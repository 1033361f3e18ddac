"""3D cost-volume regularization + pixel-wise view weighting.

Parity targets:
  CostRegNet_small  — /root/reference/models/module.py:422-448
  PixelViewWeight   — /root/reference/models/module.py:450-463

Volumes are NDHWC: [B, D, H, W, C]. The 3D convs map directly onto
lax.conv_general_dilated with three spatial dims — XLA lowers them to MXU
contractions; the tiny channel counts (8..32) are inherent to the model.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from diffmvs_tpu.nn.layers import (
    Conv3dBnAct,
    Deconv3dBnAct,
    torch_bias_init,
    torch_kernel_init,
)
from diffmvs_tpu.nn.s2d import (
    BatchNormS2D,
    Conv3DS2D,
    from_s2d,
    to_s2d_vol,
)


class CostRegNet(nn.Module):
    """3-level 3D U-Net with transposed-conv decoder and skip adds."""

    base_channels: int = 8
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bc, dt = self.base_channels, self.dtype

        c0 = Conv3dBnAct(bc, 3, 1, 1, dtype=dt, name="conv0")(x, train)
        c1 = Conv3dBnAct(bc, 3, 1, 1, dtype=dt, name="conv1")(c0, train)

        c2 = Conv3dBnAct(bc * 2, 3, 2, 1, dtype=dt, name="conv2")(c1, train)
        c3 = Conv3dBnAct(bc * 2, 3, 1, 1, dtype=dt, name="conv3")(c2, train)

        c4 = Conv3dBnAct(bc * 4, 3, 2, 1, dtype=dt, name="conv4")(c3, train)
        c5 = Conv3dBnAct(bc * 4, 3, 1, 1, dtype=dt, name="conv5")(c4, train)

        x = c3 + Deconv3dBnAct(bc * 2, 3, dtype=dt, name="conv6")(c5, train)
        x = c1 + Deconv3dBnAct(bc, 3, dtype=dt, name="conv7")(x, train)

        prob = nn.Conv(1, (3, 3, 3), padding=((1, 1),) * 3, use_bias=False,
                       kernel_init=torch_kernel_init, dtype=dt,
                       name="prob")(x)
        return prob[..., 0]                                  # [B, D, H, W]


class Conv3dBnActS2D(nn.Module):
    """Conv3dBnAct on a volume with s2d(s) H/W axes; identical param
    tree ("conv" + "bn")."""

    features: int
    kernel_size: int = 3
    s: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel_size
        cin = int(x.shape[-1]) // (self.s * self.s)
        x = Conv3DS2D(self.features, (k, k, k), s=self.s, use_bias=False,
                      kernel_init=torch_kernel_init,
                      bias_init=torch_bias_init(cin * k ** 3),
                      dtype=self.dtype, name="conv")(x)
        x = BatchNormS2D(s=self.s, use_running_average=not train,
                         momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                         name="bn")(x)
        return nn.relu(x)


class PixelViewWeight(nn.Module):
    """Per-source-view pixel weight: conv3d stack -> sigmoid -> max over D.

    s2d > 1 runs the H/W axes in space-to-depth layout (G=8 channels
    waste 94% of the TPU lane axis; the expanded conv has the same
    MACs-per-lane, the BN/sigmoid/max get s^2 x the lanes). Identical
    math and parameter tree (nn/s2d.py).
    """

    s2d: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, cor_feat, train: bool = False):
        """cor_feat: [B, D, H, W, G]. Returns [B, H, W]."""
        # dtype deliberately not forwarded: the NHWC path always ran the
        # PVW convs in f32 (no dtype passed) and the s2d path matches
        s, dt = self.s2d, None
        if s > 1:
            x = to_s2d_vol(cor_feat, s)
            x = Conv3dBnActS2D(8, 3, s=s, dtype=dt, name="conv0")(x, train)
            x = Conv3DS2D(1, (3, 3, 3), s=s, use_bias=True,
                          kernel_init=torch_kernel_init,
                          dtype=dt, name="conv1")(x)
            x = nn.sigmoid(x)                # [B, D, h, w, s*s]
            x = jnp.max(x, axis=1)           # [B, h, w, s*s]
            return from_s2d(x, s)[..., 0]    # [B, H, W]
        x = Conv3dBnAct(8, 3, 1, 1, name="conv0")(cor_feat, train)
        x = nn.Conv(1, (3, 3, 3), padding=((1, 1),) * 3, use_bias=True,
                    kernel_init=torch_kernel_init, name="conv1")(x)
        x = nn.sigmoid(x[..., 0])                            # [B, D, H, W]
        return jnp.max(x, axis=1)                            # [B, H, W]
