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

from diffmvs_tpu.nn.layers import Conv3dBnAct, Deconv3dBnAct, torch_kernel_init


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


class PixelViewWeight(nn.Module):
    """Per-source-view pixel weight: conv3d stack -> sigmoid -> max over D."""

    @nn.compact
    def __call__(self, cor_feat, train: bool = False):
        """cor_feat: [B, D, H, W, G]. Returns [B, H, W]."""
        x = Conv3dBnAct(8, 3, 1, 1, name="conv0")(cor_feat, train)
        x = nn.Conv(1, (3, 3, 3), padding=((1, 1),) * 3, use_bias=True,
                    kernel_init=torch_kernel_init, name="conv1")(x)
        x = nn.sigmoid(x[..., 0])                            # [B, D, H, W]
        return jnp.max(x, axis=1)                            # [B, H, W]
