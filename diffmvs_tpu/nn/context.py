"""Reference-image context encoder — parity: models/module.py:321-355.

ResidualBlock chain (8->16->32->48 ch, stride-2 between levels); per-stage
heads sized hidden_dim[s] + context_dim[s]. The stage3 head exists only for
the cascade variant (out_dim[2] > 0).

s2d=True runs the full- and half-resolution levels (C=8-16, the same
lane-bound regime the FeatureNet trunk had) in space-to-depth layout:
to_s2d(4) at the input, the two stride-2 blocks step 4->2->1, everything
from 1/4 resolution on is native. Identical math and parameter tree
(nn/s2d.py; same recipe as nn/feature.py).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

from flax import linen as nn

from diffmvs_tpu.nn.layers import ConvBnReLU, ResidualBlock, conv
from diffmvs_tpu.nn.s2d import (
    BatchNormS2D,
    ConvS2D,
    from_s2d,
    to_s2d,
)
from diffmvs_tpu.nn.layers import torch_kernel_init


class ConvBnS2D(nn.Module):
    """ConvBn (no activation) on an s2d(s) input; emits s2d(s//strides).
    Param tree matches ConvBn ("conv" + "bn")."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    s: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel_size
        conv = ConvS2D(self.features, (k, k), s=self.s,
                       stride=self.strides, use_bias=False,
                       kernel_init=torch_kernel_init,
                       dtype=self.dtype, name="conv")
        so = self.s // self.strides
        bn = BatchNormS2D(s=so, use_running_average=not train,
                          momentum=0.9, epsilon=1e-5,
                          dtype=self.dtype, name="bn")
        return bn(conv(x))


class ResidualBlockS2D(nn.Module):
    """ResidualBlock on an s2d(s) input. Param tree matches ResidualBlock
    ("conv1" ConvBnReLU + "conv2" ConvBn + optional "downsample")."""

    features: int
    strides: int = 1
    s: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        from diffmvs_tpu.nn.feature import ConvBnActS2D

        so = self.s // self.strides
        y = ConvBnActS2D(self.features, 3, self.strides, s=self.s,
                         dtype=self.dtype, name="conv1")(x, train)
        y = ConvBnS2D(self.features, 3, 1, s=so, dtype=self.dtype, name="conv2")(y, train)
        if self.strides != 1:
            x = ConvBnS2D(self.features, 3, self.strides, s=self.s,
                          dtype=self.dtype, name="downsample")(x, train)
        return nn.relu(x + y)


class ContextNet(nn.Module):
    out_dim: Tuple[int, int, int] = (64, 64, 36)  # hidden+context per stage
    s2d: bool = False
    # (A tail_s2d variant — the 1/4-res tail on the s2d(2) grid —
    # measured a WASH end-to-end at B=8 (docs/bench_r4.json) and was
    # removed, same conclusion as nn/feature.py. A fused Pallas
    # conv+BN kernel was likewise measured slower than XLA on every
    # production shape and deleted — docs/bench_r5.json conv_war_final.)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        ctx = {}
        if self.s2d:
            xs = to_s2d(x.astype(dt) if dt is not None else x, 4)
            from diffmvs_tpu.nn.feature import ConvBnActS2D
            xs = ConvBnActS2D(8, 3, 1, s=4, dtype=dt, name="conv1")(xs, train)
            xs = ResidualBlockS2D(16, strides=2, s=4, dtype=dt,
                                  name="layer1_0")(xs, train)  # -> s2d(2)
            xs = ResidualBlockS2D(16, strides=1, s=2, dtype=dt,
                                  name="layer1_1")(xs, train)
            if self.out_dim[2] > 0:
                out3 = ConvS2D(self.out_dim[2], (3, 3), s=2,
                               kernel_init=torch_kernel_init,
                               dtype=dt, name="output3")(xs)
                ctx["stage3"] = from_s2d(out3, 2)
            x = ResidualBlockS2D(32, strides=2, s=2, dtype=dt,
                                 name="layer2_0")(xs, train)   # -> native
        else:
            x = ConvBnReLU(8, 3, 1, 1, dtype=dt, name="conv1")(x, train)

            x = ResidualBlock(16, strides=2, dtype=dt,
                              name="layer1_0")(x, train)
            x = ResidualBlock(16, strides=1, dtype=dt,
                              name="layer1_1")(x, train)
            if self.out_dim[2] > 0:
                ctx["stage3"] = conv(self.out_dim[2], 3, padding=1,
                                     dtype=dt, name="output3")(x)

            x = ResidualBlock(32, strides=2, dtype=dt,
                              name="layer2_0")(x, train)
        x = ResidualBlock(32, strides=1, dtype=dt,
                          name="layer2_1")(x, train)
        ctx["stage2"] = conv(self.out_dim[1], 3, padding=1,
                             dtype=dt, name="output2")(x)

        x = ResidualBlock(48, strides=2, dtype=dt,
                          name="layer3_0")(x, train)
        x = ResidualBlock(48, strides=1, dtype=dt, name="layer3_1")(x, train)
        ctx["stage1"] = conv(self.out_dim[0], 3, padding=1,
                             dtype=dt, name="output1")(x)
        return ctx
