"""FPN image feature extractor — parity: models/module.py:357-420.

4-level pyramid: strided 5x5 convs down (8->16->32->64 ch), nearest-upsample
+ 1x1 lateral merge up. Heads emit stage1 (1/8 res), stage2 (1/4 res) and —
for the cascade variant only — stage3 (1/2 res).

s2d=True runs the full- and half-resolution trunk (C=3-16, the measured
lane-bound floor: conv3x3 8ch at full res 9.5 ms -> 1.6 ms in s2d(4),
tools/bench_layout.py) in space-to-depth layout: to_s2d(4) at the input,
the two stride-2 convs step the repr down 4->2->1, so everything from
1/4 resolution on (C>=32) is native. Identical math and parameter tree
(nn/s2d.py).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

from flax import linen as nn

from diffmvs_tpu.nn.layers import (
    ConvBnAct,
    conv,
    torch_bias_init,
    torch_kernel_init,
)
from diffmvs_tpu.nn.s2d import (
    BatchNormS2D,
    ConvS2D,
    from_s2d,
    to_s2d,
    upsample_nearest_s2d,
)
from diffmvs_tpu.ops.resize import upsample_nearest


class ConvBnActS2D(nn.Module):
    """ConvBnAct executing on an s2d(s) input; emits the s2d(s//strides)
    repr. Param tree matches ConvBnAct ("conv" + "bn")."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    s: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel_size
        cin = int(x.shape[-1]) // (self.s * self.s)
        x = ConvS2D(
            self.features, (k, k), s=self.s, stride=self.strides,
            use_bias=False, kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(cin * k * k),
            dtype=self.dtype, name="conv")(x)
        x = BatchNormS2D(s=self.s // self.strides,
                         use_running_average=not train,
                         momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class FeatureNet(nn.Module):
    base_channels: int = 8
    out_channels: Tuple[int, int, int] = (48, 32, 16)  # stage1..3; [2]==0 for DiffMVS
    s2d: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bc, dt = self.base_channels, self.dtype

        if self.s2d:
            def cba(name, feats, k, stride, s):
                return ConvBnActS2D(feats, k, stride, s=s, dtype=dt,
                                    name=name)
            # cast to the compute dtype BEFORE the relayout: halves the
            # one-hot-conv to_s2d's traffic (the first ConvBnAct casts
            # to dt anyway, so only the relayout itself changes dtype)
            x = to_s2d(x.astype(dt) if dt is not None else x, 4)
            c0 = cba("conv0_0", bc, 3, 1, 4)(x, train)
            c0 = cba("conv0_1", bc, 3, 1, 4)(c0, train)

            c1 = cba("conv1_0", bc * 2, 5, 2, 4)(c0, train)   # -> s2d(2)
            c1 = cba("conv1_1", bc * 2, 3, 1, 2)(c1, train)
            c1 = cba("conv1_2", bc * 2, 3, 1, 2)(c1, train)

            c2 = cba("conv2_0", bc * 4, 5, 2, 2)(c1, train)   # -> native
            c2 = ConvBnAct(bc * 4, 3, 1, 1, dtype=dt,
                           name="conv2_1")(c2, train)
            c2 = ConvBnAct(bc * 4, 3, 1, 1, dtype=dt,
                           name="conv2_2")(c2, train)
        else:
            c0 = ConvBnAct(bc, 3, 1, 1, dtype=dt, name="conv0_0")(x, train)
            c0 = ConvBnAct(bc, 3, 1, 1, dtype=dt, name="conv0_1")(c0, train)

            c1 = ConvBnAct(bc * 2, 5, 2, 2, dtype=dt,
                           name="conv1_0")(c0, train)
            c1 = ConvBnAct(bc * 2, 3, 1, 1, dtype=dt,
                           name="conv1_1")(c1, train)
            c1 = ConvBnAct(bc * 2, 3, 1, 1, dtype=dt,
                           name="conv1_2")(c1, train)

            c2 = ConvBnAct(bc * 4, 5, 2, 2, dtype=dt,
                           name="conv2_0")(c1, train)
            c2 = ConvBnAct(bc * 4, 3, 1, 1, dtype=dt,
                           name="conv2_1")(c2, train)
            c2 = ConvBnAct(bc * 4, 3, 1, 1, dtype=dt,
                           name="conv2_2")(c2, train)

        c3 = ConvBnAct(bc * 8, 5, 2, 2, dtype=dt, name="conv3_0")(c2, train)
        c3 = ConvBnAct(bc * 8, 3, 1, 1, dtype=dt, name="conv3_1")(c3, train)
        c3 = ConvBnAct(bc * 8, 3, 1, 1, dtype=dt, name="conv3_2")(c3, train)

        outputs = {}
        intra = c3
        outputs["stage1"] = conv(self.out_channels[0], 1, use_bias=False,
                                 dtype=dt, name="out1")(intra)

        intra = upsample_nearest(intra, 2) + conv(
            bc * 8, 1, use_bias=True, dtype=dt, name="inner1")(c2)
        outputs["stage2"] = conv(self.out_channels[1], 3, padding=1,
                                 use_bias=False, dtype=dt, name="out2")(intra)

        if self.out_channels[2] > 0:
            if self.s2d:
                # intra is native 1/4 res; c1 is the s2d(2) repr of 1/2
                # res (same physical resolution) — merge and run the
                # stage-3 head without leaving s2d
                lat = ConvS2D(bc * 8, (1, 1), s=2,
                              kernel_init=torch_kernel_init,
                              dtype=dt, name="inner2")(c1)
                intra = upsample_nearest_s2d(intra, 1) + lat
                out3 = ConvS2D(self.out_channels[2], (3, 3), s=2,
                               use_bias=False,
                               kernel_init=torch_kernel_init,
                               dtype=dt, name="out3")(intra)
                outputs["stage3"] = from_s2d(out3, 2)
            else:
                intra = upsample_nearest(intra, 2) + conv(
                    bc * 8, 1, use_bias=True, dtype=dt, name="inner2")(c1)
                outputs["stage3"] = conv(self.out_channels[2], 3, padding=1,
                                         use_bias=False, dtype=dt,
                                         name="out3")(intra)
        return outputs
