"""FPN image feature extractor — parity: models/module.py:357-420.

4-level pyramid: strided 5x5 convs down (8->16->32->64 ch), nearest-upsample
+ 1x1 lateral merge up. Heads emit stage1 (1/8 res), stage2 (1/4 res) and —
for the cascade variant only — stage3 (1/2 res).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

from flax import linen as nn

from diffmvs_tpu.nn.layers import ConvBnAct, conv, torch_kernel_init
from diffmvs_tpu.ops.resize import upsample_nearest


class FeatureNet(nn.Module):
    base_channels: int = 8
    out_channels: Tuple[int, int, int] = (48, 32, 16)  # stage1..3; [2]==0 for DiffMVS
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bc, dt = self.base_channels, self.dtype

        c0 = ConvBnAct(bc, 3, 1, 1, dtype=dt, name="conv0_0")(x, train)
        c0 = ConvBnAct(bc, 3, 1, 1, dtype=dt, name="conv0_1")(c0, train)

        c1 = ConvBnAct(bc * 2, 5, 2, 2, dtype=dt, name="conv1_0")(c0, train)
        c1 = ConvBnAct(bc * 2, 3, 1, 1, dtype=dt, name="conv1_1")(c1, train)
        c1 = ConvBnAct(bc * 2, 3, 1, 1, dtype=dt, name="conv1_2")(c1, train)

        c2 = ConvBnAct(bc * 4, 5, 2, 2, dtype=dt, name="conv2_0")(c1, train)
        c2 = ConvBnAct(bc * 4, 3, 1, 1, dtype=dt, name="conv2_1")(c2, train)
        c2 = ConvBnAct(bc * 4, 3, 1, 1, dtype=dt, name="conv2_2")(c2, train)

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
            intra = upsample_nearest(intra, 2) + conv(
                bc * 8, 1, use_bias=True, dtype=dt, name="inner2")(c1)
            outputs["stage3"] = conv(self.out_channels[2], 3, padding=1,
                                     use_bias=False, dtype=dt, name="out3")(intra)
        return outputs
