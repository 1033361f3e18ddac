"""Reference-image context encoder — parity: models/module.py:321-355.

ResidualBlock chain (8->16->32->48 ch, stride-2 between levels); per-stage
heads sized hidden_dim[s] + context_dim[s]. The stage3 head exists only for
the cascade variant (out_dim[2] > 0).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

from flax import linen as nn

from diffmvs_tpu.nn.layers import ConvBnReLU, ResidualBlock, conv


class ContextNet(nn.Module):
    out_dim: Tuple[int, int, int] = (64, 64, 36)  # hidden+context per stage
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        x = ConvBnReLU(8, 3, 1, 1, dtype=dt, name="conv1")(x, train)

        x = ResidualBlock(16, strides=2, dtype=dt, name="layer1_0")(x, train)
        x = ResidualBlock(16, strides=1, dtype=dt, name="layer1_1")(x, train)
        ctx = {}
        if self.out_dim[2] > 0:
            ctx["stage3"] = conv(self.out_dim[2], 3, padding=1,
                                 dtype=dt, name="output3")(x)

        x = ResidualBlock(32, strides=2, dtype=dt, name="layer2_0")(x, train)
        x = ResidualBlock(32, strides=1, dtype=dt, name="layer2_1")(x, train)
        ctx["stage2"] = conv(self.out_dim[1], 3, padding=1,
                             dtype=dt, name="output2")(x)

        x = ResidualBlock(48, strides=2, dtype=dt, name="layer3_0")(x, train)
        x = ResidualBlock(48, strides=1, dtype=dt, name="layer3_1")(x, train)
        ctx["stage1"] = conv(self.out_dim[0], 3, padding=1,
                             dtype=dt, name="output1")(x)
        return ctx
