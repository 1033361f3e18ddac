"""flax.linen building blocks (layer L1/L2)."""

from diffmvs_tpu.nn.layers import (  # noqa: F401
    ConvBnAct,
    Conv3dBnAct,
    Deconv3dBnAct,
    SepConvGRU,
    ResidualBlock,
    ConvBnReLU,
    ConvBn,
    conv,
    torch_kernel_init,
)
from diffmvs_tpu.nn.feature import FeatureNet  # noqa: F401
from diffmvs_tpu.nn.context import ContextNet  # noqa: F401
from diffmvs_tpu.nn.costreg import CostRegNet, PixelViewWeight  # noqa: F401
from diffmvs_tpu.nn.unet import DiffusionUNet, ConditionEncoder  # noqa: F401
