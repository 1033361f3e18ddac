"""TPU compute ops: correlation volumes, soft-argmax, resizes, Pallas kernels."""

from diffmvs_tpu.ops.correlation import (  # noqa: F401
    group_correlation,
    warp_and_correlate,
    aggregate_views,
)
from diffmvs_tpu.ops.softargmax import depth_regression_with_confidence  # noqa: F401
from diffmvs_tpu.ops.resize import upsample_nearest  # noqa: F401
