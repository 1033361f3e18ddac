"""Utilities: metrics, meters, host<->device helpers (layer L8)."""

from diffmvs_tpu.utils.metrics import (  # noqa: F401
    abs_depth_error,
    threshold_error,
    DictAverageMeter,
)
