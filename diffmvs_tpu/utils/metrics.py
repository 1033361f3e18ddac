"""Depth metrics + scalar meters.

Parity targets: AbsDepthError_metrics / Thres_metrics
(/root/reference/utils.py:168-187) and DictAverageMeter (utils.py:104-123).
Per-image masked means, averaged over the batch — expressed as weighted
means (no boolean indexing => static shapes, jit-safe).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp


def _per_image_masked_mean(value, mask):
    """value, mask: [B, H, W] -> mean over batch of per-image masked means."""
    m = mask.astype(value.dtype)
    num = jnp.sum(value * m, axis=(1, 2))
    den = jnp.maximum(jnp.sum(m, axis=(1, 2)), 1.0)
    return jnp.mean(num / den)


def abs_depth_error(depth_est, depth_gt, mask):
    """Mean absolute depth error over masked pixels, per image then batch."""
    return _per_image_masked_mean(jnp.abs(depth_est - depth_gt), mask)


def threshold_error(depth_est, depth_gt, mask, thres):
    """Fraction of masked pixels with |error| > thres."""
    err = (jnp.abs(depth_est - depth_gt) > thres).astype(jnp.float32)
    return _per_image_masked_mean(err, mask)


class DictAverageMeter:
    """Running mean of scalar dicts (host-side)."""

    def __init__(self):
        self.data: Dict[str, float] = {}
        self.count = 0

    def update(self, new_input: Dict[str, float]):
        self.count += 1
        for k, v in new_input.items():
            v = float(v)
            self.data[k] = self.data.get(k, 0.0) + v

    def mean(self) -> Dict[str, float]:
        return {k: v / self.count for k, v in self.data.items()}
