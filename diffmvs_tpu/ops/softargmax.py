"""Soft-argmax depth regression + windowed photometric confidence.

Parity target: /root/reference/models/module.py:553-571 (InitialCost tail):
softmax over depth -> expectation index -> normalized inverse depth; the
photometric confidence is the probability mass of the 4 bins
[floor(idx)-1, floor(idx)+2] (implemented there via padded avg_pool3d + gather).

TPU design: the 4-bin window sum is two gathers into an exclusive cumulative
sum along depth instead of a pooled volume — O(D) memory, no reduce_window.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def depth_regression_with_confidence(prob_logits):
    """prob_logits: [B, D, H, W] regularized cost volume (pre-softmax).

    Returns (normalized_inv_depth [B,H,W] in [0,1],
             photometric_confidence [B,H,W] in [0,1]).
    """
    b, d, h, w = prob_logits.shape
    prob = jax.nn.softmax(prob_logits, axis=1)

    idx_values = jnp.arange(d, dtype=prob.dtype).reshape(1, d, 1, 1)
    index = jnp.sum(idx_values * prob, axis=1)           # [B,H,W] expectation
    normalized = index / (d - 1.0)

    # windowed confidence: sum of prob[i0-1 .. i0+2], i0 = floor(index)
    csum = jnp.cumsum(prob, axis=1)                      # inclusive cumsum
    i0 = jnp.clip(index.astype(jnp.int32), 0, d - 1)

    hi = jnp.clip(i0 + 2, 0, d - 1)                      # window end
    lo = i0 - 2                                          # window start - 1
    hi_val = jnp.take_along_axis(csum, hi[:, None], axis=1)[:, 0]
    lo_val = jnp.where(
        lo >= 0,
        jnp.take_along_axis(csum, jnp.maximum(lo, 0)[:, None], axis=1)[:, 0],
        0.0,
    )
    confidence = hi_val - lo_val
    confidence = jax.lax.stop_gradient(confidence)       # module.py:562 no_grad
    return normalized, confidence
