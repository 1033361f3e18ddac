"""Group-wise correlation cost volumes.

Parity targets:
  group correlation   — /root/reference/models/module.py:529-531,644-646
  view aggregation    — /root/reference/models/module.py:533-548,650-661

The reference materializes a [B, G, C/G, D, H, W] product before the group
mean. Here the warp -> multiply -> group-mean chain is expressed so XLA fuses
it into the gather consumers (no [B,D,H,W,C] round-trip to HBM for the
product), with an optional Pallas fusion in ops/pallas/warp_corr.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from diffmvs_tpu.geometry.transforms import relative_projection
from diffmvs_tpu.geometry.warp import plane_sweep_warp


def group_correlation(warped, ref, groups):
    """Mean of elementwise products within each channel group.

    warped: [B, D, H, W, C]; ref: [B, H, W, C]. Returns [B, D, H, W, G].
    """
    b, d, h, w, c = warped.shape
    assert c % groups == 0, f"channels {c} not divisible by groups {groups}"
    wg = warped.reshape(b, d, h, w, groups, c // groups)
    rg = ref.reshape(b, 1, h, w, groups, c // groups)
    return jnp.mean(wg * rg, axis=-1)


def warp_and_correlate(src_fea, ref_fea, src_pair, ref_pair, depth_values,
                       groups):
    """Fused plane-sweep warp + group correlation for one source view.

    src_fea/ref_fea: [B, Hs, Ws, C] / [B, H, W, C] (NHWC).
    src_pair/ref_pair: [B, 2, 4, 4] (extrinsic, intrinsic) stacks.
    depth_values: [B, D, H, W] metric hypotheses.
    Returns [B, D, H, W, G].
    """
    warped = plane_sweep_warp(src_fea, src_pair, ref_pair, depth_values)
    return group_correlation(warped, ref_fea, groups)


def aggregate_views(cor_feats, view_weights):
    """View-weighted average of per-view correlation volumes.

    cor_feats: [V, B, D, H, W, G] stacked per-source-view correlations.
    view_weights: [V, B, H, W] pixel-wise weights (sigmoid-max outputs of
      PixelViewWeight, detached by callers where the reference detaches).
    Returns [B, D, H, W, G].
    """
    w = view_weights[:, :, None, :, :, None]            # [V,B,1,H,W,1]
    num = jnp.sum(cor_feats * w, axis=0)
    den = jnp.sum(w, axis=0) + 1e-8                      # module.py:515
    return num / den


