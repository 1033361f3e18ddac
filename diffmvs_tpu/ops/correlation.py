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


def warp_corr_backward(src_fea, ref_fea, src_pair, ref_pair, depth_values,
                       g, groups):
    """Analytic cotangents (d_src, d_ref) of warp_and_correlate.

    Equals jax.vjp(warp_and_correlate)(g) for the feature inputs (the
    projection matrices and depth hypotheses get zero cotangents — the
    coords are stop_gradient'ed, geometry/warp.py:60-61), but without
    re-running the correlation forward:

      d_ref[p,c]  = (1/Cg) sum_d  g[d,p,grp(c)] * warped[d,p,c]
      d_src       = bilinear scatter-add of (1/Cg) g[...,grp(c)] * ref

    One gather (for warped) + one scatter — the recompute-based VJP pays
    gather + correlation forward + the full transpose. This is also the
    seam where a banded Pallas kernel can replace the XLA gather.
    g: [B, D, H, W, G] cotangent of the correlation output.
    Returns (d_src [B,Hs,Ws,C] f32, d_ref [B,H,W,C] f32).
    """
    b, hs, ws, c = src_fea.shape
    _, d, h, w = depth_values.shape
    cg = c // groups

    rot, trans = relative_projection(src_pair, ref_pair)
    from diffmvs_tpu.geometry.warp import plane_sweep_coords
    x, y = plane_sweep_coords(rot, trans, depth_values)     # [B,D,H,W]

    # g expanded over channels within each group: channel c = grp*Cg + i
    gexp = jnp.repeat(g.astype(jnp.float32), cg, axis=-1)   # [B,D,H,W,C]

    # d_ref: needs the warped features (one gather)
    warped = plane_sweep_warp(src_fea, src_pair, ref_pair, depth_values)
    d_ref = jnp.sum(warped.astype(jnp.float32) * gexp, axis=1) / cg

    # d_src: scatter d_warped = gexp * ref / Cg through the bilinear
    # corner weights (zero-padding semantics: invalid corners drop out)
    d_warped = gexp * ref_fea[:, None].astype(jnp.float32) / cg
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)
    wy = (y - y0)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def scatter_one(dw_flat, idx_flat, upd_mask):
        # dw_flat: [D*H*W, C]; idx_flat: [D*H*W]; upd_mask: [D*H*W]
        out = jnp.zeros((hs * ws, c), jnp.float32)
        return out.at[idx_flat].add(dw_flat * upd_mask[:, None])

    d_src = jnp.zeros((b, hs * ws, c), jnp.float32)
    for dx, dy in ((0, 0), (1, 0), (0, 1), (1, 1)):
        xi = x0i + dx
        yi = y0i + dy
        valid = ((xi >= 0) & (xi < ws) & (yi >= 0) & (yi < hs))
        wgt = ((wx if dx else 1.0 - wx) * (wy if dy else 1.0 - wy))
        idx = jnp.where(valid, yi * ws + jnp.clip(xi, 0, ws - 1), 0)
        upd = (d_warped * wgt[..., None]).reshape(b, d * h * w, c)
        msk = (valid.astype(jnp.float32) * 1.0).reshape(b, d * h * w)
        d_src = d_src + jax.vmap(scatter_one)(
            upd, idx.reshape(b, d * h * w), msk)
    return d_src.reshape(b, hs, ws, c), d_ref
