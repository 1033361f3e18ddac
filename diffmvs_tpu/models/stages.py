"""Stage heads: plane-sweep depth initialization + local cost volumes.

Parity targets:
  InitialStage (depth init)  — /root/reference/models/module.py:465-573
  local_cost_volume (GetCost)— /root/reference/models/module.py:575-667
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffmvs_tpu.geometry.transforms import (
    depth_range_samples,
    disp_to_depth,
)
from diffmvs_tpu.nn.costreg import CostRegNet, PixelViewWeight
from diffmvs_tpu.nn.layers import torch_kernel_init
from diffmvs_tpu.ops.correlation import aggregate_views, warp_and_correlate
from diffmvs_tpu.ops.softargmax import depth_regression_with_confidence


class UpsampleMaskHead(nn.Module):
    """conv3x3 -> ReLU -> conv1x1(9*r*r) mask head, scaled by 0.25.

    Parity: module.py:481-484,511 and update.py:335-339,463,473.
    (An s2d-grid variant of this head was measured NEUTRAL end-to-end
    — docs/bench_r5.json mask_s2d row — and removed.)
    """

    ratio: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, context):
        x = nn.Conv(64, (3, 3), padding=((1, 1), (1, 1)),
                    kernel_init=torch_kernel_init, dtype=self.dtype,
                    name="conv1")(context)
        x = nn.relu(x)
        x = nn.Conv(self.ratio * self.ratio * 9, (1, 1),
                    kernel_init=torch_kernel_init, dtype=self.dtype,
                    name="conv2")(x)
        return 0.25 * x


class InitialStage(nn.Module):
    """Stage-0 head at 1/8 resolution: full plane sweep + 3D regularization.

    Group correlation per source view, view-weighted aggregation (weights
    from PixelViewWeight), CostRegNet regularization, soft-argmax depth and
    windowed photometric confidence, plus the x2 convex-upsample mask.
    """

    group_dim: int = 8           # correlation groups (cost_dim_stage[0])
    up_ratio: int = 2
    warp_kernel: str = "xla"
    warp_bwd: str = "recompute"
    warp_glue: bool = True       # batched kernel glue (config.warp_glue)
    stage1_s2d: bool = False     # s2d layout for PixelViewWeight
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, features, context, proj_pairs, depth_values,
                 scale_inv_depth, train: bool = False):
        """
        features: list of V feature maps [B, H, W, C] (ref first).
        context: [B, H, W, Cctx] (relu'd stage-1 context).
        proj_pairs: [B, V, 2, 4, 4] (extrinsic, intrinsic) stacks.
        depth_values: [B, D, H, W] metric hypothesis depths.
        scale_inv_depth: fn(normalized inv depth) -> (scaled_disp, depth).
        Returns (mask_logits, inv_depth [B,H,W], depth [B,H,W],
                 view_weights [V-1,B,H,W] (caller detaches for reuse),
                 photometric_confidence [B,H,W]).
        """
        mask_logits = UpsampleMaskHead(self.up_ratio, dtype=self.dtype,
                                       name="mask")(context)

        ref_fea = features[0]
        pvw = PixelViewWeight(s2d=4 if self.stage1_s2d else 1,
                              dtype=self.dtype, name="pixel_view_weight")

        cor_list, weight_list = [], []
        for i, src_fea in enumerate(features[1:]):
            # "pallas" applies the fused kernel to the refinement
            # stages only; "pallas_full" also routes this full sweep
            # through it (grouped windows: 8 adjacent planes share
            # one DMA window)
            if self.warp_kernel == "pallas_full":
                from diffmvs_tpu.ops.pallas.warp_corr import (
                    warp_corr_pallas)

                cor = warp_corr_pallas(
                    src_fea, ref_fea, proj_pairs[:, i + 1],
                    proj_pairs[:, 0], depth_values, self.group_dim,
                    window_group=8, batch_glue=self.warp_glue,
                    bwd=self.warp_bwd).astype(ref_fea.dtype)
            else:
                cor = warp_and_correlate(
                    src_fea, ref_fea, proj_pairs[:, i + 1],
                    proj_pairs[:, 0], depth_values,
                    self.group_dim)                # [B,D,H,W,G]
            weight_list.append(pvw(cor, train))    # [B,H,W]
            cor_list.append(cor)

        cor_feats = jnp.stack(cor_list)                # [V-1,B,D,H,W,G]
        view_weights = jnp.stack(weight_list)          # [V-1,B,H,W]
        agg = aggregate_views(cor_feats, view_weights)

        prob_logits = CostRegNet(base_channels=8, dtype=self.dtype,
                                 name="cost_regularization")(agg, train)
        normalized, confidence = depth_regression_with_confidence(
            prob_logits.astype(jnp.float32))
        depth = scale_inv_depth(normalized)[1]

        return mask_logits, normalized, depth, view_weights, confidence


def local_cost_volume(inv_depth, features, proj_pairs, depth_interval,
                      depth_min, depth_max, cost_num, group_dim,
                      view_weights, confidence=None,
                      min_radius=0.2, max_radius=2.0, use_confidence=None,
                      warp_kernel: str = "xla",
                      warp_bwd: str = "recompute",
                      warp_glue: bool = True,
                      warp_native_agg: bool = True):
    """Per-iteration local cost volume around the current inverse depth.

    Parity: GetCost (module.py:575-667) — sample cost_num hypotheses
    (confidence-adaptive radius), warp every source view, group-correlate,
    aggregate with the frozen stage-1 view weights, flatten depth into
    channels.

    inv_depth: [B, H, W] normalized inverse depth.
    view_weights: [V-1, B, H, W] (already upsampled to this stage's res and
      gradient-stopped by the caller).
    Returns (cost [B, H, W, G*cost_num], samples [B, cost_num, H, W]).
    """
    if cost_num > 1:
        samples = depth_range_samples(
            inv_depth, cost_num, depth_interval, confidence,
            min_radius, max_radius, use_confidence)    # [B,D,H,W]
    else:
        samples = inv_depth[:, None]

    ndim_fix = (inv_depth.shape[0],) + (1,) * 3
    depth_hyp = disp_to_depth(
        samples, depth_min.reshape(ndim_fix), depth_max.reshape(ndim_fix))[1]

    ref_fea = features[0]
    cor_list = []
    if warp_kernel in ("pallas", "pallas_full"):
        # fused warp+correlation Pallas kernel (refinement hypotheses are
        # banded). One call per (view, sample): measured best of three
        # integration shapes — a single stacked launch over views x batch
        # was slower with the v1 kernel (2.82 vs 3.22 maps/s), and the v3
        # fused-view-accumulation kernel (warp_corr_agg_pallas, view axis
        # innermost with a resident accumulated output block) measured
        # ~2x slower in isolation (stage-3 cost volume 203 vs 105 ms):
        # the read-modify-write dependency between consecutive grid steps
        # defeats Mosaic's grid pipelining. Independent per-(view,sample)
        # calls pipeline against each other and the surrounding XLA ops.
        from diffmvs_tpu.ops.pallas.warp_corr import (aggregate_native_cost,
                                                      warp_corr_pallas)

        for i, src_fea in enumerate(features[1:]):
            # batched call: shared prep/epilogue, per-sample launches
            # inside (_warp_corr_impl)
            cor = warp_corr_pallas(
                src_fea, ref_fea, proj_pairs[:, i + 1],
                proj_pairs[:, 0], depth_hyp, group_dim,
                batch_glue=warp_glue, bwd=warp_bwd,
                native_out=warp_native_agg)
            cor_list.append(cor.astype(ref_fea.dtype))
        if warp_native_agg:
            # weight-sum the views in the kernel's native layout and pay
            # ONE relayout straight into the reference's g*D+d channel
            # flattening — identical values to the aggregate_views path
            # (tests/test_pallas_warp.py asserts bit-parity)
            h, w = inv_depth.shape[1], inv_depth.shape[2]
            cost = aggregate_native_cost(jnp.stack(cor_list),
                                         view_weights, h, w)
            return cost, samples
    else:
        for i, src_fea in enumerate(features[1:]):
            cor_list.append(warp_and_correlate(
                src_fea, ref_fea, proj_pairs[:, i + 1], proj_pairs[:, 0],
                depth_hyp, group_dim))
    agg = aggregate_views(jnp.stack(cor_list), view_weights)  # [B,D,H,W,G]

    b, d, h, w, g = agg.shape
    # channel layout matches the reference's [B, G*D, H, W] view of
    # [B, G, D, H, W] (module.py:665-666): channel = g*D + d
    cost = agg.transpose(0, 2, 3, 4, 1).reshape(b, h, w, g * d)
    return cost, samples
