"""Top model: DiffMVS / CasDiffMVS orchestration.

Parity target: /root/reference/models/diffusion.py:9-295 (`CasDiffMVS`).
The variant is selected by ModelConfig.stage_iters[2] (0 => DiffMVS with a
single 1/4-res refinement and x4 upsample; >0 => the 1/4 + 1/2 cascade with
x2 upsamples), exactly mirroring the reference flag semantics.

Forward contract (all NHWC):
  imgs:          [B, V, H, W, 3]   (ref view first)
  proj_matrices: {stage1..4: [B, V, 2, 4, 4]}  (extrinsic, intrinsic pairs)
  depth_values:  [B, ND] inverse-depth linspace (ref datasets emit this)
  depth_gt:      {stage1..4: [B, Hs, Ws]} metric GT (training only)
Returns {"depth": [...], "conf": [...], "photometric_confidence": [...]}
with the same list layout as the reference (loss indexing depends on it).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffmvs_tpu.config import ModelConfig
from diffmvs_tpu.geometry.transforms import depth_to_disp, disp_to_depth
from diffmvs_tpu.geometry.upsample import upsample_with_mask
from diffmvs_tpu.models.refine import RefinementStage
from diffmvs_tpu.models.schedule import DiffusionSchedule
from diffmvs_tpu.models.stages import InitialStage
from diffmvs_tpu.nn.context import ContextNet
from diffmvs_tpu.nn.feature import FeatureNet
from diffmvs_tpu.nn.layers import ConvBnAct, conv
from diffmvs_tpu.ops.resize import upsample_nearest


class HiddenInit(nn.Module):
    """Strided convs bringing the context hidden state to 1/8 resolution.

    Parity: diffusion.py:53-58 (stage 1, /2) and :91-101 (stage 2, /4).
    """

    hidden_dim: int
    num_down: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_down):
            x = ConvBnAct(32, 3, 2, 1, dtype=self.dtype,
                          name=f"down{i}")(x, train)
        return conv(self.hidden_dim, 3, padding=1, use_bias=False,
                    dtype=self.dtype, name="out")(x)


class CasDiffMVS(nn.Module):
    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        dt = cfg.dtype if cfg.compute_dtype != "float32" else None

        self.feature = FeatureNet(
            base_channels=cfg.base_channels,
            out_channels=cfg.feat_dim_stage, s2d=cfg.feature_s2d,
            phase_opt=cfg.feature_phase_opt,
            fold_head=cfg.feature_fold_head,
            dtype=dt)
        self.context = ContextNet(out_dim=cfg.ctx_out_dim,
                                  s2d=cfg.context_s2d,
                                  dtype=dt)
        self.depthnet = InitialStage(
            group_dim=cfg.cost_dim_stage[0], up_ratio=2,
            warp_kernel=cfg.warp_kernel, warp_bwd=cfg.warp_bwd,
            warp_glue=cfg.warp_glue[0],
            stage1_s2d=cfg.stage1_s2d,
            dtype=dt)

        hidden_inits, stages = [], []
        for s in (1, 2):
            if cfg.stage_iters[s] == 0:
                continue
            hidden_inits.append(HiddenInit(
                hidden_dim=cfg.hidden_dim[s], num_down=s, dtype=dt,
                name=f"hidden_init{s}"))
            stages.append(RefinementStage(
                unet_dim=cfg.unet_dim[s],
                dim_mults=cfg.unet_dim_mults[s],
                hidden_dim=cfg.hidden_dim[s],
                context_dim=cfg.context_dim[s],
                num_sample=cfg.cost_num[s],
                cost_dim=cfg.cost_dim_stage[s] * cfg.cost_num[s],
                group_dim=cfg.cost_dim_stage[s],
                depth_interval=(1.0 / cfg.numdepth)
                * cfg.depth_intervals_ratio[s],
                iters=cfg.stage_iters[s],
                up_ratio=cfg.up_ratio,
                schedule=DiffusionSchedule(
                    timesteps=cfg.timesteps[s],
                    sampling_timesteps=cfg.sampling_timesteps[s],
                    eta=cfg.ddim_eta[s],
                    scale=cfg.scale[s]),
                min_radius=cfg.min_radius,
                max_radius=cfg.max_radius,
                remat=cfg.remat,
                warp_kernel=cfg.warp_kernel,
                warp_bwd=cfg.warp_bwd,
                warp_glue=cfg.warp_glue[s],
                warp_native_agg=cfg.warp_native_agg,
                unet_s2d=cfg.unet_s2d,
                encoder_s2d=cfg.encoder_s2d,
                unroll=cfg.unroll_iters,
                dtype=dt,
                name=f"update_block{s}"))
        self.hidden_inits = hidden_inits
        self.update_blocks = stages

    def __call__(self, imgs, proj_matrices, depth_values, depth_gt=None,
                 rng=None, train: bool = False, export: bool = False,
                 train_overrides=None):
        """train=True: training branch (q_sample), full intermediate lists.
        train=False, export=False: DDIM eval but full lists (the reference's
          in-training validation, test=False + model.eval()).
        train=False, export=True: DDIM eval, final depth + full-res
          confidences only (the reference's test.py path, test=True).
        train_overrides: optional {stage_idx: (t [B], noise [B,Hs,Ws])}
          replacing each stage's rng draw (reproducibility/parity seam).
        """
        cfg = self.cfg
        if imgs.dtype == jnp.uint8:
            # datasets ship raw bytes (4x less worker-IPC + host->device
            # traffic); u8/255 in f32 matches the reference's host-side
            # normalization (datasets/dtu.py:111 in the ref) to within
            # 1 ulp (XLA strength-reduces the divide to a reciprocal
            # multiply)
            imgs = imgs.astype(jnp.float32) / 255.0
        b, v = imgs.shape[0], imgs.shape[1]

        disp_min = depth_values[:, 0].astype(jnp.float32)     # [B]
        disp_max = depth_values[:, -1].astype(jnp.float32)
        depth_max = 1.0 / disp_min
        depth_min = 1.0 / disp_max

        def bshape(x, arr):
            return x.reshape((b,) + (1,) * (arr.ndim - 1))

        def scale_inv_depth(nd):
            return disp_to_depth(nd, bshape(depth_min, nd),
                                 bshape(depth_max, nd))

        def to_disp(d):
            return depth_to_disp(d, bshape(depth_min, d),
                                 bshape(depth_max, d))

        # ------------------------------------------------------------------
        # feature extraction: fold views into batch (BN stats then cover all
        # views jointly; the reference runs per-view — same eval semantics)
        # ------------------------------------------------------------------
        flat = imgs.reshape((b * v,) + imgs.shape[2:])
        feats = self.feature(flat, train)
        features = {
            k: x.reshape((b, v) + x.shape[1:]) for k, x in feats.items()
        }
        contexts = self.context(imgs[:, 0], train)

        depth_predictions = []
        confs = []           # per-iteration confidences (training loss)
        confidences = []     # full-res photometric confidences (fusion)

        init_depth = None
        view_weights = None

        for stage_idx in range(3):
            if cfg.stage_iters[stage_idx] == 0 and stage_idx > 0:
                continue
            stage_key = f"stage{stage_idx + 1}"
            feats_stage = features[stage_key]
            proj_stage = proj_matrices[stage_key].astype(jnp.float32)
            feat_list = [feats_stage[:, i] for i in range(v)]
            context_stage = contexts[stage_key]
            h, w = feat_list[0].shape[1], feat_list[0].shape[2]

            if stage_idx == 0:
                # ---------------- depth initialization at 1/8 --------------
                nd0 = cfg.numdepth_initial
                samples = jnp.arange(nd0, dtype=jnp.float32) / (nd0 - 1.0)
                samples = jnp.broadcast_to(
                    samples.reshape(1, nd0, 1, 1), (b, nd0, h, w))
                depth_hyp = scale_inv_depth(samples)[1]

                ctx = nn.relu(context_stage)
                mask, inv_depth, init_depth, view_weights, conf = \
                    self.depthnet(feat_list, ctx, proj_stage, depth_hyp,
                                  scale_inv_depth, train)

                depth_predictions.append(init_depth)
                confidences.append(upsample_nearest(conf, 2 ** 3))

                inv_up = upsample_with_mask(
                    inv_depth, mask.astype(jnp.float32), 2)
                depth_predictions.append(scale_inv_depth(inv_up)[1])
            else:
                # ---------------- diffusion refinement ---------------------
                block_i = stage_idx - 1
                cur_depth = jax.lax.stop_gradient(depth_predictions[-1])
                inv_cur = to_disp(cur_depth)

                vw = jax.lax.stop_gradient(view_weights)
                vw_stage = upsample_nearest(vw, 2 ** stage_idx,
                                            spatial_axes=(2, 3))

                hidden_d = context_stage[..., :cfg.hidden_dim[stage_idx]]
                ctx = context_stage[..., cfg.hidden_dim[stage_idx]:]
                hidden_d = self.hidden_inits[block_i](hidden_d, train)
                hidden_d = jnp.tanh(hidden_d)
                ctx = nn.relu(ctx)

                if train:
                    init_up = upsample_nearest(init_depth, 2 ** stage_idx)
                    inv_init = jax.lax.stop_gradient(to_disp(init_up))
                    gt_stage = depth_gt[stage_key]
                    inv_gt = to_disp(gt_stage)
                else:
                    inv_init = None
                    inv_gt = None

                stage_rng = None
                if rng is not None:
                    stage_rng = jax.random.fold_in(rng, stage_idx)

                t_noise = None
                if train_overrides is not None:
                    t_noise = train_overrides.get(stage_idx)
                mask, _, inv_seq, conf_seq = self.update_blocks[block_i](
                    inv_cur, hidden_d, ctx, feat_list, proj_stage,
                    depth_min, depth_max, vw_stage,
                    gt_inv_depth=inv_gt, inv_init_depth=inv_init,
                    rng=stage_rng, train=train, t_noise=t_noise)

                if not export:
                    for inv_i in inv_seq:
                        depth_predictions.append(scale_inv_depth(inv_i)[1])
                    confs.extend(conf_seq)
                else:
                    depth_predictions.append(
                        scale_inv_depth(inv_seq[-1])[1])
                    confidences.append(
                        upsample_nearest(conf_seq[-1], 2 ** (3 - stage_idx)))

                inv_up = upsample_with_mask(
                    inv_seq[-1], mask.astype(jnp.float32), cfg.up_ratio)
                depth_predictions.append(scale_inv_depth(inv_up)[1])

        return {
            "depth": depth_predictions,
            "conf": confs,
            "photometric_confidence": confidences,
        }
