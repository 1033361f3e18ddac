"""Diffusion-based depth refinement stage.

Parity target: DiffusionUpdateBlockDepth — /root/reference/models/update.py:299-521.

Per stage: the residual inverse depth is diffused (training: q_sample of the
GT residual at a random timestep; inference: DDIM over sampling_timesteps
pairs), and a GRU-UNet denoiser iteratively predicts delta + confidence from
local cost volumes.

TPU design: the inner GRU-UNet iterations run under nn.scan (one compiled
body per stage instead of an `iters`-times unrolled graph — ~3x smaller HLO
and compile time; identical numerics, verified by the full-parity test).
The reference's per-iteration detach (update.py:442-445) is applied
unconditionally inside the cell — a no-op for inference, exact semantics for
training. DDIM time pairs stay unrolled (sampling_timesteps is 1 in all
released configs).

RNG: callers pass an explicit key (or None for deterministic zero-noise,
the parity-test seam — the released eval configs use scale=0 for most
stages anyway, cf. SURVEY.md §7.5).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffmvs_tpu.models.schedule import DiffusionSchedule
from diffmvs_tpu.models.stages import UpsampleMaskHead, local_cost_volume
from diffmvs_tpu.nn.unet import ConditionEncoder, DiffusionUNet


def _noise_like(key, x, scale):
    if key is None or scale == 0.0:
        return jnp.zeros_like(x)
    return scale * jax.random.normal(key, x.shape, x.dtype)


class RefineIteration(nn.Module):
    """One GRU-UNet denoising iteration (the nn.scan cell)."""

    unet_dim: int
    dim_mults: Tuple[int, ...]
    hidden_dim: int
    context_dim: int
    cost_num: int
    group_dim: int
    depth_interval: float
    min_radius: float
    max_radius: float
    warp_kernel: str = "xla"
    warp_bwd: str = "recompute"
    warp_glue: bool = True
    warp_native_agg: bool = True
    unet_s2d: bool = False
    encoder_s2d: int = 0         # 0 = the UNet factor; 2 = run the
                                 # condition encoder at s2d(2) + one
                                 # fused repr-change at the UNet seam
    dtype: Optional[Any] = None

    @property
    def s0(self):
        """s2d factor of the full-res UNet level (1 = s2d off)."""
        return 2 ** (len(self.dim_mults) - 1) if self.unet_s2d else 1

    def setup(self):
        s0 = self.s0
        # the encoder -> concat -> UNet seam stays in s2d layout (the
        # c-major channel order makes concatenation commute with s2d);
        # context arrives pre-s2d'd from RefinementStage (once, outside
        # the iteration scan)
        enc_s = min(self.encoder_s2d, s0) if self.encoder_s2d else s0
        self.encoder = ConditionEncoder(
            hidden_dim=self.context_dim, out_chs=self.context_dim,
            s2d=enc_s, s2d_out=s0 > 1,
            out_factor=s0 if enc_s != s0 else 0,
            dtype=self.dtype, name="encoder")
        self.unet = DiffusionUNet(
            dim=self.unet_dim, hidden_dim=self.hidden_dim,
            dim_mults=self.dim_mults, s2d=self.unet_s2d, s2d_in=s0 > 1,
            dtype=self.dtype, name="unet")

    def __call__(self, carry, context, t, inv_depth, features, proj_pairs,
                 depth_min, depth_max, view_weights):
        hidden, inv_new, delta, confidence, has_conf = carry

        # per-iteration detach (update.py:442-445); no-op at inference
        delta = jax.lax.stop_gradient(delta)
        confidence = jax.lax.stop_gradient(confidence)
        inv_new = jax.lax.stop_gradient(inv_new)

        cost, samples = local_cost_volume(
            inv_new, list(features), proj_pairs, self.depth_interval,
            depth_min, depth_max, self.cost_num, self.group_dim,
            view_weights, confidence=confidence,
            min_radius=self.min_radius, max_radius=self.max_radius,
            use_confidence=has_conf, warp_kernel=self.warp_kernel,
            warp_bwd=self.warp_bwd, warp_glue=self.warp_glue,
            warp_native_agg=self.warp_native_agg)
        input_features = self.encoder(
            inv_new[..., None], samples.transpose(0, 2, 3, 1), cost)
        input_unet = jnp.concatenate([context, input_features], axis=-1)
        hidden, update, confidence = self.unet(input_unet, hidden, t)
        # diffusion state stays f32 regardless of conv compute dtype
        confidence = confidence.astype(jnp.float32)
        delta = delta + update.astype(jnp.float32)

        inv_new = jnp.clip(inv_depth + delta, 0.0, 1.0)
        delta = inv_new - inv_depth

        carry = (hidden, inv_new, delta, confidence,
                 jnp.ones_like(has_conf))
        return carry, (inv_new, confidence)


class RefinementStage(nn.Module):
    """One diffusion refinement stage (stage_idx in {1, 2})."""

    unet_dim: int
    dim_mults: Tuple[int, ...]
    hidden_dim: int
    context_dim: int
    num_sample: int              # CostNum[s]
    cost_dim: int                # cost_dim_stage[s] * CostNum[s]
    group_dim: int               # cost_dim_stage[s]
    depth_interval: float
    iters: int
    up_ratio: int
    schedule: DiffusionSchedule
    min_radius: float = 0.2
    max_radius: float = 2.0
    remat: bool = False
    warp_kernel: str = "xla"
    warp_bwd: str = "recompute"
    warp_glue: bool = True
    warp_native_agg: bool = True
    unet_s2d: bool = False
    encoder_s2d: int = 0
    unroll: bool = False
    dtype: Optional[Any] = None

    @property
    def s0(self):
        """s2d factor of the full-res UNet level (1 = s2d off)."""
        return 2 ** (len(self.dim_mults) - 1) if self.unet_s2d else 1

    def setup(self):
        cell_cls = RefineIteration
        if self.remat:
            # rematerialize each iteration in the backward pass: activation
            # memory per stage drops from O(iters) to O(1) volumes
            cell_cls = nn.remat(RefineIteration,
                                prevent_cse=False)
        scan = nn.scan(
            cell_cls,
            variable_broadcast=["params", "wexp"],
            split_rngs={"params": False},
            in_axes=nn.broadcast,
            out_axes=0,
            length=self.iters,
            # unroll: all iterations execute in one while-loop trip, so
            # XLA CSEs the loop-invariant weight prep (s2d expansion, WS
            # standardization) instead of re-running it per iteration —
            # measured ~3-4 ms per stage-3 UNet call (tools/trace_op.py)
            unroll=self.iters if self.unroll else 1,
        )
        self.cell = scan(
            unet_dim=self.unet_dim, dim_mults=self.dim_mults,
            hidden_dim=self.hidden_dim, context_dim=self.context_dim,
            cost_num=self.num_sample, group_dim=self.group_dim,
            depth_interval=self.depth_interval,
            min_radius=self.min_radius, max_radius=self.max_radius,
            warp_kernel=self.warp_kernel,
            warp_bwd=self.warp_bwd,
            warp_glue=self.warp_glue,
            warp_native_agg=self.warp_native_agg,
            unet_s2d=self.unet_s2d,
            encoder_s2d=self.encoder_s2d,
            dtype=self.dtype, name="cell")
        self.mask = UpsampleMaskHead(
            self.up_ratio, dtype=self.dtype, name="mask")

    def _run_iters(self, inv_depth, inv_depth_new, delta, hidden, context,
                   t, features, proj_pairs, depth_min, depth_max,
                   view_weights):
        """Run `iters` denoising iterations; returns the final carry plus
        stacked per-iteration (inv_depth, confidence)."""
        if self.s0 > 1:
            # pre-s2d the loop-invariant context ONCE outside the scan
            # body (it is an nn.broadcast input, so this transpose is
            # hoisted out of the compiled while loop)
            from diffmvs_tpu.nn.s2d import to_s2d
            context = to_s2d(context, self.s0)
        carry = (hidden, inv_depth_new, delta,
                 jnp.zeros_like(inv_depth), jnp.zeros((), bool))
        carry, (inv_seq, conf_seq) = self.cell(
            carry, context, t, inv_depth, tuple(features), proj_pairs,
            depth_min, depth_max, view_weights)
        hidden, inv_new, delta, _, _ = carry
        return hidden, inv_new, delta, inv_seq, conf_seq

    def train_forward(self, inv_depth, hidden, context, gt_inv_depth,
                      inv_init_depth, rng, features, proj_pairs,
                      depth_min, depth_max, view_weights, t_noise=None):
        """Training branch (update.py:423-464). All maps [B, H, W].

        t_noise: optional explicit (t [B] int32, noise [B,H,W]) pair
        replacing the rng draw — the reproducibility/parity seam (torch
        RNG cannot be matched bit-for-bit, SURVEY.md §7.5)."""
        b = inv_depth.shape[0]
        sched = self.schedule

        gt_inv_depth = jnp.where(jnp.isinf(gt_inv_depth), inv_init_depth,
                                 gt_inv_depth)
        gt_delta = jax.lax.stop_gradient(gt_inv_depth - inv_depth)

        if t_noise is not None:
            t, noise = t_noise
            t = jnp.asarray(t, jnp.int32)
            noise = jnp.asarray(noise, gt_delta.dtype)
        else:
            kt, kn = jax.random.split(rng)
            t = jax.random.randint(kt, (b,), 0, sched.timesteps)
            noise = _noise_like(kn, gt_delta, sched.scale)

        delta = sched.q_sample(gt_delta, t, noise)
        inv_depth_new = jnp.clip(inv_depth + delta, 0.0, 1.0)
        delta = inv_depth_new - inv_depth

        hidden, _, _, inv_seq, conf_seq = self._run_iters(
            inv_depth, inv_depth_new, delta, hidden, context, t, features,
            proj_pairs, depth_min, depth_max, view_weights)

        mask = self.mask(context)
        inv_list = [inv_seq[i] for i in range(self.iters)]
        conf_list = [conf_seq[i] for i in range(self.iters)]
        return mask, hidden, inv_list, conf_list

    def eval_forward(self, inv_depth, hidden, context, rng, features,
                     proj_pairs, depth_min, depth_max, view_weights):
        """DDIM inference branch (update.py:466-521)."""
        b = inv_depth.shape[0]
        sched = self.schedule

        key = rng
        if key is not None:
            key, k0 = jax.random.split(key)
        else:
            k0 = None
        img = _noise_like(k0, inv_depth, sched.scale)
        mask = self.mask(context)

        cur_hidden = hidden
        inv_seq = conf_seq = None
        for time, time_next in sched.ddim_time_pairs():
            t = jnp.full((b,), time, dtype=jnp.int32)
            delta = img
            inv_depth_new = jnp.clip(inv_depth + delta, 0.0, 1.0)
            delta = inv_depth_new - inv_depth
            img = delta

            cur_hidden = hidden                        # reset (update.py:485)
            cur_hidden, inv_new, delta, inv_seq, conf_seq = self._run_iters(
                inv_depth, inv_depth_new, delta, cur_hidden, context, t,
                features, proj_pairs, depth_min, depth_max, view_weights)

            pred_noise = sched.predict_noise_from_start(img, t, delta)
            if time_next < 0:
                continue

            sqrt_an, c, sigma = sched.ddim_coeffs(time, time_next)
            if key is not None:
                key, kn = jax.random.split(key)
            else:
                kn = None
            noise = _noise_like(kn, inv_depth, sched.scale)
            img = delta * sqrt_an + c * pred_noise + sigma * noise

        inv_list = [inv_seq[i] for i in range(self.iters)]
        conf_list = [conf_seq[i] for i in range(self.iters)]
        return mask, cur_hidden, inv_list, conf_list

    def __call__(self, inv_depth, hidden, context, features, proj_pairs,
                 depth_min, depth_max, view_weights, gt_inv_depth=None,
                 inv_init_depth=None, rng=None, train: bool = False,
                 t_noise=None):
        if train:
            return self.train_forward(inv_depth, hidden, context,
                                      gt_inv_depth, inv_init_depth, rng,
                                      features, proj_pairs, depth_min,
                                      depth_max, view_weights,
                                      t_noise=t_noise)
        return self.eval_forward(inv_depth, hidden, context, rng, features,
                                 proj_pairs, depth_min, depth_max,
                                 view_weights)
