"""Diffusion-based depth refinement stage.

Parity target: DiffusionUpdateBlockDepth — /root/reference/models/update.py:299-521.

Per stage: the residual inverse depth is diffused (training: q_sample of the
GT residual at a random timestep; inference: DDIM over sampling_timesteps
pairs), and a GRU-UNet denoiser iteratively predicts delta + confidence from
local cost volumes. All iteration counts and DDIM steps are static -> the
loops unroll at trace time; the released configs use sampling_timesteps=1,
which collapses inference to a single denoising pass.

RNG: callers pass an explicit key (or None for deterministic zero-noise,
the parity-test seam — the released eval configs use scale=0 for most
stages anyway, cf. SURVEY.md §7.5).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffmvs_tpu.models.schedule import DiffusionSchedule
from diffmvs_tpu.models.stages import UpsampleMaskHead
from diffmvs_tpu.nn.unet import ConditionEncoder, DiffusionUNet


def _noise_like(key, x, scale):
    if key is None or scale == 0.0:
        return jnp.zeros_like(x)
    return scale * jax.random.normal(key, x.shape, x.dtype)


class RefinementStage(nn.Module):
    """One diffusion refinement stage (stage_idx in {1, 2})."""

    unet_dim: int
    dim_mults: Tuple[int, ...]
    hidden_dim: int
    context_dim: int
    num_sample: int              # CostNum[s]
    cost_dim: int                # cost_dim_stage[s] * CostNum[s]
    iters: int
    up_ratio: int
    schedule: DiffusionSchedule
    dtype: Optional[Any] = None

    def setup(self):
        self.encoder = ConditionEncoder(
            hidden_dim=self.context_dim, out_chs=self.context_dim,
            dtype=self.dtype, name="encoder")
        self.mask = UpsampleMaskHead(self.up_ratio, dtype=self.dtype,
                                     name="mask")
        self.unet = DiffusionUNet(
            dim=self.unet_dim, hidden_dim=self.hidden_dim,
            dim_mults=self.dim_mults, dtype=self.dtype, name="unet")

    def _denoise_iters(self, depth_cost_func, inv_depth, inv_depth_new,
                       delta, hidden, context, t):
        """The shared inner GRU-UNet loop (update.py:441-461 / 487-502)."""
        inv_list, conf_list = [], []
        confidence = None
        for _ in range(self.iters):
            cost, samples = depth_cost_func(inv_depth_new, confidence)
            input_features = self.encoder(
                inv_depth_new[..., None],
                samples.transpose(0, 2, 3, 1),        # [B,H,W,CostNum]
                cost)
            input_unet = jnp.concatenate([context, input_features], axis=-1)
            hidden, update, confidence = self.unet(input_unet, hidden, t)
            delta = delta + update
            conf_list.append(confidence)

            inv_depth_new = jnp.clip(inv_depth + delta, 0.0, 1.0)
            delta = inv_depth_new - inv_depth
            inv_list.append(inv_depth_new)
        return hidden, delta, inv_list, conf_list

    def train_forward(self, depth_cost_func, inv_depth, hidden, context,
                      gt_inv_depth, inv_init_depth, rng):
        """Training branch (update.py:423-464). All maps [B, H, W]."""
        b = inv_depth.shape[0]
        sched = self.schedule

        gt_inv_depth = jnp.where(jnp.isinf(gt_inv_depth), inv_init_depth,
                                 gt_inv_depth)
        gt_delta = jax.lax.stop_gradient(gt_inv_depth - inv_depth)

        kt, kn = jax.random.split(rng)
        t = jax.random.randint(kt, (b,), 0, sched.timesteps)
        noise = _noise_like(kn, gt_delta, sched.scale)

        delta = sched.q_sample(gt_delta, t, noise)
        inv_depth_new = jnp.clip(inv_depth + delta, 0.0, 1.0)
        delta = inv_depth_new - inv_depth

        inv_list, conf_list = [], []
        confidence = None
        for _ in range(self.iters):
            delta = jax.lax.stop_gradient(delta)
            if confidence is not None:
                confidence = jax.lax.stop_gradient(confidence)
            inv_depth_new = jax.lax.stop_gradient(inv_depth_new)

            cost, samples = depth_cost_func(inv_depth_new, confidence)
            input_features = self.encoder(
                inv_depth_new[..., None], samples.transpose(0, 2, 3, 1), cost)
            input_unet = jnp.concatenate([context, input_features], axis=-1)
            hidden, update, confidence = self.unet(input_unet, hidden, t)
            delta = delta + update
            conf_list.append(confidence)

            inv_depth_new = jnp.clip(inv_depth + delta, 0.0, 1.0)
            delta = inv_depth_new - inv_depth
            inv_list.append(inv_depth_new)

        mask = self.mask(context)
        return mask, hidden, inv_list, conf_list

    def eval_forward(self, depth_cost_func, inv_depth, hidden, context, rng):
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
        inv_list, conf_list = [], []
        for time, time_next in sched.ddim_time_pairs():
            t = jnp.full((b,), time, dtype=jnp.int32)
            delta = img
            inv_depth_new = jnp.clip(inv_depth + delta, 0.0, 1.0)
            delta = inv_depth_new - inv_depth
            img = delta

            cur_hidden = hidden                        # reset (update.py:485)
            cur_hidden, delta, inv_list, conf_list = self._denoise_iters(
                depth_cost_func, inv_depth, inv_depth_new, delta,
                cur_hidden, context, t)

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

        return mask, cur_hidden, inv_list, conf_list

    def __call__(self, depth_cost_func, inv_depth, hidden, context,
                 gt_inv_depth=None, inv_init_depth=None, rng=None,
                 train: bool = False):
        if train:
            return self.train_forward(depth_cost_func, inv_depth, hidden,
                                      context, gt_inv_depth, inv_init_depth,
                                      rng)
        return self.eval_forward(depth_cost_func, inv_depth, hidden, context,
                                 rng)
