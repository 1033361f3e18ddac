"""Gradient-flow semantics tests.

The reference's training relies on specific stop-gradient seams:
  * warp coordinates are computed under no_grad (module.py:187) — so the
    projection matrices receive NO gradient;
  * images receive gradients through the feature nets / grid_sample values;
  * the loss is differentiable end-to-end (finite, nonzero grads).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffmvs_tpu.config import CASDIFFMVS, TrainConfig
from diffmvs_tpu.models.casdiffmvs import CasDiffMVS
from diffmvs_tpu.models.loss import compute_inverse_loss

import sys
sys.path.insert(0, "tests")
from helpers import make_batch  # noqa: E402


def test_gradient_seams():
    cfg = TrainConfig(model=dataclasses.replace(
        CASDIFFMVS, numdepth_initial=8, numdepth=32), batch_size=1)
    model = CasDiffMVS(cfg.model)
    batch = make_batch(np.random.RandomState(0), 1, 3, 64, 96, numdepth=32,
                       with_gt=True)

    variables = model.init(
        jax.random.PRNGKey(0), batch["imgs"], batch["proj_matrices"],
        batch["depth_values"], depth_gt=batch["depth"],
        rng=jax.random.PRNGKey(1), train=True)

    def loss_fn(imgs, projs):
        out, _ = model.apply(
            variables, imgs, projs, batch["depth_values"],
            depth_gt=batch["depth"], rng=jax.random.PRNGKey(2), train=True,
            mutable=["batch_stats"])
        loss, _ = compute_inverse_loss(
            out["depth"], out["conf"], batch["depth"], batch["mask"],
            batch["depth_values"], cfg.model.stage_iters, 0.9, 0.05)
        return loss

    g_imgs, g_projs = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))(
        jnp.asarray(batch["imgs"]),
        {k: jnp.asarray(v) for k, v in batch["proj_matrices"].items()})

    # images: gradients flow (feature nets + sampled values)
    g_imgs = np.asarray(g_imgs)
    assert np.isfinite(g_imgs).all()
    assert np.abs(g_imgs).max() > 0

    # projection matrices: coordinates are gradient-stopped like the
    # reference's no_grad block -> exactly zero
    for stage, g in g_projs.items():
        assert float(jnp.abs(g).max()) == 0.0, stage
