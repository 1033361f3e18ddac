"""Remat option: gradients finite + train step runs with remat on."""

import dataclasses

import numpy as np
import jax
import pytest

from diffmvs_tpu.config import CASDIFFMVS, TrainConfig
from diffmvs_tpu.models.casdiffmvs import CasDiffMVS
from diffmvs_tpu.train.state import create_train_state
from diffmvs_tpu.train.step import make_train_step

import sys
sys.path.insert(0, "tests")
from helpers import make_batch  # noqa: E402


def test_remat_train_step():
    cfg = TrainConfig(
        model=dataclasses.replace(CASDIFFMVS, numdepth_initial=8,
                                  numdepth=32, remat=True),
        batch_size=1, epochs=1)
    model = CasDiffMVS(cfg.model)
    batch = make_batch(np.random.RandomState(0), 1, 3, 64, 96, numdepth=32,
                       with_gt=True)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch,
                               steps_per_epoch=10)
    step = make_train_step(model, cfg, donate=False)
    new_state, scalars, _ = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(scalars["loss"]))
    p = jax.tree_util.tree_leaves(new_state.params)[0]
    assert np.isfinite(np.asarray(p)).all()


@pytest.mark.slow
def test_remat_with_pallas_backward():
    """remat=True composes with the Pallas warp kernel's custom_vjp in
    bwd="pallas" mode: the rematerialized forward replays the Pallas
    kernel and the backward runs warp_corr_bwd — loss/grads finite and
    equal to the non-remat step (VERDICT r2 next-round #3)."""
    base = dataclasses.replace(CASDIFFMVS, numdepth_initial=8,
                               numdepth=16, stage_iters=(1, 1, 1),
                               warp_kernel="pallas", warp_bwd="pallas")
    batch = make_batch(np.random.RandomState(0), 1, 3, 64, 96,
                       numdepth=16, with_gt=True)
    losses = {}
    for remat in (False, True):
        cfg = TrainConfig(model=dataclasses.replace(base, remat=remat),
                          batch_size=1, epochs=1)
        model = CasDiffMVS(cfg.model)
        state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                   batch, steps_per_epoch=10)
        step = make_train_step(model, cfg, donate=False)
        new_state, scalars, _ = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(scalars["loss"]))
        p = jax.tree_util.tree_leaves(new_state.params)[0]
        assert np.isfinite(np.asarray(p)).all()
        losses[remat] = (float(scalars["loss"]), np.asarray(p))
    np.testing.assert_allclose(losses[False][0], losses[True][0],
                               rtol=1e-6)
    np.testing.assert_allclose(losses[False][1], losses[True][1],
                               rtol=1e-4, atol=1e-6)
