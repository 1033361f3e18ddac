"""Learning smoke test: a few optimizer steps reduce the loss."""

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


def test_loss_decreases_smoke():
    """Default-gate tiny version of test_loss_decreases: 32x64 /
    numdepth 4/16, 8 overfit steps on one batch must reduce the loss."""
    cfg = TrainConfig(
        model=dataclasses.replace(CASDIFFMVS, numdepth_initial=4,
                                  numdepth=16),
        batch_size=1, epochs=1, lr=2e-3, lr_sche="mslr",
        lrepochs="100:2")
    model = CasDiffMVS(cfg.model)
    batch = make_batch(np.random.RandomState(0), 1, 3, 32, 64, numdepth=16,
                       with_gt=True)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch,
                               steps_per_epoch=100)
    step = make_train_step(model, cfg, donate=False)

    losses = []
    rng = jax.random.PRNGKey(42)
    for i in range(8):
        state, scalars, _ = step(state, batch, jax.random.fold_in(rng, i))
        losses.append(float(scalars["loss"]))

    assert all(np.isfinite(losses))
    assert np.mean(losses[-3:]) < np.mean(losses[:3]) * 0.95, losses


@pytest.mark.slow
def test_loss_decreases():
    cfg = TrainConfig(
        model=dataclasses.replace(CASDIFFMVS, numdepth_initial=8,
                                  numdepth=32),
        batch_size=1, epochs=1, lr=2e-3, lr_sche="mslr",
        lrepochs="100:2")
    model = CasDiffMVS(cfg.model)
    batch = make_batch(np.random.RandomState(0), 1, 3, 64, 96, numdepth=32,
                       with_gt=True)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch,
                               steps_per_epoch=100)
    step = make_train_step(model, cfg, donate=False)

    losses = []
    rng = jax.random.PRNGKey(42)
    for i in range(10):
        state, scalars, _ = step(state, batch, jax.random.fold_in(rng, i))
        losses.append(float(scalars["loss"]))

    assert all(np.isfinite(losses))
    # overfitting a single batch must reduce the loss
    assert np.mean(losses[-3:]) < np.mean(losses[:3]) * 0.9, losses
