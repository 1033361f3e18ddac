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
