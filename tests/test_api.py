"""Public inference API smoke test."""

import dataclasses

import numpy as np
import jax

from diffmvs_tpu import api
from diffmvs_tpu.config import CASDIFFMVS
from diffmvs_tpu.utils.synthetic import synthetic_inputs


def test_depth_runner_from_random():
    runner = api.DepthRunner.from_random(
        "casdiffmvs", image_hw=(64, 96), views=3,
        numdepth_initial=8, numdepth=32)
    imgs, projs, dv = synthetic_inputs(1, 3, 64, 96, 32)
    depth, confs = runner(imgs, projs, dv)
    assert depth.shape == (1, 64, 96)
    assert len(confs) == 3
    assert np.isfinite(depth).all()
    assert depth.min() >= 4.0 - 1e-2 and depth.max() <= 10.0 + 1e-1
