"""Banded Pallas warp kernel vs the XLA reference path (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffmvs_tpu.geometry.warp import plane_sweep_warp
from diffmvs_tpu.ops.pallas.warp_refine import (
    warp_refine_pallas,
    window_miss_fraction,
)

from helpers import make_cams, stage_projs


def _setup(rng, hs=48, ws=128, c=16, d=4, spread=0.02):
    """Refinement-like hypotheses: d close depths around a base map."""
    cams = make_cams(2, hs * 2, ws * 2)      # stage intrinsics = 1/2 res
    projs = stage_projs(cams)["stage3"]
    ref_pair = jnp.asarray(projs[0][None])
    src_pair = jnp.asarray(projs[1][None])
    src = jnp.asarray(rng.randn(1, hs, ws, c).astype(np.float32))
    base = 6.0 + 1.5 * rng.rand(1, 1, hs, ws).astype(np.float32)
    offs = (np.arange(d, dtype=np.float32) - d / 2) * spread
    depths = jnp.asarray(base + offs.reshape(1, d, 1, 1))
    return src, src_pair, ref_pair, depths


def test_window_miss_is_zero_for_refinement_geometry(rng):
    src, src_pair, ref_pair, depths = _setup(rng)
    miss = float(jax.jit(window_miss_fraction)(
        src, src_pair, ref_pair, depths))
    assert miss == 0.0


def test_pallas_warp_matches_xla_interpret(rng):
    src, src_pair, ref_pair, depths = _setup(rng)

    ref_out = np.asarray(jax.jit(plane_sweep_warp)(
        src, src_pair, ref_pair, depths))

    out = np.asarray(jax.jit(
        lambda s, sp, rp, dd: warp_refine_pallas(s, sp, rp, dd,
                                                 interpret=True)
    )(src, src_pair, ref_pair, depths))

    assert out.shape == ref_out.shape
    np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=1e-4)


def test_model_with_pallas_warp_matches_xla(rng):
    """Full CasDiffMVS export forward with warp_kernel='pallas' (interpreted
    on CPU) == the XLA path."""
    import dataclasses

    from diffmvs_tpu.config import CASDIFFMVS
    from diffmvs_tpu.models.casdiffmvs import CasDiffMVS
    from helpers import make_batch

    cfg_x = dataclasses.replace(CASDIFFMVS, numdepth_initial=8, numdepth=32)
    cfg_p = dataclasses.replace(cfg_x, warp_kernel="pallas")
    batch = make_batch(np.random.RandomState(0), 1, 3, 64, 96, numdepth=32)

    model_x = CasDiffMVS(cfg_x)
    variables = model_x.init(
        jax.random.PRNGKey(0), batch["imgs"], batch["proj_matrices"],
        batch["depth_values"], rng=None, train=False, export=True)

    def run(model):
        return jax.jit(lambda v, b: model.apply(
            v, b["imgs"], b["proj_matrices"], b["depth_values"],
            rng=None, train=False, export=True))(variables, batch)

    out_x = run(model_x)
    out_p = run(CasDiffMVS(cfg_p))
    np.testing.assert_allclose(np.asarray(out_p["depth"][-1]),
                               np.asarray(out_x["depth"][-1]),
                               rtol=1e-4, atol=1e-4)


def test_pallas_warp_full_sweep_per_depth_windows(rng):
    """Stage-1-style full uniform sweep needs one window per depth plane."""
    hs, ws, c, d = 48, 128, 16, 8
    cams = make_cams(2, hs * 8, ws * 8)
    projs = stage_projs(cams)["stage1"]
    ref_pair = jnp.asarray(projs[0][None])
    src_pair = jnp.asarray(projs[1][None])
    src = jnp.asarray(rng.randn(1, hs, ws, c).astype(np.float32))
    sweep = np.linspace(4.0, 10.0, d, dtype=np.float32)
    depths = jnp.asarray(np.broadcast_to(
        sweep.reshape(1, d, 1, 1), (1, d, hs, ws)).copy())

    miss = float(jax.jit(
        lambda *a: window_miss_fraction(*a, per_depth_windows=True)
    )(src, src_pair, ref_pair, depths))
    assert miss == 0.0

    ref_out = np.asarray(jax.jit(plane_sweep_warp)(
        src, src_pair, ref_pair, depths))
    out = np.asarray(jax.jit(
        lambda s, sp, rp, dd: warp_refine_pallas(
            s, sp, rp, dd, interpret=True, per_depth_windows=True)
    )(src, src_pair, ref_pair, depths))
    np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=1e-4)


def _corr_setup(rng, hs=48, ws=128, c=16, d=4, spread=0.02, stage="stage3",
                fullmul=2, yaw=None):
    cams = make_cams(2, hs * fullmul, ws * fullmul, yaw=yaw)
    projs = stage_projs(cams)[stage]
    ref_pair = jnp.asarray(projs[0][None])
    src_pair = jnp.asarray(projs[1][None])
    src = jnp.asarray(rng.randn(1, hs, ws, c).astype(np.float32))
    ref = jnp.asarray(rng.randn(1, hs, ws, c).astype(np.float32))
    base = 6.0 + 1.5 * rng.rand(1, 1, hs, ws).astype(np.float32)
    offs = (np.arange(d, dtype=np.float32) - d / 2) * spread
    depths = jnp.asarray(base + offs.reshape(1, d, 1, 1))
    return src, ref, src_pair, ref_pair, depths


def test_warp_corr_fused_matches_xla(rng):
    """v2 fused warp+correlation kernel == XLA warp_and_correlate."""
    from diffmvs_tpu.ops.correlation import warp_and_correlate
    from diffmvs_tpu.ops.pallas.warp_corr import warp_corr_pallas

    src, ref, sp, rp, depths = _corr_setup(rng)
    want = np.asarray(jax.jit(
        lambda *a: warp_and_correlate(*a, 4))(src, ref, sp, rp, depths))
    got = np.asarray(jax.jit(
        lambda s, r, a, b, dd: warp_corr_pallas(s, r, a, b, dd, 4,
                                                interpret=True)
    )(src, ref, sp, rp, depths))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_warp_corr_packed_bf16_matches_f32(rng):
    """Packed bf16 channel-pair gathers == the f32 kernel on the same
    bf16-rounded sources (both interpolate in f32 on identical values;
    only the group-sum association differs)."""
    from diffmvs_tpu.ops.pallas.warp_corr import warp_corr_pallas

    src, ref, sp, rp, depths = _corr_setup(rng)
    src16 = src.astype(jnp.bfloat16)

    want = np.asarray(jax.jit(
        lambda s, r, a, b, dd: warp_corr_pallas(
            s, r, a, b, dd, 4, interpret=True, packed=False)
    )(src16.astype(jnp.float32), ref, sp, rp, depths))
    got = np.asarray(jax.jit(
        lambda s, r, a, b, dd: warp_corr_pallas(
            s, r, a, b, dd, 4, interpret=True, packed=True)
    )(src16, ref, sp, rp, depths))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_warp_corr_agg_matches_xla(rng):
    """v3 kernel (fused view accumulation) == XLA per-view correlation
    stack + aggregate_views, over 3 source views."""
    from diffmvs_tpu.ops.correlation import (aggregate_views,
                                             warp_and_correlate)
    from diffmvs_tpu.ops.pallas.warp_corr import warp_corr_agg_pallas

    hs, ws, c, d, g, v = 48, 96, 16, 4, 4, 3
    cams = make_cams(v + 1, hs * 2, ws * 2)
    projs = stage_projs(cams)["stage3"]
    pairs = jnp.asarray(projs)                       # [V+1, 2, 4, 4]
    srcs = jnp.asarray(rng.randn(v, hs, ws, c).astype(np.float32))
    ref = jnp.asarray(rng.randn(1, hs, ws, c).astype(np.float32))
    weights = jnp.asarray(rng.rand(v, 1, hs, ws).astype(np.float32))
    base = 6.0 + 1.5 * rng.rand(1, 1, hs, ws).astype(np.float32)
    offs = (np.arange(d, dtype=np.float32) - d / 2) * 0.02
    depths = jnp.asarray(base + offs.reshape(1, d, 1, 1))

    cors = [warp_and_correlate(srcs[i:i + 1], ref, pairs[i + 1][None],
                               pairs[0][None], depths, g)
            for i in range(v)]
    want = np.asarray(jax.jit(aggregate_views)(jnp.stack(cors), weights))

    num = jax.jit(
        lambda s, r, w, pp, dd: warp_corr_agg_pallas(
            s, r, w, pp[1:], pp[0], dd, g, interpret=True)
    )(srcs, ref[0], weights[:, 0], pairs, depths[0])
    den = jnp.sum(weights[:, 0], axis=0)[None, :, :, None] + 1e-8
    got = np.asarray(num / den)[None]

    assert got.shape == want.shape
    # atol 1e-4: sequential per-view accumulation reassociates the sum
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_warp_corr_sweep_window_groups(rng):
    """Full uniform sweep through grouped windows (8 planes per DMA),
    including a depth count not divisible by the group size."""
    from diffmvs_tpu.ops.correlation import warp_and_correlate
    from diffmvs_tpu.ops.pallas.warp_corr import (warp_corr_miss_fraction,
                                                  warp_corr_pallas)

    hs, ws, c, d = 48, 100, 16, 11
    src, ref, sp, rp, _ = _corr_setup(rng, ws=ws, stage="stage1", fullmul=8)
    src = src[:, :, :ws]
    ref = ref[:, :, :ws]
    sweep = 1.0 / np.linspace(1 / 10.0, 1 / 4.0, d, dtype=np.float32)
    depths = jnp.asarray(np.broadcast_to(
        sweep.reshape(1, d, 1, 1), (1, d, hs, ws)).copy())

    miss = float(jax.jit(lambda *a: warp_corr_miss_fraction(
        *a, window_group=4))(src, sp, rp, depths))
    assert miss == 0.0

    want = np.asarray(jax.jit(
        lambda *a: warp_and_correlate(*a, 4))(src, ref, sp, rp, depths))
    got = np.asarray(jax.jit(
        lambda s, r, a, b, dd: warp_corr_pallas(
            s, r, a, b, dd, 4, window_group=4, interpret=True)
    )(src, ref, sp, rp, depths))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_strong_rotation_guard_triggers(rng):
    """On a strong-rotation rig the banded kernel drops real samples; the
    runtime guard must catch it (the model/CLI then fall back to XLA,
    whose zero-padding semantics are exact —
    /root/reference/models/module.py:212-215)."""
    from diffmvs_tpu.ops.correlation import warp_and_correlate
    from diffmvs_tpu.ops.pallas.warp_corr import (model_miss_fraction,
                                                  warp_corr_miss_fraction,
                                                  warp_corr_pallas)
    from helpers import make_batch

    # DTU-like gentle arc: guard reads ~0
    batch = make_batch(np.random.RandomState(0), 1, 3, 64, 96, numdepth=32)
    miss_ok = float(jax.jit(
        lambda p, dv: model_miss_fraction(p, dv, 64, 96,
                                          numdepth_initial=8)
    )(batch["proj_matrices"], batch["depth_values"]))
    assert miss_ok < 1e-4

    # strong yaw: per-tile epipolar spans blow past the 256-px window
    # (still stronger rotations push samples out of the image entirely —
    # then nothing valid is dropped and the kernel is exact again)
    src, ref, sp, rp, depths = _corr_setup(rng, yaw=0.3, spread=0.2)
    miss = float(jax.jit(warp_corr_miss_fraction)(src, sp, rp, depths))
    assert miss > 1e-3, miss

    # ...and the kernel output genuinely differs from XLA there (the
    # zeroed samples are real): the fallback is load-bearing
    want = np.asarray(jax.jit(
        lambda *a: warp_and_correlate(*a, 4))(src, ref, sp, rp, depths))
    got = np.asarray(jax.jit(
        lambda s, r, a, b, dd: warp_corr_pallas(s, r, a, b, dd, 4,
                                                interpret=True)
    )(src, ref, sp, rp, depths))
    assert np.abs(got - want).max() > 1e-3


def test_pallas_warp_nondivisible_width(rng):
    """W not a multiple of the 64-px tile."""
    src, src_pair, ref_pair, depths = _setup(rng, ws=100)
    ref_out = np.asarray(jax.jit(plane_sweep_warp)(
        src, src_pair, ref_pair, depths))
    out = np.asarray(jax.jit(
        lambda s, sp, rp, dd: warp_refine_pallas(s, sp, rp, dd,
                                                 interpret=True)
    )(src, src_pair, ref_pair, depths))
    np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=1e-4)
