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
