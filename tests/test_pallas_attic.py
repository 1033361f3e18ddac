"""Parity tests for the ATTIC (non-shipping) Pallas kernels.

These kernels (ops/pallas/attic/) are superseded-or-rejected engineering
history — see attic/__init__.py. Their parity tests stay green so the
documented negative results remain reproducible.
"""

import numpy as np
import jax
import jax.numpy as jnp

from diffmvs_tpu.geometry.warp import plane_sweep_warp
from diffmvs_tpu.ops.pallas.attic.warp_refine import (
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


def test_warp_corr_agg_matches_xla(rng):
    """v3 kernel (fused view accumulation) == XLA per-view correlation
    stack + aggregate_views, over 3 source views."""
    from diffmvs_tpu.ops.correlation import (aggregate_views,
                                             warp_and_correlate)
    from diffmvs_tpu.ops.pallas.attic.warp_corr_agg import (
        warp_corr_agg_pallas)

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
