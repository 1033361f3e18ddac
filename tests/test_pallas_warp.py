"""Fused Pallas warp+correlation kernel (v2, shipping) vs the XLA path
(interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp

from helpers import make_cams, stage_projs


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


def test_warp_corr_batched_matches_per_sample(rng):
    """n > 1 takes the shared-prep + per-sample-launch path
    (_warp_corr_impl): must equal per-sample n = 1 calls. Tolerance is
    fp-tight but not exact: the plane-sweep coords are computed inside
    the fused tile-layout geometry (_tile_geometry), and XLA's fma
    contraction of that fusion can differ between the n=3 and n=1
    graphs by an ulp."""
    from diffmvs_tpu.ops.pallas.warp_corr import warp_corr_pallas

    src1, ref1, sp, rp, depths1 = _corr_setup(rng)
    n = 3
    src = jnp.concatenate([src1 + 0.1 * j for j in range(n)])
    ref = jnp.concatenate([ref1 - 0.1 * j for j in range(n)])
    depths = jnp.concatenate([depths1 + 0.01 * j for j in range(n)])
    spn = jnp.concatenate([sp] * n)
    rpn = jnp.concatenate([rp] * n)

    got = np.asarray(jax.jit(
        lambda s, r, a, b, dd: warp_corr_pallas(s, r, a, b, dd, 4,
                                                interpret=True)
    )(src, ref, spn, rpn, depths))
    for j in range(n):
        want_j = np.asarray(jax.jit(
            lambda s, r, a, b, dd: warp_corr_pallas(s, r, a, b, dd, 4,
                                                    interpret=True)
        )(src[j:j + 1], ref[j:j + 1], spn[j:j + 1], rpn[j:j + 1],
          depths[j:j + 1]))
        np.testing.assert_allclose(got[j:j + 1], want_j,
                                   rtol=1e-4, atol=1e-5)

    # the batch_glue=False A/B mode (fully per-sample prep) is the same
    # computation routed through n separate impls — fp-tight match
    # (same fma-contraction caveat as above)
    ab = np.asarray(jax.jit(
        lambda s, r, a, b, dd: warp_corr_pallas(s, r, a, b, dd, 4,
                                                batch_glue=False,
                                                interpret=True)
    )(src, ref, spn, rpn, depths))
    np.testing.assert_allclose(got, ab, rtol=1e-4, atol=1e-5)


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
    # atol 5e-5: the kernel's coords come from the fused tile-layout
    # geometry whose fma rounding differs from plane_sweep_coords'
    # matmul by an ulp (one pixel in ~200k trips the tighter bound)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-5)


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


def test_warp_corr_rowbatch_packed_matches_f32(rng):
    """Packed (bf16 channel-pair) ROWBATCH kernel == the f32 rowbatch
    kernel on the same bf16-rounded sources, refinement + grouped-sweep
    shapes (the group sums recombine as evens+odds of each group)."""
    from diffmvs_tpu.ops.pallas.warp_corr import warp_corr_pallas

    for stage, wg, d in (("stage3", 0, 4), ("stage1", 4, 11)):
        fullmul = 8 if stage == "stage1" else 2
        src, ref, sp, rp, depths = _corr_setup(rng, stage=stage,
                                               fullmul=fullmul, d=d)
        if stage == "stage1":
            sweep = 1.0 / np.linspace(1 / 10.0, 1 / 4.0, d,
                                      dtype=np.float32)
            depths = jnp.asarray(np.broadcast_to(
                sweep.reshape(1, d, 1, 1),
                (1, d) + src.shape[1:3]).copy())
        src16 = src.astype(jnp.bfloat16)
        want = np.asarray(jax.jit(
            lambda s, r, a, b, dd, _wg=wg: warp_corr_pallas(
                s, r, a, b, dd, 4, window_group=_wg, interpret=True)
        )(src16.astype(jnp.float32), ref, sp, rp, depths))
        got = np.asarray(jax.jit(
            lambda s, r, a, b, dd, _wg=wg: warp_corr_pallas(
                s, r, a, b, dd, 4, window_group=_wg, packed=True,
                interpret=True)
        )(src16, ref, sp, rp, depths))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_local_cost_volume_native_agg_matches(rng):
    """warp_native_agg=True (kernel-native weighted view aggregation +
    one relayout, ops/pallas/warp_corr.aggregate_native_cost) must equal
    the standard per-view-transpose + aggregate_views path — values AND
    feature gradients (the custom_vjp converts native cotangents back to
    the standard layout)."""
    from diffmvs_tpu.models.stages import local_cost_volume

    b, h, w, c, v = 2, 48, 128, 16, 3
    cams = make_cams(v, h * 2, w * 2)
    projs = stage_projs(cams)["stage3"]       # [V, 2, 4, 4]
    pp = jnp.asarray(np.broadcast_to(projs, (b,) + projs.shape).copy())
    feats = jnp.asarray(rng.randn(v, b, h, w, c).astype(np.float32))
    inv = jnp.asarray((rng.rand(b, h, w) * 0.5 + 0.25).astype(np.float32))
    vw = jnp.asarray((rng.rand(v - 1, b, h, w) + 0.1).astype(np.float32))
    dmin = jnp.full((b,), 4.0, jnp.float32)
    dmax = jnp.full((b,), 10.0, jnp.float32)

    def run(native, fs):
        cost, samples = local_cost_volume(
            inv, [fs[i] for i in range(v)], pp, 1.0 / 32, dmin, dmax,
            cost_num=4, group_dim=4, view_weights=vw,
            warp_kernel="pallas", warp_native_agg=native)
        return cost, samples

    (cost_n, samp_n) = jax.jit(lambda fs: run(True, fs))(feats)
    (cost_s, samp_s) = jax.jit(lambda fs: run(False, fs))(feats)
    assert cost_n.shape == cost_s.shape
    np.testing.assert_array_equal(np.asarray(samp_n), np.asarray(samp_s))
    np.testing.assert_allclose(np.asarray(cost_n), np.asarray(cost_s),
                               rtol=1e-6, atol=1e-7)

    def loss(native, fs):
        cost, _ = run(native, fs)
        return jnp.sum(cost * cost)

    g_n = np.asarray(jax.jit(jax.grad(lambda fs: loss(True, fs)))(feats))
    g_s = np.asarray(jax.jit(jax.grad(lambda fs: loss(False, fs)))(feats))
    np.testing.assert_allclose(g_n, g_s, rtol=1e-5, atol=1e-6)







def test_tile_geometry_matches_legacy(rng):
    """_tile_geometry (fused tile-layout window geometry, the rowbatch
    operand path) == the legacy plane_sweep_coords + _corner_split +
    _window_geometry pipeline: bases/rstarts exactly, and the depth
    tile view is an exact relayout of depth_values, at refinement and
    grouped-sweep shapes. (The per-pixel coords are no longer
    materialized — the kernel recomputes them in-register from the
    depth tile + projection scalars; their parity is covered by the
    kernel-vs-XLA tests above.)"""
    from diffmvs_tpu.geometry.transforms import relative_projection
    from diffmvs_tpu.geometry.warp import plane_sweep_coords
    from diffmvs_tpu.ops.pallas.warp_corr import (
        GATHER_W, WIN_K, _corner_split, _tile_geometry, _window_geometry)

    for hs, ws, d, wg, spread, stage in (
            (48, 128, 4, 4, 0.02, "stage3"),      # refinement, 1 tile
            (48, 200, 4, 4, 0.02, "stage3"),      # ragged width
            (24, 100, 16, 8, 0.15, "stage1"),     # grouped sweep
    ):
        src, ref, sp, rp, depths = _corr_setup(
            rng, hs=hs, ws=ws, d=d, spread=spread, stage=stage)
        n, dd, h, w = depths.shape
        rows, band, win_w, tile = 16, 4, 256, GATHER_W
        win_k = min(WIN_K, hs + 2)
        rot, trans = relative_projection(sp, rp)

        x, y = plane_sweep_coords(rot, trans, depths)
        xi, yi, fx, fy, valid = _corner_split(x, y, hs, ws)
        bases0, rstarts0, dims0 = _window_geometry(
            xi, yi, valid, dd, h, w, hs, ws, wg, win_k, rows, band,
            win_w, tile)
        # legacy rstarts [D, rows, T, N*HB] -> rowbatch [T, N*HB, D*rows]
        t_tiles = dims0[1]
        rstarts0 = np.asarray(rstarts0).transpose(2, 3, 0, 1).reshape(
            t_tiles, -1, dd * rows)

        dv_t, bases1, rstarts1, dims1 = _tile_geometry(
            rot, trans, depths, hs, ws, wg, win_k, rows, band, win_w,
            tile)
        assert dims1 == dims0
        np.testing.assert_array_equal(np.asarray(bases1),
                                      np.asarray(bases0))
        np.testing.assert_array_equal(np.asarray(rstarts1), rstarts0)

        # the depth tile view is an exact (padded) relayout
        hb = dims0[0]
        h_pad, w_pad = hb * rows, t_tiles * tile
        dp = np.zeros((n, dd, h_pad, w_pad), np.float32)
        dp[:, :, :h, :w] = np.asarray(depths)
        want_dv = (dp.reshape(n, dd, hb, rows, t_tiles, tile)
                   .transpose(0, 2, 4, 1, 3, 5)
                   .reshape(n * hb * t_tiles, dd, rows, tile))
        np.testing.assert_array_equal(np.asarray(dv_t), want_dv)
