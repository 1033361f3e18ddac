"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffmvs_tpu.config import CASDIFFMVS, TrainConfig
from diffmvs_tpu.models.casdiffmvs import CasDiffMVS
from diffmvs_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)
from diffmvs_tpu.train.state import create_train_state
from diffmvs_tpu.train.step import make_train_step

from helpers import make_batch

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 devices")


def _tiny_cfg():
    return dataclasses.replace(CASDIFFMVS, numdepth_initial=8, numdepth=32)


def test_mesh_construction():
    mesh = make_mesh(4, 2)
    assert mesh.shape == {"data": 4, "space": 2}
    mesh = make_mesh(-1, 2)
    assert mesh.shape["data"] * 2 == len(jax.devices())


def test_shard_batch_layouts(rng):
    mesh = make_mesh(4, 2)
    batch = make_batch(rng, 4, 3, 64, 128, numdepth=32, with_gt=True)
    sharded = shard_batch(mesh, batch)
    # imgs sharded over (data, space) on axes (0, 3)
    s = sharded["imgs"].sharding
    assert s.shard_shape(sharded["imgs"].shape) == (1, 3, 64, 64, 3)
    # GT maps sharded over (data, -, space)
    s4 = sharded["depth"]["stage4"]
    assert s4.sharding.shard_shape(s4.shape) == (1, 64, 64)
    # small tensors sharded over batch only
    dv = sharded["depth_values"]
    assert dv.sharding.shard_shape(dv.shape) == (1, 32)


def test_spatial_sharded_inference_matches(rng):
    """Export forward with width sharded over 'space' (+ batch over 'data')
    == unsharded forward: the large-image scaling path."""
    cfg = _tiny_cfg()
    model = CasDiffMVS(cfg)
    batch = make_batch(rng, 2, 3, 64, 128, numdepth=32)

    variables = model.init(
        jax.random.PRNGKey(0), batch["imgs"], batch["proj_matrices"],
        batch["depth_values"], rng=None, train=False, export=True)

    fwd = jax.jit(lambda v, b: model.apply(
        v, b["imgs"], b["proj_matrices"], b["depth_values"],
        rng=None, train=False, export=True))

    ref = fwd(variables, batch)

    mesh = make_mesh(2, 4)
    batch_s = shard_batch(mesh, batch)
    variables_s = replicate(mesh, variables)
    out = fwd(variables_s, batch_s)

    np.testing.assert_allclose(np.asarray(out["depth"][-1]),
                               np.asarray(ref["depth"][-1]),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(out["photometric_confidence"][0]),
        np.asarray(ref["photometric_confidence"][0]),
        rtol=2e-3, atol=2e-3)


def test_dp_sp_train_step_matches_single_device(rng):
    """One dp x sp sharded step == the same step unsharded (same math,
    sync-BN over the global batch in both cases)."""
    cfg = TrainConfig(model=_tiny_cfg(), batch_size=4, epochs=1)
    model = CasDiffMVS(cfg.model)
    batch = make_batch(rng, 4, 3, 64, 128, numdepth=32, with_gt=True)

    state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch,
                               steps_per_epoch=10)
    step = make_train_step(model, cfg, donate=False)
    key = jax.random.PRNGKey(7)

    # single-device baseline
    _, scalars_single, _ = step(state, batch, key)

    # sharded
    mesh = make_mesh(4, 2)
    state_r = replicate(mesh, state)
    batch_s = shard_batch(mesh, batch)
    new_state, scalars_sharded, _ = step(state_r, batch_s, key)

    for k in ("loss", "final_depth_error"):
        a = float(scalars_single[k])
        b = float(scalars_sharded[k])
        assert np.isfinite(a) and np.isfinite(b)
        np.testing.assert_allclose(a, b, rtol=5e-3), k

    # params stay replicated + finite
    p = jax.tree_util.tree_leaves(new_state.params)[0]
    assert np.isfinite(np.asarray(p)).all()


def test_warp_corr_pallas_under_shard_map():
    """The fused kernel runs under jax.shard_map over the data axis
    (manual SPMD: each device gets its local batch — the multi-chip
    path for the kernel, which has no GSPMD partitioning rule)."""
    import sys
    sys.path.insert(0, "tests")
    from helpers import make_cams, stage_projs
    from jax.sharding import PartitionSpec as P

    from diffmvs_tpu.ops.correlation import warp_and_correlate
    from diffmvs_tpu.ops.pallas.warp_corr import warp_corr_pallas
    from diffmvs_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8, 1)
    hs, ws, c, d, G, B = 32, 64, 8, 2, 4, 8
    cams = stage_projs(make_cams(2, hs * 2, ws * 2))["stage3"]
    rng = np.random.RandomState(0)
    rp = jnp.asarray(np.stack([cams[0]] * B))
    sp = jnp.asarray(np.stack([cams[1]] * B))
    src = jnp.asarray(rng.randn(B, hs, ws, c).astype(np.float32))
    ref = jnp.asarray(rng.randn(B, hs, ws, c).astype(np.float32))
    base = 6.0 + 0.5 * rng.rand(B, 1, hs, ws).astype(np.float32)
    depths = jnp.asarray(
        base + np.arange(d, dtype=np.float32).reshape(1, d, 1, 1) * 0.02)

    f = jax.jit(jax.shard_map(
        lambda *a: warp_corr_pallas(*a, G),
        mesh=mesh, in_specs=(P("data"),) * 5, out_specs=P("data"),
        check_vma=False))
    out = f(src, ref, sp, rp, depths)
    want = warp_and_correlate(src, ref, sp, rp, depths, G)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_shard_map_train_step():
    """make_train_step_shmap: replicated state stays replicated (grads
    and BN stats pmean'd), loss finite, params update — the manual-SPMD
    data-parallel step that carries the Pallas kernel on real pods."""
    import dataclasses
    import sys
    sys.path.insert(0, "tests")
    from helpers import make_batch

    from diffmvs_tpu.config import CASDIFFMVS, TrainConfig
    from diffmvs_tpu.models.casdiffmvs import CasDiffMVS
    from diffmvs_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from diffmvs_tpu.train.state import create_train_state
    from diffmvs_tpu.train.step import make_train_step_shmap

    mesh = make_mesh(8, 1)
    cfg_m = dataclasses.replace(CASDIFFMVS, numdepth_initial=8,
                                numdepth=16, stage_iters=(1, 1, 1))
    cfg = TrainConfig(model=cfg_m, batch_size=8, epochs=1)
    model = CasDiffMVS(cfg_m)
    batch = make_batch(np.random.RandomState(0), 8, 3, 64, 96,
                       numdepth=16, with_gt=True)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch,
                               steps_per_epoch=10)
    state = replicate(mesh, state)
    sb = shard_batch(mesh, batch)
    step = make_train_step_shmap(model, cfg, mesh, donate=False)
    new_state, scalars, images = step(state, sb, jax.random.PRNGKey(1))
    assert np.isfinite(float(scalars["loss"]))
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    p1 = jax.tree_util.tree_leaves(new_state.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    # state replication invariant: every param leaf fully replicated
    for leaf in jax.tree_util.tree_leaves(new_state.params):
        assert leaf.sharding.is_fully_replicated
