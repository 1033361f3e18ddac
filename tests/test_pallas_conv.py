"""Interpret-mode parity tests for the fused conv+affine+ReLU kernel
(ops/pallas/conv2d.py) against the XLA reference implementation.

Covers the shapes the kernel serves in the model: centered 3x3s (FPN
heads, UNet stacks), the phase-opt trunk's offset-0 2x2s, 1x1 heads,
non-dividing row tiles, odd widths, N > 1, bf16 and f32, with and
without the BatchNorm-inference affine."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffmvs_tpu.ops.pallas.conv2d import conv2d_fused, conv2d_fused_ref


def _run(n, h, w, cin, cout, kh, kw, offset, relu, affine, dtype,
         rows_per_step=8, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(n, h, w, cin).astype(np.float32) * 0.5,
                    dtype)
    wk = jnp.asarray(rng.randn(kh, kw, cin, cout).astype(np.float32) * 0.1)
    scale = shift = None
    if affine:
        scale = jnp.asarray(rng.rand(cout).astype(np.float32) + 0.5)
        shift = jnp.asarray(rng.randn(cout).astype(np.float32) * 0.2)
    got = conv2d_fused(x, wk, scale, shift, offset=offset, relu=relu,
                       rows_per_step=rows_per_step, interpret=True)
    want = conv2d_fused_ref(x, wk, scale, shift, offset=offset, relu=relu)
    assert got.shape == want.shape and got.dtype == want.dtype
    tol = dict(rtol=2e-2, atol=2e-2) if dtype == jnp.bfloat16 else \
        dict(rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), **tol)


@pytest.mark.parametrize("kh,kw,offset", [
    (3, 3, None),        # centered 3x3 (FPN head / UNet)
    (2, 2, (0, 0)),      # phase-opt trunk trimmed window
    (1, 1, (0, 0)),      # 1x1 head
    (3, 3, (0, 0)),      # uncentered 3x3 (min_span s2d expansion)
    (2, 2, (1, 1)),      # bottom-right aligned window
])
def test_conv2d_fused_offsets(kh, kw, offset):
    _run(2, 19, 23, 16, 24, kh, kw, offset, relu=False, affine=False,
         dtype=jnp.float32)


def test_conv2d_fused_affine_relu():
    _run(1, 16, 30, 8, 16, 3, 3, None, relu=True, affine=True,
         dtype=jnp.float32)


def test_conv2d_fused_bf16():
    _run(2, 17, 33, 16, 32, 2, 2, (0, 0), relu=True, affine=True,
         dtype=jnp.bfloat16)


def test_conv2d_fused_single_tile():
    # h <= rows_per_step: one grid row-tile (first == last)
    _run(1, 6, 21, 8, 8, 3, 3, None, relu=False, affine=False,
         dtype=jnp.float32)


def test_conv2d_fused_two_tiles():
    # exactly two tiles: no "middle" DMA case emitted
    _run(1, 16, 21, 8, 8, 3, 3, None, relu=False, affine=True,
         dtype=jnp.float32)


def test_conv2d_fused_ragged_last_tile():
    # h % rows_per_step != 0: masked output rows + re-zeroed slab rows
    _run(3, 21, 27, 8, 8, 3, 3, None, relu=True, affine=True,
         dtype=jnp.float32)


def test_conv2d_fused_halo_crosses_last_tile():
    # uncentered 3x3 (oh=0): bottom halo = 2 rows, last tile = 1 row
    # (17 = 2*8+1) — the second-to-last tile's DMA must clamp at the
    # image edge and zero the crossed halo rows
    _run(2, 17, 21, 8, 8, 3, 3, (0, 0), relu=False, affine=True,
         dtype=jnp.float32)


def test_conv2d_fused_halo_crosses_two_tiles():
    # nr == 2 with h just past one tile (9 = 8+1): the FIRST tile's
    # halo also crosses the image bottom
    _run(1, 9, 21, 8, 8, 3, 3, (0, 0), relu=False, affine=False,
         dtype=jnp.float32)


def test_conv2d_fused_trunk_shape():
    # scaled-down analogue of the s2d trunk conv (offset-0 2x2, wide W)
    _run(2, 10, 101, 48, 64, 2, 2, (0, 0), relu=True, affine=True,
         dtype=jnp.bfloat16)


def _rand_vars(variables, seed=7):
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    return jax.tree_util.tree_unflatten(
        treedef, [jax.random.normal(k, l.shape, l.dtype) * 0.1 + (
            1.0 if l.ndim == 1 else 0.0)  # keep BN vars positive-ish
                  for k, l in zip(keys, leaves)])


@pytest.mark.parametrize("phase_opt", [False, True])
def test_feature_net_conv_pallas_parity(phase_opt):
    """FeatureNet(conv_pallas=True) == FeatureNet (same params) through
    the fused kernel in interpret mode, at the judged flag set
    (s2d + fold_head [+ phase_opt])."""
    from diffmvs_tpu.nn.feature import FeatureNet

    rng = np.random.RandomState(0)
    kw = dict(base_channels=8, out_channels=(48, 32, 16), s2d=True,
              phase_opt=phase_opt, fold_head=True)
    net = FeatureNet(**kw)
    net_p = FeatureNet(**kw, conv_pallas=True)
    x = jnp.asarray(rng.rand(1, 32, 64, 3).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), x, False)
    assert (jax.tree_util.tree_map(jnp.shape, variables)
            == jax.tree_util.tree_map(
                jnp.shape, net_p.init(jax.random.PRNGKey(0), x, False)))
    variables = _rand_vars(variables)
    # positive running variances (rsqrt)
    variables = jax.tree_util.tree_map(lambda a: jnp.abs(a) + 0.1,
                                       variables)

    want = net.apply(variables, x, False)
    got = net_p.apply(variables, x, False)
    for k in want:
        np.testing.assert_allclose(
            np.asarray(got[k], np.float32), np.asarray(want[k], np.float32),
            rtol=5e-3, atol=5e-4, err_msg=k)


def test_context_net_conv_pallas_parity():
    from diffmvs_tpu.nn.context import ContextNet

    rng = np.random.RandomState(1)
    net = ContextNet(out_dim=(64, 64, 36), s2d=True)
    net_p = ContextNet(out_dim=(64, 64, 36), s2d=True, conv_pallas=True)
    x = jnp.asarray(rng.rand(1, 32, 64, 3).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), x, False)
    variables = jax.tree_util.tree_map(lambda a: jnp.abs(a) + 0.1,
                                       _rand_vars(variables))
    want = net.apply(variables, x, False)
    got = net_p.apply(variables, x, False)
    for k in want:
        np.testing.assert_allclose(
            np.asarray(got[k], np.float32), np.asarray(want[k], np.float32),
            rtol=5e-3, atol=5e-4, err_msg=k)


def test_conv2d_fused_gradients():
    """custom_vjp backward (recompute through the XLA ref) must match
    grads of the reference exactly."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 12, 18, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32) * 0.1)
    scale = jnp.asarray(rng.rand(16).astype(np.float32) + 0.5)
    shift = jnp.asarray(rng.randn(16).astype(np.float32) * 0.2)

    def loss_fused(x, w, s, b):
        return jnp.sum(conv2d_fused(x, w, s, b, relu=True,
                                    interpret=True) ** 2)

    def loss_ref(x, w, s, b):
        return jnp.sum(conv2d_fused_ref(x, w, s, b, relu=True) ** 2)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, w, scale, shift)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, w, scale, shift)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-3)

    # no-affine variant
    g2f = jax.grad(lambda x, w: jnp.sum(
        conv2d_fused(x, w, interpret=True) ** 2), argnums=(0, 1))(x, w)
    g2r = jax.grad(lambda x, w: jnp.sum(
        conv2d_fused_ref(x, w) ** 2), argnums=(0, 1))(x, w)
    for a, b in zip(g2f, g2r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-3)


def test_diffusion_unet_conv_pallas_parity():
    """DiffusionUNet(s2d, pallas=True) == DiffusionUNet(s2d), same
    params — every stride-1-on-grid conv through the fused kernel."""
    from diffmvs_tpu.nn.unet import DiffusionUNet

    rng = np.random.RandomState(2)
    mults = (1, 2)
    ds = 2 ** (len(mults) - 1)
    h, w = 16, 32
    unet = DiffusionUNet(dim=8, hidden_dim=12, dim_mults=mults, s2d=True)
    unet_p = DiffusionUNet(dim=8, hidden_dim=12, dim_mults=mults,
                           s2d=True, pallas=True)
    x = jnp.asarray(rng.rand(2, h, w, 10).astype(np.float32))
    hid = jnp.asarray(rng.rand(2, h // ds, w // ds, 12).astype(np.float32))
    t = jnp.asarray(np.array([3, 7], np.int32))
    variables = unet.init(jax.random.PRNGKey(0), x, hid, t)
    want = unet.apply(variables, x, hid, t)
    got = unet_p.apply(variables, x, hid, t)
    for g, wv in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(wv),
                                   rtol=2e-4, atol=2e-5)

    # and gradients flow (recompute-vjp), matching the plain path
    def loss(net, v):
        out = net.apply(v, x, hid, t)
        return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in out)

    g_w = jax.grad(lambda v: loss(unet, v))(variables)
    g_p = jax.grad(lambda v: loss(unet_p, v))(variables)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_w),
            jax.tree_util.tree_leaves_with_path(g_p)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=5e-4,
                                   err_msg=jax.tree_util.keystr(pa))


def test_condition_encoder_conv_pallas_parity():
    from diffmvs_tpu.nn.unet import ConditionEncoder

    rng = np.random.RandomState(4)
    h, w = 16, 32
    enc = ConditionEncoder(hidden_dim=16, out_chs=16, s2d=4)
    enc_p = ConditionEncoder(hidden_dim=16, out_chs=16, s2d=4,
                             pallas=True)
    depth = jnp.asarray(rng.rand(2, h, w, 1).astype(np.float32))
    dv = jnp.asarray(rng.rand(2, h, w, 4).astype(np.float32))
    cost = jnp.asarray(rng.rand(2, h, w, 16).astype(np.float32))
    variables = enc.init(jax.random.PRNGKey(0), depth, dv, cost)
    want = enc.apply(variables, depth, dv, cost)
    got = enc_p.apply(variables, depth, dv, cost)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)
