"""Space-to-depth layout (nn/s2d.py): exact parity with NHWC execution.

The s2d path must be a pure layout change — same parameters, same math
(modulo float reassociation), same outputs. These tests run everything
in f32 on CPU with tight tolerances.
"""

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from diffmvs_tpu.nn.s2d import (
    conv_s2d,
    expand_kernel,
    from_s2d,
    to_s2d,
    upsample_nearest_s2d,
)


def test_to_from_s2d_roundtrip(rng):
    x = jnp.asarray(rng.rand(2, 16, 24, 5).astype(np.float32))
    for s in (1, 2, 4):
        y = to_s2d(x, s)
        assert y.shape == (2, 16 // s, 24 // s, 5 * s * s)
        np.testing.assert_array_equal(np.asarray(from_s2d(y, s)), x)


def test_to_s2d_conv_path_bit_exact(rng):
    """The TPU one-hot-conv relayouts (to_s2d/from_s2d fast paths) are
    bit-exact vs the reshape/transpose paths, in f32 and bf16."""
    from diffmvs_tpu.nn.s2d import _from_s2d_conv, _to_s2d_conv

    for s, c in ((2, 8), (4, 16), (4, 3)):
        x = jnp.asarray(rng.randn(2, 16, 16, c).astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(_to_s2d_conv(x, s)), np.asarray(to_s2d(x, s)))
        xs = to_s2d(x, s)
        np.testing.assert_array_equal(
            np.asarray(_from_s2d_conv(xs, s)), np.asarray(x))
        xb = x.astype(jnp.bfloat16)
        np.testing.assert_array_equal(
            np.asarray(_to_s2d_conv(xb, s)).astype(np.float32),
            np.asarray(to_s2d(xb, s)).astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(_from_s2d_conv(to_s2d(xb, s), s)).astype(
                np.float32),
            np.asarray(xb).astype(np.float32))


def test_upsample_nearest_s2d(rng):
    """repeat-based channel duplication == nearest x2 on the original."""
    for s_in, c in ((1, 16), (2, 8), (4, 3)):
        x = jnp.asarray(rng.rand(2, 16, 16, c).astype(np.float32))
        up = upsample_nearest_s2d(to_s2d(x, s_in), s_in)
        ref = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        np.testing.assert_array_equal(
            np.asarray(from_s2d(up, 2 * s_in)), np.asarray(ref))


def test_s2d_channel_order_c_major(rng):
    """Channel index (c*s+p1)*s+p2: concat commutes with s2d."""
    a = jnp.asarray(rng.rand(1, 8, 8, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(1, 8, 8, 2).astype(np.float32))
    for s in (2, 4):
        want = to_s2d(jnp.concatenate([a, b], -1), s)
        got = jnp.concatenate([to_s2d(a, s), to_s2d(b, s)], -1)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def _conv_ref(x, w, b, stride=1, offset=None):
    k = w.shape[0]
    off = k // 2 if offset is None else offset
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((off, k - 1 - off), (off, k - 1 - off)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


def test_conv_s2d_matches_direct(rng):
    """Expanded structured conv == direct conv for every (k, s, stride)
    combination the UNet/encoder/feature net uses."""
    x = jnp.asarray(rng.rand(2, 16, 32, 6).astype(np.float32))
    for k, s, stride in ((1, 2, 1), (1, 4, 1), (3, 2, 1), (3, 4, 1),
                         (5, 2, 1), (5, 4, 1), (7, 2, 1), (7, 4, 1),
                         (5, 2, 2), (5, 4, 2), (3, 4, 2), (2, 4, 4)):
        w = jnp.asarray(rng.randn(k, k, 6, 8).astype(np.float32))
        b = jnp.asarray(rng.randn(8).astype(np.float32))
        want = _conv_ref(x, w, b, stride)
        got = from_s2d(
            conv_s2d(to_s2d(x, s), w, b, s, stride), s // stride)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5), (k, s, stride)


def test_conv_s2d_unpadded_downsample(rng):
    """offset=0 2x2/stride-2 == reference space-to-depth + 1x1 conv."""
    x = jnp.asarray(rng.rand(1, 16, 16, 4).astype(np.float32))
    w2 = jnp.asarray(rng.randn(2, 2, 4, 6).astype(np.float32))
    b = jnp.asarray(rng.randn(6).astype(np.float32))
    want = jax.lax.conv_general_dilated(
        x, w2, (2, 2), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    got = from_s2d(conv_s2d(to_s2d(x, 4), w2, b, 4, stride=2, offset=0), 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_upsample_nearest_s2d_roundtrip(rng):
    x = jnp.asarray(rng.rand(1, 8, 12, 5).astype(np.float32))
    want = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    for s_in in (1, 2):
        xin = to_s2d(x, s_in)                   # phys res /s_in
        got = from_s2d(upsample_nearest_s2d(xin, s_in), 2 * s_in)
        # from_s2d(2*s_in) recovers orig res * 2 relative to phys
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_diffusion_unet_s2d_parity(rng):
    """DiffusionUNet(s2d=True) == DiffusionUNet(s2d=False) with the SAME
    parameter tree (the layout is a pure apply-time transform)."""
    from diffmvs_tpu.nn.unet import DiffusionUNet

    for mults in ((1, 2), (1, 2, 4)):
        ds = 2 ** (len(mults) - 1)
        h, w = 16, 32
        unet = DiffusionUNet(dim=8, hidden_dim=12, dim_mults=mults)
        unet_s = DiffusionUNet(dim=8, hidden_dim=12, dim_mults=mults,
                               s2d=True)
        x = jnp.asarray(rng.rand(2, h, w, 10).astype(np.float32))
        hid = jnp.asarray(
            rng.rand(2, h // ds, w // ds, 12).astype(np.float32))
        t = jnp.asarray(np.array([3, 7], np.int32))
        variables = unet.init(jax.random.PRNGKey(0), x, hid, t)
        # identical param tree
        vs = unet_s.init(jax.random.PRNGKey(0), x, hid, t)
        tree_a = jax.tree_util.tree_map(lambda a: a.shape, variables)
        tree_b = jax.tree_util.tree_map(lambda a: a.shape, vs)
        assert tree_a == tree_b

        want = unet.apply(variables, x, hid, t)
        got = unet_s.apply(variables, x, hid, t)
        for g, wv in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(wv),
                                       rtol=1e-4, atol=1e-5)


def test_condition_encoder_s2d_parity(rng):
    from diffmvs_tpu.nn.unet import ConditionEncoder

    h, w = 16, 32
    enc = ConditionEncoder(hidden_dim=16, out_chs=16)
    enc_s = ConditionEncoder(hidden_dim=16, out_chs=16, s2d=4)
    depth = jnp.asarray(rng.rand(2, h, w, 1).astype(np.float32))
    dv = jnp.asarray(rng.rand(2, h, w, 4).astype(np.float32))
    cost = jnp.asarray(rng.rand(2, h, w, 16).astype(np.float32))
    variables = enc.init(jax.random.PRNGKey(0), depth, dv, cost)
    vs = enc_s.init(jax.random.PRNGKey(0), depth, dv, cost)
    assert (jax.tree_util.tree_map(lambda a: a.shape, variables)
            == jax.tree_util.tree_map(lambda a: a.shape, vs))
    want = enc.apply(variables, depth, dv, cost)
    got = enc_s.apply(variables, depth, dv, cost)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_feature_net_s2d_parity(rng):
    """FeatureNet(s2d=True) == FeatureNet(s2d=False), same params, eval
    AND train mode (BatchNormS2D batch stats must match NHWC BN)."""
    from diffmvs_tpu.nn.feature import FeatureNet

    net = FeatureNet(base_channels=8, out_channels=(48, 32, 16))
    net_s = FeatureNet(base_channels=8, out_channels=(48, 32, 16),
                       s2d=True)
    x = jnp.asarray(rng.rand(2, 32, 64, 3).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), x, False)
    vs = net_s.init(jax.random.PRNGKey(0), x, False)
    assert (jax.tree_util.tree_map(lambda a: a.shape, variables)
            == jax.tree_util.tree_map(lambda a: a.shape, vs))

    want = net.apply(variables, x, False)
    got = net_s.apply(variables, x, False)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=2e-3, atol=5e-5)

    # train mode: outputs AND updated batch_stats match
    want_t, wstats = net.apply(variables, x, True,
                               mutable=["batch_stats"])
    got_t, gstats = net_s.apply(variables, x, True,
                                mutable=["batch_stats"])
    for k in want_t:
        np.testing.assert_allclose(np.asarray(got_t[k]),
                                   np.asarray(want_t[k]),
                                   rtol=2e-3, atol=5e-5)
    flat_w = jax.tree_util.tree_leaves_with_path(wstats)
    flat_g = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_leaves_with_path(gstats)}
    for p, v in flat_w:
        np.testing.assert_allclose(np.asarray(flat_g[jax.tree_util.keystr(p)]),
                                   np.asarray(v), rtol=2e-3, atol=5e-5)




def test_full_model_s2d_parity(rng):
    """CasDiffMVS export forward with unet_s2d=True == False, same
    variables (pure layout change end to end)."""
    import dataclasses

    from diffmvs_tpu.config import CASDIFFMVS
    from diffmvs_tpu.models.casdiffmvs import CasDiffMVS
    from helpers import make_batch

    cfg = dataclasses.replace(CASDIFFMVS, numdepth_initial=8, numdepth=32)
    # the full judged TPU layout config (what tpu_optimized() enables,
    # minus the Pallas kernel which has its own parity tests)
    cfg_s = dataclasses.replace(cfg, unet_s2d=True, feature_s2d=True,
                                feature_phase_opt=True, context_s2d=True,
                                stage1_s2d=True, unroll_iters=True)
    batch = make_batch(np.random.RandomState(0), 1, 3, 64, 96, numdepth=32)

    model = CasDiffMVS(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), batch["imgs"], batch["proj_matrices"],
        batch["depth_values"], rng=None, train=False, export=True)

    def run(m):
        return jax.jit(lambda v, b: m.apply(
            v, b["imgs"], b["proj_matrices"], b["depth_values"],
            rng=None, train=False, export=True))(variables, batch)

    out = run(model)
    out_s = run(CasDiffMVS(cfg_s))
    np.testing.assert_allclose(np.asarray(out_s["depth"][-1]),
                               np.asarray(out["depth"][-1]),
                               rtol=1e-4, atol=1e-4)
    for a, b in zip(out_s["photometric_confidence"],
                    out["photometric_confidence"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_pixel_view_weight_s2d_parity(rng):
    """PixelViewWeight(s2d=4) == NHWC, same params, eval + train stats."""
    from diffmvs_tpu.nn.costreg import PixelViewWeight

    pvw = PixelViewWeight()
    pvw_s = PixelViewWeight(s2d=4)
    cor = jnp.asarray(rng.rand(2, 6, 16, 24, 8).astype(np.float32))
    variables = pvw.init(jax.random.PRNGKey(0), cor, False)
    vs = pvw_s.init(jax.random.PRNGKey(0), cor, False)
    assert (jax.tree_util.tree_map(lambda a: a.shape, variables)
            == jax.tree_util.tree_map(lambda a: a.shape, vs))

    want = pvw.apply(variables, cor, False)
    got = pvw_s.apply(variables, cor, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)

    want_t, wstats = pvw.apply(variables, cor, True,
                               mutable=["batch_stats"])
    got_t, gstats = pvw_s.apply(variables, cor, True,
                                mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want_t),
                               rtol=1e-4, atol=1e-5)
    for (p, v), (p2, v2) in zip(
            jax.tree_util.tree_leaves_with_path(wstats),
            jax.tree_util.tree_leaves_with_path(gstats)):
        assert jax.tree_util.keystr(p) == jax.tree_util.keystr(p2)
        np.testing.assert_allclose(np.asarray(v2), np.asarray(v),
                                   rtol=1e-4, atol=1e-5)


def test_s2d_bf16_backward(rng):
    """Gradients flow through the full s2d stack in bfloat16 compute
    (regression: the s2d init conv's preferred_element_type broke the
    conv VJP's dtype matching on the first TPU train bench)."""
    import dataclasses

    from diffmvs_tpu.config import CASDIFFMVS, TrainConfig
    from diffmvs_tpu.models.casdiffmvs import CasDiffMVS
    from diffmvs_tpu.models.loss import compute_inverse_loss
    from diffmvs_tpu.train.state import create_train_state
    from helpers import make_batch

    cfg = TrainConfig(model=dataclasses.replace(
        CASDIFFMVS, numdepth_initial=8, numdepth=16,
        stage_iters=(1, 1, 1), cost_num=(0, 2, 2),
        compute_dtype="bfloat16", unet_s2d=True, feature_s2d=True,
        stage1_s2d=True), batch_size=1)
    model = CasDiffMVS(cfg.model)
    batch = make_batch(np.random.RandomState(0), 1, 3, 32, 64,
                       numdepth=16, with_gt=True)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch,
                               steps_per_epoch=10)

    def loss_fn(params):
        outputs, _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch["imgs"], batch["proj_matrices"], batch["depth_values"],
            depth_gt=batch["depth"], rng=jax.random.PRNGKey(7),
            train=True, mutable=["batch_stats"])
        loss, _ = compute_inverse_loss(
            outputs["depth"], outputs["conf"], batch["depth"],
            batch["mask"], batch["depth_values"],
            cfg.model.stage_iters, cfg.loss_rate, cfg.conf_weight)
        return loss

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(state.params)
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.sum(jnp.square(g.astype(jnp.float32))))
                for g in jax.tree_util.tree_leaves(grads)) ** 0.5
    assert np.isfinite(gnorm) and gnorm > 0


def test_s2d_change(rng):
    """s2d_change == to_s2d(from_s2d(x, s_in), s_out) — both the generic
    composition and the fused one-hot conv path (bit-exact)."""
    from diffmvs_tpu.nn.s2d import _s2d_change_onehot, s2d_change

    x = jnp.asarray(rng.rand(2, 16, 24, 3).astype(np.float32))
    for s_in, s_out in ((1, 2), (1, 4), (2, 4), (2, 8), (4, 4)):
        rep = to_s2d(x, s_in)
        want = to_s2d(from_s2d(rep, s_in), s_out)
        got = s2d_change(rep, s_in, s_out)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        if s_out > s_in:
            # the TPU branch explicitly (backend-independent math)
            r = s_out // s_in
            c = rep.shape[-1] // (s_in * s_in)
            k = jnp.asarray(_s2d_change_onehot(s_in, s_out, c), rep.dtype)
            conv = jax.lax.conv_general_dilated(
                rep, k, (r, r), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            np.testing.assert_array_equal(np.asarray(conv),
                                          np.asarray(want))


def test_condition_encoder_s2d2_matches_s4(rng):
    """ConditionEncoder at s2d=2 + fused repr-change to 4 == the s2d=4
    encoder: same parameter tree, same math (modulo f32 reassociation
    in the differently-expanded convs)."""
    from diffmvs_tpu.nn.unet import ConditionEncoder

    b, h, w, g, cn = 1, 16, 24, 4, 4
    depth = jnp.asarray(rng.rand(b, h, w, 1).astype(np.float32))
    dvals = jnp.asarray(rng.rand(b, h, w, cn).astype(np.float32))
    cost = jnp.asarray(rng.rand(b, h, w, g * cn).astype(np.float32))

    enc4 = ConditionEncoder(hidden_dim=16, out_chs=16, s2d=4, s2d_out=True)
    enc2 = ConditionEncoder(hidden_dim=16, out_chs=16, s2d=2, s2d_out=True,
                            out_factor=4)
    v4 = enc4.init(jax.random.PRNGKey(0), depth, dvals, cost)
    v2 = enc2.init(jax.random.PRNGKey(0), depth, dvals, cost)
    assert jax.tree_util.tree_structure(v4) == \
        jax.tree_util.tree_structure(v2)
    chex = jax.tree_util.tree_map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), v4["params"], v2["params"])
    del chex
    out4 = np.asarray(enc4.apply(v4, depth, dvals, cost))
    out2 = np.asarray(enc2.apply(v4, depth, dvals, cost))
    assert out4.shape == out2.shape
    np.testing.assert_allclose(out2, out4, rtol=2e-5, atol=2e-5)


def test_feature_net_phase_opt_parity(rng):
    """phase_opt trunk (off-center min-span kernels + border masks +
    pre-pad/crop) == the direct NHWC FeatureNet, eval mode, at bit
    level; train mode falls back to the plain s2d trunk (BN stats would
    see the pad rows otherwise)."""
    from diffmvs_tpu.nn.feature import FeatureNet
    from diffmvs_tpu.nn.s2d import prepare_wexp

    net = FeatureNet(base_channels=8, out_channels=(48, 32, 16))
    net_p = FeatureNet(base_channels=8, out_channels=(48, 32, 16),
                       s2d=True, phase_opt=True)
    x = jnp.asarray(rng.rand(2, 40, 64, 3).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), x, False)

    want = net.apply(variables, x, False)
    got = net_p.apply(variables, x, False)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]),
                                   np.asarray(want[k]),
                                   rtol=1e-5, atol=1e-6)

    # the hoisted-weight-prep (wexp) fast path records and reuses the
    # trimmed expansions too
    vp = prepare_wexp(net_p.apply, variables, x, False)
    assert "wexp" in vp
    got2 = net_p.apply(vp, x, False)
    for k in want:
        np.testing.assert_allclose(np.asarray(got2[k]),
                                   np.asarray(got[k]), rtol=0, atol=0)

    # train mode: identical tree/result to the plain s2d trunk
    want_t, wstats = net.apply(variables, x, True, mutable=["batch_stats"])
    got_t, gstats = net_p.apply(variables, x, True,
                                mutable=["batch_stats"])
    for k in want_t:
        np.testing.assert_allclose(np.asarray(got_t[k]),
                                   np.asarray(want_t[k]),
                                   rtol=2e-3, atol=5e-5)


def test_zero_px_border_s2d(rng):
    """zero_px_border_s2d == zeroing pixel rows/cols in image space."""
    from diffmvs_tpu.nn.s2d import zero_px_border_s2d

    for s, (top, bottom, left, right) in ((4, (7, 1, 2, 5)),
                                          (2, (1, 3, 0, 4))):
        x = jnp.asarray(rng.rand(2, 16, 24, 3).astype(np.float32))
        want = np.asarray(x).copy()
        want[:, :top] = 0
        if bottom:
            want[:, -bottom:] = 0
        want[:, :, :left] = 0
        if right:
            want[:, :, -right:] = 0
        got = from_s2d(zero_px_border_s2d(to_s2d(x, s), s, top, bottom,
                                          left, right), s)
        np.testing.assert_array_equal(np.asarray(got), want)


def test_context_net_s2d_parity(rng):
    """ContextNet(s2d=True) == ContextNet(s2d=False): same params, eval
    AND train mode (BN stats), all stage heads."""
    from diffmvs_tpu.nn.context import ContextNet

    net = ContextNet(out_dim=(64, 64, 36))
    net_s = ContextNet(out_dim=(64, 64, 36), s2d=True)
    x = jnp.asarray(rng.rand(2, 32, 64, 3).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), x, False)
    vs = net_s.init(jax.random.PRNGKey(0), x, False)
    assert (jax.tree_util.tree_map(lambda a: a.shape, variables)
            == jax.tree_util.tree_map(lambda a: a.shape, vs))

    want = net.apply(variables, x, False)
    got = net_s.apply(variables, x, False)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]),
                                   np.asarray(want[k]),
                                   rtol=2e-3, atol=5e-5)

    want_t, wstats = net.apply(variables, x, True, mutable=["batch_stats"])
    got_t, gstats = net_s.apply(variables, x, True, mutable=["batch_stats"])
    for k in want_t:
        np.testing.assert_allclose(np.asarray(got_t[k]),
                                   np.asarray(want_t[k]),
                                   rtol=2e-3, atol=5e-5)
    for a, b in zip(jax.tree_util.tree_leaves(wstats),
                    jax.tree_util.tree_leaves(gstats)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=5e-5)



def test_feature_net_fold_head_parity(rng):
    """FeatureNet(s2d, fold_head=True) == FeatureNet(s2d), same params
    (identical tree incl. inner2/out3), with RANDOM inner2 bias so the
    ones-channel bias fold is exercised, plus gradient parity through
    the folded head (the fold must stay differentiable in train mode)."""
    from diffmvs_tpu.nn.feature import FeatureNet

    net = FeatureNet(base_channels=8, out_channels=(48, 32, 16), s2d=True)
    net_f = FeatureNet(base_channels=8, out_channels=(48, 32, 16),
                       s2d=True, fold_head=True)
    x = jnp.asarray(rng.rand(2, 32, 64, 3).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), x, False)
    vf = net_f.init(jax.random.PRNGKey(0), x, False)
    assert (jax.tree_util.tree_map(lambda a: a.shape, variables)
            == jax.tree_util.tree_map(lambda a: a.shape, vf))

    # randomize every param (esp. inner2 bias, zero at init)
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    variables = jax.tree_util.tree_unflatten(
        treedef, [jax.random.normal(k, l.shape, l.dtype) * 0.1
                  for k, l in zip(keys, leaves)])

    want = net.apply(variables, x, False)
    got = net_f.apply(variables, x, False)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=2e-4, atol=1e-5, err_msg=k)

    # gradient parity: the fold is plain algebra on the params, so grads
    # through the folded head must match the unfolded path
    def loss(net_, v):
        out = net_.apply(v, x, False)
        return sum(jnp.sum(o ** 2) for o in out.values())

    g_want = jax.grad(lambda v: loss(net, v))(variables)
    g_got = jax.grad(lambda v: loss(net_f, v))(variables)
    flat_w = {jax.tree_util.keystr(p): v for p, v
              in jax.tree_util.tree_leaves_with_path(g_want)}
    flat_g = {jax.tree_util.keystr(p): v for p, v
              in jax.tree_util.tree_leaves_with_path(g_got)}
    for p, v in flat_w.items():
        np.testing.assert_allclose(np.asarray(flat_g[p]), np.asarray(v),
                                   rtol=5e-4, atol=2e-4, err_msg=p)


