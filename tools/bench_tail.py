"""Micro-benchmark the refinement-stage tail (encoder / UNet / GRU) and
representative small-channel convs at stage-3 resolution on the TPU.

The per-iteration tail at stage 3 (576x800) costs ~50 ms (perf_breakdown);
channel dims are 8-32, so convs use 6-25% of the 128 MXU lanes. This tool
splits the tail to decide whether a space-to-depth re-layout is worth it.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_tail.py
"""

import os
import sys
import time

os.environ.setdefault("OMP_NUM_THREADS", "1")

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    os.makedirs("/root/.cache/jax_comp", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from diffmvs_tpu.config import CASDIFFMVS
    from diffmvs_tpu.nn.unet import ConditionEncoder, DiffusionUNet

    cfg = CASDIFFMVS
    s = 2                                    # stage 3
    B, H, W = 4, 576, 800
    dt = jnp.bfloat16

    key = jax.random.PRNGKey(0)
    tiny = jax.jit(lambda k: jax.random.uniform(k).sum())
    float(tiny(key))
    t0 = time.perf_counter()
    for i in range(5):
        float(tiny(jax.random.fold_in(key, i)))
    floor = (time.perf_counter() - t0) / 5
    print(f"# fetch floor {floor * 1000:.1f} ms", file=sys.stderr)

    def measure(label, fn, *args, reps=10):
        @jax.jit
        def chained(args):
            def body(acc, i):
                a = list(args)
                a[0] = a[0] + (acc * 1e-12).astype(a[0].dtype)
                out = fn(*a)
                tot = jnp.float32(0.0)
                for leaf in jax.tree_util.tree_leaves(out):
                    tot = tot + leaf.astype(jnp.float32).mean()
                return acc + tot, None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(reps))
            return acc

        args = jax.tree_util.tree_map(jnp.asarray, list(args))
        float(chained(args))
        t0 = time.perf_counter()
        float(chained(args))
        ms = (time.perf_counter() - t0 - floor) / reps * 1000
        print(f"{label:40s} {ms:8.2f} ms")

    rng = np.random.RandomState(0)
    hd, cd = cfg.hidden_dim[s], cfg.context_dim[s]
    g, cn = cfg.cost_dim_stage[s], cfg.cost_num[s]

    cost = rng.rand(B, H, W, g * cn).astype(np.float32)
    samples = rng.rand(B, H, W, cn).astype(np.float32)
    inv = rng.rand(B, H, W, 1).astype(np.float32)
    ctx = rng.rand(B, H, W, cd).astype(np.float32)
    ds = 2 ** (len(cfg.unet_dim_mults[s]) - 1)     # UNet bottleneck res
    hidden = rng.rand(B, H // ds, W // ds, hd).astype(np.float32)
    t = np.zeros((B,), np.int32)

    enc = ConditionEncoder(hidden_dim=cd, out_chs=cd, dtype=dt)
    evars = enc.init(key, inv[:1], samples[:1], cost[:1])
    measure("encoder (5 convs, 16ch)",
            lambda i_, s_, c_: enc.apply(evars, i_, s_, c_),
            inv, samples, cost)

    unet = DiffusionUNet(dim=cfg.unet_dim[s], hidden_dim=hd,
                         dim_mults=cfg.unet_dim_mults[s], dtype=dt)
    x_in = rng.rand(B, H, W, 2 * cd).astype(np.float32)
    uvars = unet.init(key, x_in[:1], hidden[:1], t[:1])
    measure("unet (full)",
            lambda x_, h_, t_: unet.apply(uvars, x_, h_, t_),
            x_in, hidden, t)

    # representative convs at stage-3 res, bf16
    for cin, cout, k, label in (
            (32, 16, 3, "conv3x3 32->16"),
            (16, 16, 3, "conv3x3 16->16"),
            (32, 8, 7, "conv7x7 32->8 (unet init)"),
            (8, 8, 3, "conv3x3 8->8 (unet blk)")):
        conv = nn.Conv(cout, (k, k), padding=k // 2, dtype=dt)
        x = rng.rand(B, H, W, cin).astype(np.float32)
        cvars = conv.init(key, x[:1])
        measure(label, lambda x_, _c=conv, _v=cvars: _c.apply(_v, x_), x)

    # same conv in space-to-depth layout: [B,H/2,W/2,4C] k2
    for cin, cout, label in ((32, 16, "s2d conv2x2 128->64 (eq 32->16)"),
                             (16, 16, "s2d conv2x2 64->64 (eq 16->16)")):
        conv = nn.Conv(4 * cout, (2, 2), padding=((0, 1), (0, 1)), dtype=dt)
        x = rng.rand(B, H // 2, W // 2, 4 * cin).astype(np.float32)
        cvars = conv.init(key, x[:1])
        measure(label, lambda x_, _c=conv, _v=cvars: _c.apply(_v, x_), x)

    # exact-equivalent reformulations of the 7x7 32->8 init conv
    cin, cout = 32, 8
    x = rng.rand(B, H, W, cin).astype(np.float32)
    w77 = rng.randn(7, 7, cin, cout).astype(np.float32)

    def conv_pad_out(x_, w_):
        wp = jnp.pad(w_, ((0, 0), (0, 0), (0, 0), (0, 120)))
        y = jax.lax.conv_general_dilated(
            x_.astype(dt), wp.astype(dt), (1, 1), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y[..., :cout]
    measure("conv7x7 as padded-out 32->128", conv_pad_out, x, w77)

    def conv_rows(x_, w_):
        xp = jnp.pad(x_, ((0, 0), (3, 3), (0, 0), (0, 0))).astype(dt)
        y = 0
        for dy in range(7):
            y = y + jax.lax.conv_general_dilated(
                xp[:, dy:dy + H], w_[dy:dy + 1].astype(dt), (1, 1),
                ((0, 0), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y
    measure("conv7x7 as 7 x conv1x7", conv_rows, x, w77)

    def conv_3x3sum(x_, w_):
        wp = jnp.pad(w_, ((1, 1), (1, 1), (0, 0), (0, 0)))  # 9x9
        xp = jnp.pad(x_, ((0, 0), (3, 3), (3, 3), (0, 0))).astype(dt)
        y = 0
        for by in range(3):
            for bx in range(3):
                y = y + jax.lax.conv_general_dilated(
                    xp[:, 3 * by:3 * by + H + 2 - 2,
                       3 * bx:3 * bx + W + 2 - 2],
                    wp[3 * by:3 * by + 3, 3 * bx:3 * bx + 3].astype(dt),
                    (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y
    measure("conv7x7 as 9 x conv3x3", conv_3x3sum, x, w77)

    # stage-1 glue: PixelViewWeight conv3ds at sweep shape (per view)
    from diffmvs_tpu.nn.costreg import PixelViewWeight
    cor = rng.rand(4, 48, 144, 200, 8).astype(np.float32)
    pvw = PixelViewWeight()
    pvars = pvw.init(key, cor[:1], False)
    measure("pvw (1 view, sweep shape)",
            lambda c_: pvw.apply(pvars, c_, False), cor)

    conv3 = nn.Conv(8, (3, 3, 3), padding=1, dtype=dt)
    c3vars = conv3.init(key, cor[:1])
    measure("conv3d 3x3x3 8->8 sweep shape",
            lambda c_: conv3.apply(c3vars, c_), cor)

    # stage-3 refine mask head + hidden plumbing shapes
    from diffmvs_tpu.models.stages import UpsampleMaskHead
    mh = UpsampleMaskHead(2, dtype=dt)
    ctx3 = rng.rand(B, H, W, 16).astype(np.float32)
    mvars = mh.init(key, ctx3[:1])
    measure("mask head (stage3)", lambda c_: mh.apply(mvars, c_), ctx3)

    # feature-net-shaped convs (20 images at full DTU res)
    BV, FH, FW = 20, 1152, 1600
    for cin, cout, k, stride, h_, w_, label in (
            (3, 8, 3, 1, FH, FW, "feat conv3x3 3->8 full-res"),
            (8, 8, 3, 1, FH, FW, "feat conv3x3 8->8 full-res"),
            (8, 16, 5, 2, FH, FW, "feat conv5x5s2 8->16 full-res"),
            (16, 32, 5, 2, FH // 2, FW // 2, "feat conv5x5s2 16->32 1/2")):
        conv = nn.Conv(cout, (k, k), strides=(stride, stride),
                       padding=k // 2, dtype=dt)
        x = rng.rand(BV, h_, w_, cin).astype(np.float32)
        cvars = conv.init(key, x[:1])
        measure(label, lambda x_, _c=conv, _v=cvars: _c.apply(_v, x_), x)

    # 5x5 stride-2 as 5 x (1x5, stride (2,2)) row sum
    def conv5s2_rows(x_, w_):
        h_ = x_.shape[1]
        xp = jnp.pad(x_, ((0, 0), (2, 2), (0, 0), (0, 0))).astype(dt)
        y = 0
        for dy in range(5):
            y = y + jax.lax.conv_general_dilated(
                xp[:, dy:dy + h_], w_[dy:dy + 1].astype(dt), (2, 2),
                ((0, 0), (2, 2)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y
    x = rng.rand(BV, FH, FW, 8).astype(np.float32)
    w55 = rng.randn(5, 5, 8, 16).astype(np.float32)
    measure("feat conv5x5s2 as 5 x conv1x5", conv5s2_rows, x, w55)

    # GroupNorm at stage-3 res (the UNet has 8 of these per iteration)
    gn = nn.GroupNorm(num_groups=4, epsilon=1e-5, dtype=dt)
    x = rng.rand(B, H, W, 8).astype(np.float32)
    gvars = gn.init(key, x[:1])
    measure("groupnorm 8ch", lambda x_: gn.apply(gvars, x_), x)


if __name__ == "__main__":
    main()
