"""Layout experiments for the refinement tail + feature net (round 3).

The r2 trace showed ~140 ms/forward of layout copies + small-channel
(C=8-32) lane waste concentrated in the UNet/encoder tails and
feature_net (docs/perf_breakdown.md). These probes compare the shipped
NHWC small-C ops against space-to-depth (s2d) reformulations that use
all 128 lanes:

  s2d(s): [B,H,W,C] -> [B,H/s,W/s,C*s*s]   (channel order (c,p1,p2) so
  GroupNorm groups stay contiguous). A stride-1 3x3 conv becomes a 3x3
  conv on the s2d tensor with an (s^2*Cin -> s^2*Cout) kernel that is
  mostly structural zeros — more MACs, but small-C convs are lane-bound
  not FLOP-bound, while every elementwise/norm op gets s^2 x the lanes.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_layout.py [section ...]
Sections: gn res unet enc feat kern
"""

import os
import sys
import time

os.environ.setdefault("OMP_NUM_THREADS", "1")

import numpy as np  # noqa: E402


def main(sections):
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    os.makedirs("/root/.cache/jax_comp", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(0)

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
        try:
            float(chained(args))
            t0 = time.perf_counter()
            float(chained(args))
            ms = (time.perf_counter() - t0 - floor) / reps * 1000
            print(f"{label:52s} {ms:8.2f} ms")
            return ms
        except Exception as e:
            print(f"{label:52s} FAILED: {str(e)[:100]}")
            return None

    B, H, W = 4, 576, 800          # stage-3 resolution, bench batch

    def mkx(c, h=H, w=W, b=B):
        return rng.rand(b, h, w, c).astype(np.float32)

    def gn_silu(groups):
        gn = nn.GroupNorm(num_groups=groups, epsilon=1e-5, dtype=dt)
        def f(x, v):
            return nn.silu(gn.apply(v, x))
        return gn, f

    # ---------------- section: gn --------------------------------------
    if "gn" in sections:
        print("## GroupNorm+SiLU, same logical data, three layouts")
        for c, s, groups in ((8, 1, 4), (32, 2, 4), (128, 4, 4)):
            gn, f = gn_silu(groups)
            x = mkx(c, H // s, W // s)
            v = gn.init(key, x[:1])
            measure(f"gn+silu C={c:<4d} {H//s}x{W//s} (s2d{s})",
                    lambda x_, _v=v, _f=f: _f(x_, _v), x)

    # ---------------- section: res -------------------------------------
    # ResnetBlock-shaped chain: [conv3x3 C->C, GN, SiLU] x2 + residual.
    # s2d variants use dense random weights of the structural-zero shape
    # (timing identical to the zero-structured kernel).
    if "res" in sections:
        print("## ResnetBlock chain (conv+gn+silu x2 + res)")
        for c, s, kk in ((8, 1, 3), (32, 2, 3), (128, 4, 3)):
            h, w = H // s, W // s
            conv = nn.Conv(c, (kk, kk), padding=kk // 2, dtype=dt)
            gn, _ = gn_silu(4)
            x = mkx(c, h, w)
            cv1 = conv.init(key, x[:1])
            cv2 = conv.init(jax.random.fold_in(key, 1), x[:1])
            gv = gn.init(key, x[:1])

            def block(x_, _c=conv, _g=gn, _cv1=cv1, _cv2=cv2, _gv=gv):
                y = nn.silu(_g.apply(_gv, _c.apply(_cv1, x_)))
                y = nn.silu(_g.apply(_gv, _c.apply(_cv2, y)))
                return y + x_
            measure(f"resblock C={c:<4d} {h}x{w} (s2d{s})", block, x)

    # ---------------- section: unet ------------------------------------
    if "unet" in sections:
        from diffmvs_tpu.config import CASDIFFMVS
        from diffmvs_tpu.nn.unet import ConditionEncoder, DiffusionUNet

        cfg = CASDIFFMVS
        s3 = 2
        hd, cd = cfg.hidden_dim[s3], cfg.context_dim[s3]
        print("## shipped stage-3 tail (reference numbers)")
        mults = cfg.unet_dim_mults[s3]
        ds = 2 ** (len(mults) - 1)          # bottleneck downsample factor
        unet = DiffusionUNet(dim=cfg.unet_dim[s3], hidden_dim=hd,
                             dim_mults=mults, dtype=dt)
        x_in = mkx(2 * cd)
        hidden = mkx(hd, H // ds, W // ds)
        t = np.zeros((B,), np.int32)
        uvars = unet.init(key, x_in[:1], hidden[:1], t[:1])
        measure("unet (shipped)", lambda x_, h_, t_: unet.apply(
            uvars, x_, h_, t_), x_in, hidden, t)

        unet_s = DiffusionUNet(dim=cfg.unet_dim[s3], hidden_dim=hd,
                               dim_mults=mults, s2d=True, dtype=dt)
        measure("unet (s2d)", lambda x_, h_, t_: unet_s.apply(
            uvars, x_, h_, t_), x_in, hidden, t)
        import jax.numpy as _jnp
        x16 = _jnp.asarray(x_in, dt)
        h16 = _jnp.asarray(hidden, dt)
        measure("unet (s2d, bf16 in)", lambda x_, h_, t_: unet_s.apply(
            uvars, x_, h_, t_), x16, h16, t)
        measure("unet (shipped, bf16 in)", lambda x_, h_, t_: unet.apply(
            uvars, x_, h_, t_), x16, h16, t)

        # stage-2 shapes (288x400, dim 16, mults (1,2))
        s2 = 1
        hd2, cd2 = cfg.hidden_dim[s2], cfg.context_dim[s2]
        mults2 = cfg.unet_dim_mults[s2]
        ds2 = 2 ** (len(mults2) - 1)
        unet2 = DiffusionUNet(dim=cfg.unet_dim[s2], hidden_dim=hd2,
                              dim_mults=mults2, dtype=dt)
        unet2_s = DiffusionUNet(dim=cfg.unet_dim[s2], hidden_dim=hd2,
                                dim_mults=mults2, s2d=True, dtype=dt)
        x2_in = mkx(2 * cd2, 288, 400)
        hid2 = mkx(hd2, 288 // ds2, 400 // ds2)
        u2v = unet2.init(key, x2_in[:1], hid2[:1], t[:1])
        measure("unet stage2 (shipped)", lambda x_, h_, t_: unet2.apply(
            u2v, x_, h_, t_), x2_in, hid2, t)
        measure("unet stage2 (s2d)", lambda x_, h_, t_: unet2_s.apply(
            u2v, x_, h_, t_), x2_in, hid2, t)

        # unet pieces at stage-3 shapes
        from diffmvs_tpu.nn.layers import SepConvGRU
        from diffmvs_tpu.nn.unet import (Conv7x7RowSum, Downsample,
                                         ResnetBlock, Upsample, WSConv)
        c7 = Conv7x7RowSum(8, dtype=dt)
        x32 = mkx(32)
        c7v = c7.init(key, x32[:1])
        measure("unet init conv7x7 rowsum 32->8", lambda x_: c7.apply(
            c7v, x_), x32)

        gru = SepConvGRU(hd, dtype=dt)
        xg = mkx(32, H // ds, W // ds)
        hg = mkx(hd, H // ds, W // ds)
        gvars = gru.init(key, hg[:1], xg[:1])
        measure(f"gru (hidden {hd}ch {H//ds}x{W//ds})",
                lambda h_, x_: gru.apply(gvars, h_, x_), hg, xg)

        rb = ResnetBlock(8, 4, dtype=dt)
        x8 = mkx(8)
        temb = rng.rand(B, 32).astype(np.float32)
        rbv = rb.init(key, x8[:1], temb[:1])
        measure("unet resblock 8ch full-res (FiLM)",
                lambda x_, t_: rb.apply(rbv, x_, t_), x8, temb)

        us = Upsample(8, dtype=dt)
        xu = mkx(8, H // 2, W // 2)
        usv = us.init(key, xu[:1])
        measure("unet upsample 8ch 288x400->576x800",
                lambda x_: us.apply(usv, x_), xu)

        dsm = Downsample(8, dtype=dt)
        dsv = dsm.init(key, x8[:1])
        measure("unet downsample 8ch 576x800",
                lambda x_: dsm.apply(dsv, x_), x8)

        ws = WSConv(8, 3, dtype=dt)
        x16c = mkx(16)
        wsv = ws.init(key, x16c[:1])
        measure("wsconv 16->8 full-res", lambda x_: ws.apply(wsv, x_),
                x16c)

        enc = ConditionEncoder(hidden_dim=cd, out_chs=cd, dtype=dt)
        cost = mkx(16)
        samples = mkx(4)
        inv = mkx(1)
        evars = enc.init(key, inv[:1], samples[:1], cost[:1])
        measure("encoder (shipped)", lambda i_, s_, c_: enc.apply(
            evars, i_, s_, c_), inv, samples, cost)
        enc_s = ConditionEncoder(hidden_dim=cd, out_chs=cd, s2d=4,
                                 dtype=dt)
        measure("encoder (s2d4)", lambda i_, s_, c_: enc_s.apply(
            evars, i_, s_, c_), inv, samples, cost)

        # mock s2d4 unet level-0 ladder: what the full-res ops cost in
        # s2d(4) layout. init conv 7x7 (32ch) -> 3x3 512->128;
        # resblock convs 8ch -> 3x3 128->128; heads 1x1 8->1 -> 1x1
        # 128->16. All at 144x200.
        print("## s2d4 mock of the unet's full-res level")
        h4, w4 = H // 4, W // 4
        x512 = mkx(512, h4, w4)
        conv_init = nn.Conv(128, (3, 3), padding=1, dtype=dt)
        civ = conv_init.init(key, x512[:1])
        measure("s2d4 init conv 512->128 3x3", lambda x_: conv_init.apply(
            civ, x_), x512)

        x128 = mkx(128, h4, w4)
        convb = nn.Conv(128, (3, 3), padding=1, dtype=dt)
        cbv = convb.init(key, x128[:1])
        gn, _ = gn_silu(4)
        gv = gn.init(key, x128[:1])

        def s2d_res(x_):
            y = nn.silu(gn.apply(gv, convb.apply(cbv, x_)))
            y = nn.silu(gn.apply(gv, convb.apply(cbv, y)))
            return y + x_
        measure("s2d4 resblock 128ch (= 8ch full-res)", s2d_res, x128)

        heads = nn.Conv(32, (1, 1), dtype=dt)
        hv = heads.init(key, x128[:1])
        measure("s2d4 heads 128->32 1x1 (= 8->2)", lambda x_: heads.apply(
            hv, x_), x128)

        # s2d boundary: the once-per-iteration relayout in/out
        def to_s2d4(x_):
            b, h, w, c = x_.shape
            y = x_.reshape(b, h // 4, 4, w // 4, 4, c)
            return y.transpose(0, 1, 3, 5, 2, 4).reshape(
                b, h // 4, w // 4, c * 16)
        x33 = mkx(33)
        measure("s2d4 boundary in (33ch 576x800)", to_s2d4, x33)

        def from_s2d4(x_):
            b, h, w, c = x_.shape
            cc = c // 16
            y = x_.reshape(b, h, w, cc, 4, 4)
            return y.transpose(0, 1, 4, 2, 5, 3).reshape(
                b, h * 4, w * 4, cc)
        x32o = mkx(32, h4, w4)
        measure("s2d4 boundary out (2ch eq 576x800)", from_s2d4,
                mkx(32, h4, w4))

    # ---------------- section: enc -------------------------------------
    if "enc" in sections:
        print("## encoder convs: NHWC vs s2d4 equivalents")
        conv = nn.Conv(16, (3, 3), padding=1, dtype=dt)
        x = mkx(16)
        cv = conv.init(key, x[:1])
        measure("enc conv3x3 16->16 576x800", lambda x_: conv.apply(
            cv, x_), x)
        conv4 = nn.Conv(256, (3, 3), padding=1, dtype=dt)
        x4 = mkx(256, H // 4, W // 4)
        c4v = conv4.init(key, x4[:1])
        measure("s2d4 conv3x3 256->256 144x200 (= 16->16)",
                lambda x_: conv4.apply(c4v, x_), x4)

    # ---------------- section: feat ------------------------------------
    if "feat" in sections:
        print("## feature-net head convs: NHWC vs s2d2")
        BV, FH, FW = 20, 1152, 1600
        conv = nn.Conv(8, (3, 3), padding=1, dtype=dt)
        x = rng.rand(BV, FH, FW, 8).astype(np.float32)
        cv = conv.init(key, x[:1])
        measure("feat conv3x3 8->8 full-res", lambda x_: conv.apply(
            cv, x_), x)
        conv2 = nn.Conv(32, (3, 3), padding=1, dtype=dt)
        x2 = rng.rand(BV, FH // 2, FW // 2, 32).astype(np.float32)
        c2v = conv2.init(key, x2[:1])
        measure("s2d2 conv3x3 32->32 (= 8->8)", lambda x_: conv2.apply(
            c2v, x_), x2)
        conv44 = nn.Conv(128, (3, 3), padding=1, dtype=dt)
        x44 = rng.rand(BV, FH // 4, FW // 4, 128).astype(np.float32)
        c44v = conv44.init(key, x44[:1])
        measure("s2d4 conv3x3 128->128 (= 8->8)", lambda x_: conv44.apply(
            c44v, x_), x44)

    # ---------------- section: kern ------------------------------------
    if "kern" in sections:
        print("## pallas kernel: batched N=4 vs 4 unrolled N=1 calls")
        import jax.numpy as jnp
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tests"))
        from helpers import make_cams, stage_projs
        from diffmvs_tpu.ops.pallas.warp_corr import warp_corr_pallas

        for stage, hs, ws, c, d, wg, fullmul in (
                ("stage3", 576, 800, 16, 4, 0, 2),
                ("stage1", 144, 200, 48, 48, 8, 8)):
            cams = stage_projs(make_cams(2, hs * fullmul,
                                         ws * fullmul))[stage]
            rp = jnp.asarray(np.broadcast_to(cams[0], (4, 2, 4, 4)).copy())
            sp = jnp.asarray(np.broadcast_to(cams[1], (4, 2, 4, 4)).copy())
            src = jnp.asarray(rng.randn(4, hs, ws, c).astype(np.float32))
            ref = jnp.asarray(rng.randn(4, hs, ws, c).astype(np.float32))
            if stage == "stage1":
                planes = 1.0 / np.linspace(1 / 10.0, 1 / 4.0, d,
                                           dtype=np.float32)
                depths = jnp.asarray(np.broadcast_to(
                    planes.reshape(1, d, 1, 1), (4, d, hs, ws)).copy())
            else:
                base = 6.0 + 1.5 * rng.rand(4, 1, hs, ws).astype(np.float32)
                offs = (np.arange(d, dtype=np.float32) - d / 2) * 0.005
                depths = jnp.asarray(base + offs.reshape(1, d, 1, 1))

            measure(f"{stage} batched N=4 single call",
                    lambda s, r, a, b_, dd: warp_corr_pallas(
                        s, r, a, b_, dd, 8, window_group=wg),
                    src, ref, sp, rp, depths)
            measure(f"{stage} 4 x N=1 calls (shipped shape)",
                    lambda s, r, a, b_, dd: jnp.concatenate([
                        warp_corr_pallas(s[j:j + 1], r[j:j + 1],
                                         a[j:j + 1], b_[j:j + 1],
                                         dd[j:j + 1], 8, window_group=wg)
                        for j in range(4)]),
                    src, ref, sp, rp, depths)


if __name__ == "__main__":
    secs = sys.argv[1:] or ["gn", "res", "unet", "enc", "feat", "kern"]
    main(secs)
