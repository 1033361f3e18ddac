"""Capture a jax.profiler trace of one component and print per-op
self-times (the r2 recipe: the tunnel supports profiling; the trace json
carries per-op HLO names/shapes).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/trace_op.py unet_s2d
  PYTHONPATH=... python tools/trace_op.py unet
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

os.environ.setdefault("OMP_NUM_THREADS", "1")

import numpy as np  # noqa: E402


def parse_trace(logdir, top=40):
    paths = glob.glob(os.path.join(
        logdir, "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        print("no trace found under", logdir)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device-side complete events: pid of TPU core lanes; aggregate by name
    tot = defaultdict(float)
    cnt = defaultdict(int)
    pids_tpu = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if "TPU" in name or "Device" in name or "/device" in name:
                pids_tpu.add(e["pid"])
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in pids_tpu:
            continue
        name = e.get("name", "")
        if name.startswith("Thread") or name in ("", "unknown"):
            continue
        tot[name] += e.get("dur", 0) / 1000.0
        cnt[name] += 1
    total = sum(tot.values())
    print(f"# device total {total:.2f} ms over {sum(cnt.values())} events "
          f"({path})")
    for name, ms in sorted(tot.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{ms:9.3f} ms  x{cnt[name]:<4d} {name[:110]}")


def parse_trace_grouped(logdir, top=40):
    """Aggregate device self-time by (repo source line, hlo category)."""
    paths = glob.glob(os.path.join(
        logdir, "plugins/profile/*/*.trace.json.gz"))
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pids_tpu = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if "TPU" in name or "Device" in name or "/device" in name:
                pids_tpu.add(e["pid"])
    tot = defaultdict(float)
    cnt = defaultdict(int)
    grand = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in pids_tpu:
            continue
        args = e.get("args", {})
        cat = args.get("hlo_category", "")
        if not cat:        # skip enclosing jit/while wrappers
            continue
        src = args.get("source", "?")
        if "/diffmvs_tpu/" in src:
            src = src.split("/diffmvs_tpu/")[-1]
        key = (src, cat)
        ms = e.get("dur", 0) / 1000.0
        tot[key] += ms
        cnt[key] += 1
        grand += ms
    print(f"# grouped device self-time {grand:.1f} ms total ({path})")
    for (src, cat), ms in sorted(tot.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{ms:9.2f} ms  x{cnt[(src, cat)]:<5d} {cat:22s} {src}")


def trace_full():
    """Trace the full CasDiffMVS forward at the bench configuration."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    os.makedirs("/root/.cache/jax_comp", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from diffmvs_tpu.config import CASDIFFMVS, tpu_optimized
    from diffmvs_tpu.models.casdiffmvs import CasDiffMVS
    from diffmvs_tpu.utils.synthetic import synthetic_inputs

    cfg = tpu_optimized(dataclasses.replace(
        CASDIFFMVS, numdepth_initial=48, numdepth=384,
        compute_dtype="bfloat16"))
    model = CasDiffMVS(cfg)
    imgs, projs, depth_values = synthetic_inputs(4, 5, 1152, 1600,
                                                 cfg.numdepth)
    variables = model.init(jax.random.PRNGKey(0), imgs[:1],
                           {k: v[:1] for k, v in projs.items()},
                           depth_values[:1], rng=None, train=False,
                           export=True)
    from diffmvs_tpu.nn.s2d import prepare_wexp
    variables = prepare_wexp(
        model.apply, variables, imgs[:1],
        {k: v[:1] for k, v in projs.items()}, depth_values[:1],
        rng=None, train=False, export=True)

    @jax.jit
    def run(key, imgs, projs, depth_values):
        def body(acc, i):
            out = model.apply(variables, imgs, projs, depth_values,
                              rng=jax.random.fold_in(key, i),
                              train=False, export=True)
            return acc + out["depth"][-1].mean(), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(3))
        return acc

    key = jax.random.PRNGKey(0)
    imgs = jnp.asarray(imgs)
    projs = {k: jnp.asarray(v) for k, v in projs.items()}
    depth_values = jnp.asarray(depth_values)
    float(run(key, imgs, projs, depth_values))
    logdir = "/tmp/trace_full"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        float(run(key, imgs, projs, depth_values))
    parse_trace_grouped(logdir)


def trace_component(which, overrides: str = ""):
    """Trace one composed forward component at the bench configuration
    (stage2/stage3 refinement incl. pallas cost volumes, or the feature
    net) and print the grouped per-source-line attribution.
    overrides: comma-separated ModelConfig field=value pairs (same
    syntax as bench.py --set)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    os.makedirs("/root/.cache/jax_comp", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from diffmvs_tpu.config import CASDIFFMVS, tpu_optimized
    from diffmvs_tpu.models.schedule import DiffusionSchedule
    from diffmvs_tpu.models.refine import RefinementStage
    from diffmvs_tpu.nn.feature import FeatureNet
    from diffmvs_tpu.utils.synthetic import synthetic_inputs

    B, H, W, ND, V = int(os.environ.get("TRACE_B", "4")), 1152, 1600, 384, 5
    cfg = tpu_optimized(dataclasses.replace(
        CASDIFFMVS, numdepth_initial=48, numdepth=ND,
        compute_dtype="bfloat16"))
    if overrides:
        import ast as _ast
        kv = dict(p.split("=", 1) for p in overrides.split(","))
        cfg = dataclasses.replace(
            cfg, **{k: _ast.literal_eval(v) for k, v in kv.items()})
    dt = cfg.dtype
    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(0)
    imgs, projs, depth_values = synthetic_inputs(B, V, H, W, ND)

    if which == "feature":
        fnet = FeatureNet(base_channels=cfg.base_channels,
                          out_channels=cfg.feat_dim_stage,
                          s2d=cfg.feature_s2d,
                          phase_opt=cfg.feature_phase_opt,
                          fold_head=cfg.feature_fold_head,
                          dtype=dt)
        flat = jnp.asarray(imgs.reshape(B * V, H, W, 3))
        fvars = fnet.init(key, flat[:1], False)
        from diffmvs_tpu.nn.s2d import prepare_wexp
        fvars = prepare_wexp(fnet.apply, fvars, flat[:1], False)

        @jax.jit
        def run(x):
            def body(acc, i):
                out = fnet.apply(fvars,
                                 x + (acc * 1e-12).astype(x.dtype), False)
                tot = jnp.float32(0.0)
                for leaf in jax.tree_util.tree_leaves(out):
                    tot = tot + leaf.astype(jnp.float32).mean()
                return acc + tot, None
            return jax.lax.scan(body, jnp.float32(0.0),
                                jnp.arange(10))[0]

        float(run(flat))
        logdir = "/tmp/trace_feature"
        os.system(f"rm -rf {logdir}")
        with jax.profiler.trace(logdir):
            float(run(flat))
        parse_trace_grouped(logdir)
        return

    stage_idx = 2 if which == "stage3" else 1
    skey = f"stage{stage_idx + 1}"
    hs, ws = H // (2 ** (3 - stage_idx)), W // (2 ** (3 - stage_idx))
    c = cfg.feat_dim_stage[stage_idx]
    hd = cfg.hidden_dim[stage_idx]
    feat = [jnp.asarray(rng.rand(B, hs, ws, c).astype(np.float32))
            for _ in range(V)]
    hidden = jnp.asarray(np.tanh(
        rng.rand(B, H // 8, W // 8, hd).astype(np.float32)))
    ctx = jnp.asarray(np.maximum(
        rng.rand(B, hs, ws, cfg.context_dim[stage_idx]).astype(np.float32)
        - 0.2, 0))
    inv = jnp.full((B, hs, ws), 0.5, jnp.float32)
    vw = jnp.asarray(rng.rand(V - 1, B, hs, ws).astype(np.float32))
    dmin = jnp.full((B,), 4.0, jnp.float32)
    dmax = jnp.full((B,), 10.0, jnp.float32)
    proj = jnp.asarray(projs[skey])

    rstage = RefinementStage(
        unet_dim=cfg.unet_dim[stage_idx],
        dim_mults=cfg.unet_dim_mults[stage_idx],
        hidden_dim=hd, context_dim=cfg.context_dim[stage_idx],
        num_sample=cfg.cost_num[stage_idx],
        cost_dim=cfg.cost_dim_stage[stage_idx] * cfg.cost_num[stage_idx],
        group_dim=cfg.cost_dim_stage[stage_idx],
        depth_interval=(1.0 / ND) * cfg.depth_intervals_ratio[stage_idx],
        iters=cfg.stage_iters[stage_idx], up_ratio=cfg.up_ratio,
        schedule=DiffusionSchedule(
            timesteps=cfg.timesteps[stage_idx],
            sampling_timesteps=cfg.sampling_timesteps[stage_idx],
            eta=cfg.ddim_eta[stage_idx],
            scale=cfg.scale[stage_idx]),
        min_radius=cfg.min_radius, max_radius=cfg.max_radius,
        warp_kernel=cfg.warp_kernel, unet_s2d=cfg.unet_s2d,
        unroll=cfg.unroll_iters, dtype=dt)
    rvars = rstage.init(key, inv[:1], hidden[:1], ctx[:1],
                        [f[:1] for f in feat], proj[:1], dmin[:1],
                        dmax[:1], vw[:, :1], rng=None, train=False)
    from diffmvs_tpu.nn.s2d import prepare_wexp
    rvars = prepare_wexp(rstage.apply, rvars, inv[:1], hidden[:1],
                         ctx[:1], [f[:1] for f in feat], proj[:1],
                         dmin[:1], dmax[:1], vw[:, :1],
                         rng=None, train=False)

    @jax.jit
    def run(inv, hidden, ctx, feat, proj, dmin, dmax, vw):
        def body(acc, i):
            out = rstage.apply(
                rvars, inv + (acc * 1e-12).astype(inv.dtype), hidden,
                ctx, list(feat), proj, dmin, dmax, vw,
                rng=None, train=False)
            tot = jnp.float32(0.0)
            for leaf in jax.tree_util.tree_leaves(out):
                tot = tot + leaf.astype(jnp.float32).mean()
            return acc + tot, None
        return jax.lax.scan(body, jnp.float32(0.0), jnp.arange(5))[0]

    float(run(inv, hidden, ctx, tuple(feat), proj, dmin, dmax, vw))
    logdir = f"/tmp/trace_{which}"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        float(run(inv, hidden, ctx, tuple(feat), proj, dmin, dmax, vw))
    parse_trace_grouped(logdir, top=50)


def main(which):
    import jax
    import jax.numpy as jnp

    os.makedirs("/root/.cache/jax_comp", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from diffmvs_tpu.config import CASDIFFMVS
    from diffmvs_tpu.nn.unet import DiffusionUNet

    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    B, H, W = 4, 576, 800
    cfg = CASDIFFMVS
    s3 = 2
    hd, cd = cfg.hidden_dim[s3], cfg.context_dim[s3]
    mults = cfg.unet_dim_mults[s3]
    ds = 2 ** (len(mults) - 1)

    s2d = which.endswith("_s2d")
    unet = DiffusionUNet(dim=cfg.unet_dim[s3], hidden_dim=hd,
                         dim_mults=mults, s2d=s2d, dtype=dt)
    x = jnp.asarray(rng.rand(B, H, W, 2 * cd).astype(np.float32))
    hid = jnp.asarray(
        rng.rand(B, H // ds, W // ds, hd).astype(np.float32))
    t = jnp.zeros((B,), jnp.int32)
    uvars = DiffusionUNet(
        dim=cfg.unet_dim[s3], hidden_dim=hd, dim_mults=mults,
        dtype=dt).init(key, x[:1], hid[:1], t[:1])

    @jax.jit
    def run(x, hid, t):
        def body(acc, i):
            out = unet.apply(uvars, x + (acc * 1e-12).astype(x.dtype),
                             hid, t)
            return acc + out[1].astype(jnp.float32).mean(), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(10))
        return acc

    float(run(x, hid, t))                          # compile+warm
    logdir = f"/tmp/trace_{which}"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        float(run(x, hid, t))
    parse_trace(logdir)


if __name__ == "__main__":
    if sys.argv[1] == "parse":
        parse_trace(sys.argv[2])
    elif sys.argv[1] == "parse_grouped":
        parse_trace_grouped(sys.argv[2])
    elif sys.argv[1] == "full":
        trace_full()
    elif sys.argv[1] in ("stage2", "stage3", "feature"):
        # optional: --set field=value[,field=value] (bench.py syntax)
        ov = ""
        if len(sys.argv) > 3 and sys.argv[2] == "--set":
            ov = sys.argv[3]
        trace_component(sys.argv[1], ov)
    else:
        main(sys.argv[1])
