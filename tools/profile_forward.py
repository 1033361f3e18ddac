"""Per-component device-time breakdown of the CasDiffMVS forward.

Measures each forward component at the bench configuration (B=4, DTU
1600x1152, N=5, bf16, Pallas warp) with the chained-scan methodology from
bench.py (the tunnel's per-call wall clocks lie): each component runs
`reps` times inside ONE jitted lax.scan with a data-dependent perturbation
so nothing is CSE'd, and we fetch a single scalar.

Usage (one jax process at a time against the TPU!):
    python tools/profile_forward.py                 # all components
    python tools/profile_forward.py full stage3     # a subset

Writes docs/perf_breakdown.md is manual: paste the printed table.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("OMP_NUM_THREADS", "1")

import numpy as np  # noqa: E402


def main(selected):
    import dataclasses

    import jax
    import jax.numpy as jnp

    os.makedirs("/root/.cache/jax_comp", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from diffmvs_tpu.config import CASDIFFMVS
    from diffmvs_tpu.models.schedule import DiffusionSchedule
    from diffmvs_tpu.models.stages import InitialStage, local_cost_volume
    from diffmvs_tpu.models.refine import RefinementStage
    from diffmvs_tpu.models.casdiffmvs import CasDiffMVS
    from diffmvs_tpu.nn.context import ContextNet
    from diffmvs_tpu.nn.feature import FeatureNet
    from diffmvs_tpu.geometry.upsample import upsample_with_mask
    from diffmvs_tpu.utils.synthetic import synthetic_inputs

    platform = jax.devices()[0].platform
    tpu = platform != "cpu"
    if tpu:
        B, H, W, ND, ND_INIT, REPS = 4, 1152, 1600, 384, 48, 4
    else:
        B, H, W, ND, ND_INIT, REPS = 1, 128, 160, 64, 16, 2
    V = 5
    # "b=8" in argv overrides the batch (the shipped bench default is
    # B=8 since r4 — match it when attributing the headline number)
    for tok in [s for s in selected if s.startswith("b=")]:
        B = int(tok.split("=")[1])
        selected.discard(tok)

    from diffmvs_tpu.config import tpu_optimized
    cfg = tpu_optimized(dataclasses.replace(
        CASDIFFMVS, numdepth_initial=ND_INIT, numdepth=ND,
        compute_dtype="bfloat16"))
    dt = cfg.dtype

    imgs, projs, depth_values = synthetic_inputs(B, V, H, W, ND)
    key = jax.random.PRNGKey(0)

    # fetch floor
    tiny = jax.jit(lambda k: jax.random.uniform(k).sum())
    float(tiny(key))
    t0 = time.perf_counter()
    for i in range(5):
        float(tiny(jax.random.fold_in(key, i)))
    floor = (time.perf_counter() - t0) / 5
    print(f"# fetch floor: {floor*1000:.1f} ms; platform={platform} "
          f"B={B} {W}x{H} N={V}", file=sys.stderr)

    results = {}

    def measure(name, apply_fn, *args, perturb_idx=0, reps=REPS,
                default=True):
        """apply_fn(*args) -> scalar-reducible pytree. args[perturb_idx]
        is perturbed by the carry each step (data dependence)."""
        if selected:
            if not any(s in name for s in selected) and "all" not in selected:
                return
        elif not default:
            return

        @jax.jit
        def chained(args):
            def body(acc, i):
                a = list(args)
                a[perturb_idx] = a[perturb_idx] + (acc * 1e-12).astype(
                    a[perturb_idx].dtype)
                out = apply_fn(*a)
                # reduce over EVERY leaf: reducing only one output lets
                # XLA dead-code-eliminate the rest of the component
                tot = jnp.float32(0.0)
                for leaf in jax.tree_util.tree_leaves(out):
                    tot = tot + leaf.astype(jnp.float32).mean()
                return acc + tot, None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                                  jnp.arange(reps))
            return acc

        args = jax.tree_util.tree_map(jnp.asarray, list(args))
        try:
            float(chained(args))                   # compile+warmup
            t0 = time.perf_counter()
            float(chained(args))
        except Exception as e:                     # e.g. HBM OOM at B=16
            results[name] = None
            print(f"{name:28s}    FAILED: {str(e)[:90]}")
            return
        ms = (time.perf_counter() - t0 - floor) / reps * 1000
        results[name] = ms
        print(f"{name:28s} {ms:9.2f} ms")

    # ---------------- feature / context nets --------------------------
    fnet = FeatureNet(base_channels=cfg.base_channels,
                      out_channels=cfg.feat_dim_stage, s2d=cfg.feature_s2d,
                      phase_opt=cfg.feature_phase_opt, dtype=dt)
    flat_imgs = imgs.reshape(B * V, H, W, 3)
    fvars = fnet.init(key, flat_imgs[:1], False)
    from diffmvs_tpu.nn.s2d import prepare_wexp
    fvars = prepare_wexp(fnet.apply, fvars, flat_imgs[:1], False)
    measure("feature_net(BV imgs)",
            lambda x: fnet.apply(fvars, x, False), flat_imgs)

    if cfg.feature_s2d and not cfg.feature_phase_opt:
        # A/B: the phase-optimized trunk (min-span kernels; bit-equal)
        fnet_p = FeatureNet(base_channels=cfg.base_channels,
                            out_channels=cfg.feat_dim_stage, s2d=True,
                            phase_opt=True, dtype=dt)
        fvars_p = prepare_wexp(fnet_p.apply, fvars, flat_imgs[:1], False)
        measure("feature_net(phase_opt)",
                lambda x: fnet_p.apply(fvars_p, x, False), flat_imgs)

    cnet = ContextNet(out_dim=cfg.ctx_out_dim,
                      s2d=cfg.context_s2d, dtype=dt)
    cvars = cnet.init(key, imgs[:1, 0], False)
    measure("context_net(B imgs)",
            lambda x: cnet.apply(cvars, x, False), imgs[:, 0])

    # ---------------- stage shapes ------------------------------------
    feats = jax.jit(lambda x: fnet.apply(fvars, x, False))(flat_imgs)
    feats = {k: np.asarray(v.reshape((B, V) + v.shape[1:]))
             for k, v in feats.items()}
    ctxs = jax.jit(lambda x: cnet.apply(cvars, x, False))(imgs[:, 0])
    ctxs = {k: np.asarray(v) for k, v in ctxs.items()}

    h1, w1 = H // 8, W // 8
    depth_hyp1 = np.broadcast_to(
        np.linspace(4.0, 10.0, ND_INIT, dtype=np.float32)
        .reshape(1, ND_INIT, 1, 1), (B, ND_INIT, h1, w1)).copy()

    # ---------------- stage 1: initialization -------------------------
    istage = InitialStage(group_dim=cfg.cost_dim_stage[0], up_ratio=2,
                          warp_kernel=cfg.warp_kernel,
                          stage1_s2d=cfg.stage1_s2d, dtype=dt)
    feat1 = [feats["stage1"][:, i] for i in range(V)]
    ctx1 = np.maximum(ctxs["stage1"], 0)
    scale_inv = lambda nd: (nd, 1.0 / (0.1 + 0.15 * nd))

    ivars = istage.init(key, [f[:1] for f in feat1], ctx1[:1],
                        projs["stage1"][:1], depth_hyp1[:1], scale_inv,
                        False)
    ivars = prepare_wexp(istage.apply, ivars, [f[:1] for f in feat1],
                         ctx1[:1], projs["stage1"][:1], depth_hyp1[:1],
                         scale_inv, False)
    measure("stage1_initial(total)",
            lambda f0, *rest: istage.apply(
                ivars, [f0] + list(rest[:V - 1]), rest[V - 1], rest[V],
                rest[V + 1], scale_inv, False),
            *feat1, ctx1, projs["stage1"], depth_hyp1)

    # stage-1 sub-pieces: the warp+correlate sweep vs the 3D regularizer
    from diffmvs_tpu.ops.correlation import warp_and_correlate
    from diffmvs_tpu.nn.costreg import CostRegNet

    def sweep(f0, f1, f2, f3, f4, proj, dhyp):
        cors = []
        for i, src in enumerate((f1, f2, f3, f4)):
            cors.append(warp_and_correlate(
                src, f0, proj[:, i + 1], proj[:, 0], dhyp,
                cfg.cost_dim_stage[0]))
        return jnp.stack(cors)
    measure("stage1_sweep_xla(4 views)", sweep, *feat1, projs["stage1"],
            depth_hyp1)

    creg = CostRegNet(base_channels=8, dtype=dt)
    agg1 = np.random.RandomState(0).rand(
        B, ND_INIT, h1, w1, cfg.cost_dim_stage[0]).astype(np.float32)
    crvars = creg.init(key, agg1[:1], False)
    measure("stage1_costreg3d",
            lambda x: creg.apply(crvars, x, False), agg1)

    # ---------------- refinement stages -------------------------------
    def refine_inputs(stage_idx):
        skey = f"stage{stage_idx + 1}"
        hs, ws = H // (2 ** (3 - stage_idx)), W // (2 ** (3 - stage_idx))
        feat = [feats[skey][:, i] for i in range(V)]
        ctx_full = ctxs[skey]
        hd = cfg.hidden_dim[stage_idx]
        hidden = np.tanh(np.random.RandomState(1).rand(
            B, H // 8, W // 8, hd).astype(np.float32)).astype(
                np.asarray(feat[0]).dtype)
        ctx = np.maximum(ctx_full[..., hd:], 0)
        inv = np.full((B, hs, ws), 0.5, np.float32)
        vw = np.random.RandomState(2).rand(V - 1, B, hs, ws).astype(
            np.float32)
        dmin = np.full((B,), 4.0, np.float32)
        dmax = np.full((B,), 10.0, np.float32)
        return feat, hidden, ctx, inv, vw, dmin, dmax, projs[skey]

    for stage_idx in (1, 2):
        feat, hidden, ctx, inv, vw, dmin, dmax, proj = refine_inputs(
            stage_idx)
        rstage = RefinementStage(
            unet_dim=cfg.unet_dim[stage_idx],
            dim_mults=cfg.unet_dim_mults[stage_idx],
            hidden_dim=cfg.hidden_dim[stage_idx],
            context_dim=cfg.context_dim[stage_idx],
            num_sample=cfg.cost_num[stage_idx],
            cost_dim=cfg.cost_dim_stage[stage_idx] * cfg.cost_num[stage_idx],
            group_dim=cfg.cost_dim_stage[stage_idx],
            depth_interval=(1.0 / ND) * cfg.depth_intervals_ratio[stage_idx],
            iters=cfg.stage_iters[stage_idx],
            up_ratio=cfg.up_ratio,
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
        rvars = prepare_wexp(rstage.apply, rvars, inv[:1], hidden[:1],
                             ctx[:1], [f[:1] for f in feat], proj[:1],
                             dmin[:1], dmax[:1], vw[:, :1],
                             rng=None, train=False)
        sname = f"stage{stage_idx + 1}"
        measure(f"{sname}_refine(3 iters)",
                lambda i_, h_, c_, *rest: rstage.apply(
                    rvars, i_, h_, c_, list(rest[:V]), rest[V],
                    rest[V + 1], rest[V + 2], rest[V + 3],
                    rng=None, train=False),
                inv, hidden, ctx, *feat, proj, dmin, dmax, vw,
                perturb_idx=0)

        # split: local cost volume alone (per iteration), pallas vs xla
        for wk in (cfg.warp_kernel, "xla"):
            def lcv(i_, f0, *rest, _si=stage_idx, _wk=wk):
                return local_cost_volume(
                    i_, [f0] + list(rest[:V - 1]), rest[V - 1],
                    (1.0 / ND) * cfg.depth_intervals_ratio[_si],
                    rest[V], rest[V + 1], cfg.cost_num[_si],
                    cfg.cost_dim_stage[_si], rest[V + 2],
                    confidence=i_, min_radius=cfg.min_radius,
                    max_radius=cfg.max_radius,
                    use_confidence=jnp.ones((), bool),
                    warp_kernel=_wk)[0]
            measure(f"{sname}_cost_volume({wk})", lcv,
                    inv, *feat, proj, dmin, dmax, vw, perturb_idx=0)
            if wk == "xla" == cfg.warp_kernel:
                break

    # ---------------- full model + final upsample ---------------------
    mask = np.random.RandomState(3).rand(
        B, H // 2, W // 2, 4 * 9).astype(np.float32)
    inv_half = np.full((B, H // 2, W // 2), 0.5, np.float32)
    measure("final_upsample_x2",
            lambda i_, m_: upsample_with_mask(i_, m_, 2), inv_half, mask)

    if any("FULL" in s for s in selected):
        model = CasDiffMVS(cfg)
        mvars = model.init(key, imgs[:1],
                           {k: v[:1] for k, v in projs.items()},
                           depth_values[:1], rng=None, train=False,
                           export=True)
        mvars = prepare_wexp(
            model.apply, mvars, imgs[:1],
            {k: v[:1] for k, v in projs.items()}, depth_values[:1],
            rng=None, train=False, export=True)
        # not in the default set: its chained-scan wrapper misses the
        # bench's compile-cache entry and a cold full-res compile costs
        # 15-45 min — run `python tools/profile_forward.py FULL` to opt
        # in, or read the full-forward time off bench.py (B / maps_per_s).
        measure("FULL_forward",
                lambda im, pj, dv: model.apply(
                    mvars, im, pj, dv, rng=None, train=False, export=True),
                imgs, projs, depth_values, default=False)

    print(json.dumps({k: round(v, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main(set(sys.argv[1:]))
