"""Train-step device-time attribution: forward vs backward vs optimizer.

bench.py --train gives one number; this splits it so kernel work on the
training path can be targeted (VERDICT r2 #3: carry the warp-kernel win
into training). Components, each timed with the chained-scan methodology
(see bench.py) at the training shape (B=4, 512x640, N=5, bf16 + remat):

  fwd        loss forward only (no grad)
  grad       jax.value_and_grad of the same loss (fwd + bwd)
  step       the full train step (grad + adamw update)

bwd cost ~= grad - fwd; optimizer ~= step - grad. Run per warp kernel:

    python tools/profile_train.py            # the shipped fast path
    python tools/profile_train.py xla        # the r2 XLA-warp baseline

One jax process at a time against the TPU.
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("OMP_NUM_THREADS", "1")

import numpy as np  # noqa: E402


def main(kernels):
    import dataclasses

    import jax
    import jax.numpy as jnp

    os.makedirs("/root/.cache/jax_comp", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from diffmvs_tpu.config import CASDIFFMVS, TrainConfig, tpu_optimized
    from diffmvs_tpu.models.casdiffmvs import CasDiffMVS
    from diffmvs_tpu.train.state import create_train_state
    from diffmvs_tpu.train.step import make_train_step
    from diffmvs_tpu.utils.synthetic import synthetic_inputs

    platform = jax.devices()[0].platform
    tpu = platform != "cpu"
    if tpu:
        b, h, w, nd, nd_init, reps = 4, 512, 640, 384, 48, 4
    else:
        b, h, w, nd, nd_init, reps = 1, 64, 96, 32, 8, 2

    key = jax.random.PRNGKey(0)
    tiny = jax.jit(lambda k: jax.random.uniform(k).sum())
    float(tiny(key))
    t0 = time.perf_counter()
    for i in range(5):
        float(tiny(jax.random.fold_in(key, i)))
    floor = (time.perf_counter() - t0) / 5
    print(f"# fetch floor {floor * 1000:.1f} ms", file=sys.stderr)

    for kern in kernels:
        kern, _, bwd = kern.partition(":")      # e.g. "fast:analytic"
        cfg_m = dataclasses.replace(
            CASDIFFMVS, numdepth_initial=nd_init, numdepth=nd,
            compute_dtype="bfloat16", remat=True)
        cfg_m = (tpu_optimized(cfg_m) if kern == "fast"
                 else dataclasses.replace(cfg_m, warp_kernel=kern))
        if bwd:
            cfg_m = dataclasses.replace(cfg_m, warp_bwd=bwd)
        cfg = TrainConfig(model=cfg_m, batch_size=b)
        model = CasDiffMVS(cfg_m)

        imgs, projs, depth_values = synthetic_inputs(b, 5, h, w, nd)
        gt = np.full((b, h, w), 6.0, np.float32)
        depth_ms = {f"stage{i+1}": gt[:, ::s, ::s].copy()
                    for i, s in enumerate((8, 4, 2, 1))}
        mask_ms = {k: np.ones_like(v) for k, v in depth_ms.items()}
        batch = {"imgs": imgs, "proj_matrices": projs,
                 "depth_values": depth_values, "depth": depth_ms,
                 "mask": mask_ms}
        state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                   batch, steps_per_epoch=100)
        batch = jax.tree_util.tree_map(jnp.asarray, batch)
        train_step = make_train_step(model, cfg, donate=False)

        from diffmvs_tpu.models.loss import compute_inverse_loss

        def loss_fn(params, batch, rng):
            outputs, _ = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["imgs"], batch["proj_matrices"],
                batch["depth_values"], depth_gt=batch["depth"], rng=rng,
                train=True, mutable=["batch_stats"])
            return compute_inverse_loss(
                outputs["depth"], outputs["conf"], batch["depth"],
                batch["mask"], batch["depth_values"],
                cfg.model.stage_iters, cfg.loss_rate, cfg.conf_weight)[0]

        variants = {}

        def chained_fwd(params, batch, k):
            def body(acc, i):
                l = loss_fn(params, batch, jax.random.fold_in(k, i))
                return acc + l, None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(reps))
            return acc
        variants["fwd"] = (jax.jit(chained_fwd),
                           lambda: (state.params, batch, key))

        def chained_grad(params, batch, k):
            def body(acc, i):
                l, g = jax.value_and_grad(loss_fn)(
                    params, batch, jax.random.fold_in(k, i))
                leaf = jax.tree_util.tree_leaves(g)[0]
                return acc + l + leaf.astype(jnp.float32).sum() * 1e-12, None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(reps))
            return acc
        variants["grad"] = (jax.jit(chained_grad),
                            lambda: (state.params, batch, key))

        def chained_step(st, batch, k):
            def body(carry, i):
                new_st, scalars, _ = train_step(
                    carry, batch, jax.random.fold_in(k, i))
                return new_st, scalars["loss"]
            st2, losses = jax.lax.scan(body, st, jnp.arange(reps))
            return losses[-1]
        variants["step"] = (jax.jit(chained_step),
                            lambda: (state, batch, key))

        results = {}
        for name, (fn, argf) in variants.items():
            args = argf()
            float(np.asarray(fn(*args)).ravel()[0])     # compile+warm
            t0 = time.perf_counter()
            float(np.asarray(fn(*args)).ravel()[0])
            ms = (time.perf_counter() - t0 - floor) / reps * 1000
            results[name] = ms
            print(f"{kern:6s} {name:5s}: {ms:8.1f} ms/step")
        print(f"{kern:6s} bwd ~= {results['grad'] - results['fwd']:.1f} ms, "
              f"optimizer ~= {results['step'] - results['grad']:.1f} ms, "
              f"samples/s = {b / (results['step'] / 1000):.2f}")


if __name__ == "__main__":
    ks = sys.argv[1:] or ["fast"]
    main(ks)
