"""A/B: batched vs per-sample kernel glue in warp_corr_pallas at n=4.

Round-3 open question (docs/perf_breakdown.md): the batched-glue refactor
(one shared operand prep / window geometry / epilogue for the whole batch,
per-sample pallas_call launches inside) improved stage1/stage2 isolated
costs but stage3 regressed 148 -> 161 ms. This measures the two glue modes
head-to-head at each stage's bench shape (B=4, bf16 packed sources, the
production path) so the per-stage winner can be gated in stages.py.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_glue_ab.py
"""

import os
import sys
import time

os.environ.setdefault("OMP_NUM_THREADS", "1")

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    os.makedirs("/root/.cache/jax_comp", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tests"))
    from helpers import make_cams, stage_projs

    from diffmvs_tpu.ops.pallas.warp_corr import warp_corr_pallas

    key = jax.random.PRNGKey(0)
    tiny = jax.jit(lambda k: jax.random.uniform(k).sum())
    float(tiny(key))
    t0 = time.perf_counter()
    for i in range(5):
        float(tiny(jax.random.fold_in(key, i)))
    floor = (time.perf_counter() - t0) / 5
    print(f"# fetch floor {floor * 1000:.1f} ms", file=sys.stderr)

    rng = np.random.RandomState(0)
    n, reps = 4, 12

    # (stage, hs, ws, c, d, sweep, wg): bench shapes at B=4
    shapes = [("stage3", 576, 800, 16, 4, False, 0),
              ("stage2", 288, 400, 32, 4, False, 0),
              ("stage1", 144, 200, 48, 48, True, 8)]
    for stage, hs, ws, c, d, sweep, wg in shapes:
        full = {"stage1": 8, "stage2": 4, "stage3": 2}[stage]
        cams = make_cams(2, hs * full, ws * full)
        projs = stage_projs(cams)[stage]
        rp = jnp.asarray(np.broadcast_to(projs[0], (n, 2, 4, 4)).copy())
        sp = jnp.asarray(np.broadcast_to(projs[1], (n, 2, 4, 4)).copy())
        src = jnp.asarray(rng.randn(n, hs, ws, c).astype(np.float32)
                          ).astype(jnp.bfloat16)
        ref = jnp.asarray(rng.randn(n, hs, ws, c).astype(np.float32)
                          ).astype(jnp.bfloat16)
        if sweep:
            planes = np.linspace(4.0, 10.0, d, dtype=np.float32)
            depths = jnp.asarray(np.broadcast_to(
                planes.reshape(1, d, 1, 1), (n, d, hs, ws)).copy())
        else:
            base = 6.0 + 1.5 * rng.rand(n, 1, hs, ws).astype(np.float32)
            offs = (np.arange(d, dtype=np.float32) - d / 2) * 0.005
            depths = jnp.asarray(base + offs.reshape(1, d, 1, 1))

        for glue in (True, False):
            def chained(k, dd, _glue=glue):
                def body(acc, i):
                    out = warp_corr_pallas(
                        src, ref, sp, rp,
                        dd + acc * 1e-12, 8, window_group=wg,
                        batch_glue=_glue)
                    return out.mean().astype(jnp.float32), None
                acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                                      jnp.arange(reps))
                return acc

            fn = jax.jit(chained)
            float(fn(key, depths))
            t0 = time.perf_counter()
            float(fn(jax.random.fold_in(key, 7), depths))
            ms = (time.perf_counter() - t0 - floor) / reps * 1000
            label = "batched-glue" if glue else "per-sample  "
            print(f"{stage} n={n} {label}: {ms:7.2f} ms/call")


if __name__ == "__main__":
    main()
