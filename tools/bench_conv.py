#!/usr/bin/env python
"""Isolated hot-conv microbench: XLA conv vs the fused Pallas kernel
(ops/pallas/conv2d.py) at the judged forward's actual conv shapes
(probed from FeatureNet under the tpu_optimized config — VERDICT r4:
the trace shows these running 3-7x off roofline under XLA).

Each timing jits a lax.scan chaining REPS calls + one scalar fetch
(CLAUDE.md: per-call wall clocks lie through the tunnel) and subtracts
the fetch floor. Prints one JSON line per (shape, impl).
"""

import argparse
import json
import os
import time

os.environ.setdefault("OMP_NUM_THREADS", "1")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

# (name, n, h, w, cin, cout, kh, kw, offset) — bench scale: 20 images
# of 1600x1152 through the s2d trunk (grid 290x402 after phase-opt
# pad), B-grid native quarter-res stacks, and the folded stage-3 head.
SHAPES = [
    ("trunk0_48_128", 20, 290, 402, 48, 128, 2, 2, (0, 0)),
    ("trunk1_128_128", 20, 290, 402, 128, 128, 2, 2, (0, 0)),
    ("trunk2_128_64", 20, 290, 402, 128, 64, 2, 2, (0, 0)),
    ("trunk3_64_64", 20, 290, 402, 64, 64, 2, 2, (0, 0)),
    ("bgrid_3x3_64_32", 20, 288, 400, 64, 32, 3, 3, None),
    ("bgrid_3x3_32_32", 20, 288, 400, 32, 32, 3, 3, None),
    ("cgrid_3x3_64_64", 20, 144, 200, 64, 64, 3, 3, None),
    ("fold3_3x3_129_64", 20, 288, 400, 129, 64, 3, 3, None),
    # the shipped fold3 after the ones->bias-map split (cin 128)
    ("fold3_3x3_128_64", 20, 288, 400, 128, 64, 3, 3, None),
]


def bench_one(fn, x, w, scale, shift, reps=20):
    @jax.jit
    def chained(x, w, scale, shift):
        def body(carry, _):
            y = fn(carry, w, scale, shift)
            # feed a scaled slice back so the scan can't collapse
            return x * (y[..., :1].mean() * 1e-6 + 1.0), y.mean()
        _, ys = jax.lax.scan(body, x, jnp.arange(reps))
        return ys.sum()

    tiny = jax.jit(lambda v: v.sum() * 2)
    float(tiny(jnp.ones(())))
    t0 = time.perf_counter()
    for _ in range(5):
        float(tiny(jnp.ones(())))
    floor = (time.perf_counter() - t0) / 5

    float(chained(x, w, scale, shift))      # compile+warm
    t0 = time.perf_counter()
    float(chained(x, w, scale, shift))
    return max(time.perf_counter() - t0 - floor, 1e-9) / reps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--rows", type=int, default=8,
                   help="pallas rows_per_step")
    p.add_argument("--variant", default="im2col",
                   help="pallas kernel variant: im2col | taps")
    p.add_argument("--only", default="",
                   help="substring filter on shape name")
    args = p.parse_args()

    os.makedirs("/root/.cache/jax_comp", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from diffmvs_tpu.ops.pallas.conv2d import conv2d_fused, conv2d_fused_ref

    backend = jax.devices()[0].platform
    rng = np.random.RandomState(0)
    for name, n, h, w, cin, cout, kh, kw, offset in SHAPES:
        if args.only and args.only not in name:
            continue
        if backend == "cpu":   # smoke scale
            n, h, w = 2, 32, 48
        x = jnp.asarray(rng.randn(n, h, w, cin).astype(np.float32),
                        jnp.bfloat16)
        wk = jnp.asarray(rng.randn(kh, kw, cin, cout).astype(np.float32)
                         * 0.05)
        scale = jnp.asarray(rng.rand(cout).astype(np.float32) + 0.5)
        shift = jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1)

        def xla_fn(x, w, s, b, offset=offset):
            return conv2d_fused_ref(x, w, s, b, offset=offset, relu=True)

        def pallas_fn(x, w, s, b, offset=offset):
            return conv2d_fused(x, w, s, b, offset=offset, relu=True,
                                rows_per_step=args.rows,
                                variant=args.variant,
                                interpret=(backend == "cpu"))

        flops = 2 * n * h * w * kh * kw * cin * cout
        hbm = (x.size + n * h * w * cout) * 2
        for impl, fn in (("xla", xla_fn), ("pallas", pallas_fn)):
            try:
                ms = bench_one(fn, x, wk, scale, shift,
                               reps=args.reps) * 1e3
            except Exception as e:  # noqa: BLE001 — report, keep going
                print(json.dumps({"metric": f"conv_{name}_{impl}",
                                  "error": repr(e)[:200]}))
                import traceback
                traceback.print_exc()
                continue
            print(json.dumps({
                "metric": f"conv_{name}_{impl}",
                "value": round(ms, 4), "unit": "ms",
                "mxu_sol_ms": round(flops / 197e12 * 1e3, 3),
                "hbm_sol_ms": round(hbm / 819e9 * 1e3, 3),
            }), flush=True)
        # numerics cross-check at the real shape (kernel-vs-XLA)
        try:
            a = np.asarray(pallas_fn(x, wk, scale, shift), np.float32)
            b = np.asarray(xla_fn(x, wk, scale, shift), np.float32)
            rel = float(np.abs(a - b).max() / (np.abs(b).max() + 1e-9))
            print(json.dumps({"metric": f"conv_{name}_parity",
                              "value": rel, "unit": "rel_err",
                              "pass": rel < 2e-2}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"metric": f"conv_{name}_parity",
                              "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
