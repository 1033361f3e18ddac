#!/usr/bin/env python
"""One-off XLA conv lowering probes for the round-4 conv war.

Hypotheses to kill/confirm on hardware, cheaply, before more kernel
surgery (each row is one jit + one timed run through the tunnel):
  1. fold3 (cin=129, 18 ms vs 1.1 ms floor) is a channel-alignment
     pathology: time the same conv at cin 129/136/144/192/256.
  2. Width alignment matters to XLA too: trunk1 at w 400/402/416.
  3. Small-cout convs (bgrid 32ch, 15x off floor): cout 32 vs 64 vs
     128 at fixed cin.
  4. f32 vs bf16 input for the worst case.

Usage: python tools/probe_conv.py [--only SUBSTR]
"""

import argparse
import json
import os
import time

os.environ.setdefault("OMP_NUM_THREADS", "1")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def timed(fn, *args, reps=20):
    @jax.jit
    def chained(*a):
        def body(c, _):
            y = fn(c, *a[1:])
            return a[0] * (y[..., :1].mean() * 1e-6 + 1.0), y.mean()
        _, ys = jax.lax.scan(body, a[0], jnp.arange(reps))
        return ys.sum()

    tiny = jax.jit(lambda v: v.sum() * 2)
    float(tiny(jnp.ones(())))
    t0 = time.perf_counter()
    for _ in range(5):
        float(tiny(jnp.ones(())))
    floor = (time.perf_counter() - t0) / 5
    float(chained(*args))
    t0 = time.perf_counter()
    float(chained(*args))
    return max(time.perf_counter() - t0 - floor, 1e-9) / reps


def conv(x, w):
    kh, kw = w.shape[:2]
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1),
        ((kh // 2, kh - 1 - kh // 2), (kw // 2, kw - 1 - kw // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def conv_split(x, w):
    """cin split into exact-128 halves: two convs + add. Tests whether
    slicing keeps XLA's cin==128 conv fast path (probe hypothesis 5)."""
    kh, kw = w.shape[:2]
    pad = ((kh // 2, kh - 1 - kh // 2), (kw // 2, kw - 1 - kw // 2))
    c = x.shape[-1]
    acc = None
    for lo in range(0, c, 128):
        y = jax.lax.conv_general_dilated(
            x[..., lo:lo + 128], w[:, :, lo:lo + 128].astype(x.dtype), (1, 1),
            pad, dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        acc = y if acc is None else acc + y
    return acc.astype(x.dtype)


CASES = [
    # (name, n, h, w, cin, cout, k, dtype)
    # -- round-4b: s2d(2)-grid shapes for the feature stage-2 tail --
    # conv2_1/conv2_2 (native 3x3 32->32 at 288x400) recast on the
    # 144x200 s2d(2) grid: 2x2 cin=cout=128 exactly
    ("sgrid_2x2_128_128", 20, 144, 200, 128, 128, 2, jnp.bfloat16),
    # out2 (3x3 64->32) on the s2d(2) grid: 2x2 cin256->cout128
    ("sgrid_2x2_256_128", 20, 144, 200, 256, 128, 2, jnp.bfloat16),
    # inner1 (1x1 32->64 native) on the s2d(2) grid
    ("sgrid_1x1_128_256", 20, 144, 200, 128, 256, 1, jnp.bfloat16),
    ("sgrid_3x3_64_64", 20, 144, 200, 64, 64, 3, jnp.bfloat16),
    # split-cin trick: does slicing to exact-128 halves keep the fast
    # path? compare vs fold3_c256 (15.2 ms) / sgrid_2x2_256_128
    ("split_3x3_256_64", 20, 288, 400, 256, 64, 3, jnp.bfloat16),
    ("split_2x2_256_128", 20, 144, 200, 256, 128, 2, jnp.bfloat16),
    # symmetric (centered) s2d expansions: 3x3 native -> 3x3 on-grid
    ("sgrid_3x3_128_128", 20, 144, 200, 128, 128, 3, jnp.bfloat16),
    ("split_3x3_256_128", 20, 144, 200, 256, 128, 3, jnp.bfloat16),
    ("fold3_c129", 20, 288, 400, 129, 64, 3, jnp.bfloat16),
    ("fold3_c136", 20, 288, 400, 136, 64, 3, jnp.bfloat16),
    ("fold3_c144", 20, 288, 400, 144, 64, 3, jnp.bfloat16),
    ("fold3_c192", 20, 288, 400, 192, 64, 3, jnp.bfloat16),
    ("fold3_c256", 20, 288, 400, 256, 64, 3, jnp.bfloat16),
    ("fold3_c128", 20, 288, 400, 128, 64, 3, jnp.bfloat16),
    ("fold3_c129_f32", 20, 288, 400, 129, 64, 3, jnp.float32),
    ("trunk1_w400", 20, 290, 400, 128, 128, 2, jnp.bfloat16),
    ("trunk1_w402", 20, 290, 402, 128, 128, 2, jnp.bfloat16),
    ("trunk1_w416", 20, 290, 416, 128, 128, 2, jnp.bfloat16),
    ("bgrid_cout32", 20, 288, 400, 32, 32, 3, jnp.bfloat16),
    ("bgrid_cout64", 20, 288, 400, 32, 64, 3, jnp.bfloat16),
    ("bgrid_cout128", 20, 288, 400, 32, 128, 3, jnp.bfloat16),
    ("bgrid_cin64_cout32", 20, 288, 400, 64, 32, 3, jnp.bfloat16),
    ("bgrid_c128_128", 20, 288, 400, 128, 128, 3, jnp.bfloat16),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--only", default="")
    p.add_argument("--reps", type=int, default=20)
    args = p.parse_args()

    os.makedirs("/root/.cache/jax_comp", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    rng = np.random.RandomState(0)
    for name, n, h, w, cin, cout, k, dtype in CASES:
        if args.only and args.only not in name:
            continue
        x = jnp.asarray(rng.randn(n, h, w, cin).astype(np.float32), dtype)
        wk = jnp.asarray(
            rng.randn(k, k, cin, cout).astype(np.float32) * 0.05)
        fn = conv_split if "split" in name else conv
        try:
            ms = timed(fn, x, wk, reps=args.reps) * 1e3
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"metric": f"probe_{name}",
                              "error": repr(e)[:160]}), flush=True)
            continue
        flops = 2 * n * h * w * k * k * cin * cout
        hbm = (x.size * x.dtype.itemsize + n * h * w * cout
               * x.dtype.itemsize)
        print(json.dumps({
            "metric": f"probe_{name}", "value": round(ms, 4),
            "unit": "ms", "mxu_sol_ms": round(flops / 197e12 * 1e3, 3),
            "hbm_sol_ms": round(hbm / 819e9 * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main()
