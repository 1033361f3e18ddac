#!/usr/bin/env python
"""Microbench: aggregate_native_cost epilogue relayout variants.

The round-5 B=16 trace (hwlogs/trace_stage3_b16_r5.txt) shows the
kernel-native -> NHWC cost relayout (warp_corr.py:987) at ~14 ms per
stage-3 call plus the num/den elementwise at ~30 ms — and the same
relayout is one of the two batch-minor padded copies (5.3x expansion)
that OOM the B=24 compile. Variants:

  v0      current: one 7-D transpose (0,1,4,2,6,5,3) + reshape
  v1      two-step: major-axis shuffle (minor dims (G,tile) unchanged)
          + merge (D,G) + clean (16,128) minor transpose + channel-perm
          gather to restore the g*D+d channel order
  v0_f32  v0 with the tensor in f32 (bf16 (16,128) tiling pads G=4 4x)

Each prints ms per call at the stage-3 B=16 shape; asserts
value-equality of every variant against v0 first.
"""

import json
import os
import time

os.environ.setdefault("OMP_NUM_THREADS", "1")

import jax
import jax.numpy as jnp
import numpy as np


def v0(agg, n, hb, rows, tt, tile, d, g, h, w):
    return (agg.transpose(0, 1, 4, 2, 6, 5, 3)
            .reshape(n, hb * rows, tt * tile, g * d)[:, :h, :w])


def v1(agg, n, hb, rows, tt, tile, d, g, h, w):
    # target channel c = g_*d + d_  ->  (d, g)-flat index d_*g + g_
    perm = np.array([(c % d) * g + (c // d) for c in range(g * d)])
    t1 = agg.transpose(0, 1, 4, 2, 3, 5, 6)      # [N,HB,rows,T,D,G,tile]
    m = t1.reshape(n, hb * rows, tt, d * g, tile)
    t2 = m.transpose(0, 1, 2, 4, 3)              # minor (16,128) swap
    out = t2.reshape(n, hb * rows, tt * tile, d * g)
    return out[:, :h, :w, jnp.asarray(perm)]


def bench_one(fn, args, reps=30):
    @jax.jit
    def chained(a):
        def body(carry, _):
            y = fn(carry, *args[1:])
            return a + (y[..., :1].mean() * 1e-12).astype(a.dtype), y.mean()
        _, ys = jax.lax.scan(body, a, jnp.arange(reps))
        return ys.sum()

    tiny = jax.jit(lambda v: v.sum() * 2)
    float(tiny(jnp.ones(())))
    t0 = time.perf_counter()
    for _ in range(5):
        float(tiny(jnp.ones(())))
    floor = (time.perf_counter() - t0) / 5
    float(chained(args[0]))
    t0 = time.perf_counter()
    float(chained(args[0]))
    return max(time.perf_counter() - t0 - floor, 1e-9) / reps


def main():
    os.makedirs("/root/.cache/jax_comp", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    n, hb, rows, tt, tile, d, g = 16, 36, 16, 7, 128, 4, 4
    h, w = 576, 800
    rng = np.random.RandomState(0)
    agg16 = jnp.asarray(rng.randn(n, hb, tt, d, rows, g, tile)
                        .astype(np.float32)).astype(jnp.bfloat16)
    agg32 = agg16.astype(jnp.float32)
    args16 = (agg16, n, hb, rows, tt, tile, d, g, h, w)
    args32 = (agg32, n, hb, rows, tt, tile, d, g, h, w)

    want = np.asarray(jax.jit(lambda a: v0(*(a,) + args16[1:]))(agg16),
                      dtype=np.float32)
    got = np.asarray(jax.jit(lambda a: v1(*(a,) + args16[1:]))(agg16),
                     dtype=np.float32)
    np.testing.assert_array_equal(got, want)
    print("# v1 == v0 exactly")

    for name, fn, args in (("epi_v0_bf16", v0, args16),
                           ("epi_v1_bf16", v1, args16),
                           ("epi_v0_f32", v0, args32),
                           ("epi_v1_f32", v1, args32)):
        ms = bench_one(fn, args) * 1e3
        print(json.dumps({"metric": name, "value": round(ms, 4),
                          "unit": "ms"}))


if __name__ == "__main__":
    main()
