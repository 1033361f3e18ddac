"""Micro-benchmark warp_corr_pallas variants on the TPU.

Chained-scan methodology (see bench.py): `reps` kernel calls inside one
jitted lax.scan with a data dependence through the depth hypotheses, one
scalar fetch. Prints ms per call for each (shape, rows, win_k,
window_group) variant plus the XLA gather path, and the banding miss
fraction of each variant (a variant is only usable where its miss is 0).

Usage:  PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_kernel.py
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

    from diffmvs_tpu.ops.correlation import warp_and_correlate
    from diffmvs_tpu.ops.pallas.warp_corr import (warp_corr_miss_fraction,
                                                  warp_corr_pallas)

    key = jax.random.PRNGKey(0)
    tiny = jax.jit(lambda k: jax.random.uniform(k).sum())
    float(tiny(key))
    t0 = time.perf_counter()
    for i in range(5):
        float(tiny(jax.random.fold_in(key, i)))
    floor = (time.perf_counter() - t0) / 5
    print(f"# fetch floor {floor * 1000:.1f} ms", file=sys.stderr)

    rng = np.random.RandomState(0)

    def setup(stage, hs, ws, c, d, sweep):
        full = {"stage1": 8, "stage2": 4, "stage3": 2}[stage]
        cams = make_cams(2, hs * full, ws * full)
        projs = stage_projs(cams)[stage]
        ref_pair = jnp.asarray(projs[0][None])
        src_pair = jnp.asarray(projs[1][None])
        src = jnp.asarray(rng.randn(1, hs, ws, c).astype(np.float32))
        ref = jnp.asarray(rng.randn(1, hs, ws, c).astype(np.float32))
        if sweep:
            planes = np.linspace(4.0, 10.0, d, dtype=np.float32)
            depths = jnp.asarray(np.broadcast_to(
                planes.reshape(1, d, 1, 1), (1, d, hs, ws)).copy())
        else:
            base = 6.0 + 1.5 * rng.rand(1, 1, hs, ws).astype(np.float32)
            offs = (np.arange(d, dtype=np.float32) - d / 2) * 0.005
            depths = jnp.asarray(base + offs.reshape(1, d, 1, 1))
        return src, ref, src_pair, ref_pair, depths

    def measure(label, fn, src, ref, sp, rp, depths, reps=20):
        @jax.jit
        def chained(src, ref, sp, rp, depths):
            def body(acc, i):
                out = fn(src, ref, sp, rp,
                         depths + (acc * 1e-12).astype(depths.dtype))
                return acc + out.astype(jnp.float32).mean(), None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(reps))
            return acc

        float(chained(src, ref, sp, rp, depths))
        t0 = time.perf_counter()
        float(chained(src, ref, sp, rp, depths))
        ms = (time.perf_counter() - t0 - floor) / reps * 1000
        print(f"{label:44s} {ms:8.2f} ms")
        return ms

    shapes = [
        ("stage3 refine 576x800 C16 D4", "stage3", 576, 800, 16, 4, False,
         [0]),
        ("stage2 refine 288x400 C32 D4", "stage2", 288, 400, 32, 4, False,
         [0]),
        ("stage1 sweep  144x200 C48 D48", "stage1", 144, 200, 48, 48, True,
         [8]),
    ]
    g = 8

    for name, stage, hs, ws, c, d, sweep, wgs in shapes:
        src, ref, sp, rp, depths = setup(stage, hs, ws, c, d, sweep)
        print(f"## {name}")
        measure("xla gather", lambda *a: warp_and_correlate(*a, g),
                src, ref, sp, rp, depths)
        for wg in wgs:
            for variant, kw in (
                    ("t128 rows=16 (default)", {}),
                    ("t128 rows=8", {"rows": 8}),
                    ("t128 rows=32", {"rows": 32}),
                    ("t64 rows=16", {"tile": 64}),
                    ("cap=8192 (dchunk 2x)", {"chunk_cap": 8192}),
                    ("packed rowbatch bf16", {"packed": True}),
                    ("packed + cap=8192", {"packed": True,
                                           "chunk_cap": 8192})):
                # mirror the exact geometry of the warp_corr_pallas call
                # below (rows/band/tile change window bases and band
                # offsets, so a defaults-computed miss would mislabel
                # the non-default variants)
                miss = float(jax.jit(
                    lambda s, a, b, dd, _wg=wg, _kw=kw:
                    warp_corr_miss_fraction(
                        s, a, b, dd, window_group=_wg,
                        rows=_kw.get("rows", 16),
                        band=_kw.get("band", 4),
                        win_w=_kw.get("win_w", 0),
                        tile=_kw.get("tile", 0))
                )(src, sp, rp, depths))
                label = f"pallas wg={wg} {variant} miss={miss:.4f}"
                sv = (jnp.asarray(src, jnp.bfloat16)
                      if kw.get("packed") else src)
                try:
                    measure(label,
                            lambda s, r, a, b, dd, _wg=wg, _kw=kw:
                            warp_corr_pallas(s, r, a, b, dd, g,
                                             window_group=_wg, **_kw),
                            sv, ref, sp, rp, depths)
                except Exception as e:
                    print(f"{label:44s} FAILED: {str(e)[:80]}")

        # backward modes: grad of a sum-loss through the kernel
        # (recompute = XLA-path vjp;
        # pallas = the banded backward kernel, warp_corr_bwd.py)
        for bwd in ("recompute", "pallas"):
            wg0 = wgs[0]

            def gfn(s, r, a, b, dd, _bwd=bwd, _wg=wg0):
                gs, gr = jax.grad(
                    lambda s2, r2: jnp.sum(warp_corr_pallas(
                        s2, r2, a, b, dd, g, window_group=_wg,
                        bwd=_bwd).astype(jnp.float32)),
                    argnums=(0, 1))(s, r)
                return gs.astype(jnp.float32).mean() + gr.astype(
                    jnp.float32).mean()

            try:
                measure(f"fwd+bwd ({bwd})", gfn, src, ref, sp, rp, depths)
            except Exception as e:
                print(f"fwd+bwd ({bwd}) FAILED: {str(e)[:80]}")


if __name__ == "__main__":
    main()
