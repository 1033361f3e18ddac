"""Benchmark: CasDiffMVS depth-map inference throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "depth_maps/s/chip", "vs_baseline": N}

Baseline (BASELINE.md north star): >= 20 depth-maps/sec/chip on TPU v5e at
DTU eval resolution 1600x1152, N=5 views, full CasDiffMVS preset
(numdepth_initial=48, numdepth=384). vs_baseline = value / 20.
"""

import json
import os
import sys
import time

# keep CPU fallbacks usable
os.environ.setdefault("OMP_NUM_THREADS", "1")

import numpy as np


def main():
    import jax

    os.makedirs("/root/.cache/jax_comp", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from diffmvs_tpu.config import CASDIFFMVS
    from diffmvs_tpu.models.casdiffmvs import CasDiffMVS
    from __graft_entry__ import _synthetic_inputs

    platform = jax.devices()[0].platform
    # full DTU eval shape on accelerators; tiny shape on CPU smoke runs
    if platform == "cpu":
        h, w, cfg_nd, nd_init, iters = 128, 160, 64, 16, (2, 1)
    else:
        h, w, cfg_nd, nd_init, iters = 1152, 1600, 384, 48, (5, 20)

    import dataclasses
    cfg = dataclasses.replace(CASDIFFMVS, numdepth_initial=nd_init,
                              numdepth=cfg_nd)
    model = CasDiffMVS(cfg)

    imgs, projs, depth_values = _synthetic_inputs(1, 5, h, w, cfg.numdepth)
    variables = model.init(jax.random.PRNGKey(0), imgs, projs, depth_values,
                           rng=None, train=False, export=True)

    @jax.jit
    def infer(imgs, projs, depth_values, rng):
        out = model.apply(variables, imgs, projs, depth_values, rng=rng,
                          train=False, export=True)
        return out["depth"][-1], out["photometric_confidence"]

    rng = jax.random.PRNGKey(0)
    warmup, reps = iters
    for i in range(warmup):
        d, _ = infer(imgs, projs, depth_values, jax.random.fold_in(rng, i))
        d.block_until_ready()

    t0 = time.perf_counter()
    for i in range(reps):
        d, _ = infer(imgs, projs, depth_values,
                     jax.random.fold_in(rng, 100 + i))
        d.block_until_ready()
    elapsed = (time.perf_counter() - t0) / reps

    value = 1.0 / elapsed
    print(json.dumps({
        "metric": "casdiffmvs_dtu1600x1152_n5_inference_throughput",
        "value": round(value, 4),
        "unit": "depth_maps/s/chip",
        "vs_baseline": round(value / 20.0, 4),
    }))


if __name__ == "__main__":
    main()
