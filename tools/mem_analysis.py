#!/usr/bin/env python
"""Print the compiled bench forward's HBM memory analysis at a given
batch (default 16). The B=20/24/32 configs OOM at compile with two
batch-minor padded XLA temp copies (5-6x padding expansion —
docs/bench_r5.json); this shows how much of the CURRENT program's HBM
footprint is the same waste.

Usage: python tools/mem_analysis.py [batch]
"""

import dataclasses
import os
import sys

os.environ.setdefault("OMP_NUM_THREADS", "1")

import jax


def main(batch: int = 16):
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
    imgs, projs, depth_values = synthetic_inputs(batch, 5, 1152, 1600,
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

    fwd = jax.jit(lambda v, im, pj, dv: model.apply(
        v, im, pj, dv, rng=None, train=False, export=True)["depth"][-1])
    lowered = fwd.lower(variables, imgs, projs, depth_values)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    print(f"batch={batch}")
    if ma is None:
        print("memory_analysis unavailable on this backend")
        return
    for k in ("temp_size_in_bytes", "argument_size_in_bytes",
              "output_size_in_bytes", "alias_size_in_bytes",
              "generated_code_size_in_bytes"):
        v = getattr(ma, k, None)
        if v is not None:
            print(f"{k}: {v / 2**30:.3f} GiB")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16)
