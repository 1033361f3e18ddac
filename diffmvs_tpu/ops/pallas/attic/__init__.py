"""Attic: superseded / negative-result Pallas kernels. NOT SHIPPING.

Nothing in the model or the CLIs imports from here; the shipping kernel
is diffmvs_tpu/ops/pallas/warp_corr.py (the v2.2/v2.3 rowbatch fused
warp+correlation kernel). These are kept, with their parity tests
(tests/test_pallas_attic.py), as documented engineering history:

  - warp_refine.py  — the round-1 v1 banded warp-only kernel (no fused
    correlation; per-(depth,row) gathers). Superseded by warp_corr.py,
    which removed the warped-volume HBM round-trip and batches all rows
    of a depth chunk into single large vector ops.
  - warp_corr_agg.py — the v3 fused view-accumulation kernel. MEASURED
    SLOWER than per-(view,sample) v2 calls on v5e (stage-3 cost volume
    203 vs 105 ms): the output-block read-modify-write between
    consecutive grid steps defeats Mosaic's cross-step pipelining.
"""
