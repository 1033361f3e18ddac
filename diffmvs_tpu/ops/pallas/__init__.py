"""Pallas TPU kernels.

`warp_corr.py` — the shipping fused plane-sweep warp + group-correlation
kernel (v2.2/v2.3 "rowbatch": double-buffered window DMAs, scalar-
prefetched window bases, per-(depth,row) band sub-slicing, all output
rows and depth chunks folded into single large vector ops, full-width
128-px tiles). It serves the refinement stages ("pallas") and the
stage-1 full sweep ("pallas_full", grouped windows) — see
docs/perf_breakdown.md for the measured history and
`model_miss_fraction` for the runtime banding guard.

(Superseded kernel iterations — the v1 warp-only kernel and the
rejected v3 fused-view-accumulation kernel — were deleted in round 5;
their designs and measurements remain in docs/perf_breakdown.md and
docs/pallas_warp_plan.md, recoverable from git history.)
"""
