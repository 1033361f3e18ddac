"""Pallas TPU kernels (in progress).

The fused plane-sweep warp kernel — the profiled hot path — is specified in
docs/pallas_warp_plan.md together with the Mosaic primitives validated on
v5e (single-tile lane gathers via take_along_axis(axis=1), manual window
DMA with scalar-prefetched bases, MXU one-hot gathers). The XLA path in
diffmvs_tpu/geometry/sampling.py (corner-packed lane-axis gather) is the
current production implementation.
"""
