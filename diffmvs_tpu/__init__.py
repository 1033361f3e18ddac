"""diffmvs_tpu — a TPU-native (JAX/XLA/Pallas) multi-view-stereo framework.

Re-designed from scratch with the capabilities of cvg/diffmvs (DiffMVS /
CasDiffMVS, TPAMI 2025): learned MVS depth estimation with a conditional
diffusion refinement model, plus dataset pipelines, point-cloud fusion and
SfM ingestion tooling.

Layering (cf. SURVEY.md §1):
  geometry/  — pure-jnp numeric core (plane-sweep warping, inverse-depth
               transforms, convex upsampling, hypothesis sampling)
  ops/       — TPU compute ops (fused warp+correlation, soft-argmax,
               Pallas kernels)
  nn/        — flax.linen building blocks (conv wrappers, FPN, context net,
               3D cost regularization, diffusion UNet, GRU)
  models/    — model orchestration (CasDiffMVS forward, diffusion engine,
               loss)
  data/      — datasets + codecs (PFM / cam.txt / pair.txt) + host pipeline
  parallel/  — device-mesh construction and sharding rules (dp × spatial)
  train/     — train state, optimizer, step functions, checkpointing
  fusion/    — on-device geometric/photometric consistency fusion + PLY
  tools/     — COLMAP ingestion, torch-checkpoint import
"""

__version__ = "0.1.0"

from diffmvs_tpu.config import (  # noqa: F401
    ModelConfig,
    EvalConfig,
    TrainConfig,
    DIFFMVS,
    CASDIFFMVS,
)
