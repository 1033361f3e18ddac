"""Typed configuration for DiffMVS / CasDiffMVS on TPU.

Replaces the reference's duplicated argparse flag triplets
(/root/reference/train.py:17-90, /root/reference/test.py:20-77) and the
canonical hyperparameter sets scattered across
/root/reference/scripts/{train,test}/*.sh with frozen dataclasses + presets.

Per-stage hyperparameters are 3-tuples indexed by stage
(stage 0 = 1/8-res initialization, stage 1 = 1/4-res refinement,
stage 2 = 1/2-res refinement; stage_iters[2] == 0 selects the DiffMVS
variant, cf. /root/reference/models/diffusion.py:36).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

Triple = Tuple[float, float, float]
ITriple = Tuple[int, int, int]


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture + diffusion hyperparameters (static at trace time)."""

    # depth sampling
    numdepth_initial: int = 48     # hypotheses for the 1/8-res plane sweep
    numdepth: int = 384            # 1/numdepth = minimum inverse-depth interval

    # diffusion schedule per stage
    scale: Triple = (0.0, 0.5, 0.1)            # noise scale
    timesteps: ITriple = (1000, 1000, 1000)
    sampling_timesteps: ITriple = (1, 1, 1)    # DDIM steps at inference
    ddim_eta: Triple = (0.0, 1.0, 1.0)

    # per-stage net dims
    hidden_dim: ITriple = (0, 32, 20)          # GRU hidden state dims
    context_dim: ITriple = (32, 32, 16)        # context feature dims
    unet_dim: ITriple = (0, 16, 8)             # UNet base dims
    stage_iters: ITriple = (1, 3, 3)           # GRU iterations per stage
    cost_dim_stage: ITriple = (4, 4, 4)        # correlation groups G per stage
    cost_num: ITriple = (0, 4, 4)              # depth samples per refinement iter

    # confidence-adaptive hypothesis range (models/module.py:262-268)
    min_radius: float = 0.125
    max_radius: float = 8.0

    # depth interval ratio per stage (models/diffusion.py:15)
    depth_intervals_ratio: Triple = (4.0, 2.0, 1.0)

    # feature extractor dims (models/diffusion.py:40,77)
    base_channels: int = 8

    # compute dtype for the conv stacks ("float32" or "bfloat16"); geometry,
    # soft-argmax and the diffusion state always stay float32.
    compute_dtype: str = "float32"

    # rematerialize refinement iterations in the backward pass (trades
    # recompute for activation memory — jax.checkpoint per scan step)
    remat: bool = False

    # plane-sweep warp backend:
    #   "xla"         — corner-packed jnp.take gather (exact grid_sample
    #                   semantics everywhere; the general/CPU fallback)
    #   "pallas"      — fused warp+correlation Pallas kernel on the
    #                   REFINEMENT stages only (assumes locally-banded
    #                   sampling windows — exact for refinement
    #                   hypotheses; runtime-guarded via
    #                   ops/pallas/warp_corr.model_miss_fraction)
    #   "pallas_full" — also run the stage-1 full sweep through the
    #                   kernel (grouped windows). The judged bench
    #                   configuration: fastest on TPU since the v2.2
    #                   rowbatch kernel (docs/perf_breakdown.md); the
    #                   CLI/API resolve "auto" to this on TPU.
    # The dataclass default stays "xla" (safe everywhere); entry points
    # (cli/test.py, api.DepthRunner, bench.py) select the fast path.
    warp_kernel: str = "xla"

    # Backward mode of the Pallas warp kernel's custom_vjp:
    # "recompute" re-runs the exact XLA warp+corr under jax.vjp (the
    # proven default); "pallas" runs the banded Pallas backward kernel
    # (gather for d_ref + MXU one-hot-matmul scatter for d_src,
    # ops/pallas/warp_corr_bwd.py) — the fastest mode when the kernel
    # is on the training path (1.78 vs 1.47 samples/s,
    # docs/bench_r4.json). Both produce identical gradients on
    # guard-clean geometries (tests/test_gradients.py). A third
    # "analytic" XLA gather+scatter mode measured strictly worse
    # (0.68) and was removed in round 5.
    warp_bwd: str = "recompute"

    # Per-stage batched-glue mode of the Pallas kernel (shared operand
    # prep / window geometry / epilogue across the batch; hardware A/B,
    # docs/perf_breakdown.md: stage1 72->67.5 ms, stage2 67->64.7, but
    # stage3 REGRESSED 148->161 — so the deepest stage keeps per-sample
    # glue). Index = stage (initial, refine2, refine3).
    warp_glue: Tuple[bool, bool, bool] = (True, True, False)

    # Aggregate the per-view Pallas correlations in the kernel's native
    # [HB, T, D, rows, G, tile] layout (refinement stages): one relayout
    # after the weighted view mean instead of one 6-D transpose per
    # source view (ops/pallas/warp_corr.aggregate_native_cost). Bit-
    # identical values; A/B with bench.py --set warp_native_agg=False.
    warp_native_agg: bool = True

    # Concluded layout experiments (hardware-measured, flags removed):
    # warp_fold_views -0.6 maps/s (docs/bench_r4.json), warp_grid_launch
    # neutral and mask_s2d neutral (docs/bench_r5.json).

    # Run the refinement UNet + condition encoder in space-to-depth
    # layout (nn/s2d.py): identical math and parameters, but the
    # C=8-32 convs/norms/elementwise use all 128 TPU lanes instead of
    # 6-25%, and XLA stops inserting relayout copies between them
    # (measured: stage-3 UNet call 36.8 -> ~? ms, tools/bench_layout.py).
    unet_s2d: bool = False

    # Run the ConditionEncoder at s2d(2) instead of the UNet's factor:
    # at C=16 the s=4 expanded 3x3 pays ~7x MACs at full lanes while
    # s=2 pays ~1.8x at half lanes (~2x cheaper overall); one fused
    # one-hot repr-change conv re-lays the UNet seam (nn/s2d.py
    # s2d_change). 0 = match the UNet factor.
    encoder_s2d: int = 0

    # Same treatment for the FeatureNet's full/half-res trunk (C=3-16;
    # conv3x3 8ch at full res measured 9.5 -> 1.6 ms in s2d(4)).
    feature_s2d: bool = False

    # Phase-optimized feature trunk (inference-only; needs feature_s2d):
    # off-center window alignments + trimmed expanded kernels run the
    # trunk's 3x3s (and the first 5x5/2) at 2.25x fewer MXU MACs for
    # bit-identical math (nn/feature.py FeatureNet.phase_opt).
    feature_phase_opt: bool = False

    # Fold the FPN stage-3 head (inner2 1x1 + nearest-upsample + add +
    # out3 3x3) into ONE conv over concat([intra, c1, ones]) — removes
    # ~10 ms/forward of channel-duplication data movement and halves the
    # out3 contraction width; same params, same math modulo one f32
    # reassociation (nn/feature.py _fold_stage3_kernel). Needs
    # feature_s2d.
    feature_fold_head: bool = False

    # (feature_tail_s2d / context_tail_s2d — the 1/4-res FPN/context
    # tails on the s2d(2) grid — measured a WASH end-to-end at B=8
    # (17.90 vs 17.93, docs/bench_r4.json) and were removed.)

    # ...and for the stage-1 PixelViewWeight 3D convs (G=8 lanes).
    stage1_s2d: bool = False

    # (A fused Pallas conv+BN+ReLU kernel for the feature/context/UNet
    # conv stacks measured SLOWER than XLA on every production shape —
    # docs/bench_r5.json conv_war_final — and was deleted in round 5;
    # probe history in docs/perf_breakdown.md "the conv war".)

    # ...and for the ContextNet's full/half-res levels (C=8-16).
    context_s2d: bool = False

    # Unroll the refinement iterations inside the nn.scan body
    # (lax.scan unroll=iters): XLA then CSEs the loop-invariant weight
    # prep (s2d kernel expansion, weight standardization, GroupNorm
    # scale repeats) across iterations and can fuse across iteration
    # boundaries. Identical numerics; ~iters x larger refine-stage HLO
    # (the round-1 compile-time motivation for the scan), so the
    # dataclass default stays False and tpu_optimized turns it on.
    unroll_iters: bool = False

    @property
    def is_cascade(self) -> bool:
        """CasDiffMVS iff stage 2 runs refinement iterations."""
        return self.stage_iters[2] > 0

    @property
    def up_ratio(self) -> int:
        """Final convex-upsampling ratio (diffusion.py:38,75)."""
        return 2 if self.is_cascade else 4

    @property
    def feat_dim_stage(self) -> ITriple:
        """FPN output channels per stage (diffusion.py:40,77)."""
        return (48, 32, 16) if self.is_cascade else (48, 32, 0)

    @property
    def ctx_out_dim(self) -> ITriple:
        """ContextNet head dims = hidden + context per stage."""
        return tuple(h + c for h, c in zip(self.hidden_dim, self.context_dim))

    @property
    def unet_dim_mults(self):
        """UNet depth multiplier schedule per stage (diffusion.py:33)."""
        return ((1,), (1, 2), (1, 2, 4))

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    def validate(self) -> "ModelConfig":
        assert self.stage_iters[0] >= 1
        assert self.stage_iters[1] >= 1
        for s in (1, 2):
            if self.stage_iters[s] > 0:
                assert self.cost_num[s] >= 1, f"stage {s} needs cost samples"
                assert self.hidden_dim[s] > 0 and self.unet_dim[s] > 0
        return self


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    """Inference / benchmark-evaluation configuration (test.py:20-77)."""

    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    dataset: str = "general"       # dtu | tank | eth3d | general
    num_view: int = 5
    max_h: int = 4800
    max_w: int = 6400

    # fusion / post-processing
    geo_mask_thres: int = 2
    geo_pixel_thres: float = 1.0
    geo_depth_thres: float = 0.01
    photo_thres: Triple = (0.3, 0.0, 0.0)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training configuration (train.py:17-90 + scripts/train/*.sh)."""

    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    dataset: str = "dtu"
    epochs: int = 16
    train_epochs: int = -1          # early-stop epoch count (-1 = epochs)
    batch_size: int = 4
    lr: float = 1e-3
    lr_sche: str = "onecycle"       # onecycle | mslr
    lrepochs: str = "10,12,14:2"    # for mslr
    weight_decay: float = 1e-3
    train_views: int = 5
    test_views: int = 5
    seed: int = 123
    loss_rate: float = 0.9          # exponential loss weighting (train.py:197)
    conf_weight: float = 0.05       # confidence-loss weight (scripts)
    grad_clip: float = 2.0          # train.py:208
    save_freq: int = 1
    eval_freq: int = 1
    summary_freq: int = 20

    # parallelism: data-parallel and spatial axes of the device mesh
    dp: int = -1                    # -1 = all devices
    sp: int = 1

    # gradient accumulation: process the batch as accum_steps sequential
    # microbatches, average the gradients, apply ONE optimizer update —
    # large global batches without the activation memory (train/step.py)
    accum_steps: int = 1


# ---------------------------------------------------------------------------
# Canonical presets (scripts/train/*.sh, scripts/test/*.sh)
# ---------------------------------------------------------------------------

# DiffMVS: single refinement stage at 1/4 res, upsample x4.
DIFFMVS = ModelConfig(
    scale=(0.0, 0.5, 0.0),
    ddim_eta=(0.0, 1.0, 0.0),
    hidden_dim=(0, 32, 0),
    context_dim=(32, 32, 0),
    unet_dim=(0, 16, 8),
    stage_iters=(1, 4, 0),
    cost_dim_stage=(4, 4, 0),
    cost_num=(0, 6, 0),
    min_radius=0.25,
    max_radius=4.0,
)

# CasDiffMVS: cascade refinement at 1/4 then 1/2 res, upsample x2.
CASDIFFMVS = ModelConfig(
    scale=(0.0, 0.5, 0.1),
    ddim_eta=(0.0, 1.0, 1.0),
    hidden_dim=(0, 32, 20),
    context_dim=(32, 32, 16),
    unet_dim=(0, 16, 8),
    stage_iters=(1, 3, 3),
    cost_dim_stage=(4, 4, 4),
    cost_num=(0, 4, 4),
    min_radius=0.125,
    max_radius=8.0,
)

# BlendedMVS-finetuned noise scales used for T&T / ETH3D eval
CASDIFFMVS_MVG = dataclasses.replace(CASDIFFMVS, scale=(0.0, 0.125, 0.025))
DIFFMVS_MVG = dataclasses.replace(DIFFMVS, scale=(0.0, 0.125, 0.0))

# Tanks&Temples uses 96 initial hypotheses (scripts/test/test_tank*.sh)
CASDIFFMVS_TANK = dataclasses.replace(CASDIFFMVS_MVG, numdepth_initial=96)
DIFFMVS_TANK = dataclasses.replace(DIFFMVS_MVG, numdepth_initial=96)

def train_optimized(cfg: ModelConfig, backend: str = None) -> ModelConfig:
    """Training-path resolver: returns cfg UNCHANGED — the dataclass
    defaults (XLA warp, no s2d layouts) ARE the fastest measured
    training configuration. Hardware decision rows (docs/bench_r4.json,
    v5e, B=4 640x512): plain XLA 3.44 samples/s; the inference fast
    path (pallas_full + s2d) 1.78 best-case (bwd=pallas), 1.47
    (recompute), 0.68 (analytic); pallas warp without s2d 0.66. The
    s2d layouts pay s^2 x conv FLOPs in train mode (phase_opt must
    fall back for BN batch stats) and the banded warp backwards don't
    make it back. This function exists so entry points state the
    decision explicitly instead of silently relying on defaults."""
    return cfg


def tpu_optimized(cfg: ModelConfig, backend: str = None) -> ModelConfig:
    """Resolve the TPU fast path onto a preset: the fused Pallas
    warp+correlation kernel (runtime-guarded) and the s2d layouts for
    the UNet/encoder/feature trunk. On CPU the config is returned
    unchanged: the s2d expansion pays s^2 x conv FLOPs for a lane win
    that only exists on TPU, and the Pallas kernel would run
    interpret-mode. Entry points (cli/test.py, api.DepthRunner,
    bench.py, __graft_entry__) route "auto" through this."""
    if backend is None:
        import jax
        backend = jax.default_backend()
    if backend != "tpu":
        return cfg
    return dataclasses.replace(cfg, warp_kernel="pallas_full",
                               unet_s2d=True, feature_s2d=True,
                               feature_phase_opt=True, context_s2d=True,
                               feature_fold_head=True,
                               stage1_s2d=True, unroll_iters=True,
                               # measured positive at B=4 (15.38 vs
                               # 15.27) AND B=16 (20.95 vs 20.87) —
                               # docs/bench_r4.json + bench_r5.json
                               encoder_s2d=2)


MODEL_PRESETS = {
    "diffmvs": DIFFMVS,
    "casdiffmvs": CASDIFFMVS,
    "diffmvs_mvg": DIFFMVS_MVG,
    "casdiffmvs_mvg": CASDIFFMVS_MVG,
    "diffmvs_tank": DIFFMVS_TANK,
    "casdiffmvs_tank": CASDIFFMVS_TANK,
}

# Benchmark eval resolutions (datasets/mvs.py:30-34)
EVAL_RESOLUTIONS = {
    "dtu": (1600, 1152),     # (W, H)
    "tank": (1920, 1056),
    "eth3d": (1920, 1280),
}

# Per-scene fusion hyperparameters for Tanks&Temples (test.py:217-232,
# filter.py:273-293) and ETH3D (test.py:239-292), moved out of code.
TANK_PHOTO_THRES = {
    "Family": (0.8, 0.8, 0.95), "Francis": (0.3, 0.6, 0.6),
    "Horse": (0.15, 0.4, 0.8), "Lighthouse": (0.3, 0.8, 0.9),
    "M60": (0.7, 0.8, 0.95), "Panther": (0.3, 0.3, 0.95),
    "Playground": (0.3, 0.8, 0.9), "Train": (0.3, 0.6, 0.95),
    "Auditorium": (0.0, 0.0, 0.0), "Ballroom": (0.3, 0.3, 0.5),
    "Courtroom": (0.0, 0.2, 0.2), "Museum": (0.3, 0.3, 0.7),
    "Palace": (0.3, 0.3, 0.4), "Temple": (0.3, 0.5, 0.5),
}
TANK_DYNAMIC_PARAMS = {  # (dh_view_num, dist_div, rel_diff_div)
    "Family": (2, 12, 1600), "Francis": (9, 8, 1600), "Horse": (2, 4, 1300),
    "Lighthouse": (6, 8, 1600), "M60": (4, 8, 1600), "Panther": (3, 4, 1300),
    "Playground": (6, 8, 1600), "Train": (3, 4, 1600),
    "Auditorium": (2, 4, 1300), "Ballroom": (2, 4, 1300),
    "Courtroom": (2, 4, 1300), "Museum": (2, 4, 1300),
    "Palace": (2, 4, 1300), "Temple": (1, 4, 1500),
}
ETH3D_GEO_MASK_THRES = {
    "bridge": 2,
}  # default 1 for all other ETH3D scenes
ETH3D_GEO_PIXEL_THRES = {
    "courtyard": 0.5, "delivery_area": 0.5, "electro": 1, "facade": 1,
    "kicker": 1, "meadow": 2, "office": 2, "pipes": 2, "playground": 1,
    "relief": 1, "relief_2": 1, "terrace": 0.5, "terrains": 1,
    "botanical_garden": 1, "boulders": 0.5, "bridge": 0.5, "door": 0.5,
    "exhibition_hall": 0.5, "lecture_room": 0.5, "living_room": 0.5,
    "lounge": 2, "observatory": 1, "old_computer": 2, "statue": 1,
    "terrace_2": 0.5,
}
