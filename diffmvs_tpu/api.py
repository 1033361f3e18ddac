"""High-level inference API.

For users switching from the reference:

    import diffmvs_tpu.api as mvs

    runner = mvs.DepthRunner.from_torch_checkpoint(
        "casdiffmvs_dtu.ckpt", preset="casdiffmvs")
    depth, confidences = runner(imgs, proj_matrices, depth_values)

imgs: [B, V, H, W, 3] float32 in [0, 1] or raw uint8 (normalized on
device; ref view first); proj_matrices:
{stage1..4: [B, V, 2, 4, 4]} (extrinsic, intrinsic); depth_values: [B, ND]
inverse-depth linspace (see diffmvs_tpu.data.mvs for building these from a
scene folder).
"""

from __future__ import annotations

import dataclasses
import warnings
from typing import Optional, Tuple

import jax
import numpy as np

from diffmvs_tpu.config import MODEL_PRESETS, ModelConfig
from diffmvs_tpu.models.casdiffmvs import CasDiffMVS
from diffmvs_tpu.train.step import make_infer_fn

# guard threshold on the banded-warp window-miss fraction (shared with
# cli/test.py): above this, fall back to the exact XLA warp
MISS_GUARD_THRESHOLD = 1e-4


def resolve_warp_kernel(warp_kernel: str) -> str:
    """"auto" -> the judged fast path on TPU (fused Pallas warp+corr for
    the refinement stages AND the stage-1 sweep), exact XLA gather
    elsewhere. Mirrors cli/test.py's --warp_kernel auto."""
    if warp_kernel == "auto":
        return ("pallas_full" if jax.default_backend() == "tpu" else "xla")
    return warp_kernel


class DepthRunner:
    """Jitted export-mode inference on one device.

    warp_kernel: "auto" (default — resolve_warp_kernel), "xla",
    "pallas", "pallas_full", or None to use cfg.warp_kernel unchanged.
    Pallas kernels zero samples outside their banded windows, so every
    call is guarded: the jitted program also returns the window-miss
    fraction of its geometry (ops/pallas/warp_corr.model_miss_fraction),
    and when it exceeds `guard_threshold` the batch is transparently
    re-run through the exact XLA path (params are kernel-independent).
    The common case (DTU-style rigs measure miss = 0) costs only the
    scalar riding along with the outputs."""

    def __init__(self, cfg: ModelConfig, variables, seed: int = 0,
                 warp_kernel: Optional[str] = "auto",
                 guard_threshold: float = MISS_GUARD_THRESHOLD):
        if warp_kernel == "auto":
            # the full TPU fast path: pallas_full + s2d conv layouts
            from diffmvs_tpu.config import tpu_optimized
            cfg = tpu_optimized(cfg)
        elif warp_kernel is not None:
            cfg = dataclasses.replace(
                cfg, warp_kernel=resolve_warp_kernel(warp_kernel))
        self.cfg = cfg
        self.model = CasDiffMVS(cfg)
        self.variables = variables
        self.guard_threshold = guard_threshold
        self._guarded = cfg.warp_kernel.startswith("pallas")
        self._infer = (self._make_guarded_infer() if self._guarded
                       else make_infer_fn(self.model))
        self._infer_xla = None          # lazy fallback (guard trips)
        self._seed = seed
        self._prepared = False          # wexp weight prep (first call)

    # ------------------------------------------------------------------
    @classmethod
    def from_torch_checkpoint(cls, path: str, preset: str = "casdiffmvs",
                              warp_kernel: Optional[str] = "auto",
                              **overrides) -> "DepthRunner":
        """Load one of the reference's released .ckpt files."""
        from diffmvs_tpu.tools.torch_import import load_torch_checkpoint

        cfg = MODEL_PRESETS[preset]
        if overrides:
            cfg = dataclasses.replace(cfg, **overrides)
        variables = load_torch_checkpoint(path, cfg)
        return cls(cfg, variables, warp_kernel=warp_kernel)

    @classmethod
    def from_random(cls, preset: str = "casdiffmvs", image_hw=(512, 640),
                    views: int = 3, warp_kernel: Optional[str] = "auto",
                    **overrides) -> "DepthRunner":
        """Random-weight runner (smoke tests / benchmarking)."""
        cfg = MODEL_PRESETS[preset]
        if overrides:
            cfg = dataclasses.replace(cfg, **overrides)
        model = CasDiffMVS(cfg)
        h, w = image_hw
        from diffmvs_tpu.utils.synthetic import synthetic_inputs
        imgs, projs, dv = synthetic_inputs(1, views, h, w, cfg.numdepth)
        variables = model.init(jax.random.PRNGKey(0), imgs, projs, dv,
                               rng=None, train=False, export=True)
        return cls(cfg, variables, warp_kernel=warp_kernel)

    # ------------------------------------------------------------------
    def _make_guarded_infer(self):
        from diffmvs_tpu.ops.pallas.warp_corr import model_miss_fraction

        cfg, model = self.cfg, self.model

        def infer(variables, imgs, proj_matrices, depth_values, rng=None):
            outputs = model.apply(variables, imgs, proj_matrices,
                                  depth_values, rng=rng, train=False,
                                  export=True)
            miss = model_miss_fraction(
                proj_matrices, depth_values,
                height=imgs.shape[2], width=imgs.shape[3],
                stage_iters=cfg.stage_iters,
                numdepth_initial=(cfg.numdepth_initial
                                  if cfg.warp_kernel == "pallas_full"
                                  else 0))
            return (outputs["depth"][-1],
                    outputs["photometric_confidence"], miss)

        return jax.jit(infer)

    def __call__(self, imgs, proj_matrices, depth_values,
                 rng: Optional[jax.Array] = None
                 ) -> Tuple[np.ndarray, list]:
        """Returns (depth [B, H, W], [conf0.. full-res confidences])."""
        if rng is None:
            rng = jax.random.PRNGKey(self._seed)
        if not self._prepared:
            # hoist the inference weight prep (s2d expansion, WS
            # standardization, BN affines) out of every forward: one
            # DCE'd pass records the "wexp" collection (nn/s2d.py)
            from diffmvs_tpu.nn.s2d import prepare_wexp
            self.variables = prepare_wexp(
                self.model.apply, self.variables, imgs, proj_matrices,
                depth_values, rng=rng, train=False, export=True)
            self._prepared = True
        if not self._guarded:
            depth, confs = self._infer(self.variables, imgs, proj_matrices,
                                       depth_values, rng)
            return np.asarray(depth), [np.asarray(c) for c in confs]

        depth, confs, miss = self._infer(self.variables, imgs,
                                         proj_matrices, depth_values, rng)
        if float(miss) > self.guard_threshold:
            warnings.warn(
                f"banded-warp window miss {float(miss):.2%} > "
                f"{self.guard_threshold:.2%} on this rig geometry — "
                "re-running the batch through warp_kernel='xla'")
            if self._infer_xla is None:
                xla_model = CasDiffMVS(
                    dataclasses.replace(self.cfg, warp_kernel="xla"))
                self._infer_xla = make_infer_fn(xla_model)
            depth, confs = self._infer_xla(self.variables, imgs,
                                           proj_matrices, depth_values,
                                           rng)
        return np.asarray(depth), [np.asarray(c) for c in confs]
