"""High-level inference API.

For users switching from the reference:

    import diffmvs_tpu.api as mvs

    runner = mvs.DepthRunner.from_torch_checkpoint(
        "casdiffmvs_dtu.ckpt", preset="casdiffmvs")
    depth, confidences = runner(imgs, proj_matrices, depth_values)

imgs: [B, V, H, W, 3] float32 in [0, 1] (ref view first); proj_matrices:
{stage1..4: [B, V, 2, 4, 4]} (extrinsic, intrinsic); depth_values: [B, ND]
inverse-depth linspace (see diffmvs_tpu.data.mvs for building these from a
scene folder).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import numpy as np

from diffmvs_tpu.config import MODEL_PRESETS, ModelConfig
from diffmvs_tpu.models.casdiffmvs import CasDiffMVS
from diffmvs_tpu.train.step import make_infer_fn


class DepthRunner:
    """Jitted export-mode inference on one device."""

    def __init__(self, cfg: ModelConfig, variables, seed: int = 0):
        self.cfg = cfg
        self.model = CasDiffMVS(cfg)
        self.variables = variables
        self._infer = make_infer_fn(self.model)
        self._seed = seed

    # ------------------------------------------------------------------
    @classmethod
    def from_torch_checkpoint(cls, path: str, preset: str = "casdiffmvs",
                              **overrides) -> "DepthRunner":
        """Load one of the reference's released .ckpt files."""
        from diffmvs_tpu.tools.torch_import import load_torch_checkpoint

        cfg = MODEL_PRESETS[preset]
        if overrides:
            cfg = dataclasses.replace(cfg, **overrides)
        variables = load_torch_checkpoint(path, cfg)
        return cls(cfg, variables)

    @classmethod
    def from_random(cls, preset: str = "casdiffmvs", image_hw=(512, 640),
                    views: int = 3, **overrides) -> "DepthRunner":
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
        return cls(cfg, variables)

    # ------------------------------------------------------------------
    def __call__(self, imgs, proj_matrices, depth_values,
                 rng: Optional[jax.Array] = None
                 ) -> Tuple[np.ndarray, list]:
        """Returns (depth [B, H, W], [conf0.. full-res confidences])."""
        if rng is None:
            rng = jax.random.PRNGKey(self._seed)
        depth, confs = self._infer(self.variables, imgs, proj_matrices,
                                   depth_values, rng)
        return np.asarray(depth), [np.asarray(c) for c in confs]
