"""Full-model numerical parity: torch oracle -> importer -> flax forward.

Random-weight torch oracle (reference state_dict names), eval mode, zero
noise. Its exported depth maps and confidences must match our jitted
export forward through the checkpoint importer. This covers the entire
system: feature/context nets, plane-sweep + correlation + view weights,
3D regularization, soft-argmax + confidence, convex upsampling, hidden
init, condition encoder, GRU-UNet, DDIM wiring, and the importer itself.
"""

import dataclasses
import sys

import numpy as np
import jax
import pytest
import torch

from diffmvs_tpu.config import CASDIFFMVS, DIFFMVS
from diffmvs_tpu.models.casdiffmvs import CasDiffMVS
from diffmvs_tpu.tools.torch_import import import_torch_state_dict

sys.path.insert(0, "tests")
from helpers import make_batch  # noqa: E402
from torch_oracle import CasDiffMVSOracle  # noqa: E402


def _randomize_bn_stats(module, gen):
    for m in module.modules():
        if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)):
            m.running_mean.normal_(0, 0.5, generator=gen)
            m.running_var.uniform_(0.5, 1.5, generator=gen)


@pytest.mark.parametrize("preset", [CASDIFFMVS, DIFFMVS],
                         ids=["casdiffmvs", "diffmvs"])
def test_full_model_parity(preset):
    cfg = dataclasses.replace(preset, numdepth_initial=8, numdepth=32)

    torch.manual_seed(0)
    gen = torch.Generator().manual_seed(1)
    oracle = CasDiffMVSOracle(cfg)
    _randomize_bn_stats(oracle, gen)
    oracle.eval()

    batch = make_batch(np.random.RandomState(0), 1, 3, 64, 96, numdepth=32)
    imgs_t = torch.from_numpy(batch["imgs"]).permute(0, 1, 4, 2, 3)
    projs_t = {k: torch.from_numpy(v)
               for k, v in batch["proj_matrices"].items()}
    dv_t = torch.from_numpy(batch["depth_values"])

    with torch.no_grad():
        ref_depths, ref_confs = oracle(imgs_t, projs_t, dv_t)

    variables = import_torch_state_dict(oracle.state_dict(), cfg)
    model = CasDiffMVS(cfg)
    out = jax.jit(
        lambda v, b: model.apply(
            {"params": v["params"], "batch_stats": v["batch_stats"]},
            b["imgs"], b["proj_matrices"], b["depth_values"],
            rng=None, train=False, export=True)
    )(variables, batch)

    depths = [np.asarray(d) for d in out["depth"]]
    confs = [np.asarray(c) for c in out["photometric_confidence"]]

    # oracle emits [init, final_s, up_s] per stage; ours interleaves the
    # same values: [init, up0, s1_final, s1_up, (s2_final, s2_up)]
    assert len(confs) == len(ref_confs)

    # initial depth (pure plane-sweep path)
    np.testing.assert_allclose(
        depths[0], ref_depths[0].numpy(), rtol=5e-3, atol=5e-3)
    # stage-0 confidence
    np.testing.assert_allclose(
        confs[0], ref_confs[0].numpy(), rtol=5e-3, atol=5e-3)
    # upsampled initial depth
    np.testing.assert_allclose(
        depths[1], ref_depths[1].numpy(), rtol=5e-3, atol=5e-3)
    # final full-res depth after all refinement stages
    np.testing.assert_allclose(
        depths[-1], ref_depths[-1].numpy(), rtol=5e-3, atol=5e-3)
    # refinement confidences
    for c_ours, c_ref in zip(confs[1:], ref_confs[1:]):
        np.testing.assert_allclose(
            c_ours, c_ref.numpy(), rtol=5e-3, atol=5e-3)


@pytest.mark.slow
@pytest.mark.parametrize("preset", [CASDIFFMVS, DIFFMVS],
                         ids=["casdiffmvs", "diffmvs"])
def test_full_scale_parity(preset):
    """Benchmark-scale parity: 800x576, nd 384/48, N=5 — the DTU eval
    configuration at half linear resolution (README.md:165-170 north star
    is <0.5% mean rel-error vs the reference). Catches the
    resolution-dependent bug classes the 64x96 test cannot: padding at
    odd pyramid sizes, sampling-window misses, accumulation drift.
    Runs in minutes on CPU — marked slow (--run-slow)."""
    cfg = dataclasses.replace(preset, numdepth_initial=48, numdepth=384)
    h, w, v = 576, 800, 5

    torch.manual_seed(0)
    gen = torch.Generator().manual_seed(1)
    oracle = CasDiffMVSOracle(cfg)
    _randomize_bn_stats(oracle, gen)
    oracle.eval()

    batch = make_batch(np.random.RandomState(0), 1, v, h, w, numdepth=384)
    imgs_t = torch.from_numpy(batch["imgs"]).permute(0, 1, 4, 2, 3)
    projs_t = {k: torch.from_numpy(x)
               for k, x in batch["proj_matrices"].items()}
    dv_t = torch.from_numpy(batch["depth_values"])

    with torch.no_grad():
        ref_depths, ref_confs = oracle(imgs_t, projs_t, dv_t)

    variables = import_torch_state_dict(oracle.state_dict(), cfg)
    model = CasDiffMVS(cfg)
    out = jax.jit(
        lambda vv, bb: model.apply(
            {"params": vv["params"], "batch_stats": vv["batch_stats"]},
            bb["imgs"], bb["proj_matrices"], bb["depth_values"],
            rng=None, train=False, export=True)
    )(variables, batch)

    final = np.asarray(out["depth"][-1])
    ref_final = ref_depths[-1].numpy()
    rel = np.abs(final - ref_final) / np.abs(ref_final)
    assert rel.mean() < 0.005, f"mean rel-error {rel.mean():.2e}"
    # and much tighter in practice (same f32 weights, same math)
    np.testing.assert_allclose(final, ref_final, rtol=5e-3, atol=5e-3)
    for c_ours, c_ref in zip(
            [np.asarray(c) for c in out["photometric_confidence"]],
            ref_confs):
        np.testing.assert_allclose(c_ours, c_ref.numpy(),
                                   rtol=5e-3, atol=5e-3)
