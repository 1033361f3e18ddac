"""Checkpoint-importer coverage test.

Synthesizes a torch state_dict with the reference's exact key names (learned
by running the importer's name map in a recording mode) and shapes (derived
from our flax tree by inverting the layout transforms), imports it, and
checks the result reproduces the flax tree exactly. This proves:
  * every flax parameter/stat is covered by the importer's name map;
  * the layout transforms are invertible/consistent;
  * no checkpoint tensor would be silently dropped.
Reference-name fidelity itself is audited via the file/line citations in
tools/torch_import.py; tests/test_full_parity.py checks numerics end-to-end.
"""

import dataclasses
import sys

import numpy as np
import jax
import pytest

from diffmvs_tpu.config import CASDIFFMVS, DIFFMVS
from diffmvs_tpu.models.casdiffmvs import CasDiffMVS
from diffmvs_tpu.tools import torch_import as ti

sys.path.insert(0, "tests")
from helpers import make_batch  # noqa: E402


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _invert_kernel(path, value):
    """our param -> torch tensor layout (inverse of the import transforms)."""
    name = path[-1]
    v = np.asarray(value)
    if name == "kernel" and v.ndim == 4:          # HWIO -> OIHW
        return np.transpose(v, (3, 2, 0, 1))
    if name == "kernel" and v.ndim == 5:
        if "conv6" in path or "conv7" in path:    # deconv: unflip + IO order
            w = np.transpose(v, (3, 4, 0, 1, 2))
            return w[:, :, ::-1, ::-1, ::-1].copy()
        return np.transpose(v, (4, 3, 0, 1, 2))   # DHWIO -> OIDHW
    if name == "kernel" and v.ndim == 2:          # dense [I,O] -> [O,I]
        return v.T
    return v


def _record_mapping(cfg, flat_params, flat_stats):
    """Run the importer's name map with sentinels; returns
    {param_path_or_('batch_stats',)+path: torch_key}."""
    recorded = {}

    class AlwaysHasKeys(dict):
        def __contains__(self, k):
            return True

        def __getitem__(self, k):
            # conv_bn sniffs ndim to pick 2D vs 3D; identical in recording
            return np.zeros((1, 1, 1, 1))

    class RecordingAssigner(ti._Assigner):
        def __init__(self):
            self.sd = AlwaysHasKeys()
            self.used = set()
            self.params = {}
            self.batch_stats = {}

        def take(self, torch_key):
            self.used.add(torch_key)
            return torch_key

        def _set(self, tree, path, torch_key):
            full = (("batch_stats",) + path if tree is self.batch_stats
                    else path)
            known = (full[1:] in flat_stats if full[0] == "batch_stats"
                     else full in flat_params)
            if not known and path[-1] == "bias":
                return  # optional torch bias our module doesn't have
            recorded[full] = torch_key

    # identity layout transforms during recording
    orig = (ti.conv2d_kernel, ti.conv3d_kernel, ti.deconv3d_kernel,
            ti.linear_kernel)
    ti.conv2d_kernel = ti.conv3d_kernel = ti.deconv3d_kernel = \
        ti.linear_kernel = lambda x: x
    try:
        a = RecordingAssigner()
        ti._import_featurenet(a, cfg.is_cascade)
        ti._import_contextnet(a, cfg.is_cascade)
        ti._import_initialcost(a)
        ti._import_hidden_init(a, cfg.is_cascade)
        ti._import_update_block(a, "update_block_depth2", 1, cfg)
        if cfg.is_cascade:
            ti._import_update_block(a, "update_block_depth3", 2, cfg)
    finally:
        (ti.conv2d_kernel, ti.conv3d_kernel, ti.deconv3d_kernel,
         ti.linear_kernel) = orig
    return recorded


@pytest.mark.parametrize("preset", [CASDIFFMVS, DIFFMVS],
                         ids=["casdiffmvs", "diffmvs"])
def test_import_roundtrip_covers_full_tree(preset):
    cfg = dataclasses.replace(preset, numdepth_initial=8, numdepth=32)
    model = CasDiffMVS(cfg)
    batch = make_batch(np.random.RandomState(0), 1, 3, 64, 96, numdepth=32)

    variables = model.init(jax.random.PRNGKey(0), batch["imgs"],
                           batch["proj_matrices"], batch["depth_values"],
                           rng=None, train=False, export=True)
    flat_params = _flatten(jax.device_get(variables["params"]))
    flat_stats = _flatten(jax.device_get(variables.get("batch_stats", {})))

    mapping = _record_mapping(cfg, flat_params, flat_stats)

    # importer must cover the full flax tree
    covered_p = {p for p in mapping if p[0] != "batch_stats"}
    covered_s = {p[1:] for p in mapping if p[0] == "batch_stats"}
    unknown = covered_p - set(flat_params)
    assert not unknown, f"importer writes unknown params: {sorted(unknown)[:6]}"
    missing = set(flat_params) - covered_p
    assert not missing, f"params not covered: {sorted(missing)[:6]}"
    missing_stats = set(flat_stats) - covered_s
    assert not missing_stats, f"stats not covered: {sorted(missing_stats)[:6]}"

    # synthesize the torch state_dict and round-trip it
    sd = {}
    for path, tkey in mapping.items():
        if path[0] == "batch_stats":
            sd[tkey] = np.asarray(flat_stats[path[1:]])
        else:
            sd[tkey] = _invert_kernel(path, flat_params[path])
    # torch checkpoints also carry num_batches_tracked + schedule buffers +
    # update_block ModuleList aliases; add representative extras
    for k in list(sd):
        if k.endswith(".running_mean"):
            sd[k.replace(".running_mean", ".num_batches_tracked")] = \
                np.asarray(0)
    sd["update_block_depth2.betas"] = np.zeros(cfg.timesteps[1], np.float32)
    sd["update_block.0.unet.final_conv.weight"] = \
        sd["update_block_depth2.unet.final_conv.weight"]

    imported = ti.import_torch_state_dict(sd, cfg)
    got_params = _flatten(imported["params"])
    got_stats = _flatten(imported["batch_stats"])
    for path, v in flat_params.items():
        np.testing.assert_array_equal(got_params[path], np.asarray(v),
                                      err_msg=str(path))
    for path, v in flat_stats.items():
        np.testing.assert_array_equal(got_stats[path], np.asarray(v),
                                      err_msg=str(path))
