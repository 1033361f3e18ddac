"""Mesh construction + sharding rules.

The reference's entire distributed story is single-process nn.DataParallel
(/root/reference/train.py:349-351). The TPU-native replacement:

  * a 2-D ("data", "space") jax.sharding.Mesh over ICI;
  * batch axis sharded over "data" (gradient all-reduce and global-batch
    sync-BN fall out of XLA SPMD partitioning);
  * image width sharded over "space" for resolutions that don't fit one
    chip's HBM — XLA inserts conv halo exchanges and gathers automatically;
  * parameters and optimizer state replicated (the model is ~1M params —
    sharding them would be pure overhead).

Everything goes through jit with NamedSharding-annotated inputs: no pmap,
no hand-written collectives in model code.

Multi-chip x Pallas: the fused warp+correlation kernel has no GSPMD
partitioning rule, so multi-chip TRAINING with warp_kernel="pallas*"
uses train/step.py:make_train_step_shmap — a jax.shard_map (manual
SPMD) step over the "data" axis where every device runs the whole model
(kernel included) on its local batch and gradients/BN stats are
pmean'd. Validated on the CPU mesh: the kernel under shard_map matches
the XLA path (tests/test_parallel.py) and the shard_map step trains.
The GSPMD step remains the default for warp_kernel="xla" and for
"space"-axis sharding (manual SPMD would need hand-written conv halos).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed() -> None:
    """Multi-host initialization (jax.distributed). Call once per process
    before any jax op when running multi-host TPU pods; a no-op for
    single-process runs or when the coordinator env isn't set."""
    import os

    if os.environ.get("COORDINATOR_ADDRESS") or os.environ.get(
            "JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def make_mesh(dp: int = -1, sp: int = 1, devices=None) -> Mesh:
    """dp=-1: use all devices / sp."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp == -1:
        assert n % sp == 0, f"{n} devices not divisible by sp={sp}"
        dp = n // sp
    assert dp * sp <= n, f"mesh {dp}x{sp} needs more than {n} devices"
    devices = devices[: dp * sp]
    arr = mesh_utils.create_device_mesh((dp, sp), devices=devices)
    return Mesh(arr, ("data", "space"))


def batch_sharding(mesh: Mesh, batch) -> dict:
    """Shardings for the standard batch pytree.

    imgs [B,V,H,W,3] -> (data, -, -, space, -); per-stage GT/mask maps
    [B,h,w] -> (data, -, space); small per-sample tensors -> (data,).
    """
    def spec_for(path_key: str, arr) -> P:
        if path_key == "imgs":
            return P("data", None, None, "space", None)
        if path_key in ("depth", "mask"):
            return P("data", None, "space")
        return P("data")

    out = {}
    for key, value in batch.items():
        if isinstance(value, dict):
            out[key] = {k: NamedSharding(mesh, spec_for(key, v))
                        for k, v in value.items()}
        else:
            out[key] = NamedSharding(mesh, spec_for(key, value))
    return out


def shard_batch(mesh: Mesh, batch):
    """Host numpy batch -> device arrays laid out per batch_sharding."""
    shardings = batch_sharding(mesh, batch)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), batch, shardings,
        is_leaf=lambda x: isinstance(x, (np.ndarray, jax.Array)))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params / train state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
