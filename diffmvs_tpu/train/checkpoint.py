"""Orbax checkpointing with epoch-level resume.

Parity target: the reference's torch.save/load flow
(/root/reference/train.py:136-141, 330-344): a checkpoint per epoch in
logdir, `resume` loads the latest (with optimizer state), `loadckpt` loads
weights only (strict=False for the DiffMVS -> CasDiffMVS finetune).

Here a checkpoint stores the full train state (params, batch_stats,
opt_state, step, epoch) via orbax; `load_weights_only` merges params +
batch_stats into a fresh state, tolerating missing subtrees like torch's
strict=False.
"""

from __future__ import annotations

import os
import re
from typing import Optional

import jax
import orbax.checkpoint as ocp


def _ckpt_dir(logdir: str, epoch: int) -> str:
    return os.path.join(os.path.abspath(logdir), f"model_{epoch:06d}")


def save_checkpoint(logdir: str, state, epoch: int) -> str:
    path = _ckpt_dir(logdir, epoch)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"state": jax.device_get(state)}, force=True)
    ckptr.wait_until_finished()
    return path


def latest_epoch(logdir: str) -> Optional[int]:
    if not os.path.isdir(logdir):
        return None
    epochs = []
    for name in os.listdir(logdir):
        m = re.fullmatch(r"model_(\d{6})", name)
        if m:
            epochs.append(int(m.group(1)))
    return max(epochs) if epochs else None


def restore_checkpoint(logdir: str, state, epoch: Optional[int] = None):
    """Restore the full train state. epoch=None -> latest. Returns
    (state, epoch) or (state, None) if nothing to restore."""
    if epoch is None:
        epoch = latest_epoch(logdir)
    if epoch is None:
        return state, None
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(_ckpt_dir(logdir, epoch),
                             {"state": jax.device_get(state)})
    return restored["state"], epoch


def _merge(dst, src):
    """Recursively overlay src onto dst, ignoring keys absent in dst
    (strict=False semantics)."""
    if not isinstance(dst, dict) or not isinstance(src, dict):
        return src
    out = dict(dst)
    for k, v in src.items():
        if k in out:
            out[k] = _merge(out[k], v)
    return out


def _resolve_ckpt_path(path_or_logdir: str) -> str:
    path = path_or_logdir
    if not os.path.basename(path).startswith("model_"):
        ep = latest_epoch(path)
        if ep is None:
            raise FileNotFoundError(f"no checkpoints in {path}")
        path = _ckpt_dir(path, ep)
    return path


def load_variables(path_or_logdir: str):
    """Load inference variables ({params, batch_stats}) from an orbax
    checkpoint dir (or a logdir containing model_NNNNNN dirs) without a
    state template — the eval driver's restore path
    (reference: /root/reference/test.py:106-111)."""
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(_resolve_ckpt_path(path_or_logdir))
    src = restored["state"]
    variables = {"params": src["params"]}
    if src.get("batch_stats"):
        variables["batch_stats"] = src["batch_stats"]
    return variables


def load_weights_only(path_or_logdir: str, state):
    """Load params + batch_stats from a checkpoint into `state`, keeping the
    optimizer state fresh (the reference's --loadckpt)."""
    path = path_or_logdir
    if not os.path.basename(path).startswith("model_"):
        ep = latest_epoch(path)
        if ep is None:
            raise FileNotFoundError(f"no checkpoints in {path}")
        path = _ckpt_dir(path, ep)
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(path)
    src = restored["state"]
    params = _merge(jax.device_get(state.params), src["params"])
    stats = _merge(jax.device_get(state.batch_stats),
                   src.get("batch_stats", {}))
    return state.replace(params=params, batch_stats=stats)
