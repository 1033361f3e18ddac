"""Epoch training loop with validation, checkpointing and scalar logging.

Parity target: /root/reference/train.py:98-176 (train/test loops with
TensorBoard scalars, per-epoch checkpoints, eval passes).

Logging: JSONL scalars (logdir/scalars.jsonl) always; TensorBoard via
tensorboardX when available (the reference hard-depends on it; here it is
optional since image-summary support isn't needed for headless TPU runs).
"""

from __future__ import annotations

import json
import os
import time

import jax
import numpy as np

from diffmvs_tpu.train.checkpoint import save_checkpoint
from diffmvs_tpu.train.step import make_eval_step, make_train_step
from diffmvs_tpu.utils.metrics import DictAverageMeter


class ScalarLogger:
    """JSONL + optional TensorBoard scalar sink."""

    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        self._file = open(os.path.join(logdir, "scalars.jsonl"), "a")
        self._tb = None
        try:
            from tensorboardX import SummaryWriter  # optional
            self._tb = SummaryWriter(logdir)
        except Exception:
            pass

    def log(self, mode: str, scalars: dict, step: int):
        rec = {"mode": mode, "step": step,
               **{k: float(v) for k, v in scalars.items()}}
        self._file.write(json.dumps(rec) + "\n")
        self._file.flush()
        if self._tb is not None:
            for k, v in rec.items():
                if k not in ("mode", "step"):
                    self._tb.add_scalar(f"{mode}/{k}", v, step)


def run_eval(model, cfg, state, val_loader, logdir: str = None):
    """Eval-only pass over the validation loader (the reference's
    `--mode test` in train.py:165-176). Returns mean scalars."""
    eval_step = make_eval_step(model, cfg)
    rng = jax.random.PRNGKey(cfg.seed)
    meter = DictAverageMeter()
    for batch_idx, batch in enumerate(val_loader):
        t0 = time.time()
        scalars = eval_step(state, batch, jax.random.fold_in(rng, batch_idx))
        scalars = {k: float(v) for k, v in jax.device_get(scalars).items()}
        scalars["time"] = time.time() - t0
        meter.update(scalars)
    means = meter.mean()
    print("final", means)
    if logdir:
        ScalarLogger(logdir).log("eval", means, 0)
    return means


def run_training(model, cfg, state, train_loader, val_loader, mesh,
                 logdir: str, start_epoch: int = 0):
    logger = ScalarLogger(logdir)
    # the Pallas warp kernel has no GSPMD partitioning rule: on a
    # multi-device data-parallel mesh it trains through the manual-SPMD
    # shard_map step (parallel/mesh.py module docs)
    use_shmap = (mesh is not None and mesh.size > 1
                 and mesh.shape.get("space", 1) == 1
                 and cfg.model.warp_kernel != "xla")
    if use_shmap:
        from diffmvs_tpu.train.step import make_train_step_shmap

        train_step = make_train_step_shmap(model, cfg, mesh)
    else:
        train_step = make_train_step(model, cfg)
    eval_step = make_eval_step(model, cfg)

    rng = jax.random.PRNGKey(cfg.seed)
    total_epochs = cfg.epochs if cfg.train_epochs == -1 else cfg.train_epochs
    steps_per_epoch = len(train_loader)

    for epoch in range(start_epoch, total_epochs):
        print(f"Epoch {epoch}:")
        for batch_idx, batch in enumerate(train_loader):
            step_rng = jax.random.fold_in(rng, epoch * steps_per_epoch
                                          + batch_idx)
            t0 = time.time()
            state, scalars, images = train_step(state, batch, step_rng)
            global_step = epoch * steps_per_epoch + batch_idx
            if global_step % cfg.summary_freq == 0:
                scalars = jax.device_get(scalars)
                logger.log("train", scalars, global_step)
            if global_step % (50 * cfg.summary_freq) == 0:
                from diffmvs_tpu.utils.summaries import save_images
                save_images(logdir, "train", jax.device_get(images),
                            global_step, tb=logger._tb)
            print(f"Epoch {epoch}/{total_epochs}, Iter {batch_idx}/"
                  f"{steps_per_epoch}, loss = {float(scalars['loss']):.3f}, "
                  f"time = {time.time() - t0:.3f}")

        if (epoch + 1) % cfg.save_freq == 0:
            path = save_checkpoint(logdir, state, epoch)
            print(f"saved {path}")

        if epoch % cfg.eval_freq == 0 or epoch == total_epochs - 1:
            meter = DictAverageMeter()
            for batch_idx, batch in enumerate(val_loader):
                eval_rng = jax.random.fold_in(rng, 1_000_000 + batch_idx)
                scalars = eval_step(state, batch, eval_rng)
                meter.update(
                    {k: float(v) for k, v in jax.device_get(scalars).items()})
            means = meter.mean()
            logger.log("full_test", means,
                       (epoch + 1) * steps_per_epoch)
            print("eval:", means)

    return state
