"""Learning-rate schedules matching the reference's two options.

Parity targets:
  OneCycleLR(anneal='linear', pct_start=0.05) — /root/reference/train.py:372-376
  MultiStepLR('--lrepochs 10,12,14:2')        — /root/reference/train.py:367-371
"""

from __future__ import annotations

import optax


def onecycle_linear(total_steps: int, peak_lr: float, pct_start: float = 0.05,
                    div_factor: float = 25.0,
                    final_div_factor: float = 1e4):
    """torch OneCycleLR with linear annealing: warm from peak/div_factor to
    peak over pct_start, then anneal linearly to initial/final_div_factor.
    The reference sizes it to len(loader)*epochs + 100 steps."""
    init_lr = peak_lr / div_factor
    final_lr = init_lr / final_div_factor
    warm = max(1, int(total_steps * pct_start))
    return optax.join_schedules(
        [optax.linear_schedule(init_lr, peak_lr, warm),
         optax.linear_schedule(peak_lr, final_lr, total_steps - warm)],
        [warm])


def multistep(steps_per_epoch: int, base_lr: float, lrepochs: str):
    """'e1,e2,e3:gamma_inv' — divide lr by gamma_inv at those epochs."""
    epochs_part, gamma_part = lrepochs.split(":")
    milestones = [int(e) for e in epochs_part.split(",")]
    gamma = 1.0 / float(gamma_part)
    boundaries = {e * steps_per_epoch: gamma for e in milestones}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def make_lr_schedule(cfg, steps_per_epoch: int):
    """cfg: TrainConfig."""
    if cfg.lr_sche == "onecycle":
        return onecycle_linear(steps_per_epoch * cfg.epochs + 100, cfg.lr)
    if cfg.lr_sche == "mslr":
        return multistep(steps_per_epoch, cfg.lr, cfg.lrepochs)
    raise NotImplementedError(cfg.lr_sche)
