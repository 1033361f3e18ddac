"""Train state: params + BN batch_stats + AdamW(grad-clip) optimizer.

Parity targets:
  AdamW(lr, wd, eps=1e-8)    — /root/reference/train.py:321-326
  clip_grad_norm_(2.0)       — /root/reference/train.py:208
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import core, struct
from flax.training import train_state


class MVSTrainState(train_state.TrainState):
    batch_stats: core.FrozenDict[str, Any] = struct.field(pytree_node=True)
    epoch: int = struct.field(pytree_node=True, default=0)


def make_optimizer(lr_schedule: Callable, weight_decay: float,
                   grad_clip: float = 2.0) -> optax.GradientTransformation:
    """Gradient clip -> AdamW. The reference decays every parameter (no BN
    exclusion), so we do too."""
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(lr_schedule, b1=0.9, b2=0.999, eps=1e-8,
                    weight_decay=weight_decay),
    )


def create_train_state(model, cfg, rng, sample_batch,
                       steps_per_epoch: int = 1000) -> MVSTrainState:
    """Initialize params on the host and build the optimizer.

    sample_batch: a pytree with imgs/proj_matrices/depth_values (+ depth,
    mask when training) on tiny shapes is fine — parameter shapes do not
    depend on image resolution.
    """
    from diffmvs_tpu.train.schedules import make_lr_schedule

    init_rng, diff_rng = jax.random.split(rng)
    variables = model.init(
        init_rng,
        sample_batch["imgs"],
        sample_batch["proj_matrices"],
        sample_batch["depth_values"],
        depth_gt=sample_batch.get("depth"),
        rng=diff_rng,
        train=sample_batch.get("depth") is not None,
    )
    lr = make_lr_schedule(cfg, steps_per_epoch)
    tx = make_optimizer(lr, cfg.weight_decay, cfg.grad_clip)
    return MVSTrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", core.FrozenDict()),
        tx=tx,
    )
