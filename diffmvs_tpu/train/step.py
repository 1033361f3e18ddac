"""Jitted train / eval step functions.

Parity targets: train_sample (/root/reference/train.py:179-231) and
test_sample_depth (train.py:234-291) — loss, grad clip, AdamW step, and the
init/final absolute-depth-error metrics.

TPU design: one jitted function per phase; the device mesh enters through
in_shardings on the batch + replicated params (see diffmvs_tpu/parallel).
Gradient all-reduce and sync-BN fall out of XLA's SPMD partitioning — no
hand-written collectives in the step.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from diffmvs_tpu.models.loss import compute_inverse_loss
from diffmvs_tpu.utils.metrics import abs_depth_error


def make_train_step(model, cfg, donate: bool = True):
    """cfg: TrainConfig. Returns train_step(state, batch, rng).

    cfg.accum_steps > 1 runs gradient ACCUMULATION: the batch's leading
    dim is split into accum_steps microbatches processed sequentially
    under lax.scan (one live microbatch of activations at a time — the
    standard large-global-batch recipe when activations don't fit),
    gradients are averaged and applied in ONE optimizer update. BN
    batch statistics are per-microbatch (sequential EMA updates), the
    usual grad-accumulation semantics. The reference has no equivalent
    (nn.DataParallel only)."""

    def loss_fn(params, stats, mb, mrng):
        outputs, mutated = model.apply(
            {"params": params, "batch_stats": stats},
            mb["imgs"], mb["proj_matrices"],
            mb["depth_values"], depth_gt=mb["depth"], rng=mrng,
            train=True, mutable=["batch_stats"])
        loss, loss_dict = compute_inverse_loss(
            outputs["depth"], outputs["conf"], mb["depth"],
            mb["mask"], mb["depth_values"],
            cfg.model.stage_iters, cfg.loss_rate, cfg.conf_weight)
        return loss, (loss_dict, mutated["batch_stats"], outputs)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    accum = max(int(getattr(cfg, "accum_steps", 1)), 1)

    def train_step(state, batch, rng):
        if accum == 1:
            (loss, (loss_dict, new_stats, outputs)), grads = grad_fn(
                state.params, state.batch_stats, batch, rng)
        else:
            def split(x):
                return x.reshape((accum, x.shape[0] // accum)
                                 + x.shape[1:])

            micro = jax.tree_util.tree_map(split, batch)
            zero_g = jax.tree_util.tree_map(
                lambda p: jnp.zeros_like(p, dtype=jnp.float32),
                state.params)

            def body(carry, xs):
                stats, gacc, lacc = carry
                mb, i = xs
                (l, (ld, new_stats, outs)), g = grad_fn(
                    state.params, stats, mb, jax.random.fold_in(rng, i))
                gacc = jax.tree_util.tree_map(
                    lambda a, b: a + b.astype(jnp.float32), gacc, g)
                return (new_stats, gacc, lacc + l), (ld, outs)

            (new_stats, gsum, lsum), (lds, outs_seq) = jax.lax.scan(
                body, (state.batch_stats, zero_g, jnp.float32(0.0)),
                (micro, jnp.arange(accum)))
            grads = jax.tree_util.tree_map(lambda g: g / accum, gsum)
            loss = lsum / accum
            loss_dict = jax.tree_util.tree_map(lambda x: x.mean(), lds)
            # summaries/metrics from the LAST microbatch (cheap, and the
            # scalar loss above already covers the full global batch)
            outputs = jax.tree_util.tree_map(lambda x: x[-1], outs_seq)
            batch = jax.tree_util.tree_map(lambda x: x[-1], micro)

        new_state = state.apply_gradients(grads=grads,
                                          batch_stats=new_stats)

        depth_est = outputs["depth"][-1]
        depth_init = outputs["depth"][0]
        scalars = {
            "loss": loss,
            "depth_loss": loss_dict[f"l{len(outputs['depth']) - 1}"],
            "init_abs_depth_error": abs_depth_error(
                depth_init, batch["depth"]["stage1"],
                batch["mask"]["stage1"] > 0.5),
            "final_depth_error": abs_depth_error(
                depth_est, batch["depth"]["stage4"],
                batch["mask"]["stage4"] > 0.5),
            **loss_dict,
        }
        # image summaries (train.py:222-229); fetched lazily by the loop
        images = {
            "depth_est": depth_est * batch["mask"]["stage4"],
            "depth_est_nomask": depth_est,
            "depth_gt": batch["depth"]["stage4"],
            "errormap": jnp.abs(depth_est - batch["depth"]["stage4"])
            * batch["mask"]["stage4"],
        }
        if outputs["conf"]:
            images["confidence"] = outputs["conf"][-1]
        return new_state, scalars, images

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_train_step_shmap(model, cfg, mesh, donate: bool = True):
    """shard_map (manual-SPMD) variant of the train step over the mesh's
    "data" axis: each device computes its local-shard loss and gradients
    (the whole model — including the Pallas warp kernel, which has no
    GSPMD partitioning rule — runs on per-device batches), then
    gradients/scalars are pmean'd and the replicated optimizer update is
    applied identically on every device.

    Semantics vs the GSPMD step: BN batch statistics are per-shard and
    pmean-averaged into the replicated state — the reference's
    nn.DataParallel semantics (per-GPU stats), NOT global-batch sync-BN.
    The per-shard diffusion rng is folded with the device's axis index so
    shards draw independent noise. Requires sp == 1 (the "space" axis
    would need conv halo exchanges that manual SPMD doesn't insert)."""
    from jax.sharding import PartitionSpec as P

    assert mesh.shape.get("space", 1) == 1, \
        "shard_map step shards batch only; use the GSPMD step for sp > 1"

    def loss_fn(params, stats, mb, mrng):
        outputs, mutated = model.apply(
            {"params": params, "batch_stats": stats},
            mb["imgs"], mb["proj_matrices"],
            mb["depth_values"], depth_gt=mb["depth"], rng=mrng,
            train=True, mutable=["batch_stats"])
        loss, loss_dict = compute_inverse_loss(
            outputs["depth"], outputs["conf"], mb["depth"],
            mb["mask"], mb["depth_values"],
            cfg.model.stage_iters, cfg.loss_rate, cfg.conf_weight)
        return loss, (loss_dict, mutated["batch_stats"], outputs)

    def local_step(state, batch, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        (loss, (loss_dict, new_stats, outputs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats,
                                   batch, rng)
        grads = jax.lax.pmean(grads, "data")
        new_stats = jax.lax.pmean(new_stats, "data")
        loss = jax.lax.pmean(loss, "data")
        loss_dict = jax.lax.pmean(loss_dict, "data")
        new_state = state.apply_gradients(grads=grads,
                                          batch_stats=new_stats)
        depth_est = outputs["depth"][-1]
        scalars = {
            "loss": loss,
            "depth_loss": loss_dict[f"l{len(outputs['depth']) - 1}"],
            "final_depth_error": jax.lax.pmean(abs_depth_error(
                depth_est, batch["depth"]["stage4"],
                batch["mask"]["stage4"] > 0.5), "data"),
            **loss_dict,
        }
        images = {
            "depth_est": depth_est * batch["mask"]["stage4"],
            "depth_gt": batch["depth"]["stage4"],
        }
        return new_state, scalars, images

    shmap = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P("data"), P()),
        out_specs=(P(), P(), P("data")),
        check_vma=False)
    return jax.jit(shmap, donate_argnums=(0,) if donate else ())


def make_eval_step(model, cfg):
    """Validation step: DDIM eval branch with full intermediate lists
    (the reference's test_sample_depth — model.eval(), test=False)."""

    def eval_step(state, batch, rng):
        outputs = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["imgs"], batch["proj_matrices"], batch["depth_values"],
            rng=rng, train=False, export=False)
        loss, loss_dict = compute_inverse_loss(
            outputs["depth"], outputs["conf"], batch["depth"],
            batch["mask"], batch["depth_values"],
            cfg.model.stage_iters, cfg.loss_rate, cfg.conf_weight)

        depth_est = outputs["depth"][-1]
        scalars = {
            "loss": loss,
            "depth_loss": loss_dict[f"l{len(outputs['depth']) - 1}"],
            "init_abs_depth_error": abs_depth_error(
                outputs["depth"][0], batch["depth"]["stage1"],
                batch["mask"]["stage1"] > 0.5),
            "final_depth_error": abs_depth_error(
                depth_est, batch["depth"]["stage4"],
                batch["mask"]["stage4"] > 0.5),
            **loss_dict,
        }
        return scalars

    return jax.jit(eval_step)


def make_infer_fn(model):
    """Export-mode inference: returns (final_depth, [conf0..confN]) —
    the test.py save-depth path."""

    def infer(variables, imgs, proj_matrices, depth_values,
              rng: Optional[jax.Array] = None):
        outputs = model.apply(variables, imgs, proj_matrices, depth_values,
                              rng=rng, train=False, export=True)
        return (outputs["depth"][-1],
                outputs["photometric_confidence"])

    return jax.jit(infer)
