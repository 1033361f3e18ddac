"""Training driver — parity: /root/reference/train.py.

Usage:
  python -m diffmvs_tpu.cli.train --mode train --dataset dtu \
      --trainpath /DTU --trainlist lists/dtu/train.txt \
      --testlist lists/dtu/val.txt --preset casdiffmvs --logdir ckpts/cas

The per-stage hyperparameter triplets live in config presets
(--preset diffmvs|casdiffmvs, overridable by the same triplet flags as the
reference for script compatibility).
"""

from __future__ import annotations

import argparse
import dataclasses
import os

import jax

from diffmvs_tpu.config import MODEL_PRESETS, ModelConfig, TrainConfig


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="DiffMVS/CasDiffMVS TPU trainer")
    p.add_argument("--mode", default="train", choices=["train", "test"])
    p.add_argument("--preset", default="casdiffmvs",
                   choices=sorted(MODEL_PRESETS.keys()))
    p.add_argument("--dataset", default="dtu")
    p.add_argument("--trainpath")
    p.add_argument("--testpath")
    p.add_argument("--trainlist")
    p.add_argument("--testlist")
    p.add_argument("--trainviews", type=int, default=5)
    p.add_argument("--testviews", type=int, default=5)
    p.add_argument("--epochs", type=int, default=16)
    p.add_argument("--train_epochs", type=int, default=-1)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--lr_sche", default="onecycle")
    p.add_argument("--lrepochs", default="10,12,14:2")
    p.add_argument("--wd", type=float, default=1e-3)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--accum_steps", type=int, default=1,
                   help="gradient-accumulation microbatches per step")
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--loadckpt", default=None)
    p.add_argument("--logdir", default="./checkpoints/debug")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--summary_freq", type=int, default=20)
    p.add_argument("--save_freq", type=int, default=1)
    p.add_argument("--eval_freq", type=int, default=1)
    p.add_argument("--conf_weight", type=float, default=0.05)
    p.add_argument("--workers", type=int, default=0,
                   help="input-pipeline worker processes (reference: 8)")
    p.add_argument("--dp", type=int, default=-1)
    p.add_argument("--sp", type=int, default=1)
    # model triplet overrides (reference flag compatibility)
    p.add_argument("--numdepth_initial", type=int)
    p.add_argument("--numdepth", type=int)
    p.add_argument("--scale", nargs="+", type=float)
    p.add_argument("--timesteps", nargs="+", type=int)
    p.add_argument("--sampling_timesteps", nargs="+", type=int)
    p.add_argument("--ddim_eta", nargs="+", type=float)
    p.add_argument("--hidden_dim", nargs="+", type=int)
    p.add_argument("--context_dim", nargs="+", type=int)
    p.add_argument("--stage_iters", nargs="+", type=int)
    p.add_argument("--cost_dim_stage", nargs="+", type=int)
    p.add_argument("--CostNum", nargs="+", type=int)
    p.add_argument("--unet_dim", nargs="+", type=int)
    p.add_argument("--min_radius", type=float)
    p.add_argument("--max_radius", type=float)
    return p


def model_config_from_args(args) -> ModelConfig:
    cfg = MODEL_PRESETS[args.preset]
    overrides = {}
    triplets = {
        "scale": "scale", "timesteps": "timesteps",
        "sampling_timesteps": "sampling_timesteps", "ddim_eta": "ddim_eta",
        "hidden_dim": "hidden_dim", "context_dim": "context_dim",
        "stage_iters": "stage_iters", "cost_dim_stage": "cost_dim_stage",
        "CostNum": "cost_num", "unet_dim": "unet_dim",
    }
    for flag, field in triplets.items():
        v = getattr(args, flag)
        if v is not None:
            overrides[field] = tuple(v)
    for flag in ("numdepth_initial", "numdepth", "min_radius", "max_radius"):
        v = getattr(args, flag)
        if v is not None:
            overrides[flag] = v
    return dataclasses.replace(cfg, **overrides).validate()


def train_config_from_args(args) -> TrainConfig:
    return TrainConfig(
        model=model_config_from_args(args),
        dataset=args.dataset, epochs=args.epochs,
        train_epochs=args.train_epochs, batch_size=args.batch_size,
        lr=args.lr, lr_sche=args.lr_sche, lrepochs=args.lrepochs,
        weight_decay=args.wd, train_views=args.trainviews,
        test_views=args.testviews, seed=args.seed,
        conf_weight=args.conf_weight, save_freq=args.save_freq,
        eval_freq=args.eval_freq, summary_freq=args.summary_freq,
        dp=args.dp, sp=args.sp, accum_steps=args.accum_steps,
    )


def main(argv=None):
    args = build_argparser().parse_args(argv)
    cfg = train_config_from_args(args)
    print("config:", cfg)

    from diffmvs_tpu.data.pipeline import DataPipeline
    from diffmvs_tpu.data.registry import find_dataset_def
    from diffmvs_tpu.models.casdiffmvs import CasDiffMVS
    from diffmvs_tpu.parallel.mesh import make_mesh, replicate
    from diffmvs_tpu.train.checkpoint import (
        load_weights_only, restore_checkpoint, save_checkpoint)
    from diffmvs_tpu.train.loop import run_training
    from diffmvs_tpu.train.state import create_train_state

    if args.testpath is None:
        args.testpath = args.trainpath

    dataset_cls = find_dataset_def(cfg.dataset)
    train_ds = dataset_cls(args.trainpath, args.trainlist, "train",
                           cfg.train_views, cfg.model.numdepth)
    val_ds = dataset_cls(args.testpath, args.testlist, "test",
                         cfg.test_views, cfg.model.numdepth)

    mesh = make_mesh(cfg.dp, cfg.sp)
    train_loader = DataPipeline(train_ds, cfg.batch_size, shuffle=True,
                                drop_last=True, mesh=mesh, seed=cfg.seed,
                                num_workers=args.workers)
    val_loader = DataPipeline(val_ds, cfg.batch_size, shuffle=False,
                              drop_last=False, mesh=mesh,
                              num_workers=args.workers)

    model = CasDiffMVS(cfg.model)
    sample = next(iter(DataPipeline(train_ds, 1)))
    state = create_train_state(model, cfg, jax.random.PRNGKey(cfg.seed),
                               sample, steps_per_epoch=len(train_loader))

    start_epoch = 0
    if args.resume:
        state, epoch = restore_checkpoint(args.logdir, state)
        if epoch is not None:
            start_epoch = epoch + 1
            print(f"resumed from epoch {epoch}")
    elif args.loadckpt:
        if args.loadckpt.endswith(".ckpt"):
            # torch checkpoint import
            from diffmvs_tpu.tools.torch_import import load_torch_checkpoint
            variables = load_torch_checkpoint(args.loadckpt, cfg.model)
            state = state.replace(params=variables["params"],
                                  batch_stats=variables["batch_stats"])
        else:
            state = load_weights_only(args.loadckpt, state)
        print(f"loaded weights from {args.loadckpt}")

    state = replicate(mesh, state)

    os.makedirs(args.logdir, exist_ok=True)
    if args.mode == "test":
        from diffmvs_tpu.train.loop import run_eval
        run_eval(model, cfg, state, val_loader, args.logdir)
    else:
        run_training(model, cfg, state, train_loader, val_loader, mesh,
                     args.logdir, start_epoch)


if __name__ == "__main__":
    main()
