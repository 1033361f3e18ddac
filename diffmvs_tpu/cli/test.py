"""Inference driver: depth/confidence export + point-cloud fusion.

Parity target: /root/reference/test.py — per-scene depth export
(.pfm + cam.txt + .jpg + conf maps) and per-dataset fusion dispatch with the
reference's hardcoded per-scene hyperparameters (now in config).
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def build_argparser():
    p = argparse.ArgumentParser(
        description="Depth export + fusion (TPU inference)")
    p.add_argument("--method", default="casdiffmvs",
                   choices=["casdiffmvs", "diffmvs"])
    p.add_argument("--preset", default=None,
                   help="model preset; defaults per --method/--dataset")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--loadckpt", default=None,
                   help=".ckpt (torch) or orbax checkpoint dir")
    p.add_argument("--outdir", default="./outputs")
    p.add_argument("--save_depth", action="store_true")
    p.add_argument("--dataset", default="general",
                   choices=["dtu", "tank", "eth3d", "general"])
    p.add_argument("--testpath")
    p.add_argument("--testlist")
    p.add_argument("--num_view", type=int, default=5)
    p.add_argument("--max_h", type=int, default=4800)
    p.add_argument("--max_w", type=int, default=6400)
    p.add_argument("--numdepth_initial", type=int, default=None)
    p.add_argument("--numdepth", type=int, default=384)
    p.add_argument("--warp_kernel", default="auto",
                   choices=["auto", "xla", "pallas", "pallas_full"],
                   help="plane-sweep backend; auto = fused Pallas kernel "
                        "on TPU (with a per-scene window-miss guard that "
                        "falls back to XLA), XLA gather elsewhere")
    p.add_argument("--geo_mask_thres", type=int, default=2)
    p.add_argument("--geo_pixel_thres", type=float, default=1.0)
    p.add_argument("--geo_depth_thres", type=float, default=0.01)
    p.add_argument("--photo_thres", nargs="+", type=float,
                   default=[0.3, 0.0, 0.0])
    p.add_argument("--workers", type=int, default=-1,
                   help="input-pipeline worker processes; -1 = one per "
                        "CPU core (the measured per-core decode ceiling "
                        "is ~6 view_sets/s — a 20 maps/s chip needs "
                        "3-4 cores feeding it; reference uses 2, "
                        "test.py:85). 0 = in-process loading.")
    p.add_argument("--seed", type=int, default=123)
    return p


def default_preset(method: str, dataset: str) -> str:
    if dataset == "dtu":
        return method
    if dataset == "tank":
        return f"{method}_tank"
    return f"{method}_mvg"


def save_scene_depth(args, cfg, testlist):
    """Export depth maps for the scenes in `testlist`
    (test.py:92-205)."""

    import dataclasses

    import jax

    from diffmvs_tpu.data.io import save_pfm, write_cam
    from diffmvs_tpu.data.mvs import MVSDataset
    from diffmvs_tpu.models.casdiffmvs import CasDiffMVS
    from diffmvs_tpu.train.step import make_infer_fn
    from PIL import Image

    from diffmvs_tpu.data.pipeline import DataPipeline

    from diffmvs_tpu.api import MISS_GUARD_THRESHOLD, resolve_warp_kernel
    from diffmvs_tpu.config import tpu_optimized

    # auto -> the judged bench configuration on TPU (fused Pallas kernel
    # on the refinement stages AND the stage-1 sweep, s2d conv layouts);
    # the per-scene miss guard below falls back to warp_kernel=xla where
    # the banded windows would drop samples (the s2d layouts are exact
    # and stay on)
    if args.warp_kernel == "auto":
        cfg = tpu_optimized(cfg)
    warp_kernel = (cfg.warp_kernel if args.warp_kernel == "auto"
                   else resolve_warp_kernel(args.warp_kernel))

    model = CasDiffMVS(cfg)         # params are warp-kernel independent
    infer_cache = {}

    def get_infer(kern):
        if kern not in infer_cache:
            m = CasDiffMVS(dataclasses.replace(cfg, warp_kernel=kern))
            infer_cache[kern] = make_infer_fn(m)
        return infer_cache[kern]

    variables = None
    times = []
    for scene in testlist:
        scene_kernel = warp_kernel
        ds = MVSDataset(args.testpath, args.num_view, args.numdepth,
                        dataset=args.dataset, scan=[scene],
                        max_h=args.max_h, max_w=args.max_w)
        # batch view-sets within a scene (all share one resolution). The
        # tail batch runs at its actual size: jit caches per shape, so
        # this costs at most one extra compile per (resolution, tail
        # size) — reused across every scene of the dataset — instead of
        # re-inferring padded duplicate samples on every scene's tail
        loader = DataPipeline(ds, args.batch_size, shuffle=False,
                              drop_last=False,
                              num_workers=args.workers)
        for batch_idx, batch in enumerate(loader):
            bsz = batch["imgs"].shape[0]
            imgs = batch["imgs"]
            projs = batch["proj_matrices"]
            depth_values = batch["depth_values"]

            if batch_idx == 0 and scene_kernel.startswith("pallas"):
                # per-scene window-miss guard: the banded kernel zeroes
                # samples outside its windows; on rigs where that would
                # drop real samples, fall back to the exact XLA path
                from diffmvs_tpu.ops.pallas.warp_corr import (
                    model_miss_fraction)

                import functools
                guard = jax.jit(functools.partial(
                    model_miss_fraction,
                    height=imgs.shape[2], width=imgs.shape[3],
                    stage_iters=cfg.stage_iters,
                    numdepth_initial=(cfg.numdepth_initial
                                      if scene_kernel == "pallas_full"
                                      else 0)))
                miss = float(guard(projs, depth_values))
                if miss > MISS_GUARD_THRESHOLD:
                    print(f"scene {scene or '<root>'}: banded-warp window "
                          f"miss {miss:.2%} > {MISS_GUARD_THRESHOLD:.2%} "
                          f"— falling back to warp_kernel=xla")
                    scene_kernel = "xla"
            infer = get_infer(scene_kernel)

            if variables is None:
                if args.loadckpt and args.loadckpt.endswith(".ckpt"):
                    from diffmvs_tpu.tools.torch_import import (
                        load_torch_checkpoint)
                    variables = load_torch_checkpoint(args.loadckpt, cfg)
                elif args.loadckpt:
                    # orbax checkpoint dir (or a train logdir: latest epoch)
                    from diffmvs_tpu.train.checkpoint import load_variables
                    variables = load_variables(args.loadckpt)
                else:
                    variables = model.init(
                        jax.random.PRNGKey(0), imgs[:1],
                        {k: v[:1] for k, v in projs.items()},
                        depth_values[:1], rng=None, train=False,
                        export=True)
                # hoist the inference weight prep out of every forward
                # (one DCE'd recording pass, nn/s2d.py)
                from diffmvs_tpu.nn.s2d import prepare_wexp
                variables = prepare_wexp(
                    model.apply, variables, imgs[:1],
                    {k: v[:1] for k, v in projs.items()},
                    depth_values[:1], rng=None, train=False, export=True)

            rng = jax.random.PRNGKey(args.seed + batch_idx)
            t0 = time.time()
            depth, confs = infer(variables, imgs, projs, depth_values, rng)
            depth = np.asarray(depth)
            confs = [np.asarray(c) for c in confs]
            elapsed = time.time() - t0
            times.append(elapsed / bsz)
            print(f"Iter {batch_idx}/{len(loader)}, Time:{elapsed:.3f} "
                  f"Res:{imgs.shape}")

            for j in range(bsz):
                filename = batch["filename"][j]
                depth_max = 1.0 / depth_values[j, 0]
                depth_min = 1.0 / depth_values[j, -1]
                cam = projs["stage4"][j, 0]

                def outpath(sub, ext, _f=filename):
                    path = os.path.join(args.outdir, _f.format(sub, ext))
                    os.makedirs(os.path.dirname(path), exist_ok=True)
                    return path

                save_pfm(outpath("depth_est", ".pfm"), depth[j])
                write_cam(outpath("cams", "_cam.txt"), cam, depth_max,
                          depth_min)
                img8 = (np.asarray(imgs[j, 0])
                        if imgs.dtype == np.uint8 else
                        np.clip(imgs[j, 0] * 255, 0, 255).astype(np.uint8))
                Image.fromarray(img8).save(outpath("images", ".jpg"))
                n_conf = 3 if args.method == "casdiffmvs" else 2
                for i in range(n_conf):
                    save_pfm(outpath(f"conf{i}", ".pfm"), confs[i][j])
    if times:
        print("avg_time", float(np.mean(times)))


def run_fusion(args, testlist):
    """Per-dataset fusion dispatch (test.py:300-368)."""
    from diffmvs_tpu.config import (
        ETH3D_GEO_MASK_THRES, ETH3D_GEO_PIXEL_THRES, TANK_PHOTO_THRES)
    from diffmvs_tpu.fusion.fuse import filter_depth, filter_depth_dynamic

    plypath = os.path.join(args.outdir, "pc")
    os.makedirs(plypath, exist_ok=True)

    if args.dataset == "general":
        filter_depth(args.testpath, args.outdir,
                     os.path.join(args.outdir, "pc.ply"),
                     args.geo_mask_thres, args.geo_pixel_thres,
                     args.geo_depth_thres, tuple(args.photo_thres),
                     args.method, args.dataset)
        return

    for scan in testlist:
        pair_folder = os.path.join(args.testpath, scan)
        out_folder = os.path.join(args.outdir, scan)
        if args.dataset == "dtu":
            scan_id = int(scan[4:])
            ply = os.path.join(plypath, f"mvs{scan_id:03d}_l3.ply")
            filter_depth(pair_folder, out_folder, ply, args.geo_mask_thres,
                         args.geo_pixel_thres, args.geo_depth_thres,
                         tuple(args.photo_thres), args.method, args.dataset)
        elif args.dataset == "tank":
            name = scan.split("/")[1]
            ply = os.path.join(plypath, f"{name}.ply")
            filter_depth_dynamic(name, pair_folder, out_folder, ply,
                                 TANK_PHOTO_THRES[name], args.method)
        elif args.dataset == "eth3d":
            ply = os.path.join(plypath, f"{scan}.ply")
            filter_depth(pair_folder, out_folder, ply,
                         ETH3D_GEO_MASK_THRES.get(scan, 1),
                         ETH3D_GEO_PIXEL_THRES.get(scan, 1.0),
                         args.geo_depth_thres, tuple(args.photo_thres),
                         args.method, args.dataset)


def main(argv=None):
    import dataclasses

    from diffmvs_tpu.config import MODEL_PRESETS

    args = build_argparser().parse_args(argv)
    if args.workers < 0:
        args.workers = os.cpu_count() or 1
    preset = args.preset or default_preset(args.method, args.dataset)
    cfg = MODEL_PRESETS[preset]
    if args.numdepth_initial:
        cfg = dataclasses.replace(cfg, numdepth_initial=args.numdepth_initial)
    cfg = dataclasses.replace(cfg, numdepth=args.numdepth)

    if args.dataset == "general" or not args.testlist:
        testlist = [""]
    else:
        with open(args.testlist) as f:
            testlist = [line.rstrip() for line in f.readlines()]

    if args.save_depth:
        save_scene_depth(args, cfg, testlist)
    run_fusion(args, testlist)


if __name__ == "__main__":
    main()
