"""End-to-end CLI test: synthetic general scene -> depth export -> fusion.

Exercises cli.test's save_scene_depth + run_fusion on a tiny 3-view scene
(the reference's demo path, test.py + filter.py), producing depth/conf PFMs,
cam files, masks and a final PLY.
"""

import os
import sys

import numpy as np
import pytest
from PIL import Image

from diffmvs_tpu.data.io import read_pfm


def _make_scene(root, v=3, h=64, w=96):
    os.makedirs(root / "images")
    os.makedirs(root / "cams")
    k = np.array([[1.2 * w, 0, w / 2], [0, 1.2 * w, h / 2], [0, 0, 1]],
                 np.float32)
    for i in range(v):
        img = (np.random.RandomState(i).rand(h, w, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(root / "images" / f"{i:08d}.jpg")
        th = 0.04 * i
        e = np.eye(4, dtype=np.float32)
        e[:3, :3] = [[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                     [-np.sin(th), 0, np.cos(th)]]
        e[:3, 3] = [0.25 * i, 0.02 * i, 0]
        with open(root / "cams" / f"{i:08d}_cam.txt", "w") as f:
            f.write("extrinsic\n")
            for r in range(4):
                f.write(" ".join(str(e[r, c]) for c in range(4)) + "\n")
            f.write("\nintrinsic\n")
            for r in range(3):
                f.write(" ".join(str(k[r, c]) for c in range(3)) + "\n")
            f.write("\n4.0 0.05 128 10.0\n")
    with open(root / "pair.txt", "w") as f:
        f.write("3\n0\n2 1 10.0 2 5.0\n1\n2 0 10.0 2 5.0\n"
                "2\n2 0 10.0 1 5.0\n")


def test_cli_export_and_fusion_smoke(tmp_path):
    """Default-gate tiny-res version of test_cli_export_and_fusion: the
    same CLI seam (save_scene_depth + run_fusion, reference test.py +
    filter.py) at 32x64 / numdepth 4/16 so a regression in the export or
    fusion plumbing is caught without --run-slow."""
    from diffmvs_tpu.cli.test import main

    scene = tmp_path / "scene"
    scene.mkdir()
    _make_scene(scene, h=32, w=64)
    outdir = tmp_path / "out"

    main([
        "--dataset", "general", "--method", "casdiffmvs", "--save_depth",
        "--testpath", str(scene), "--outdir", str(outdir),
        "--numdepth_initial", "4", "--numdepth", "16",
        "--max_h", "32", "--max_w", "64",
        "--geo_mask_thres", "1", "--geo_pixel_thres", "8",
        "--geo_depth_thres", "0.5", "--photo_thres", "0", "0", "0",
    ])

    for i in range(3):
        depth, _ = read_pfm(str(outdir / "depth_est" / f"{i:08d}.pfm"))
        assert depth.shape == (32, 64)
        assert np.isfinite(depth).all()
        assert depth.min() >= 4.0 - 1e-2 and depth.max() <= 10.0 + 1e-1
    assert (outdir / "pc.ply").exists()
    from diffmvs_tpu.fusion.ply import read_ply
    xyz, _ = read_ply(str(outdir / "pc.ply"))
    assert xyz.shape[0] > 0 and np.isfinite(xyz).all()


@pytest.mark.slow
def test_cli_export_and_fusion(tmp_path):
    from diffmvs_tpu.cli.test import main

    scene = tmp_path / "scene"
    scene.mkdir()
    _make_scene(scene)
    outdir = tmp_path / "out"

    main([
        "--dataset", "general", "--method", "casdiffmvs", "--save_depth",
        "--testpath", str(scene), "--outdir", str(outdir),
        "--numdepth_initial", "8", "--numdepth", "32",
        "--max_h", "64", "--max_w", "96",
        "--geo_mask_thres", "1", "--geo_pixel_thres", "8",
        "--geo_depth_thres", "0.5", "--photo_thres", "0", "0", "0",
    ])

    for i in range(3):
        depth, _ = read_pfm(str(outdir / "depth_est" / f"{i:08d}.pfm"))
        assert depth.shape == (64, 96)
        assert np.isfinite(depth).all()
        assert depth.min() >= 4.0 - 1e-2 and depth.max() <= 10.0 + 1e-1
        for c in range(3):
            conf, _ = read_pfm(str(outdir / f"conf{c}" / f"{i:08d}.pfm"))
            assert conf.shape == (64, 96)
        assert (outdir / "cams" / f"{i:08d}_cam.txt").exists()
        assert (outdir / "images" / f"{i:08d}.jpg").exists()

    assert (outdir / "pc.ply").exists()
    from diffmvs_tpu.fusion.ply import read_ply
    xyz, rgb = read_ply(str(outdir / "pc.ply"))
    assert xyz.shape[0] > 0
    assert np.isfinite(xyz).all()


@pytest.mark.slow
def test_cli_eval_from_orbax_checkpoint(tmp_path):
    """Own-trainer checkpoint -> cli.test --loadckpt <orbax logdir> round
    trip (the reference's test.py:106-111 load path for own checkpoints)."""
    import dataclasses

    import jax

    from diffmvs_tpu.cli.test import main
    from diffmvs_tpu.config import CASDIFFMVS, TrainConfig
    from diffmvs_tpu.models.casdiffmvs import CasDiffMVS
    from diffmvs_tpu.train.checkpoint import save_checkpoint
    from diffmvs_tpu.train.state import create_train_state
    from diffmvs_tpu.utils.synthetic import synthetic_inputs

    model_cfg = dataclasses.replace(CASDIFFMVS, numdepth_initial=8,
                                    numdepth=32)
    model = CasDiffMVS(model_cfg)
    imgs, projs, depth_values = synthetic_inputs(1, 3, 64, 96, 32)
    sample = {"imgs": imgs, "proj_matrices": projs,
              "depth_values": depth_values}
    state = create_train_state(model, TrainConfig(model=model_cfg),
                               jax.random.PRNGKey(7), sample)
    logdir = tmp_path / "logs"
    save_checkpoint(str(logdir), state, epoch=0)

    scene = tmp_path / "scene"
    scene.mkdir()
    _make_scene(scene)
    outdir = tmp_path / "out"

    main([
        "--dataset", "general", "--method", "casdiffmvs", "--save_depth",
        "--testpath", str(scene), "--outdir", str(outdir),
        "--loadckpt", str(logdir),
        "--numdepth_initial", "8", "--numdepth", "32",
        "--max_h", "64", "--max_w", "96",
        "--geo_mask_thres", "1", "--geo_pixel_thres", "8",
        "--geo_depth_thres", "0.5", "--photo_thres", "0", "0", "0",
    ])

    depth, _ = read_pfm(str(outdir / "depth_est" / "00000000.pfm"))
    assert depth.shape == (64, 96)
    assert np.isfinite(depth).all()

    # the exported depth must come from the checkpoint's params: re-export
    # with fresh init (no --loadckpt) and check they differ
    outdir2 = tmp_path / "out2"
    main([
        "--dataset", "general", "--method", "casdiffmvs", "--save_depth",
        "--testpath", str(scene), "--outdir", str(outdir2),
        "--numdepth_initial", "8", "--numdepth", "32",
        "--max_h", "64", "--max_w", "96",
        "--geo_mask_thres", "1", "--geo_pixel_thres", "8",
        "--geo_depth_thres", "0.5", "--photo_thres", "0", "0", "0",
    ])
    depth2, _ = read_pfm(str(outdir2 / "depth_est" / "00000000.pfm"))
    assert not np.allclose(depth, depth2)
