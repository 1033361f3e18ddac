"""Training-loop integration: synthetic BlendedMVS-layout scene through
run_training (data pipeline -> sharded steps -> checkpoint -> eval pass ->
resume)."""

import dataclasses
import json
import os

import numpy as np
import jax
import pytest
from PIL import Image

from diffmvs_tpu.config import CASDIFFMVS, TrainConfig
from diffmvs_tpu.data.io import save_pfm
from diffmvs_tpu.data.pipeline import DataPipeline
from diffmvs_tpu.models.casdiffmvs import CasDiffMVS
from diffmvs_tpu.parallel.mesh import make_mesh, replicate
from diffmvs_tpu.train.checkpoint import latest_epoch, restore_checkpoint
from diffmvs_tpu.train.loop import run_eval, run_training
from diffmvs_tpu.train.state import create_train_state


def _make_blend_scene(root, scan, n_views=4, h=64, w=96):
    for sub in ("blended_images", "cams", "rendered_depth_maps"):
        os.makedirs(root / scan / sub, exist_ok=True)
    k = np.array([[1.2 * w, 0, w / 2], [0, 1.2 * w, h / 2], [0, 0, 1]],
                 np.float32)
    for i in range(n_views):
        img = (np.random.RandomState(i).rand(h, w, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(
            root / scan / "blended_images" / f"{i:08d}.jpg")
        th = 0.04 * i
        e = np.eye(4, dtype=np.float32)
        e[:3, :3] = [[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                     [-np.sin(th), 0, np.cos(th)]]
        e[:3, 3] = [0.25 * i, 0, 0]
        with open(root / scan / "cams" / f"{i:08d}_cam.txt", "w") as f:
            f.write("extrinsic\n")
            for r in range(4):
                f.write(" ".join(str(e[r, c]) for c in range(4)) + "\n")
            f.write("\nintrinsic\n")
            for r in range(3):
                f.write(" ".join(str(k[r, c]) for c in range(3)) + "\n")
            f.write("\n4.0 0.05 128 10.0\n")
        save_pfm(str(root / scan / "rendered_depth_maps" / f"{i:08d}.pfm"),
                 np.full((h, w), 6.0, np.float32))
    with open(root / scan / "cams" / "pair.txt", "w") as f:
        f.write(f"{n_views}\n")
        for i in range(n_views):
            others = [j for j in range(n_views) if j != i]
            f.write(f"{i}\n{len(others)} " + " ".join(
                f"{j} {10.0 - j}" for j in others) + "\n")


def test_training_loop_smoke(tmp_path):
    """Default-gate tiny-res version of test_training_loop_end_to_end:
    data pipeline -> sharded train steps -> checkpoint -> restore, at
    32x64 / numdepth 4/16 so the train seam runs on every pytest."""
    from diffmvs_tpu.data.blend import MVSDataset

    scan = "synthscan"
    _make_blend_scene(tmp_path, scan, h=32, w=64)
    listfile = tmp_path / "list.txt"
    listfile.write_text(scan + "\n")

    cfg = TrainConfig(
        model=dataclasses.replace(CASDIFFMVS, numdepth_initial=4,
                                  numdepth=16),
        dataset="blend", epochs=1, batch_size=2, train_views=3,
        test_views=3, summary_freq=1, lr=1e-4)

    train_ds = MVSDataset(str(tmp_path), str(listfile), "train", 3, 16)
    val_ds = MVSDataset(str(tmp_path), str(listfile), "test", 3, 16)
    mesh = make_mesh(2, 1)
    train_loader = DataPipeline(train_ds, 2, shuffle=True, drop_last=True,
                                mesh=mesh)
    val_loader = DataPipeline(val_ds, 2, shuffle=False, drop_last=True,
                              mesh=mesh)

    model = CasDiffMVS(cfg.model)
    sample = next(iter(DataPipeline(train_ds, 1)))
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), sample,
                               steps_per_epoch=len(train_loader))
    state = replicate(mesh, state)

    logdir = str(tmp_path / "logs")
    final_state = run_training(model, cfg, state, train_loader, val_loader,
                               mesh, logdir, start_epoch=0)
    assert int(final_state.step) == len(train_loader)

    with open(os.path.join(logdir, "scalars.jsonl")) as f:
        records = [json.loads(line) for line in f]
    assert any(r["mode"] == "train" for r in records)
    assert any(r["mode"] == "full_test" for r in records)
    for r in records:
        if "loss" in r:
            assert np.isfinite(r["loss"])

    assert latest_epoch(logdir) == 0
    restored, epoch = restore_checkpoint(logdir, jax.device_get(final_state))
    assert epoch == 0
    assert int(restored.step) == int(final_state.step)


@pytest.mark.slow
def test_training_loop_end_to_end(tmp_path):
    from diffmvs_tpu.data.blend import MVSDataset

    scan = "synthscan"
    _make_blend_scene(tmp_path, scan)
    listfile = tmp_path / "list.txt"
    listfile.write_text(scan + "\n")

    cfg = TrainConfig(
        model=dataclasses.replace(CASDIFFMVS, numdepth_initial=8,
                                  numdepth=32),
        dataset="blend", epochs=1, batch_size=2, train_views=3,
        test_views=3, summary_freq=1, lr=1e-4)

    train_ds = MVSDataset(str(tmp_path), str(listfile), "train", 3, 32)
    val_ds = MVSDataset(str(tmp_path), str(listfile), "test", 3, 32)
    mesh = make_mesh(2, 1)
    train_loader = DataPipeline(train_ds, 2, shuffle=True, drop_last=True,
                                mesh=mesh)
    val_loader = DataPipeline(val_ds, 2, shuffle=False, drop_last=True,
                              mesh=mesh)

    model = CasDiffMVS(cfg.model)
    sample = next(iter(DataPipeline(train_ds, 1)))
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), sample,
                               steps_per_epoch=len(train_loader))
    state = replicate(mesh, state)

    logdir = str(tmp_path / "logs")
    final_state = run_training(model, cfg, state, train_loader, val_loader,
                               mesh, logdir, start_epoch=0)
    assert int(final_state.step) == len(train_loader)

    # scalars logged
    with open(os.path.join(logdir, "scalars.jsonl")) as f:
        records = [json.loads(line) for line in f]
    assert any(r["mode"] == "train" for r in records)
    assert any(r["mode"] == "full_test" for r in records)
    for r in records:
        if "loss" in r:
            assert np.isfinite(r["loss"])

    # checkpoint written + restorable
    assert latest_epoch(logdir) == 0
    restored, epoch = restore_checkpoint(logdir, jax.device_get(final_state))
    assert epoch == 0
    assert int(restored.step) == int(final_state.step)

    # eval-only entry point
    means = run_eval(model, cfg, final_state, val_loader)
    assert np.isfinite(means["loss"])
