"""Dataset integration tests on synthetic on-disk scenes (no jax)."""

import os

import numpy as np
import pytest
from PIL import Image

from diffmvs_tpu.data.io import save_pfm
from diffmvs_tpu.data.pipeline import DataPipeline, _collate


def _write_cam_txt(path, k, e, line4):
    with open(path, "w") as f:
        f.write("extrinsic\n")
        for r in range(4):
            f.write(" ".join(str(e[r, c]) for c in range(4)) + "\n")
        f.write("\nintrinsic\n")
        for r in range(3):
            f.write(" ".join(str(k[r, c]) for c in range(3)) + "\n")
        f.write("\n" + line4 + "\n")


def _k():
    return np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]], np.float32)


def test_eval_dataset_general(tmp_path):
    from diffmvs_tpu.data.mvs import MVSDataset

    root = tmp_path
    os.makedirs(root / "images")
    os.makedirs(root / "cams")
    for i in range(3):
        img = (np.random.rand(70, 100, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(root / "images" / f"{i:08d}.jpg")
        e = np.eye(4, dtype=np.float32)
        e[0, 3] = 0.2 * i
        _write_cam_txt(root / "cams" / f"{i:08d}_cam.txt", _k(), e,
                       "2.5 0.05 192 10.0")
    with open(root / "pair.txt", "w") as f:
        f.write("3\n0\n2 1 10.0 2 5.0\n1\n2 0 10.0 2 5.0\n"
                "2\n2 0 10.0 1 5.0\n")

    ds = MVSDataset(str(root), n_views=3, numdepth=32, dataset="general")
    assert len(ds) == 3
    s = ds[0]
    # adaptive resize to multiples of 32 under max size
    assert s["imgs"].shape == (3, 64, 96, 3)
    assert s["depth_values"].shape == (32,)
    assert s["depth_values"][0] == pytest.approx(1 / 10.0)
    assert s["depth_values"][-1] == pytest.approx(1 / 2.5)
    # per-stage intrinsics scaling
    p1 = s["proj_matrices"]["stage1"][0, 1]
    p4 = s["proj_matrices"]["stage4"][0, 1]
    np.testing.assert_allclose(p1[:2] * 8, p4[:2], rtol=1e-5)
    # intrinsics rescaled by the image resize (100->96, 70->64)
    assert p4[0, 0] == pytest.approx(100.0 * 96 / 100)
    assert p4[1, 1] == pytest.approx(100.0 * 64 / 70)
    assert s["filename"] == "{}/00000000{}"


def test_blend_dataset(tmp_path):
    from diffmvs_tpu.data.blend import MVSDataset

    scan = "5c1f33f1d33e1f2e4aa6dda4"
    root = tmp_path
    for sub in ("blended_images", "cams", "rendered_depth_maps"):
        os.makedirs(root / scan / sub)
    h, w = 64, 96
    for i in range(4):
        img = (np.random.rand(h, w, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(
            root / scan / "blended_images" / f"{i:08d}.jpg")
        e = np.eye(4, dtype=np.float32)
        e[0, 3] = 0.1 * i
        _write_cam_txt(root / scan / "cams" / f"{i:08d}_cam.txt", _k(), e,
                       "2.0 0.05 192 8.0")
        depth = np.full((h, w), 5.0, np.float32)
        depth[:4] = 0.0   # invalid band
        save_pfm(str(root / scan / "rendered_depth_maps" / f"{i:08d}.pfm"),
                 depth)
    with open(root / scan / "cams" / "pair.txt", "w") as f:
        f.write("4\n0\n3 1 10.0 2 5.0 3 2.0\n1\n3 0 10.0 2 5.0 3 2.0\n"
                "2\n3 0 10.0 1 5.0 3 2.0\n3\n3 0 10.0 1 5.0 2 2.0\n")
    listfile = root / "list.txt"
    listfile.write_text(scan + "\n")

    ds = MVSDataset(str(root), str(listfile), "test", nviews=3, ndepths=16)
    assert len(ds) == 4
    s = ds[0]
    assert s["imgs"].shape == (3, h, w, 3)
    assert s["depth"]["stage1"].shape == (h // 8, w // 8)
    assert s["depth"]["stage4"].shape == (h, w)
    # mask excludes the invalid band
    assert s["mask"]["stage4"][:4].sum() == 0
    assert s["mask"]["stage4"][8:].mean() == 1.0
    # endpoint=False linspace (blend.py:121)
    dv = s["depth_values"]
    assert dv[0] == pytest.approx(1 / 8.0)
    assert dv[-1] < 1 / 2.0

    # pipeline collation + iteration
    pipe = DataPipeline(ds, batch_size=2, shuffle=True, drop_last=True,
                        seed=1)
    batches = list(pipe)
    assert len(batches) == 2
    b = batches[0]
    assert b["imgs"].shape == (2, 3, h, w, 3)
    assert b["depth"]["stage2"].shape == (2, h // 4, w // 4)


def test_scene_lists(tmp_path):
    from diffmvs_tpu.data.scene_lists import ALL_LISTS, write_lists

    write_lists(str(tmp_path))
    for rel, scenes in ALL_LISTS.items():
        with open(tmp_path / rel) as f:
            lines = [line.rstrip() for line in f]
        assert lines == list(scenes)
    assert len(ALL_LISTS["dtu/train.txt"]) == 79
    assert len(ALL_LISTS["blend/train.txt"]) == 106
