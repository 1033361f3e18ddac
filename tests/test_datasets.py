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
    assert s["imgs"].dtype == np.uint8   # raw bytes; model normalizes on device
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


def test_dtu_train_dataset(tmp_path):
    from diffmvs_tpu.data.dtu import MVSDataset

    root = tmp_path
    scan = "scan1"
    os.makedirs(root / "Cameras" / "train")
    os.makedirs(root / f"Rectified/{scan}_train")
    os.makedirs(root / f"Depths_raw/{scan}")

    # DTU preprocessed layout: 1600x1200 raw depth, 640x512 images
    with open(root / "Cameras" / "pair.txt", "w") as f:
        f.write("3\n0\n2 1 10.0 2 5.0\n1\n2 0 10.0 2 5.0\n"
                "2\n2 0 10.0 1 5.0\n")
    k = _k()
    for vid in range(3):
        e = np.eye(4, dtype=np.float32)
        e[0, 3] = 0.2 * vid
        # cam file: depth line "min interval"
        with open(root / "Cameras" / "train" / f"{vid:08d}_cam.txt",
                  "w") as f:
            f.write("extrinsic\n")
            for r in range(4):
                f.write(" ".join(str(e[r, c]) for c in range(4)) + "\n")
            f.write("\nintrinsic\n")
            for r in range(3):
                f.write(" ".join(str(k[r, c]) for c in range(3)) + "\n")
            f.write("\n425.0 2.5\n")
        for light in range(7):
            img = (np.random.rand(512, 640, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(
                root / f"Rectified/{scan}_train" /
                f"rect_{vid + 1:0>3}_{light}_r5000.png")
        depth_hr = np.full((1200, 1600), 600.0, np.float32)
        save_pfm(str(root / f"Depths_raw/{scan}" /
                     f"depth_map_{vid:0>4}.pfm"), depth_hr)
        vis = np.full((1200, 1600), 255, np.uint8)
        Image.fromarray(vis).save(
            root / f"Depths_raw/{scan}" / f"depth_visual_{vid:0>4}.png")

    listfile = root / "train.txt"
    listfile.write_text(scan + "\n")
    ds = MVSDataset(str(root), str(listfile), "train", nviews=3, ndepths=192)
    assert len(ds) == 3 * 7          # 7 light conditions per view
    s = ds[0]
    assert s["imgs"].shape == (3, 512, 640, 3)
    assert s["imgs"].dtype == np.uint8
    assert s["depth"]["stage4"].shape == (512, 640)
    assert s["depth"]["stage1"].shape == (64, 80)
    # depth_max = min + interval*scale*ndepths; interval_scale=1.06
    # -> 425 + 2.5*1.06*192 = 933.8
    dv = s["depth_values"]
    assert dv[0] == pytest.approx(1 / 933.8, rel=1e-4)
    assert dv[-1] == pytest.approx(1 / 425.0, rel=1e-5)
    # GT=600 within range => mask on (away from crop borders)
    assert s["mask"]["stage4"].mean() == 1.0
    # stage1 intrinsics = 0.5 x file intrinsics (file is 1/4-res)
    np.testing.assert_allclose(s["proj_matrices"]["stage1"][0, 1, 0, 0],
                               k[0, 0] * 0.5)
    np.testing.assert_allclose(s["proj_matrices"]["stage4"][0, 1, 0, 0],
                               k[0, 0] * 4.0)
    # train mode samples random sources
    s2 = ds[7]
    assert s2["imgs"].shape == (3, 512, 640, 3)


def test_scene_lists(tmp_path):
    from diffmvs_tpu.data.scene_lists import ALL_LISTS, write_lists

    write_lists(str(tmp_path))
    for rel, scenes in ALL_LISTS.items():
        with open(tmp_path / rel) as f:
            lines = [line.rstrip() for line in f]
        assert lines == list(scenes)
    assert len(ALL_LISTS["dtu/train.txt"]) == 79
    assert len(ALL_LISTS["blend/train.txt"]) == 106


def test_pipeline_worker_processes(tmp_path):
    """num_workers>0 (spawned decode workers) yields byte-identical
    batches, in order, vs the threaded pipeline."""
    import numpy as np

    from diffmvs_tpu.data.blend import MVSDataset
    from diffmvs_tpu.data.pipeline import DataPipeline
    from test_train_loop import _make_blend_scene

    scan = "wscan"
    _make_blend_scene(tmp_path, scan, n_views=5, h=32, w=48)
    listfile = tmp_path / "list.txt"
    listfile.write_text(scan + "\n")
    ds = MVSDataset(str(tmp_path), str(listfile), "test", 3, 16)

    ref_batches = list(DataPipeline(ds, 2, shuffle=False, drop_last=False))
    got_batches = list(DataPipeline(ds, 2, shuffle=False, drop_last=False,
                                    num_workers=2))
    assert len(got_batches) == len(ref_batches) > 0
    for a, b in zip(ref_batches, got_batches):
        assert a.keys() == b.keys()
        for k in a:
            if isinstance(a[k], dict):
                for kk in a[k]:
                    np.testing.assert_array_equal(a[k][kk], b[k][kk])
            elif isinstance(a[k], list):
                assert a[k] == b[k]
            else:
                np.testing.assert_array_equal(a[k], b[k])


def test_eval_dataset_predecoded_npy(tmp_path):
    """Pre-decoded uint8 .npy images (serving-cache contract): served
    verbatim when already at the target size, intrinsics scale by 1;
    identical sample structure to the JPEG path."""
    from diffmvs_tpu.data.mvs import MVSDataset

    root = tmp_path
    os.makedirs(root / "images")
    os.makedirs(root / "cams")
    rng = np.random.RandomState(3)
    raws = []
    for i in range(3):
        # already multiple-of-32 under max_h/max_w -> no resize
        img = (rng.rand(64, 96, 3) * 255).astype(np.uint8)
        raws.append(img)
        np.save(root / "images" / f"{i:08d}.npy", img)
        e = np.eye(4, dtype=np.float32)
        e[0, 3] = 0.2 * i
        _write_cam_txt(root / "cams" / f"{i:08d}_cam.txt", _k(), e,
                       "2.5 0.05 192 10.0")
    with open(root / "pair.txt", "w") as f:
        f.write("3\n0\n2 1 10.0 2 5.0\n1\n2 0 10.0 2 5.0\n"
                "2\n2 0 10.0 1 5.0\n")

    ds = MVSDataset(str(root), n_views=3, numdepth=32, dataset="general")
    s = ds[0]
    assert s["imgs"].shape == (3, 64, 96, 3)
    assert s["imgs"].dtype == np.uint8
    np.testing.assert_array_equal(s["imgs"][0], raws[0])
    # intrinsics unscaled (cache is at target resolution)
    assert s["proj_matrices"]["stage4"][0, 1][0, 0] == pytest.approx(100.0)
