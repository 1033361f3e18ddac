"""DTU eval-harness tests on synthetic fixtures (cli/eval_dtu.py).

Builds a fake DTU evaluation layout — Points/stl plys, ObsMask/Plane
.mat files (scipy.io) — plus fused clouds, and checks the toolbox
protocol: grid downsample, ObsMask/bounding-box filtering for accuracy,
plane filtering for completeness, known-offset distances, and the
unmasked fallback flag."""

import os

import numpy as np
import pytest

from diffmvs_tpu.cli.eval_dtu import main, reduce_pts
from diffmvs_tpu.fusion.ply import write_ply


def _write_cloud(path, xyz):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    write_ply(path, xyz.astype(np.float32),
              np.full((xyz.shape[0], 3), 128, np.uint8))


def _make_gt_dir(root, scan, gt, with_masks=True):
    _write_cloud(os.path.join(root, "Points", "stl",
                              f"stl{scan:03d}_total.ply"), gt)
    if not with_masks:
        return
    from scipy.io import savemat

    os.makedirs(os.path.join(root, "ObsMask"), exist_ok=True)
    # observability grid covering the cloud with 1 mm cells, all cells
    # observed; bounding box snug around the gt
    bb = np.stack([gt.min(0) - 1.0, gt.max(0) + 1.0])
    res = 1.0
    shape = np.ceil((bb[1] - bb[0]) / res).astype(int) + 1
    savemat(os.path.join(root, "ObsMask", f"ObsMask{scan}_10.mat"),
            {"ObsMask": np.ones(shape, np.uint8), "BB": bb, "Res": res})
    # ground plane z = min - 0.5 (everything above)
    p = np.array([0.0, 0.0, 1.0, -(gt[:, 2].min() - 0.5)])
    savemat(os.path.join(root, "ObsMask", f"Plane{scan}.mat"),
            {"P": p.reshape(4, 1)})


def _grid_cloud(n=400, z=10.0, jitter=0.0, seed=0):
    rng = np.random.RandomState(seed)
    g = int(np.sqrt(n))
    xs, ys = np.meshgrid(np.linspace(0, 30, g), np.linspace(0, 30, g))
    xyz = np.stack([xs.ravel(), ys.ravel(),
                    np.full(g * g, z)], axis=1)
    if jitter:
        xyz = xyz + rng.randn(*xyz.shape) * jitter
    return xyz.astype(np.float32)


def test_reduce_pts_dedups():
    xyz = np.array([[0, 0, 0], [0.05, 0, 0], [1.0, 0, 0]], np.float32)
    out = reduce_pts(xyz, 0.2)
    assert out.shape[0] == 2           # first two share a 0.2 cell


def test_eval_known_offset(tmp_path):
    scan = 3
    gt = _grid_cloud()
    pred = gt + np.array([0.0, 0.0, 0.4], np.float32)   # 0.4 mm off
    _make_gt_dir(str(tmp_path), scan, gt)
    _write_cloud(str(tmp_path / "pc" / f"mvs{scan:03d}_l3.ply"), pred)

    res = main(["--pc_dir", str(tmp_path / "pc"),
                "--gt_dir", str(tmp_path), "--scans", str(scan),
                "--json", str(tmp_path / "r.json")])
    r = res["scans"][0]
    assert r["masked"]
    assert r["acc_mean"] == pytest.approx(0.4, abs=0.02)
    assert r["comp_mean"] == pytest.approx(0.4, abs=0.02)
    assert res["mean"]["overall"] == pytest.approx(0.4, abs=0.02)
    assert os.path.exists(tmp_path / "r.json")


def test_eval_masks_filter(tmp_path):
    """Points outside the ObsMask BB must not hurt accuracy; gt points
    below the plane must not hurt completeness."""
    scan = 7
    gt = _grid_cloud()
    # pred: perfect cloud + junk far outside the bounding box
    junk = np.array([[500.0, 500.0, 500.0]], np.float32)
    pred = np.concatenate([gt, junk])
    _make_gt_dir(str(tmp_path), scan, gt)
    _write_cloud(str(tmp_path / "pc" / f"mvs{scan:03d}_l3.ply"), pred)
    r = main(["--pc_dir", str(tmp_path / "pc"),
              "--gt_dir", str(tmp_path),
              "--scans", str(scan)])["scans"][0]
    assert r["acc_mean"] == pytest.approx(0.0, abs=2e-3)

    # gt with sub-plane points, pred missing them: completeness clean
    scan2 = 8
    below = _grid_cloud() - np.array([0.0, 0.0, 50.0], np.float32)
    gt2 = np.concatenate([gt, below])
    _make_gt_dir(str(tmp_path), scan2, gt2)
    # plane fixture sits 0.5 below gt2.min -> rebuild with gt's floor
    from scipy.io import savemat
    savemat(os.path.join(str(tmp_path), "ObsMask", f"Plane{scan2}.mat"),
            {"P": np.array([0.0, 0.0, 1.0,
                            -(gt[:, 2].min() - 0.5)]).reshape(4, 1)})
    _write_cloud(str(tmp_path / "pc" / f"mvs{scan2:03d}_l3.ply"), gt)
    r2 = main(["--pc_dir", str(tmp_path / "pc"),
               "--gt_dir", str(tmp_path),
               "--scans", str(scan2)])["scans"][0]
    assert r2["comp_mean"] == pytest.approx(0.0, abs=2e-3)


def test_eval_unmasked_fallback(tmp_path):
    scan = 11
    gt = _grid_cloud()
    _make_gt_dir(str(tmp_path), scan, gt, with_masks=False)
    _write_cloud(str(tmp_path / "pc" / f"scan{scan}.ply"), gt)
    r = main(["--pc_dir", str(tmp_path / "pc"),
              "--gt_dir", str(tmp_path), "--scans", str(scan)])
    assert not r["scans"][0]["masked"]
    assert r["scans"][0]["overall"] == pytest.approx(0.0, abs=2e-3)
