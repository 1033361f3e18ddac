"""Codec round-trip + byte-compatibility tests (PFM, cam.txt, pair.txt, PLY)."""

import os

import numpy as np
import pytest

from diffmvs_tpu.data.io import (
    read_cam_file,
    read_camera_parameters,
    read_pair_file,
    read_pfm,
    save_pfm,
    write_cam,
)
from diffmvs_tpu.data.resize import resize_nearest
from diffmvs_tpu.fusion.ply import read_ply, write_ply


def test_pfm_roundtrip(tmp_path, rng):
    img = rng.randn(7, 9).astype(np.float32)
    path = str(tmp_path / "x.pfm")
    save_pfm(path, img)
    back, scale = read_pfm(path)
    np.testing.assert_array_equal(back, img)
    assert scale == 1.0


def test_pfm_color_roundtrip(tmp_path, rng):
    img = rng.randn(5, 4, 3).astype(np.float32)
    path = str(tmp_path / "c.pfm")
    save_pfm(path, img)
    back, _ = read_pfm(path)
    np.testing.assert_array_equal(back, img)


def test_cam_roundtrip(tmp_path, rng):
    cam = np.zeros((2, 4, 4), np.float32)
    cam[0] = np.eye(4) + 0.01 * rng.randn(4, 4).astype(np.float32)
    cam[1, :3, :3] = [[100, 0, 32], [0, 100, 24], [0, 0, 1]]
    path = str(tmp_path / "c_cam.txt")
    write_cam(path, cam, depth_max=10.0, depth_min=2.0)

    # fusion-side reader swaps the (max, min) line back
    intr, extr, dmax, dmin = read_camera_parameters(path)
    np.testing.assert_allclose(extr, cam[0], rtol=1e-5)
    np.testing.assert_allclose(intr, cam[1, :3, :3], rtol=1e-5)
    assert (dmax, dmin) == (10.0, 2.0)


def test_camera_parameters_dtu_clamp(tmp_path):
    """data_io.py:156-158 hardcodes the DTU 425-935 range."""
    cam = np.zeros((2, 4, 4), np.float32)
    cam[0] = np.eye(4)
    cam[1, :3, :3] = np.eye(3)
    path = str(tmp_path / "d_cam.txt")
    write_cam(path, cam, depth_max=933.8, depth_min=425.0)
    _, _, dmax, dmin = read_camera_parameters(path)
    assert (dmax, dmin) == (935, 425)


def test_pair_file(tmp_path):
    content = "2\n0\n3 1 0.5 2 0.3 3 0.05\n1\n2 0 0.4 2 0.2\n"
    path = str(tmp_path / "pair.txt")
    with open(path, "w") as f:
        f.write(content)
    pairs = read_pair_file(path, "dtu")
    assert pairs == [(0, [1, 2, 3]), (1, [0, 2])]
    # eth3d applies the score filter (>0.1)
    pairs = read_pair_file(path, "eth3d")
    assert pairs == [(0, [1, 2]), (1, [0, 2])]


def test_ply_roundtrip(tmp_path, rng):
    xyz = rng.randn(100, 3).astype(np.float32)
    rgb = (rng.rand(100, 3) * 255).astype(np.uint8)
    path = str(tmp_path / "pc.ply")
    write_ply(path, xyz, rgb)
    xyz2, rgb2 = read_ply(path)
    np.testing.assert_array_equal(xyz2, xyz)
    np.testing.assert_array_equal(rgb2, rgb)


def test_resize_nearest_matches_strided_decimation(rng):
    arr = rng.randn(16, 24).astype(np.float32)
    half = resize_nearest(arr, (12, 8))
    np.testing.assert_array_equal(half, arr[::2, ::2])
