"""COLMAP ingestion test on a synthetic text sparse model."""

import os

import numpy as np
import pytest
from PIL import Image

from diffmvs_tpu.data.io import read_cam_file
from diffmvs_tpu.tools.colmap import (
    convert,
    qvec2rotmat,
    read_model,
    triangulation_score,
)


def _write_sparse(root, n_views=3, n_points=50):
    os.makedirs(root / "sparse", exist_ok=True)
    os.makedirs(root / "images", exist_ok=True)

    with open(root / "sparse" / "cameras.txt", "w") as f:
        f.write("# cameras\n")
        for i in range(1, n_views + 1):
            f.write(f"{i} PINHOLE 64 48 70.0 70.0 32.0 24.0\n")

    rng = np.random.RandomState(0)
    pts = rng.rand(n_points, 3) * 2 - 1
    pts[:, 2] += 6.0

    views = []
    with open(root / "sparse" / "images.txt", "w") as f:
        f.write("# images\n")
        for i in range(1, n_views + 1):
            tx = 0.3 * (i - 1)
            f.write(f"{i} 1 0 0 0 {tx} 0 0 {i} view{i}.png\n")
            obs = []
            for pid in range(n_points):
                x = 70 * (pts[pid, 0] - tx) / pts[pid, 2] + 32
                y = 70 * pts[pid, 1] / pts[pid, 2] + 24
                obs.append(f"{x:.2f} {y:.2f} {pid + 1}")
            f.write(" ".join(obs) + "\n")
            img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(root / "images" / f"view{i}.png")

    with open(root / "sparse" / "points3D.txt", "w") as f:
        f.write("# points\n")
        for pid in range(n_points):
            track = " ".join(f"{i} {pid}" for i in range(1, n_views + 1))
            f.write(f"{pid + 1} {pts[pid, 0]:.4f} {pts[pid, 1]:.4f} "
                    f"{pts[pid, 2]:.4f} 128 128 128 0.5 {track}\n")


def test_qvec_identity():
    np.testing.assert_allclose(qvec2rotmat([1, 0, 0, 0]), np.eye(3))


def test_triangulation_score_peak():
    center_i = np.zeros(3)
    p = np.array([0.0, 0.0, 6.0])
    # ~5 degrees triangulation angle scores ~1
    center_j = np.array([6.0 * np.tan(np.radians(5.0)), 0, 0])
    assert triangulation_score(p, center_i, center_j) > 0.95
    # tiny angle scores much lower
    center_k = np.array([0.01, 0, 0])
    assert triangulation_score(p, center_i, center_k) < \
        triangulation_score(p, center_i, center_j)


def test_convert_end_to_end(tmp_path):
    _write_sparse(tmp_path)
    out = tmp_path / "mvs"
    convert(str(tmp_path), str(out), model_ext=".txt", num_src=2)

    # cams readable by the dataset-side reader
    for i in range(3):
        intr, extr, dmin, dmax = read_cam_file(
            str(out / "cams" / f"{i:08d}_cam.txt"))
        np.testing.assert_allclose(intr[0, 0], 70.0)
        assert 0 < dmin < dmax
        assert extr.shape == (4, 4)
        assert (out / "images" / f"{i:08d}.jpg").exists()

    with open(out / "pair.txt") as f:
        assert int(f.readline()) == 3
        ref0 = int(f.readline())
        assert ref0 == 0
        tokens = f.readline().split()
        assert int(tokens[0]) == 2          # two source views
        # nearest baseline should score highest
        srcs = [int(t) for t in tokens[1::2]]
        assert set(srcs) <= {0, 1, 2}


def test_convert_vggt_mode(tmp_path):
    """--vggt view selection: images -> ImageNet-normalized ViT
    descriptors -> dot-product pair scores (colmap_input.py:294-329,
    392-395). Tiny random-weight ViT keeps it fast."""
    from diffmvs_tpu.tools.retrieval import ViTConfig

    _write_sparse(tmp_path)
    out = tmp_path / "mvs_vggt"
    tiny = ViTConfig(image_size=32, patch_size=16, embed_dim=32, depth=1,
                     num_heads=2, num_classes=16)
    convert(str(tmp_path), str(out), model_ext=".txt", num_src=2,
            vggt=True, vit_cfg=tiny)

    with open(out / "pair.txt") as f:
        assert int(f.readline()) == 3
        entries = {}
        for _ in range(3):
            ref = int(f.readline())
            toks = f.readline().split()
            n = int(toks[0])
            entries[ref] = [(int(toks[1 + 2 * i]), float(toks[2 + 2 * i]))
                            for i in range(n)]
    # descriptor dot products of unit vectors: scores in [-1, 1],
    # symmetric, and every ref has the requested 2 sources
    for ref, lst in entries.items():
        assert len(lst) == 2
        for j, s in lst:
            assert -1.0 - 1e-5 <= s <= 1.0 + 1e-5
            back = dict(entries[j])
            if ref in back:
                assert abs(back[ref] - s) < 1e-4


def test_cli_vggt_flag(tmp_path, monkeypatch):
    """CLI --vggt path end-to-end (tiny ViT patched in)."""
    import diffmvs_tpu.tools.colmap as colmap_mod
    from diffmvs_tpu.tools.retrieval import ViTConfig

    _write_sparse(tmp_path)
    out = tmp_path / "mvs_cli"
    tiny = ViTConfig(image_size=32, patch_size=16, embed_dim=32, depth=1,
                     num_heads=2, num_classes=16)
    orig = colmap_mod.compute_image_descriptors
    monkeypatch.setattr(
        colmap_mod, "compute_image_descriptors",
        lambda folder, images, checkpoint=None, vit_cfg=None:
        orig(folder, images, checkpoint=checkpoint, vit_cfg=tiny))
    colmap_mod.main(["--dense_folder", str(tmp_path),
                     "--save_folder", str(out),
                     "--model_ext", ".txt", "--num_src", "2", "--vggt"])
    assert (out / "pair.txt").exists()
