"""Native IO library (native/jpeg_loader.cpp): decode + resize parity."""

import io

import numpy as np
import pytest
from PIL import Image

from diffmvs_tpu.data import native_io


def _jpeg(rng, h, w, quality=92):
    img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=quality)
    return buf.getvalue()


@pytest.fixture(scope="module")
def data():
    if not native_io.available():
        pytest.skip("native IO library unavailable on this host")
    return _jpeg(np.random.RandomState(0), 300, 400)


def test_dims(data):
    assert native_io.jpeg_dims(data) == (400, 300)


def test_decode_resize_bit_equal_pil(data):
    """Same libjpeg decode + a faithful Pillow-BILINEAR reimplementation
    -> bit-identical arrays for identity, downscale, upscale and mixed
    resizes (the contract that lets the dataset switch loaders freely)."""
    for size in ((400, 300), (400, 288), (200, 152), (416, 320),
                 (200, 320)):
        want = np.asarray(
            Image.open(io.BytesIO(data)).convert("RGB").resize(
                size, Image.BILINEAR))
        got = native_io.decode_resize(data, size)
        np.testing.assert_array_equal(got, want), size


def test_batch_threads(data):
    rng = np.random.RandomState(1)
    datas = [data, _jpeg(rng, 240, 320), _jpeg(rng, 160, 480)]
    sizes = [(384, 288), (320, 224), (480, 160)]
    outs = native_io.decode_resize_batch(datas, sizes, nthreads=3)
    assert outs is not None
    for d, s, o in zip(datas, sizes, outs):
        want = np.asarray(
            Image.open(io.BytesIO(d)).convert("RGB").resize(
                s, Image.BILINEAR))
        np.testing.assert_array_equal(o, want)


def test_dataset_uses_native_and_matches_pil(tmp_path, monkeypatch):
    """MVSDataset output identical with the native loader on and off."""
    import os

    from diffmvs_tpu.data.mvs import MVSDataset

    rng = np.random.RandomState(2)
    scan = tmp_path / "scan1"
    os.makedirs(scan / "images")
    os.makedirs(scan / "cams_1")
    for i in range(3):
        Image.fromarray((rng.rand(120, 160, 3) * 255).astype(
            np.uint8)).save(scan / f"images/{i:08d}.jpg")
        k = np.array([[200.0, 0, 80], [0, 200.0, 60], [0, 0, 1]])
        e = np.eye(4)
        e[0, 3] = 0.1 * i
        with open(scan / f"cams_1/{i:08d}_cam.txt", "w") as f:
            f.write("extrinsic\n")
            for r in range(4):
                f.write(" ".join(str(e[r, c]) for c in range(4)) + "\n")
            f.write("\nintrinsic\n")
            for r in range(3):
                f.write(" ".join(str(k[r, c]) for c in range(3)) + "\n")
            f.write("\n4.0 0.1 192 10.0\n")
    with open(scan / "pair.txt", "w") as f:
        f.write("3\n0\n2 1 10.0 2 8.0\n1\n2 0 10.0 2 8.0\n"
                "2\n2 0 10.0 1 8.0\n")

    def build():
        return MVSDataset(str(tmp_path), n_views=3, numdepth=16,
                          dataset="dtu", scan=["scan1"])

    # dtu mode resizes to FIXED_WH; shrink via monkeypatch for speed
    import diffmvs_tpu.data.mvs as mvs_mod
    monkeypatch.setitem(mvs_mod.FIXED_WH, "dtu", (160, 96))

    ds = build()
    native_sample = ds[0]
    monkeypatch.setattr(native_io, "_lib", None)
    monkeypatch.setattr(native_io, "_tried", True)   # force PIL path
    assert not native_io.available()
    pil_sample = build()[0]
    np.testing.assert_array_equal(native_sample["imgs"],
                                  pil_sample["imgs"])
    for k2 in native_sample["proj_matrices"]:
        np.testing.assert_array_equal(
            native_sample["proj_matrices"][k2],
            pil_sample["proj_matrices"][k2])
