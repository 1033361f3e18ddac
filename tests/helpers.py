"""Synthetic mini-scene builders shared by model/train/bench tests."""

import numpy as np


def make_cams(v, h, w, focal=None, yaw=None, roll=None):
    """[V, 2, 4, 4] (extrinsic, intrinsic) with ref identity and src views on
    a small arc (yaw overrides the 0.04 rad/view step — big values make a
    strong-rotation rig; roll slants image rows across source rows, the
    band-miss fixture for the Pallas warp guard). Intrinsics are
    full-resolution."""
    focal = focal or 1.2 * w
    k = np.array([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]],
                 np.float32)
    cams = []
    for i in range(v):
        th = 0.0 if i == 0 else (yaw if yaw is not None else 0.04) * i
        e = np.eye(4, dtype=np.float32)
        e[:3, :3] = np.array(
            [[np.cos(th), 0, np.sin(th)], [0, 1, 0],
             [-np.sin(th), 0, np.cos(th)]], np.float32)
        if roll is not None and i > 0:
            cr, sr = np.cos(roll * i), np.sin(roll * i)
            rz = np.array([[cr, -sr, 0], [sr, cr, 0], [0, 0, 1]],
                          np.float32)
            e[:3, :3] = rz @ e[:3, :3]
        e[:3, 3] = [0.25 * i, 0.02 * i, 0.0]
        mat = np.zeros((2, 4, 4), np.float32)
        mat[0] = e
        mat[1, :3, :3] = k
        cams.append(mat)
    return np.stack(cams)


def stage_projs(cams):
    out = {}
    for stage, s in (("stage1", 0.125), ("stage2", 0.25), ("stage3", 0.5),
                     ("stage4", 1.0)):
        m = cams.copy()
        m[:, 1, :2, :] = cams[:, 1, :2, :] * s
        out[stage] = m
    return out


def make_batch(rng, b, v, h, w, numdepth=32, dmin=4.0, dmax=10.0,
               with_gt=False):
    """Synthetic batch matching the model's forward contract."""
    imgs = rng.rand(b, v, h, w, 3).astype(np.float32)
    cams = make_cams(v, h, w)
    projs = {k: np.broadcast_to(m, (b,) + m.shape).copy()
             for k, m in stage_projs(cams).items()}
    depth_values = np.broadcast_to(
        np.linspace(1 / dmax, 1 / dmin, numdepth, dtype=np.float32),
        (b, numdepth)).copy()

    batch = {"imgs": imgs, "proj_matrices": projs,
             "depth_values": depth_values}
    if with_gt:
        # slanted plane in range
        ys, xs = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w),
                             indexing="ij")
        gt = (dmin + (dmax - dmin) * (0.3 + 0.4 * xs)).astype(np.float32)
        gt = np.broadcast_to(gt, (b, h, w)).copy()
        depth_ms, mask_ms = {}, {}
        for stage, s in (("stage1", 8), ("stage2", 4), ("stage3", 2),
                         ("stage4", 1)):
            depth_ms[stage] = gt[:, ::s, ::s]
            mask_ms[stage] = np.ones_like(depth_ms[stage])
        batch["depth"] = depth_ms
        batch["mask"] = mask_ms
    return batch
