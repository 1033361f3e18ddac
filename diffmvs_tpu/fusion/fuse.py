"""Geometric + photometric consistency fusion, vectorized on device.

Parity targets:
  reproject_with_depth          — /root/reference/filter.py:8-51
  check_geometric_consistency   — /root/reference/filter.py:54-87
  filter_depth                  — /root/reference/filter.py:90-227
  filter_depth_dynamic (D2HC)   — /root/reference/filter.py:230-440

The reference loops views on the CPU with cv2.remap (O(views^2 · H · W)
serial remaps per scene). Here a single jitted kernel reprojects the
reference depth into ALL source views at once (vmap over the source axis)
and reduces the consistency votes on device; the host only does file IO and
vertex accumulation. Source lists are padded to a fixed bucket size so each
scene compiles one executable.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from diffmvs_tpu.data.io import (
    read_camera_parameters,
    read_img,
    read_pair_file,
    read_pfm,
    save_mask,
)
from diffmvs_tpu.fusion.ply import write_ply
from diffmvs_tpu.geometry.sampling import bilinear_sample
from diffmvs_tpu.geometry.transforms import invert_intrinsics, invert_rigid

_mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)


def reproject_with_depth(depth_ref, k_ref, e_ref, depth_src, k_src, e_src):
    """Project ref depth into one source view and back (filter.py:8-51).

    depth_ref: [H, W]; depth_src: [H, W]; k_*: [3,3]; e_*: [4,4].
    Returns (depth_reprojected, x_reprojected, y_reprojected, x_src, y_src),
    all [H, W].
    """
    h, w = depth_ref.shape
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    grid = jnp.stack([xs.ravel(), ys.ravel(),
                      jnp.ones(h * w, jnp.float32)])       # [3, HW]

    # ref pixels -> ref cam -> src cam
    xyz_ref = _mm(invert_intrinsics(k_ref),
                  grid * depth_ref.reshape(1, -1))
    rel = _mm(e_src, invert_rigid(e_ref))
    xyz_src = _mm(rel[:3, :3], xyz_ref) + rel[:3, 3:4]
    k_xyz = _mm(k_src, xyz_src)
    xy_src = k_xyz[:2] / k_xyz[2:3]
    x_src = xy_src[0].reshape(h, w)
    y_src = xy_src[1].reshape(h, w)

    # sample src depth (cv2.remap INTER_LINEAR, border 0 == zero-pad bilinear)
    sampled = bilinear_sample(depth_src[None, :, :, None],
                              x_src[None], y_src[None])[0, :, :, 0]

    # back-project with sampled depth -> ref
    xyz_src2 = _mm(invert_intrinsics(k_src),
                   jnp.concatenate([xy_src, jnp.ones((1, h * w))])
                   * sampled.reshape(1, -1))
    rel_back = _mm(e_ref, invert_rigid(e_src))
    xyz_reproj = _mm(rel_back[:3, :3], xyz_src2) + rel_back[:3, 3:4]
    depth_reproj = xyz_reproj[2].reshape(h, w)

    k_xyz_reproj = _mm(k_ref, xyz_reproj)
    k_xyz_reproj = jnp.where(k_xyz_reproj == 0.0, 1e-5, k_xyz_reproj)
    xy_reproj = jnp.clip(k_xyz_reproj[:2] / k_xyz_reproj[2:3], -1e8, 1e8)
    x_reproj = xy_reproj[0].reshape(h, w)
    y_reproj = xy_reproj[1].reshape(h, w)
    return depth_reproj, x_reproj, y_reproj, x_src, y_src


def check_geometric_consistency(depth_ref, k_ref, e_ref, depth_src, k_src,
                                e_src, depth_max, depth_min,
                                geo_pixel_thres=1.0, geo_depth_thres=0.01):
    """Single src-view consistency mask (filter.py:54-87)."""
    h, w = depth_ref.shape
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    depth_reproj, x2d, y2d, xs_src, ys_src = reproject_with_depth(
        depth_ref, k_ref, e_ref, depth_src, k_src, e_src)
    dist = jnp.sqrt((x2d - xs) ** 2 + (y2d - ys) ** 2)
    rel_diff = jnp.abs(depth_reproj - depth_ref) / depth_ref
    mask = (dist < geo_pixel_thres) & (rel_diff < geo_depth_thres)
    mask &= (depth_ref > depth_min) & (depth_ref < depth_max)
    return mask, jnp.where(mask, depth_reproj, 0.0), xs_src, ys_src


@functools.partial(jax.jit, static_argnames=())
def _consistency_batch(depth_ref, k_ref, e_ref, depth_srcs, k_srcs, e_srcs,
                       valid, depth_max, depth_min, pix_thres, d_thres):
    """All-source-view reprojection: returns per-view (dist, rel_diff,
    depth_reproj) plus the standard mask reduction.

    depth_srcs: [S, H, W]; valid: [S] bool (padding slots masked out).
    """
    h, w = depth_ref.shape
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")

    def per_src(depth_src, k_src, e_src):
        depth_reproj, x2d, y2d, _, _ = reproject_with_depth(
            depth_ref, k_ref, e_ref, depth_src, k_src, e_src)
        dist = jnp.sqrt((x2d - xs) ** 2 + (y2d - ys) ** 2)
        rel = jnp.abs(depth_reproj - depth_ref) / depth_ref
        return dist, rel, depth_reproj

    dist, rel, depth_reproj = jax.vmap(per_src)(depth_srcs, k_srcs, e_srcs)

    in_range = (depth_ref > depth_min) & (depth_ref < depth_max)
    mask = (dist < pix_thres) & (rel < d_thres) & in_range[None]
    mask &= valid[:, None, None]
    geo_sum = jnp.sum(mask.astype(jnp.int32), axis=0)
    depth_sum = jnp.sum(jnp.where(mask, depth_reproj, 0.0), axis=0)
    depth_avg = (depth_sum + depth_ref) / (geo_sum + 1)
    return dist, rel, depth_reproj, mask, geo_sum, depth_avg


def _load_view(out_folder: str, view: int):
    intr, extr, dmax, dmin = read_camera_parameters(
        os.path.join(out_folder, f"cams/{view:08d}_cam.txt"))
    depth = read_pfm(
        os.path.join(out_folder, f"depth_est/{view:08d}.pfm"))[0]
    return intr, extr, dmax, dmin, np.ascontiguousarray(depth)


def _photo_mask(out_folder: str, ref_view: int, photo_thres,
                method: str, dynamic: bool = False) -> np.ndarray:
    """AND of per-stage confidence thresholds (filter.py:117-138,322-343)."""
    n_conf = 3 if method == "casdiffmvs" else 2
    confs = [read_pfm(os.path.join(
        out_folder, f"conf{i}/{ref_view:08d}.pfm"))[0] for i in range(n_conf)]
    if method == "casdiffmvs":
        mask = ((confs[0] > photo_thres[0]) & (confs[1] > photo_thres[1])
                & (confs[2] > photo_thres[2]))
    elif dynamic:
        # DiffMVS dynamic path uses the LAST threshold for the refinement
        # confidence (filter.py:342)
        mask = (confs[0] > photo_thres[0]) & (confs[1] > photo_thres[2])
    else:
        mask = (confs[0] > photo_thres[0]) & (confs[1] > photo_thres[1])
    return mask


def _pad_srcs(src_views: Sequence[int], bucket: int) -> List[int]:
    """Pad the source list to a bucket size (repeat last; masked invalid)."""
    padded = list(src_views)[:bucket]
    n_valid = len(padded)
    while len(padded) < bucket:
        padded.append(padded[-1])
    return padded, n_valid


def _unproject_masked(depth_avg, final_mask, ref_img, k_ref, e_ref):
    """Masked pixels -> world points + colors (filter.py:198-210)."""
    h, w = depth_avg.shape
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    valid = np.asarray(final_mask)
    x = xs[valid]
    y = ys[valid]
    depth = np.asarray(depth_avg)[valid]
    color = ref_img[valid]
    xyz_ref = np.linalg.inv(k_ref) @ (
        np.vstack((x, y, np.ones_like(x))) * depth)
    xyz_world = (np.linalg.inv(e_ref) @ np.vstack(
        (xyz_ref, np.ones_like(x))))[:3]
    return xyz_world.T, color


def filter_depth(pair_folder: str, out_folder: str, plyfilename: str,
                 geo_mask_thres: int = 3, geo_pixel_thres: float = 1.0,
                 geo_depth_thres: float = 0.01,
                 photo_thres=(0.3, 0.5, 0.5), method: str = "casdiffmvs",
                 dataset: str = "dtu", src_bucket: int = 10,
                 save_masks: bool = True) -> None:
    """Standard fusion (filter.py:90-227)."""
    pair_data = read_pair_file(os.path.join(pair_folder, "pair.txt"), dataset)

    vertexs, vertex_colors = [], []
    for ref_view, src_views in pair_data:
        k_ref, e_ref, depth_max, depth_min, ref_depth = _load_view(
            out_folder, ref_view)
        ref_img = read_img(
            os.path.join(out_folder, f"images/{ref_view:08d}.jpg"))
        photo_mask = _photo_mask(out_folder, ref_view, photo_thres, method)

        padded, n_valid = _pad_srcs(src_views, src_bucket)
        srcs = [_load_view(out_folder, v) for v in padded]
        k_srcs = np.stack([s[0] for s in srcs])
        e_srcs = np.stack([s[1] for s in srcs])
        d_srcs = np.stack([s[4] for s in srcs])
        valid = np.arange(src_bucket) < n_valid

        _, _, _, _, geo_sum, depth_avg = _consistency_batch(
            jnp.asarray(ref_depth), jnp.asarray(k_ref), jnp.asarray(e_ref),
            jnp.asarray(d_srcs), jnp.asarray(k_srcs), jnp.asarray(e_srcs),
            jnp.asarray(valid), jnp.float32(depth_max),
            jnp.float32(depth_min), jnp.float32(geo_pixel_thres),
            jnp.float32(geo_depth_thres))

        geo_mask = np.asarray(geo_sum) >= geo_mask_thres
        final_mask = photo_mask & geo_mask

        if save_masks:
            os.makedirs(os.path.join(out_folder, "mask"), exist_ok=True)
            save_mask(os.path.join(
                out_folder, f"mask/{ref_view:08d}_photo.png"), photo_mask)
            save_mask(os.path.join(
                out_folder, f"mask/{ref_view:08d}_geo.png"), geo_mask)
            save_mask(os.path.join(
                out_folder, f"mask/{ref_view:08d}_final.png"), final_mask)

        print(f"processing {out_folder}, ref-view{ref_view:02d}, "
              f"photo/geo/final-mask:{photo_mask.mean():.3f}/"
              f"{geo_mask.mean():.3f}/{final_mask.mean():.3f}")

        xyz, color = _unproject_masked(depth_avg, final_mask, ref_img,
                                       k_ref, e_ref)
        vertexs.append(xyz)
        vertex_colors.append(color)

    write_ply(plyfilename, np.concatenate(vertexs),
              np.concatenate(vertex_colors))
    print("saving the final model to", plyfilename)


@functools.partial(jax.jit, static_argnames=("dh_view_num",))
def _dynamic_mask_family(dist, rel, depth_reproj, valid, ref_depth,
                         dist_div, rel_div, dh_view_num):
    """D2HC mask family i in [dh_view_num, 10] on device
    (filter.py:253-257, 378-380): accept a pixel if >= i source views are
    consistent at the i-th loosest thresholds for any i, or >= 10 views at
    the strict thresholds. Also returns the strict-mask depth average."""
    valid_b = valid[:, None, None]
    strict = (dist < 10.0 / dist_div) & (rel < 10.0 / rel_div) & valid_b
    geo_mask_sum = strict.sum(0)
    geo_mask = geo_mask_sum >= 10
    for i in range(dh_view_num, 11):
        mi = ((dist < i / dist_div) & (rel < i / rel_div) & valid_b).sum(0)
        geo_mask |= mi >= i
    depth_masked = jnp.where(strict, depth_reproj, 0.0)
    depth_avg = (depth_masked.sum(0) + ref_depth) / (geo_mask_sum + 1)
    return geo_mask, depth_avg


def filter_depth_dynamic(scan: str, pair_folder: str, out_folder: str,
                         plyfilename: str, photo_thres=(0.3, 0.5, 0.5),
                         method: str = "casdiffmvs",
                         dynamic_params: Dict = None,
                         src_bucket: int = 10,
                         save_masks: bool = True) -> None:
    """D2HC-RMVSNet-style dynamic consistency for T&T (filter.py:262-440).

    dynamic_params: {scan: (dh_view_num, dist_div, rel_diff_div)}; defaults
    to the reference's per-scene table (config.TANK_DYNAMIC_PARAMS).
    """
    from diffmvs_tpu.config import TANK_DYNAMIC_PARAMS

    params = dynamic_params or TANK_DYNAMIC_PARAMS
    dh_view_num, dist_div, rel_div = params[scan]

    pair_data = read_pair_file(os.path.join(pair_folder, "pair.txt"))
    vertexs, vertex_colors = [], []

    for ref_view, src_views in pair_data:
        k_ref, e_ref, depth_max, depth_min, ref_depth = _load_view(
            out_folder, ref_view)
        ref_img = read_img(
            os.path.join(out_folder, f"images/{ref_view:08d}.jpg"))
        photo_mask = _photo_mask(out_folder, ref_view, photo_thres, method,
                                 dynamic=True)

        padded, n_valid = _pad_srcs(src_views, src_bucket)
        srcs = [_load_view(out_folder, v) for v in padded]
        k_srcs = np.stack([s[0] for s in srcs])
        e_srcs = np.stack([s[1] for s in srcs])
        d_srcs = np.stack([s[4] for s in srcs])
        valid_np = np.arange(src_bucket) < n_valid

        # the per-view mask family uses the i=10 mask as the "strict" mask
        dist, rel, depth_reproj, _, _, _ = _consistency_batch(
            jnp.asarray(ref_depth), jnp.asarray(k_ref), jnp.asarray(e_ref),
            jnp.asarray(d_srcs), jnp.asarray(k_srcs), jnp.asarray(e_srcs),
            jnp.asarray(valid_np), jnp.float32(depth_max),
            jnp.float32(depth_min), jnp.float32(10.0 / dist_div),
            jnp.float32(10.0 / rel_div))

        geo_mask, depth_avg = _dynamic_mask_family(
            dist, rel, depth_reproj, jnp.asarray(valid_np),
            jnp.asarray(ref_depth), jnp.float32(dist_div),
            jnp.float32(rel_div), dh_view_num)
        geo_mask = np.asarray(geo_mask)
        depth_avg = np.asarray(depth_avg)
        mask_depth = (depth_avg >= depth_min) & (depth_avg <= depth_max)

        final_mask = photo_mask & geo_mask & mask_depth

        if save_masks:
            os.makedirs(os.path.join(out_folder, "mask"), exist_ok=True)
            save_mask(os.path.join(
                out_folder, f"mask/{ref_view:08d}_photo.png"), photo_mask)
            save_mask(os.path.join(
                out_folder, f"mask/{ref_view:08d}_geo.png"), geo_mask)
            save_mask(os.path.join(
                out_folder, f"mask/{ref_view:08d}_final.png"), final_mask)

        print(f"processing {out_folder}, ref-view{ref_view:02d}, "
              f"photo/geo/final-mask:{photo_mask.mean():.3f}/"
              f"{geo_mask.mean():.3f}/{final_mask.mean():.3f}")

        xyz, color = _unproject_masked(depth_avg, final_mask, ref_img,
                                       k_ref, e_ref)
        vertexs.append(xyz)
        vertex_colors.append(color)

    write_ply(plyfilename, np.concatenate(vertexs),
              np.concatenate(vertex_colors))
    print("saving the final model to", plyfilename)
