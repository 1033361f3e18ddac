"""Point-cloud quality metrics: DTU-style accuracy/completeness + F-score.

The reference pipeline has no in-repo evaluation of its fused clouds — it
defers to the external DTU matlab toolbox / T&T evaluation server
(/root/reference/README.md:165-170). This module provides the same two
metric families natively so fusion quality is measurable offline (e.g. the
synthetic-scene tests in tests/test_fusion.py, or any scene with a GT
cloud):

  accuracy      mean / median distance from reconstructed points to the GT
                cloud (DTU "acc", lower is better), with the toolbox's
                outlier cutoff (distances > max_dist are excluded).
  completeness  mean / median distance from GT points to the reconstruction
                (DTU "comp").
  overall       (acc_mean + comp_mean) / 2 — the DTU headline number.
  precision/recall/f_score
                fraction of points within tau of the other cloud, both
                directions, and their harmonic mean (the Tanks&Temples
                F-score family).

TPU-native design: nearest-neighbor distance is a chunked pairwise
computation using |a-b|^2 = |a|^2 + |b|^2 - 2 a.b — the -2ab term is a
[chunk, 3] x [3, M] matmul, so the whole search runs on the MXU with
O(chunk * M) memory per step via lax.map (no KD-tree, no host loop). Exact,
not approximate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_CHUNK = 2048


def nn_distances(query, target, chunk: int = _CHUNK):
    """Exact distance from each query point to its nearest target point.

    query: [N, 3] float; target: [M, 3] float. Returns [N] float32.
    Chunked over the query axis; each chunk is one matmul + row-min.
    """
    query = jnp.asarray(query, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    n = query.shape[0]
    n_pad = -n % chunk
    q = jnp.pad(query, ((0, n_pad), (0, 0)))
    t_sq = jnp.sum(target * target, axis=1)              # [M]

    def one_chunk(qc):
        q_sq = jnp.sum(qc * qc, axis=1, keepdims=True)   # [C, 1]
        # f32 HIGHEST: the -2ab term cancels against |a|^2+|b|^2 for
        # near-coincident points; bf16 would round the cancellation away
        cross = jax.lax.dot_general(
            qc, target.T, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)         # [C, M]
        d2 = q_sq + t_sq[None, :] - 2.0 * cross
        return jnp.sqrt(jnp.maximum(jnp.min(d2, axis=1), 0.0))

    d = jax.lax.map(one_chunk, q.reshape(-1, chunk, 3))
    return d.reshape(-1)[:n]


def accuracy_completeness(pred, gt, max_dist: float = 20.0,
                          tau: float = 0.5, chunk: int = _CHUNK):
    """DTU acc/comp + T&T-style precision/recall/F-score for two clouds.

    pred: [N, 3] reconstructed points; gt: [M, 3] ground-truth points.
    max_dist: outlier cutoff for the acc/comp means (DTU toolbox uses
    20 mm); tau: inlier threshold for precision/recall/F-score.
    Returns a dict of python floats.
    """
    pred = np.asarray(pred, np.float32)
    gt = np.asarray(gt, np.float32)
    if pred.size == 0 or gt.size == 0:
        nanable = float("nan")
        return {"acc_mean": nanable, "acc_median": nanable,
                "comp_mean": nanable, "comp_median": nanable,
                "overall": nanable, "precision": 0.0, "recall": 0.0,
                "f_score": 0.0}

    d_pred = np.asarray(jax.jit(
        lambda a, b: nn_distances(a, b, chunk))(pred, gt))
    d_gt = np.asarray(jax.jit(
        lambda a, b: nn_distances(a, b, chunk))(gt, pred))

    acc = d_pred[d_pred <= max_dist]
    comp = d_gt[d_gt <= max_dist]
    acc_mean = float(acc.mean()) if acc.size else float("nan")
    comp_mean = float(comp.mean()) if comp.size else float("nan")
    precision = float((d_pred < tau).mean())
    recall = float((d_gt < tau).mean())
    f_score = (2 * precision * recall / (precision + recall)
               if precision + recall > 0 else 0.0)
    return {
        "acc_mean": acc_mean,
        "acc_median": float(np.median(acc)) if acc.size else float("nan"),
        "comp_mean": comp_mean,
        "comp_median": float(np.median(comp)) if comp.size else float("nan"),
        "overall": (acc_mean + comp_mean) / 2.0,
        "precision": precision,
        "recall": recall,
        "f_score": f_score,
    }


def sample_mesh_plane(z: float, x_range, y_range, step: float):
    """Uniform GT sample grid of the plane z=const (synthetic-scene GT)."""
    xs = np.arange(x_range[0], x_range[1] + 1e-6, step, dtype=np.float32)
    ys = np.arange(y_range[0], y_range[1] + 1e-6, step, dtype=np.float32)
    gx, gy = np.meshgrid(xs, ys, indexing="xy")
    return np.stack([gx.ravel(), gy.ravel(),
                     np.full(gx.size, z, np.float32)], axis=1)
