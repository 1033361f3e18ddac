"""R2Former-style global image descriptors for retrieval view selection.

Parity target: /root/reference/r2former.py — a DeiT-S/16 *distilled* ViT
(embed 384, depth 12, heads 6) with cls + dist tokens; the descriptor is
L2-normalize((head(cls) + head_dist(dist)) / 2), 256-d. Used by the COLMAP
ingestion tool's VGGT mode (tools/colmap.py score_pairs descriptors hook).

Weights come from the external R2Former checkpoint via
`import_timm_state_dict` (timm VisionTransformer key layout).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from diffmvs_tpu.nn.layers import torch_kernel_init


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 16
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    num_classes: int = 256

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


class Attention(nn.Module):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        head_dim = c // self.num_heads
        qkv = nn.Dense(3 * c, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (head_dim ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(c, name="proj")(out)


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        x = x + Attention(self.dim, self.num_heads, name="attn")(y)
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="fc2")(y)
        return x + y


class DistilledViT(nn.Module):
    """DeiT-distilled ViT emitting a unit-norm global descriptor."""

    cfg: ViTConfig = ViTConfig()

    @nn.compact
    def __call__(self, x):
        """x: [B, H, W, 3] (H=W=cfg.image_size). Returns [B, num_classes]."""
        cfg = self.cfg
        b = x.shape[0]
        patches = nn.Conv(cfg.embed_dim,
                          (cfg.patch_size, cfg.patch_size),
                          strides=cfg.patch_size, padding="VALID",
                          name="patch_embed")(x)
        patches = patches.reshape(b, -1, cfg.embed_dim)

        cls_token = self.param("cls_token", nn.initializers.zeros,
                               (1, 1, cfg.embed_dim))
        dist_token = self.param("dist_token", nn.initializers.zeros,
                                (1, 1, cfg.embed_dim))
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, cfg.num_patches + 2, cfg.embed_dim))

        tokens = jnp.concatenate([
            jnp.broadcast_to(cls_token, (b, 1, cfg.embed_dim)),
            jnp.broadcast_to(dist_token, (b, 1, cfg.embed_dim)),
            patches,
        ], axis=1) + pos_embed

        for i in range(cfg.depth):
            tokens = Block(cfg.embed_dim, cfg.num_heads, cfg.mlp_ratio,
                           name=f"block{i}")(tokens)
        tokens = nn.LayerNorm(epsilon=1e-6, name="norm")(tokens)

        cls_out = nn.Dense(cfg.num_classes, name="head")(tokens[:, 0])
        dist_out = nn.Dense(cfg.num_classes, name="head_dist")(tokens[:, 1])
        desc = (cls_out + dist_out) / 2.0
        return desc / jnp.linalg.norm(desc, axis=-1, keepdims=True)


def import_timm_state_dict(state_dict: Dict, cfg: ViTConfig = ViTConfig()):
    """timm DistilledVisionTransformer state_dict -> flax params."""
    def t(key):
        v = state_dict[key]
        return v.detach().cpu().numpy() if hasattr(v, "detach") \
            else np.asarray(v)

    p: Dict[str, Any] = {}
    w = t("patch_embed.proj.weight")          # [D, 3, ps, ps]
    p["patch_embed"] = {
        "kernel": np.transpose(w, (2, 3, 1, 0)),
        "bias": t("patch_embed.proj.bias"),
    }
    p["cls_token"] = t("cls_token")
    p["dist_token"] = t("dist_token")
    p["pos_embed"] = t("pos_embed")

    def dense(key):
        return {"kernel": t(key + ".weight").T, "bias": t(key + ".bias")}

    def norm(key):
        return {"scale": t(key + ".weight"), "bias": t(key + ".bias")}

    for i in range(cfg.depth):
        bk = f"blocks.{i}"
        p[f"block{i}"] = {
            "norm1": norm(f"{bk}.norm1"),
            "attn": {"qkv": dense(f"{bk}.attn.qkv"),
                     "proj": dense(f"{bk}.attn.proj")},
            "norm2": norm(f"{bk}.norm2"),
            "fc1": dense(f"{bk}.mlp.fc1"),
            "fc2": dense(f"{bk}.mlp.fc2"),
        }
    p["norm"] = norm("norm")
    p["head"] = dense("head")
    p["head_dist"] = dense("head_dist")
    return {"params": p}


def compute_descriptors(variables, images, cfg: ViTConfig = ViTConfig(),
                        batch: int = 8):
    """images: [N, H, W, 3] float in [0,1], resized to cfg.image_size with
    ImageNet normalization applied by the caller. Returns [N, num_classes]."""
    model = DistilledViT(cfg)
    fn = jax.jit(lambda v, x: model.apply(v, x))
    outs = []
    for i in range(0, images.shape[0], batch):
        outs.append(np.asarray(fn(variables, images[i:i + batch])))
    return np.concatenate(outs)
