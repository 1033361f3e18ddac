"""DistilledViT retrieval descriptor parity vs a torch oracle."""

import numpy as np
import jax
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from diffmvs_tpu.tools.retrieval import (
    DistilledViT,
    ViTConfig,
    import_timm_state_dict,
)


class _TorchBlock(nn.Module):
    def __init__(self, dim, heads, mlp_ratio):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(dim, 3 * dim)
        self.attn.proj = nn.Linear(dim, dim)
        self.heads = heads
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, int(dim * mlp_ratio))
        self.mlp.fc2 = nn.Linear(int(dim * mlp_ratio), dim)

    def forward(self, x):
        b, n, c = x.shape
        hd = c // self.heads
        y = self.norm1(x)
        qkv = self.attn.qkv(y).reshape(b, n, 3, self.heads, hd)
        q, k, v = (qkv[:, :, i].transpose(1, 2) for i in range(3))
        a = (q @ k.transpose(-2, -1)) * hd ** -0.5
        a = a.softmax(dim=-1)
        y = (a @ v).transpose(1, 2).reshape(b, n, c)
        x = x + self.attn.proj(y)
        y = self.norm2(x)
        return x + self.mlp.fc2(F.gelu(self.mlp.fc1(y)))


class _TorchDeiT(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        pe = nn.Module()
        pe.proj = nn.Conv2d(3, cfg.embed_dim, cfg.patch_size,
                            stride=cfg.patch_size)
        self.patch_embed = pe
        self.cls_token = nn.Parameter(torch.randn(1, 1, cfg.embed_dim) * .02)
        self.dist_token = nn.Parameter(torch.randn(1, 1, cfg.embed_dim) * .02)
        self.pos_embed = nn.Parameter(
            torch.randn(1, cfg.num_patches + 2, cfg.embed_dim) * .02)
        self.blocks = nn.ModuleList(
            [_TorchBlock(cfg.embed_dim, cfg.num_heads, cfg.mlp_ratio)
             for _ in range(cfg.depth)])
        self.norm = nn.LayerNorm(cfg.embed_dim, eps=1e-6)
        self.head = nn.Linear(cfg.embed_dim, cfg.num_classes)
        self.head_dist = nn.Linear(cfg.embed_dim, cfg.num_classes)

    def forward(self, x):
        b = x.shape[0]
        p = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(b, -1, -1),
                       self.dist_token.expand(b, -1, -1), p], dim=1)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x)
        out = (self.head(x[:, 0]) + self.head_dist(x[:, 1])) / 2
        return F.normalize(out, p=2, dim=1)


def test_retrieval_descriptor_parity(rng):
    cfg = ViTConfig(image_size=32, patch_size=16, embed_dim=64, depth=2,
                    num_heads=4, num_classes=16)
    torch.manual_seed(0)
    oracle = _TorchDeiT(cfg).eval()
    x = rng.rand(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()

    variables = import_timm_state_dict(oracle.state_dict(), cfg)
    ours = jax.jit(lambda v, x: DistilledViT(cfg).apply(v, x))(
        variables, x)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-4)
    # unit norm
    np.testing.assert_allclose(np.linalg.norm(np.asarray(ours), axis=1),
                               1.0, rtol=1e-5)
