"""Vision Transformer (ViT-B/16) — the reference zoo's classification model.

Capability parity with ViT.jittor (see SURVEY.md §2.5): patch embed via a
16x16/s16 conv, cls token + learned position embeddings, N pre-LN encoder
blocks (MHSA + GELU MLP), final LayerNorm, linear classification head.

TPU-native design: the encoder blocks' params are STACKED along a leading
layer axis and the encoder runs as one ``lax.scan`` — one compiled block body
regardless of depth, better compile time, identical math. Attention is plain
``jnp.einsum`` (197-token sequences need no custom kernel; XLA fuses QK^T,
softmax and PV into MXU-friendly code).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from tpuseg.nn import layers as L


@dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 16
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    num_classes: int = 1000
    ln_eps: float = 1e-6

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


VIT_B16 = ViTConfig()
VIT_L16 = ViTConfig(hidden_size=1024, num_layers=24, num_heads=16, mlp_dim=4096)


def init_params(key: jax.Array, cfg: ViTConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 8)
    d, mlp, nl = cfg.hidden_size, cfg.mlp_dim, cfg.num_layers

    # each stacked parameter (q/k/v/out/fc1/fc2) gets an independent key —
    # reusing one key would make Q==K==V==O per layer (degenerate init)
    _stack_n = iter(range(64))

    def stack(f):
        k = jax.random.fold_in(ks[7], next(_stack_n))
        return jax.vmap(f)(jax.random.split(k, nl))

    block = {
        "ln1": {"weight": jnp.ones((nl, d), dtype), "bias": jnp.zeros((nl, d), dtype)},
        "ln2": {"weight": jnp.ones((nl, d), dtype), "bias": jnp.zeros((nl, d), dtype)},
        "attn": {
            "q": {"weight": stack(lambda k: L.xavier_linear(k, d, d, dtype)),
                  "bias": jnp.zeros((nl, d), dtype)},
            "k": {"weight": stack(lambda k: L.xavier_linear(k, d, d, dtype)),
                  "bias": jnp.zeros((nl, d), dtype)},
            "v": {"weight": stack(lambda k: L.xavier_linear(k, d, d, dtype)),
                  "bias": jnp.zeros((nl, d), dtype)},
            "out": {"weight": stack(lambda k: L.xavier_linear(k, d, d, dtype)),
                    "bias": jnp.zeros((nl, d), dtype)},
        },
        "mlp": {
            "fc1": {"weight": stack(lambda k: L.xavier_linear(k, d, mlp, dtype)),
                    "bias": jnp.zeros((nl, mlp), dtype)},
            "fc2": {"weight": stack(lambda k: L.xavier_linear(k, mlp, d, dtype)),
                    "bias": jnp.zeros((nl, d), dtype)},
        },
    }
    return {
        "patch_embed": L.conv_params(
            ks[0], cfg.patch_size, cfg.patch_size, 3, d, dtype=dtype
        ),
        "cls_token": jnp.zeros((1, 1, d), dtype),
        "pos_embed": jax.random.normal(ks[1], (1, cfg.num_patches + 1, d), dtype)
        * 0.02,
        "blocks": block,
        "ln": {"weight": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
        "head": L.linear_params(ks[2], d, cfg.num_classes, dtype=dtype),
    }


def _attention(x: jax.Array, p: dict, num_heads: int) -> jax.Array:
    b, n, d = x.shape
    hd = d // num_heads

    def proj(pp):
        return L.linear(x, pp).reshape(b, n, num_heads, hd)

    q = proj(p["q"])
    k = proj(p["k"])
    v = proj(p["v"])
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k) / jnp.sqrt(
        jnp.asarray(hd, x.dtype)
    )
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, d)
    return L.linear(out, p["out"])


def _block(x: jax.Array, p: dict, cfg: ViTConfig) -> jax.Array:
    h = L.layer_norm(x, p["ln1"], cfg.ln_eps)
    x = x + _attention(h, p["attn"], cfg.num_heads)
    h = L.layer_norm(x, p["ln2"], cfg.ln_eps)
    h = L.linear(h, p["mlp"]["fc1"])
    h = L.gelu(h)
    h = L.linear(h, p["mlp"]["fc2"])
    return x + h


def forward(params: dict, images: jax.Array, cfg: ViTConfig = VIT_B16):
    """images [B, H, W, 3] (already normalized) -> logits [B, num_classes]."""
    return L.linear(features(params, images, cfg), params["head"])


def features(params: dict, images: jax.Array, cfg: ViTConfig = VIT_B16):
    """Pre-head cls embedding [B, hidden] (for probing / finetuning)."""
    x = L.conv2d(images, params["patch_embed"], stride=cfg.patch_size)
    b, gh, gw, d = x.shape
    x = x.reshape(b, gh * gw, d)
    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype), (b, 1, d))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"].astype(x.dtype)

    def body(carry, layer_params):
        return _block(carry, layer_params, cfg), None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = L.layer_norm(x, params["ln"], cfg.ln_eps)
    return x[:, 0]
