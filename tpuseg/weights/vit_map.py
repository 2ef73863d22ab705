"""ViT checkpoint conversion: reference state dicts -> tpuseg param trees.

Handles the two formats the reference ViT.jittor consumes (SURVEY.md §2.5
"load jax/torch-converted .pth/.npz pretrained"):
  * torch state dicts with jeonsworld/ViT-pytorch naming
    (``transformer.encoder.layer.{i}.attn.query.weight`` ...)
  * google-research vision_transformer ``.npz`` files
    (``Transformer/encoderblock_{i}/MultiHeadDotProductAttention_1/...``)

Our encoder blocks are stacked on a leading layer axis (see tpuseg.nn.vit),
so per-layer tensors are transposed to [in, out] and np.stack-ed.
"""
from __future__ import annotations

import numpy as np

from tpuseg.nn.vit import ViTConfig


def _t(a):  # torch Linear [out, in] -> [in, out]
    return np.ascontiguousarray(a.T)


def from_torch_state(flat: dict[str, np.ndarray], cfg: ViTConfig) -> dict:
    """jeonsworld/ViT-pytorch style state dict -> param tree."""
    g = lambda k: np.asarray(flat[k], np.float32)  # noqa: E731
    nl = cfg.num_layers
    pre = "transformer."

    def per_layer(fmt, conv=lambda x: x):
        return np.stack([conv(g(fmt.format(i))) for i in range(nl)])

    lp = pre + "encoder.layer.{}."
    blocks = {
        "ln1": {
            "weight": per_layer(lp + "attention_norm.weight"),
            "bias": per_layer(lp + "attention_norm.bias"),
        },
        "ln2": {
            "weight": per_layer(lp + "ffn_norm.weight"),
            "bias": per_layer(lp + "ffn_norm.bias"),
        },
        "attn": {
            name: {
                "weight": per_layer(lp + f"attn.{src}.weight", _t),
                "bias": per_layer(lp + f"attn.{src}.bias"),
            }
            for name, src in [
                ("q", "query"), ("k", "key"), ("v", "value"), ("out", "out"),
            ]
        },
        "mlp": {
            "fc1": {
                "weight": per_layer(lp + "ffn.fc1.weight", _t),
                "bias": per_layer(lp + "ffn.fc1.bias"),
            },
            "fc2": {
                "weight": per_layer(lp + "ffn.fc2.weight", _t),
                "bias": per_layer(lp + "ffn.fc2.bias"),
            },
        },
    }
    patch_w = g(pre + "embeddings.patch_embeddings.weight")  # OIHW
    return {
        "patch_embed": {
            "weight": np.ascontiguousarray(patch_w.transpose(2, 3, 1, 0)),
            "bias": g(pre + "embeddings.patch_embeddings.bias"),
        },
        "cls_token": g(pre + "embeddings.cls_token"),
        "pos_embed": g(pre + "embeddings.position_embeddings"),
        "blocks": blocks,
        "ln": {
            "weight": g(pre + "encoder.encoder_norm.weight"),
            "bias": g(pre + "encoder.encoder_norm.bias"),
        },
        "head": {"weight": _t(g("head.weight")), "bias": g("head.bias")},
    }


def from_npz(npz: dict, cfg: ViTConfig) -> dict:
    """google-research vision_transformer npz -> param tree."""
    g = lambda k: np.asarray(npz[k], np.float32)  # noqa: E731
    nl = cfg.num_layers
    d = cfg.hidden_size

    def attn_w(i, name):
        w = g(f"Transformer/encoderblock_{i}/MultiHeadDotProductAttention_1/{name}/kernel")
        b = g(f"Transformer/encoderblock_{i}/MultiHeadDotProductAttention_1/{name}/bias")
        if name == "out":  # [H, hd, D] -> [D, D]
            return w.reshape(-1, d), b
        return w.reshape(d, -1), b.reshape(-1)  # [D, H, hd] -> [D, D]

    def stack_attn(name):
        ws, bs = zip(*[attn_w(i, name) for i in range(nl)])
        return {"weight": np.stack(ws), "bias": np.stack(bs)}

    def stack(fmt, conv=lambda x: x):
        return np.stack([conv(g(fmt.format(i))) for i in range(nl)])

    eb = "Transformer/encoderblock_{}/"
    blocks = {
        "ln1": {"weight": stack(eb + "LayerNorm_0/scale"),
                "bias": stack(eb + "LayerNorm_0/bias")},
        "ln2": {"weight": stack(eb + "LayerNorm_2/scale"),
                "bias": stack(eb + "LayerNorm_2/bias")},
        "attn": {
            "q": stack_attn("query"),
            "k": stack_attn("key"),
            "v": stack_attn("value"),
            "out": stack_attn("out"),
        },
        "mlp": {
            "fc1": {"weight": stack(eb + "MlpBlock_3/Dense_0/kernel"),
                    "bias": stack(eb + "MlpBlock_3/Dense_0/bias")},
            "fc2": {"weight": stack(eb + "MlpBlock_3/Dense_1/kernel"),
                    "bias": stack(eb + "MlpBlock_3/Dense_1/bias")},
        },
    }
    return {
        "patch_embed": {"weight": g("embedding/kernel"), "bias": g("embedding/bias")},
        "cls_token": g("cls"),
        "pos_embed": g("Transformer/posembed_input/pos_embedding"),
        "blocks": blocks,
        "ln": {"weight": g("Transformer/encoder_norm/scale"),
               "bias": g("Transformer/encoder_norm/bias")},
        "head": {"weight": g("head/kernel"), "bias": g("head/bias")},
    }
