"""ViT classification predictor — the reference zoo's CPU-runnable smoke model.

Mirrors ViT.jittor's test/infer entry point (SURVEY.md §2.5): load pretrained
``.pth``/``.npz`` weights, preprocess a single image, return top-k classes.
The whole preprocess+forward path is one jit-compiled program.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.engine.config import ConfigNode, get_config
from tpuseg.nn import vit as vit_nn
from tpuseg.ops.preprocess import vit_preprocess


def config_to_vit(cfg: ConfigNode) -> vit_nn.ViTConfig:
    return vit_nn.ViTConfig(
        image_size=cfg.image_size,
        patch_size=cfg.patch_size,
        hidden_size=cfg.hidden_size,
        num_layers=cfg.num_layers,
        num_heads=cfg.num_heads,
        mlp_dim=cfg.mlp_dim,
        num_classes=cfg.num_classes,
    )


class ViTClassifier:
    """Programmatic predictor (analog of the reference's COCODemo surface)."""

    def __init__(self, config_name: str = "vit_b16_config", weights: str | None = None):
        self.cfg = get_config(config_name).freeze()
        self.vit_cfg = config_to_vit(self.cfg)
        if weights:
            self.params = load_vit_weights(weights, self.vit_cfg)
        else:
            self.params = vit_nn.init_params(jax.random.PRNGKey(0), self.vit_cfg)
        self._forward = jax.jit(
            functools.partial(_preprocess_and_forward, cfg=self.vit_cfg)
        )

    def run_on_image(self, image_rgb_u8: np.ndarray, top_k: int = 5):
        """uint8 RGB HWC image -> (top_k class ids, probabilities)."""
        # resize on host to the model's square input so the jitted program
        # compiles ONCE (feeding raw shapes re-traced the whole ViT per
        # distinct resolution)
        import cv2

        s = self.vit_cfg.image_size
        if image_rgb_u8.shape[:2] != (s, s):
            image_rgb_u8 = cv2.resize(image_rgb_u8, (s, s),
                                      interpolation=cv2.INTER_LINEAR)
        logits = self._forward(self.params, jnp.asarray(image_rgb_u8)[None])
        probs = jax.nn.softmax(logits, -1)[0]
        top_p, top_i = jax.lax.top_k(probs, top_k)
        return np.asarray(top_i), np.asarray(top_p)


def _preprocess_and_forward(params, images_u8, cfg: vit_nn.ViTConfig):
    x = vit_preprocess(images_u8, size=cfg.image_size)
    return vit_nn.forward(params, x, cfg)


def load_vit_weights(path: str, cfg: vit_nn.ViTConfig) -> dict:
    from tpuseg.weights import vit_map
    from tpuseg.weights.torch_io import flatten_state_dict, load_torch_file

    if path.endswith(".npz"):
        npz = dict(np.load(path))
        tree = vit_map.from_npz(npz, cfg)
    else:
        flat = flatten_state_dict(load_torch_file(path))
        tree = vit_map.from_torch_state(flat, cfg)
    return jax.tree.map(jnp.asarray, tree)
