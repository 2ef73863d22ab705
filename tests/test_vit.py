import math

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn as nn

from tpuseg.nn import vit as V
from tpuseg.weights.torch_io import load_torch_file, flatten_state_dict
from tpuseg.weights.vit_map import from_torch_state


class TorchViT(nn.Module):
    """Reference-semantics ViT (jeonsworld/ViT-pytorch naming) as test golden."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        d, mlp = cfg.hidden_size, cfg.mlp_dim
        n = cfg.num_patches

        class Embeddings(nn.Module):
            def __init__(s):
                super().__init__()
                s.patch_embeddings = nn.Conv2d(3, d, cfg.patch_size, cfg.patch_size)
                s.cls_token = nn.Parameter(torch.randn(1, 1, d) * 0.02)
                s.position_embeddings = nn.Parameter(torch.randn(1, n + 1, d) * 0.02)

            def forward(s, x):
                x = s.patch_embeddings(x).flatten(2).transpose(1, 2)
                cls = s.cls_token.expand(x.size(0), -1, -1)
                return torch.cat([cls, x], 1) + s.position_embeddings

        class Attn(nn.Module):
            def __init__(s):
                super().__init__()
                s.query, s.key, s.value, s.out = (nn.Linear(d, d) for _ in range(4))

            def forward(s, x):
                b, t, _ = x.shape
                h, hd = cfg.num_heads, d // cfg.num_heads
                q = s.query(x).view(b, t, h, hd).transpose(1, 2)
                k = s.key(x).view(b, t, h, hd).transpose(1, 2)
                v = s.value(x).view(b, t, h, hd).transpose(1, 2)
                a = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(hd), -1)
                return s.out((a @ v).transpose(1, 2).reshape(b, t, d))

        class Block(nn.Module):
            def __init__(s):
                super().__init__()
                s.attention_norm = nn.LayerNorm(d, eps=cfg.ln_eps)
                s.ffn_norm = nn.LayerNorm(d, eps=cfg.ln_eps)
                s.attn = Attn()
                s.ffn = nn.Sequential()
                s.ffn.fc1 = nn.Linear(d, mlp)
                s.ffn.fc2 = nn.Linear(mlp, d)

            def forward(s, x):
                x = x + s.attn(s.attention_norm(x))
                h = s.ffn_norm(x)
                h = s.ffn.fc2(nn.functional.gelu(s.ffn.fc1(h)))
                return x + h

        class Encoder(nn.Module):
            def __init__(s):
                super().__init__()
                s.layer = nn.ModuleList([Block() for _ in range(cfg.num_layers)])
                s.encoder_norm = nn.LayerNorm(d, eps=cfg.ln_eps)

            def forward(s, x):
                for blk in s.layer:
                    x = blk(x)
                return s.encoder_norm(x)

        class Transformer(nn.Module):
            def __init__(s):
                super().__init__()
                s.embeddings = Embeddings()
                s.encoder = Encoder()

            def forward(s, x):
                return s.encoder(s.embeddings(x))

        self.transformer = Transformer()
        self.head = nn.Linear(d, cfg.num_classes)

    def forward(self, x):
        return self.head(self.transformer(x)[:, 0])


def test_vit_matches_torch_reference(tmp_path, rng):
    cfg = V.ViTConfig(
        image_size=32, patch_size=8, hidden_size=64, num_layers=3,
        num_heads=4, mlp_dim=128, num_classes=10,
    )
    torch.manual_seed(0)
    tmodel = TorchViT(cfg).eval()
    path = str(tmp_path / "vit.pth")
    torch.save(tmodel.state_dict(), path)

    flat = flatten_state_dict(load_torch_file(path))
    params = from_torch_state(flat, cfg)

    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    got = np.asarray(V.forward(params, jnp.asarray(x), cfg))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_vit_b16_shapes():
    import jax

    params = V.init_params(jax.random.PRNGKey(0), V.VIT_B16)
    x = jnp.zeros((1, 224, 224, 3))
    logits = jax.jit(lambda p, x: V.forward(p, x, V.VIT_B16))(params, x)
    assert logits.shape == (1, 1000)


def test_vit_npz_mapping(tmp_path, rng):
    """google-research npz layout loads and matches manual forward shapes."""
    import jax

    from tpuseg.weights.vit_map import from_npz

    cfg = V.ViTConfig(image_size=32, patch_size=8, hidden_size=64,
                      num_layers=2, num_heads=4, mlp_dim=128, num_classes=7)
    d, mlp, heads = 64, 128, 4
    hd = d // heads
    npz = {}
    npz["embedding/kernel"] = rng.standard_normal((8, 8, 3, d)).astype(np.float32)
    npz["embedding/bias"] = rng.standard_normal(d).astype(np.float32)
    npz["cls"] = rng.standard_normal((1, 1, d)).astype(np.float32)
    npz["Transformer/posembed_input/pos_embedding"] = rng.standard_normal(
        (1, cfg.num_patches + 1, d)).astype(np.float32)
    for i in range(2):
        eb = f"Transformer/encoderblock_{i}/"
        for ln, name in (("LayerNorm_0", "ln1"), ("LayerNorm_2", "ln2")):
            npz[eb + f"{ln}/scale"] = np.ones(d, np.float32)
            npz[eb + f"{ln}/bias"] = np.zeros(d, np.float32)
        at = eb + "MultiHeadDotProductAttention_1/"
        for nm in ("query", "key", "value"):
            npz[at + f"{nm}/kernel"] = rng.standard_normal(
                (d, heads, hd)).astype(np.float32)
            npz[at + f"{nm}/bias"] = rng.standard_normal(
                (heads, hd)).astype(np.float32)
        npz[at + "out/kernel"] = rng.standard_normal(
            (heads, hd, d)).astype(np.float32)
        npz[at + "out/bias"] = rng.standard_normal(d).astype(np.float32)
        npz[eb + "MlpBlock_3/Dense_0/kernel"] = rng.standard_normal(
            (d, mlp)).astype(np.float32)
        npz[eb + "MlpBlock_3/Dense_0/bias"] = rng.standard_normal(
            mlp).astype(np.float32)
        npz[eb + "MlpBlock_3/Dense_1/kernel"] = rng.standard_normal(
            (mlp, d)).astype(np.float32)
        npz[eb + "MlpBlock_3/Dense_1/bias"] = rng.standard_normal(
            d).astype(np.float32)
    npz["Transformer/encoder_norm/scale"] = np.ones(d, np.float32)
    npz["Transformer/encoder_norm/bias"] = np.zeros(d, np.float32)
    npz["head/kernel"] = rng.standard_normal((d, 7)).astype(np.float32)
    npz["head/bias"] = rng.standard_normal(7).astype(np.float32)

    params = from_npz(npz, cfg)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    logits = V.forward(jax.tree.map(jnp.asarray, params), x, cfg)
    assert logits.shape == (1, 7)
    assert np.isfinite(np.asarray(logits)).all()
