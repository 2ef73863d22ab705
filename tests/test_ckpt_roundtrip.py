"""Reference-convention checkpoint save (VERDICT r3 item 6).

A tpuseg training snapshot written as ``<cfg>_<epoch>_<iter>.pth``
(yolact SavePath semantics, README.md:232-233) must:
  * round-trip through tpuseg's own resume path (load_params_ckpt),
  * load through REAL ``torch.load`` with dbolya module names intact,
  * keep the filename-iteration resume semantics (--start_iter=-1).
"""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from tpuseg.engine.trainer import (ckpt_path, load_params_ckpt,
                                   parse_ckpt_iter, save_params_pth)
from tpuseg.models import yolact as Y


def tiny_cfg(**kw):
    return Y.YolactConfig(
        backbone="resnet50", img_size=128, num_classes=5, mask_dim=8,
        fpn_channels=32, **kw)


def _assert_tree_equal(a, b):
    la = jax.tree.leaves(a, is_leaf=lambda x: x is None)
    lb = jax.tree.leaves(b, is_leaf=lambda x: x is None)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        if x is None or y is None:
            assert x is None and y is None
            continue
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_pth_roundtrip_tpuseg(tmp_path):
    cfg = tiny_cfg()
    params = Y.init_params(jax.random.PRNGKey(0), cfg)
    path = ckpt_path(str(tmp_path), "yolact_base", 3, 12345)
    assert path.endswith("yolact_base_3_12345.pth")
    save_params_pth(path, jax.device_get(params), cfg)
    assert parse_ckpt_iter(path) == 12345
    restored = load_params_ckpt(path, params, cfg)
    _assert_tree_equal(params, restored)


def test_pth_roundtrip_plus(tmp_path):
    """++ checkpoints carry DCN offset convs + FastMaskIoUNet."""
    cfg = tiny_cfg(dcn_backbone=True, use_maskiou=True)
    params = Y.init_params(jax.random.PRNGKey(1), cfg)
    path = ckpt_path(str(tmp_path), "yolact_plus_base", 0, 7)
    save_params_pth(path, jax.device_get(params), cfg)
    restored = load_params_ckpt(path, params, cfg)
    _assert_tree_equal(params, restored)
    assert "maskiou" in restored


def test_pth_loads_in_real_torch(tmp_path):
    """The written zip is a genuine torch checkpoint with dbolya names."""
    cfg = tiny_cfg()
    params = Y.init_params(jax.random.PRNGKey(2), cfg)
    path = str(tmp_path / "yolact_base_0_100.pth")
    save_params_pth(path, jax.device_get(params), cfg)
    sd = torch.load(path, map_location="cpu", weights_only=False)
    assert "backbone.conv1.weight" in sd
    assert "prediction_layers.0.bbox_layer.weight" in sd
    assert "fpn.lat_layers.0.weight" in sd
    assert "backbone.bn1.num_batches_tracked" in sd
    # torch layout is OIHW; tree layout is HWIO
    w_t = sd["backbone.conv1.weight"].numpy()
    w_j = np.asarray(params["backbone"]["stem"]["conv"]["weight"])
    np.testing.assert_array_equal(w_t.transpose(2, 3, 1, 0), w_j)
    # lat_layers.0 consumes C5: its torch in-channels must be 2048
    assert sd["fpn.lat_layers.0.weight"].shape[1] == 2048


def test_npz_resume_still_works(tmp_path):
    from tpuseg.engine.trainer import save_params_npz

    cfg = tiny_cfg()
    params = Y.init_params(jax.random.PRNGKey(3), cfg)
    path = ckpt_path(str(tmp_path), "yolact_base", 1, 55, fmt="npz")
    save_params_npz(path, jax.device_get(params))
    assert parse_ckpt_iter(path) == 55
    restored = load_params_ckpt(path, params, cfg)
    _assert_tree_equal(params, restored)
