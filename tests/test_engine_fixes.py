"""Engine-layer review fixes: freeze guards, padding=0 paste, tiny-dataset
guards, COCODemo min-size honoring."""
import numpy as np
import pytest


def test_config_freeze_guards_all_mutation_paths():
    from tpuseg.engine.config import ConfigNode

    cfg = ConfigNode({"MODEL": {"DEPTH": 50}, "X": 1})
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.X = 2
    with pytest.raises(AttributeError):
        cfg["X"] = 2
    with pytest.raises(AttributeError):
        cfg.merge_from_other({"X": 2})
    with pytest.raises(AttributeError):
        cfg.merge_from_list(["MODEL.DEPTH", 101])
    with pytest.raises(AttributeError):
        cfg.replace({"X": 3})
    assert cfg.X == 1 and cfg.MODEL.DEPTH == 50
    cfg.defrost()
    cfg.merge_from_list(["MODEL.DEPTH", 101])
    assert cfg.MODEL.DEPTH == 101
    # clone of a frozen config is writable (yacs clone semantics)
    c2 = cfg.freeze().clone()
    c2.X = 5
    assert c2.X == 5


def test_paste_mask_padding_zero_identity():
    from tpuseg.engine.maskrcnn_engine import paste_mask_in_image

    m = np.zeros((28, 28), np.float32)
    m[4:24, 4:24] = 1.0
    box = np.asarray([10.0, 10.0, 66.0, 66.0])
    out0 = paste_mask_in_image(m, box, 100, 100, padding=0)
    out1 = paste_mask_in_image(m, box, 100, 100, padding=1)
    assert out0.sum() > 0, "padding=0 must not produce an empty mask"
    # both paddings paste roughly the same region
    inter = (out0 & out1).sum()
    assert inter / max(out0.sum(), out1.sum()) > 0.8


def test_yolact_batch_iterator_rejects_tiny_dataset():
    from tpuseg.engine.yolact_train_loop import batch_iterator
    from tpuseg.models.yolact import YolactConfig

    class TinyDS:
        image_ids = [1, 2]

    gen = batch_iterator(TinyDS(), YolactConfig(img_size=64),
                         np.random.default_rng(0), batch_size=8)
    with pytest.raises(ValueError, match="batch_size"):
        next(gen)


def test_cocodemo_honors_yaml_min_size():
    from tpuseg.engine.config import ConfigNode
    from tpuseg.engine.predictor import COCODemo

    node = ConfigNode({
        "MODEL": {"META_ARCHITECTURE": "GeneralizedRCNN",
                  "MASK_ON": True,
                  "BACKBONE": {"CONV_BODY": "R-50-FPN"},
                  "WEIGHT": ""},
        "INPUT": {"MIN_SIZE_TEST": 480, "MAX_SIZE_TEST": 640},
    })
    demo = COCODemo(node)
    assert demo.predictor.min_image_size == 480
    assert demo.predictor.max_image_size == 640
    demo2 = COCODemo(node, min_image_size=320)
    assert demo2.predictor.min_image_size == 320


def test_sharded_inference_two_batch_args(rng):
    import jax
    import jax.numpy as jnp

    from tpuseg.parallel.inference import ShardedInference
    from tpuseg.parallel.mesh import make_mesh

    n = min(8, len(jax.devices()))
    if n < 2:
        pytest.skip("needs a multi-device mesh")

    def fn(params, a, b):
        return a * params["w"] + b

    params = {"w": jnp.asarray(2.0)}
    a = jnp.asarray(rng.standard_normal((n * 2, 3)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((n * 2, 3)).astype(np.float32))
    for sm in (False, True):
        si = ShardedInference(fn, params, mesh=make_mesh(n),
                              use_shard_map=sm, n_batch_args=2)
        np.testing.assert_allclose(np.asarray(si(a, b)),
                                   np.asarray(a) * 2.0 + np.asarray(b),
                                   rtol=1e-6)
