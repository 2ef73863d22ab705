import pytest

from tpuseg.engine.config import ConfigNode, get_config, available_configs


def test_attribute_access_and_nesting():
    cfg = ConfigNode({"MODEL": {"RPN": {"PRE_NMS_TOP_N_TEST": 6000}}})
    assert cfg.MODEL.RPN.PRE_NMS_TOP_N_TEST == 6000
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TEST = 1000
    assert cfg.MODEL.RPN.PRE_NMS_TOP_N_TEST == 1000


def test_merge_from_list():
    cfg = ConfigNode({"MODEL": {"DEVICE": "tpu"}})
    cfg.merge_from_list(["MODEL.DEVICE", "cpu", "SOLVER.BASE_LR", "0.01"])
    assert cfg.MODEL.DEVICE == "cpu"
    assert cfg.SOLVER.BASE_LR == 0.01  # yaml-parsed to float


def test_merge_from_file(tmp_path):
    p = tmp_path / "x.yaml"
    p.write_text("MODEL:\n  MASK_ON: True\n  RPN:\n    POST_NMS_TOP_N_TEST: 1000\n")
    cfg = ConfigNode({"MODEL": {"MASK_ON": False, "RPN": {"PRE_NMS_TOP_N_TEST": 6000}}})
    cfg.merge_from_file(str(p))
    assert cfg.MODEL.MASK_ON is True
    assert cfg.MODEL.RPN.PRE_NMS_TOP_N_TEST == 6000  # untouched
    assert cfg.MODEL.RPN.POST_NMS_TOP_N_TEST == 1000


def test_freeze():
    cfg = ConfigNode({"a": 1}).freeze()
    with pytest.raises(AttributeError):
        cfg.a = 2
    cfg.defrost()
    cfg.a = 2
    assert cfg.a == 2


def test_freeze_guards_every_dict_mutator():
    cfg = ConfigNode({"a": 1, "sub": {"b": 2}}).freeze()
    with pytest.raises(AttributeError):
        cfg["a"] = 2
    with pytest.raises(AttributeError):
        cfg |= {"a": 2}  # dict.__ior__ is C-level; needs its own guard
    with pytest.raises(AttributeError):
        cfg.sub |= {"b": 3}
    with pytest.raises(AttributeError):
        cfg.update({"a": 2})
    with pytest.raises(AttributeError):
        cfg.pop("a")
    with pytest.raises(AttributeError):
        cfg.popitem()
    with pytest.raises(AttributeError):
        cfg.clear()
    with pytest.raises(AttributeError):
        cfg.setdefault("new", 1)
    with pytest.raises(AttributeError):
        del cfg["a"]
    assert cfg.a == 1 and cfg.sub.b == 2
    cfg.defrost()
    cfg |= {"a": 5}
    assert cfg.a == 5


def test_yolact_copy_chain():
    base = ConfigNode({"name": "base", "max_size": 550, "nested": {"x": 1}})
    child = base.copy({"name": "child", "nested": {"x": 2}})
    assert base.name == "base" and base.nested.x == 1
    assert child.name == "child" and child.nested.x == 2
    assert child.max_size == 550


def test_named_presets():
    cfg = get_config("vit_b16_config")
    assert cfg.hidden_size == 768
    l = get_config("vit_l16_config")
    assert l.num_layers == 24 and l.patch_size == 16
    assert "coco2017_dataset" in available_configs()


def test_unknown_preset_raises():
    with pytest.raises(KeyError):
        get_config("nope_config")


def test_config_zoo_parses_and_dispatches():
    """Every shipped yaml parses and builds the right model variant
    (VERDICT r1 #3/#10)."""
    import glob
    import os

    from tpuseg.engine.config import ConfigNode
    from tpuseg.engine.maskrcnn_engine import build_predictor_from_cfg

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    yamls = sorted(glob.glob(os.path.join(root, "*.yaml")))
    assert len(yamls) >= 5
    for path in yamls:
        cfg = ConfigNode({"MODEL": {"WEIGHT": ""}})
        cfg.merge_from_file(path)
        pred = build_predictor_from_cfg(cfg)
        name = os.path.basename(path)
        if "retinanet" in name:
            assert pred.variant == "retinanet"
            assert pred.cfg.nms_thresh == 0.4
            assert pred.cfg.pre_nms_top_n == 1000
        elif "C4" in name:
            assert pred.variant == "c4"
            assert pred.cfg.rpn_pre_nms_top_n == 6000  # README.md:267
            assert pred.cfg.rpn_post_nms_top_n == 1000  # README.md:268
        else:
            assert pred.variant == "fpn"
            assert pred.cfg.fpn_post_nms_top_n == 1000
        assert pred.cfg.depth == (101 if "R_101" in name else 50)
        # MASK_ON dispatch: faster_rcnn yamls build boxes-only models
        if "retinanet" not in name:
            assert pred.cfg.mask_on == ("faster" not in name)
            if not pred.cfg.mask_on:
                key = "mask_pred" if pred.variant == "c4" else "mask_head"
                assert key not in pred.params


def test_cocodemo_c4_dispatch(tmp_path):
    """The README's COCODemo excerpt works against the C4 config
    (cfg.merge_from_file -> COCODemo(cfg, ...)), README.md:288-335."""
    import os

    from tpuseg.engine.config import ConfigNode
    from tpuseg.engine.predictor import COCODemo

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    cfg = ConfigNode({"MODEL": {"WEIGHT": ""}})
    cfg.merge_from_file(os.path.join(root, "e2e_mask_rcnn_R_50_C4_1x.yaml"))
    demo = COCODemo(cfg, min_image_size=800, confidence_threshold=0.5)
    assert demo.predictor.variant == "c4"
    assert demo.predictor.min_image_size == 800


def test_frozen_pop_with_default_on_missing_key_is_a_read():
    from tpuseg.engine.config import ConfigNode

    cfg = ConfigNode({"A": 1})
    cfg.freeze()
    assert cfg.pop("ABSENT", None) is None  # non-mutating form: allowed
    assert cfg.pop("ABSENT", 7) == 7
    import pytest
    with pytest.raises(AttributeError):
        cfg.pop("A", None)  # would actually remove -> guarded
    with pytest.raises(AttributeError):
        cfg.pop("A")
    with pytest.raises(AttributeError):
        cfg.pop("ABSENT")  # no default: dict.pop would raise KeyError,
        # but the guard fires first (consistent with other mutators)
    assert cfg["A"] == 1
