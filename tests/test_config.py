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
