
import pytest

from drn_wsod_tpu.config import get_cfg

pytestmark = pytest.mark.core


def test_defaults_tree():
    cfg = get_cfg()
    assert cfg.MODEL.ROI_HEADS.NUM_CLASSES == 20
    assert cfg.WSL.REFINE_NUM == 3
    assert cfg.MODEL.RESNETS.RES5_DILATION == 2


def test_attribute_set_get():
    cfg = get_cfg()
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 80
    assert cfg.MODEL.ROI_HEADS.NUM_CLASSES == 80


def test_freeze():
    cfg = get_cfg()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.MODEL.ROI_HEADS.NUM_CLASSES = 80
    cfg.defrost()
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 80


def test_merge_from_list():
    cfg = get_cfg()
    cfg.merge_from_list(["MODEL.ROI_HEADS.NUM_CLASSES", "80",
                         "SOLVER.BASE_LR", "0.02",
                         "DATASETS.TRAIN", "('voc_2007_trainval',)"])
    assert cfg.MODEL.ROI_HEADS.NUM_CLASSES == 80
    assert cfg.SOLVER.BASE_LR == 0.02
    assert cfg.DATASETS.TRAIN == ("voc_2007_trainval",)


def test_merge_from_list_bad_key():
    cfg = get_cfg()
    with pytest.raises(KeyError):
        cfg.merge_from_list(["MODEL.NO_SUCH_KEY", "1"])


def test_merge_from_file_with_base(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text("MODEL:\n  ROI_HEADS:\n    NUM_CLASSES: 80\nSOLVER:\n  BASE_LR: 0.5\n")
    child = tmp_path / "child.yaml"
    child.write_text("_BASE_: base.yaml\nSOLVER:\n  BASE_LR: 0.25\n")
    cfg = get_cfg()
    cfg.merge_from_file(str(child))
    assert cfg.MODEL.ROI_HEADS.NUM_CLASSES == 80
    assert cfg.SOLVER.BASE_LR == 0.25


def test_tuple_coercion_from_yaml_list(tmp_path):
    f = tmp_path / "c.yaml"
    f.write_text("DATASETS:\n  TRAIN: ['a', 'b']\n")
    cfg = get_cfg()
    cfg.merge_from_file(str(f))
    assert cfg.DATASETS.TRAIN == ("a", "b")


def test_clone_and_dump_roundtrip():
    cfg = get_cfg()
    c2 = cfg.clone()
    c2.SOLVER.BASE_LR = 99.0
    assert cfg.SOLVER.BASE_LR != 99.0
    text = cfg.dump()
    assert "BASE_LR" in text


def test_reference_version_key_rejected_loudly(tmp_path):
    """``VERSION: 2`` (the reference's current config version) merges as a
    drop-in; older versions need detectron2's migration machinery
    (compat.py), which this framework deliberately lacks — they must be
    rejected with a clear message, not silently misread."""
    import pytest

    ok = tmp_path / "current.yaml"
    ok.write_text("VERSION: 2\nSOLVER:\n  BASE_LR: 0.1\n")
    cfg = get_cfg()
    cfg.merge_from_file(str(ok))  # version 2 == current: accepted
    assert cfg.SOLVER.BASE_LR == 0.1

    f = tmp_path / "legacy.yaml"
    f.write_text("VERSION: 1\nSOLVER:\n  BASE_LR: 0.1\n")
    cfg = get_cfg()
    with pytest.raises(KeyError, match="VERSION"):
        cfg.merge_from_file(str(f))
