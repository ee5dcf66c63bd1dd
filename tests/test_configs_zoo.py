"""Every shipped YAML must merge cleanly and build a model."""

import glob
import os

import pytest

from drn_wsod_tpu.config import get_cfg
from drn_wsod_tpu.models import build_model

CONFIG_ROOT = os.path.join(os.path.dirname(__file__), "..", "configs")
ALL_CONFIGS = sorted(
    p for p in glob.glob(os.path.join(CONFIG_ROOT, "**", "*.yaml"),
                         recursive=True)
    if "Base-" not in os.path.basename(p)
)


def test_found_configs():
    assert len(ALL_CONFIGS) >= 14


@pytest.mark.parametrize("path", ALL_CONFIGS,
                         ids=[os.path.relpath(p, CONFIG_ROOT)
                              for p in ALL_CONFIGS])
def test_config_merges_and_builds(path):
    cfg = get_cfg()
    cfg.merge_from_file(path)
    model = build_model(cfg)
    arch = cfg.MODEL.META_ARCHITECTURE
    if arch == "RetinaNet":
        assert model.num_classes == cfg.MODEL.RETINANET.NUM_CLASSES
        assert len(model.in_features) == len(model.anchor_sizes)
    elif arch == "PanopticFPN":
        assert model.num_classes == cfg.MODEL.ROI_HEADS.NUM_CLASSES
        assert model.sem_num_classes == cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES
    elif arch == "SemanticSegmentor":
        assert model.num_classes == cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES
    else:
        assert model.num_classes == cfg.MODEL.ROI_HEADS.NUM_CLASSES
        if model.pyramid_strides is None:
            assert model.feature_stride in (8, 16)
        else:
            assert len(model.pyramid_strides) > 1
