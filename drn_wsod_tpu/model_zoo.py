"""Config-path -> (cfg, weights) resolution
(equivalent of the reference detectron2/model_zoo/model_zoo.py)."""

from __future__ import annotations

import os

from .config import CfgNode, get_cfg

_CONFIG_ROOT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "configs")


def get_config_file(config_path: str) -> str:
    """Resolve a zoo-relative path like
    'PascalVOC-Detection/oicr_WSR_50_DC5_1x.yaml'."""
    full = os.path.join(_CONFIG_ROOT, config_path)
    if not os.path.exists(full):
        raise FileNotFoundError(f"{config_path} not found in {_CONFIG_ROOT}")
    return full


def get_config(config_path: str, trained: bool = False) -> CfgNode:
    cfg = get_cfg()
    cfg.merge_from_file(get_config_file(config_path))
    if not trained:
        cfg.MODEL.WEIGHTS = ""
    return cfg


def get(config_path: str, trained: bool = False):
    """Build the model for a zoo config (weights loaded if ``trained`` and
    the checkpoint file exists locally)."""
    from .models import build_model

    cfg = get_config(config_path, trained)
    model = build_model(cfg)
    return cfg, model
