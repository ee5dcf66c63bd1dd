"""Web / Flickr dataset registrations.

Equivalent of the reference WSL dataset registry
(projects/WSL/wsl/data/datasets/builtin.py:26-105): Flickr images scraped for
VOC/COCO vocabularies, stored as COCO-format json, used as extra
weakly-labeled training data. Also exposes the VOC label colormap used by
the visualizers.
"""

from __future__ import annotations

import os

import numpy as np

from ..catalog import DatasetCatalog, MetadataCatalog
from .coco import register_coco_instances
from .voc import VOC_CLASS_NAMES

_WEB_SPLITS = {
    "flickr_voc": ("flickr_voc/images",
                   "flickr_voc/annotations/instances.json"),
    "flickr_coco": ("flickr_coco/images",
                    "flickr_coco/annotations/instances.json"),
}


def register_all_web(root: str = "datasets"):
    for name, (image_dir, json_file) in _WEB_SPLITS.items():
        if name in DatasetCatalog:
            continue
        jf = os.path.join(root, json_file)
        ir = os.path.join(root, image_dir)
        if not os.path.exists(jf):
            continue  # web data is optional
        register_coco_instances(name, jf, ir)
        MetadataCatalog.get(name).set(evaluator_type="coco")


# VOC-2012 + SBD instance splits used by the WSJDS DetectionSegmentation
# configs (reference ws-jds_*_Seg.yaml DATASETS). The reference's own
# ``register_all_voc_sbd`` (builtin.py:55-63) references an UNDEFINED
# ``_PREDEFINED_SPLITS_VOC_SBD`` table — dead code that would NameError if
# called; these are the names its configs expect, in the same COCO-format
# layout the reference converter scripts produce.
_VOC_SBD_SPLITS = {
    "voc_2012_train_instance": (
        "VOC_SBD/images",
        "VOC_SBD/annotations/voc_2012_train_instance.json"),
    "voc_2012_val_instance": (
        "VOC_SBD/images",
        "VOC_SBD/annotations/voc_2012_val_instance.json"),
    "sbd_9118_instance": (
        "VOC_SBD/images",
        "VOC_SBD/annotations/sbd_9118_instance.json"),
}


def register_all_voc_sbd(root: str = "datasets"):
    for name, (image_dir, json_file) in _VOC_SBD_SPLITS.items():
        if name in DatasetCatalog:
            continue
        jf = os.path.join(root, json_file)
        if not os.path.exists(jf):
            continue  # instance-seg data is optional
        register_coco_instances(name, jf, os.path.join(root, image_dir))
        MetadataCatalog.get(name).set(evaluator_type="coco")


def voc_label_colormap(n: int = 256) -> np.ndarray:
    """The VOC bit-interleave colormap (reference builtin.py colormap)."""
    def bitget(v, i):
        return (v >> i) & 1

    cmap = np.zeros((n, 3), dtype=np.uint8)
    for i in range(n):
        r = g = b = 0
        c = i
        for j in range(8):
            r |= bitget(c, 0) << (7 - j)
            g |= bitget(c, 1) << (7 - j)
            b |= bitget(c, 2) << (7 - j)
            c >>= 3
        cmap[i] = (r, g, b)
    return cmap


VOC_COLORMAP = {name: tuple(int(v) for v in voc_label_colormap()[i + 1])
                for i, name in enumerate(VOC_CLASS_NAMES)}
