from .voc import (VOC_CLASS_NAMES, image_level_labels, load_voc_instances,
                  register_all_pascal_voc, register_pascal_voc)
from .coco import load_coco_json, register_coco_instances
from .cityscapes import (load_cityscapes_instances, load_cityscapes_semantic,
                         register_all_cityscapes)

__all__ = [
    "VOC_CLASS_NAMES", "image_level_labels", "load_voc_instances",
    "register_all_pascal_voc", "register_pascal_voc", "load_coco_json",
    "register_coco_instances", "load_cityscapes_instances",
    "load_cityscapes_semantic", "register_all_cityscapes",
]
