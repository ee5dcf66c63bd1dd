from .evaluator import (inference_on_dataset, make_detect_fn,
                        make_sem_seg_fn, panoptic_inference_on_dataset,
                        sem_seg_inference_on_dataset)
from .rotated_coco_eval import RotatedCOCODetectionEvaluator
from .sem_seg_eval import SemSegEvaluator
from .voc_eval import (PascalVOCDetectionEvaluator, voc_ap, voc_eval_class,
                       voc_eval_corloc_class)

__all__ = [
    "inference_on_dataset", "make_detect_fn", "make_sem_seg_fn",
    "panoptic_inference_on_dataset", "sem_seg_inference_on_dataset",
    "PascalVOCDetectionEvaluator", "RotatedCOCODetectionEvaluator",
    "SemSegEvaluator", "voc_ap", "voc_eval_class", "voc_eval_corloc_class",
]
