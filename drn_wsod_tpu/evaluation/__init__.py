from .cityscapes_eval import (CityscapesInstanceEvaluator,
                              CityscapesSemSegEvaluator,
                              label_ids_to_train_ids)
from .evaluator import (inference_on_dataset, make_detect_fn,
                        make_sem_seg_fn, panoptic_inference_on_dataset,
                        sem_seg_inference_on_dataset)
from .rotated_coco_eval import RotatedCOCODetectionEvaluator
from .sem_seg_eval import SemSegEvaluator
from .voc_eval import (PascalVOCDetectionEvaluator, voc_ap, voc_eval_class,
                       voc_eval_corloc_class)

__all__ = [
    "CityscapesInstanceEvaluator", "CityscapesSemSegEvaluator",
    "label_ids_to_train_ids",
    "inference_on_dataset", "make_detect_fn", "make_sem_seg_fn",
    "panoptic_inference_on_dataset", "sem_seg_inference_on_dataset",
    "PascalVOCDetectionEvaluator", "RotatedCOCODetectionEvaluator",
    "SemSegEvaluator", "voc_ap", "voc_eval_class", "voc_eval_corloc_class",
]
