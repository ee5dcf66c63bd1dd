from .catalog import DatasetCatalog, MetadataCatalog
from .loader import (EvalLoader, TrainLoader, build_detection_test_loader,
                     build_detection_train_loader,
                     get_detection_dataset_dicts)
from .mapper import DatasetMapper, read_image
from .proposals import load_proposals_into_dataset, transform_proposals

__all__ = [
    "DatasetCatalog", "MetadataCatalog", "EvalLoader", "TrainLoader",
    "build_detection_test_loader", "build_detection_train_loader",
    "get_detection_dataset_dicts", "DatasetMapper", "read_image",
    "load_proposals_into_dataset", "transform_proposals",
]
