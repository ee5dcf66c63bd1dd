import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from drn_wsod_tpu import native
from drn_wsod_tpu.data.record_dataset import (RecordDataset, pack_dataset,
                                              write_records)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_write_read_roundtrip(tmp_path):
    path = str(tmp_path / "t.rec")
    records = [
        {"a": 1, "arr": np.arange(10, dtype=np.float32)},
        {"b": "hello", "nested": {"x": [1, 2, 3]}},
        {"big": np.zeros((64, 64, 3), dtype=np.uint8)},
    ]
    n = write_records(path, records)
    assert n == 3

    ds = RecordDataset(path)
    assert len(ds) == 3
    np.testing.assert_array_equal(ds[0]["arr"], records[0]["arr"])
    assert ds[1]["nested"]["x"] == [1, 2, 3]
    assert ds[2]["big"].shape == (64, 64, 3)
    with pytest.raises(IndexError):
        ds[3]
    ds.close()


def test_pack_dataset_with_images_and_mapper(tmp_path):
    from test_e2e_train import CLASSES, make_voc_dataset, tiny_e2e_cfg

    from drn_wsod_tpu.data import DatasetCatalog, DatasetMapper
    from drn_wsod_tpu.data.datasets.voc import register_pascal_voc
    from drn_wsod_tpu.data.loader import get_detection_dataset_dicts

    d, prop = make_voc_dataset(str(tmp_path))
    name = "rec_train"
    if name in DatasetCatalog:
        DatasetCatalog.remove(name)
    register_pascal_voc(name, d, "train", 2007, CLASSES)
    records = get_detection_dataset_dicts([name], [prop])

    path = str(tmp_path / "packed.rec")
    pack_dataset(records, path)
    ds = RecordDataset(path)
    assert len(ds) == len(records)
    r0 = ds[0]
    assert "image" in r0 and r0["image"].dtype == np.uint8
    assert "proposal_boxes" in r0

    # the mapper consumes packed records without touching the filesystem
    cfg = tiny_e2e_cfg(tmp_path, prop)
    mapper = DatasetMapper(cfg, is_train=True)
    r0["file_name"] = "/nonexistent/should_not_be_read.jpg"
    s = mapper(r0, np.random.RandomState(0))
    assert s["image"].shape[2] == 3
    assert s["proposal_mask"].sum() > 0
    DatasetCatalog.remove(name)
