import json

import numpy as np

from drn_wsod_tpu.data.datasets.coco import load_coco_json
from drn_wsod_tpu.data.datasets.lvis import load_lvis_json


def _coco_json(tmp_path, with_lvis_fields=False):
    data = {
        "images": [
            {"id": 7, "file_name": "a.jpg", "height": 40, "width": 60,
             **({"neg_category_ids": [5],
                 "coco_url": "http://x/a.jpg"} if with_lvis_fields else {})},
        ],
        "annotations": [
            {"id": 1, "image_id": 7, "category_id": 5,
             "bbox": [10, 10, 20, 15], "iscrowd": 0, "area": 300},
            {"id": 2, "image_id": 7, "category_id": 9,
             "bbox": [0, 0, 5, 5], "iscrowd": 1, "area": 25},
        ],
        "categories": [{"id": 5, "name": "cat"}, {"id": 9, "name": "dog"}],
    }
    p = tmp_path / "inst.json"
    p.write_text(json.dumps(data))
    return str(p)


def test_load_coco_json(tmp_path):
    path = _coco_json(tmp_path)
    recs = load_coco_json(path, str(tmp_path), "coco_test_ds")
    assert len(recs) == 1
    r = recs[0]
    assert r["height"] == 40 and r["width"] == 60
    # crowd annotation kept but flagged difficult (excluded from training by
    # the mapper, ignored at evaluation — reference COCOEvaluator iscrowd
    # semantics); xywh converted to xyxy; ids remapped
    assert len(r["annotations"]) == 2
    a = r["annotations"][0]
    assert a["category_id"] == 0
    assert a["difficult"] == 0 and a["area"] == 300
    np.testing.assert_allclose(a["bbox"], [10, 10, 30, 25])
    crowd = r["annotations"][1]
    assert crowd["difficult"] == 1 and crowd["iscrowd"] == 1

    from drn_wsod_tpu.data import MetadataCatalog
    assert MetadataCatalog.get("coco_test_ds").thing_classes == ["cat", "dog"]


def test_load_lvis_json(tmp_path):
    path = _coco_json(tmp_path, with_lvis_fields=True)
    recs = load_lvis_json(path, str(tmp_path), "lvis_test_ds")
    r = recs[0]
    assert r["neg_category_ids"] == [0]
    assert len(r["annotations"]) == 2   # LVIS keeps everything
    assert r["annotations"][0]["category_id"] in (0, 1)
