"""tools/proposal_convert.py round-trip tests (VERDICT r4 item 6).

The converter is the single entry point for real MCG / Selective-Search data
when it arrives; these tests synthesize .mat fixtures with the reference
formats' quirks — 1-indexed (y1, x1, y2, x2) box order
(/root/reference/projects/WSL/tools/proposal_convert.py:38-40), all-ones SS
scores (:41), flickr's 'bboxes'/'bboxes_scores' keys (:79-81) — and assert
boxes land 0-indexed XYXY and survive the data/proposals.py topk/dedup
pipeline, so the real-data path is turnkey.
"""

import os
import pickle
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from drn_wsod_tpu.data import DatasetCatalog
from drn_wsod_tpu.data.proposals import (load_proposals_into_dataset,
                                         transform_proposals)
from tools.proposal_convert import convert_mcg_box, convert_ss_box

sio = pytest.importorskip("scipy.io")


def _register(name, records):
    if name in DatasetCatalog.list():
        DatasetCatalog.remove(name)
    DatasetCatalog.register(name, lambda: records)


def _records(n=3):
    return [{"image_id": f"00000{i}", "file_name": f"/img/00000{i}.jpg",
             "height": 100, "width": 120, "annotations": []}
            for i in range(n)]


def _raw_boxes(rng, n):
    """1-indexed (y1, x1, y2, x2) integer boxes as SS/MCG .mat files carry,
    including one duplicate pair to exercise the dedup stage."""
    x1 = rng.randint(1, 60, size=n)
    y1 = rng.randint(1, 50, size=n)
    x2 = x1 + rng.randint(5, 40, size=n)
    y2 = y1 + rng.randint(5, 30, size=n)
    b = np.stack([y1, x1, y2, x2], 1).astype(np.float64)
    b[-1] = b[0]                                  # exact duplicate
    return b


def test_ss_convert_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    records = _records()
    _register("test_pc_ss", records)

    per_img = [_raw_boxes(rng, 8) for _ in records]
    cell = np.empty(len(records), dtype=object)
    for i, b in enumerate(per_img):
        cell[i] = b
    mat = tmp_path / "SS.mat"
    sio.savemat(mat, {"boxes": cell.reshape(1, -1)})

    out = tmp_path / "ss.pkl"
    convert_ss_box("test_pc_ss", str(mat), str(out))

    with open(out, "rb") as f:
        data = pickle.load(f)
    assert data["ids"] == [r["image_id"] for r in records]
    # reference parity: SS objectness is all-ONES (proposal_convert.py:41) —
    # it feeds the WSDDN (objectness+1) scale, so the constant matters
    for s in data["objectness_logits"]:
        np.testing.assert_array_equal(s, np.ones_like(s))
    # 1-indexed y1x1y2x2 -> 0-indexed x1y1x2y2
    for i, b in enumerate(data["boxes"]):
        raw = per_img[i]
        np.testing.assert_array_equal(b, raw[:, (1, 0, 3, 2)] - 1.0)
        assert (b[:, 2] > b[:, 0]).all() and (b[:, 3] > b[:, 1]).all()

    # survives the proposal pipeline: attach, sort, transform, dedup, topk
    loaded = load_proposals_into_dataset(records, str(out))
    rec = loaded[0]
    assert rec["proposal_boxes"].shape[1] == 4
    boxes, logits = transform_proposals(
        rec, (rec["height"], rec["width"]), None, topk=5)
    assert boxes.shape == (5, 4) and logits.shape == (5,)
    # the duplicate pair collapsed before topk
    flat = {tuple(np.round(b, 3)) for b in boxes}
    assert len(flat) == len(boxes)
    assert boxes[:, 0::2].max() <= rec["width"]
    assert boxes[:, 1::2].max() <= rec["height"]


def test_mcg_convert_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    records = _records()
    _register("test_pc_mcg", records)

    mcg_dir = tmp_path / "mcg"
    mcg_dir.mkdir()
    per_img = {}
    for r in records:
        b = _raw_boxes(rng, 6)
        s = rng.rand(6).astype(np.float64)
        per_img[r["image_id"]] = (b, s)
        sio.savemat(mcg_dir / f"{r['image_id']}.mat",
                    {"boxes": b, "scores": s.reshape(-1, 1)})

    out = tmp_path / "mcg.pkl"
    convert_mcg_box("test_pc_mcg", str(mcg_dir), str(out))

    with open(out, "rb") as f:
        data = pickle.load(f)
    for i, r in enumerate(records):
        raw_b, raw_s = per_img[r["image_id"]]
        np.testing.assert_array_equal(data["boxes"][i],
                                      raw_b[:, (1, 0, 3, 2)] - 1.0)
        np.testing.assert_allclose(data["objectness_logits"][i], raw_s,
                                   rtol=1e-6)

    # pipeline sorts by descending objectness
    loaded = load_proposals_into_dataset(records, str(out))
    lg = loaded[1]["proposal_objectness_logits"]
    assert (np.diff(lg) <= 0).all()


def test_mcg_flickr_keys_and_basename(tmp_path):
    """Flickr web datasets: per-image files keyed by file_name basename and
    'bboxes'/'bboxes_scores' mat keys (reference proposal_convert.py:67-81)."""
    rng = np.random.RandomState(2)
    records = [{"image_id": 71, "file_name": "/web/flickr_000071.jpg",
                "height": 80, "width": 80, "annotations": []}]
    _register("flickr_test_pc", records)

    mcg_dir = tmp_path / "mcg"
    mcg_dir.mkdir()
    b = _raw_boxes(rng, 4)
    s = rng.rand(4)
    sio.savemat(mcg_dir / "flickr_000071.mat",
                {"bboxes": b, "bboxes_scores": s.reshape(-1, 1)})

    out = tmp_path / "flickr.pkl"
    convert_mcg_box("flickr_test_pc", str(mcg_dir), str(out))
    with open(out, "rb") as f:
        data = pickle.load(f)
    assert data["ids"] == [71]
    np.testing.assert_array_equal(data["boxes"][0],
                                  b[:, (1, 0, 3, 2)] - 1.0)


def test_legacy_reference_pickle_keys(tmp_path):
    """The reference tool pickles {boxes, scores, indexes} with int16 boxes
    (proposal_convert.py:48-49); the loader must ingest that layout as-is
    (rename path, data/proposals.py + reference build.py:128-133)."""
    records = _records(2)
    legacy = {
        "boxes": [np.array([[0, 0, 10, 10], [2, 2, 8, 9]], np.int16),
                  np.array([[1, 1, 5, 5]], np.int16)],
        "scores": [np.array([0.2, 0.9], np.float32),
                   np.array([1.0], np.float32)],
        "indexes": [r["image_id"] for r in records],
    }
    p = tmp_path / "legacy.pkl"
    with open(p, "wb") as f:
        pickle.dump(legacy, f)
    loaded = load_proposals_into_dataset(records, str(p))
    np.testing.assert_array_equal(loaded[0]["proposal_boxes"],
                                  [[2, 2, 8, 9], [0, 0, 10, 10]])
    np.testing.assert_allclose(loaded[0]["proposal_objectness_logits"],
                               [0.9, 0.2], rtol=1e-6)


def test_demo_frame_proposals_layouts():
    """demo.py proposal parsing accepts both the per-image-list pickle
    (reference proposal_convert output incl. legacy 'scores' key) and the
    single-image shorthand {'boxes': (N,4)} — a bare 2-D array must be one
    image's boxes, not be indexed per frame (round-5 demo smoke bug)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "demo"))
    from demo import frame_proposals

    b0 = np.array([[0, 0, 10, 10], [5, 5, 20, 20]], np.float32)
    b1 = np.array([[1, 1, 4, 4]], np.float32)

    # per-image list + legacy scores key
    data = {"boxes": [b0, b1], "scores": [np.array([0.5, 0.25]),
                                          np.array([1.0])]}
    bx, ob = frame_proposals(data, 0)
    np.testing.assert_array_equal(bx, b0)
    np.testing.assert_allclose(ob, [0.5, 0.25])
    bx, ob = frame_proposals(data, 1)
    np.testing.assert_array_equal(bx, b1)
    # frame index past the end clamps to the last entry (frame-sequence use)
    bx, _ = frame_proposals(data, 5)
    np.testing.assert_array_equal(bx, b1)

    # single-image shorthand: bare 2-D array + flat scores
    data1 = {"boxes": b0, "scores": np.array([0.5, 0.25], np.float32)}
    bx, ob = frame_proposals(data1, 0)
    assert bx.shape == (2, 4)
    np.testing.assert_array_equal(bx, b0)
    np.testing.assert_allclose(ob, [0.5, 0.25])

    # no scores at all -> zeros
    _, ob = frame_proposals({"boxes": b0}, 0)
    np.testing.assert_array_equal(ob, np.zeros(2))
