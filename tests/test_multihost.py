"""Multi-host data/eval sharding, tested single-process with explicit
(process_index, process_count) shims — the honest stand-in for a pod, since
this container cannot spawn JAX processes.

Reference semantics covered:
  * TrainingSampler rank slicing with a shared stream
    (detectron2/data/samplers/distributed_sampler.py:12-57) — here with the
    extra bucket agreement a jit'ed global-batch step needs.
  * InferenceSampler dataset sharding (:57-90).
  * rank gather of predictions before evaluate
    (pascal_voc_evaluation.py:66-77).
"""

import numpy as np
from PIL import Image

from drn_wsod_tpu.config import get_cfg
from drn_wsod_tpu.data.loader import EvalLoader, TrainLoader
from drn_wsod_tpu.data.mapper import DatasetMapper
from drn_wsod_tpu.evaluation.voc_eval import PascalVOCDetectionEvaluator


def _records(tmp_path, n=12):
    recs = []
    rng = np.random.RandomState(0)
    for i in range(n):
        h, w = int(rng.choice([60, 80])), int(rng.choice([60, 100]))
        path = tmp_path / f"im{i}.jpg"
        Image.fromarray(
            rng.randint(0, 255, (h, w, 3), np.uint8)).save(path)
        boxes = np.asarray([[2, 2, 30, 30], [5, 5, 40, 40]], np.float32)
        recs.append({
            "file_name": str(path), "image_id": f"im{i}",
            "height": h, "width": w,
            "proposal_boxes": boxes,
            "proposal_objectness_logits": np.asarray([1.0, 0.5], np.float32),
            "annotations": [{"bbox": [2, 2, 30, 30], "category_id": i % 3,
                             "difficult": 0}],
        })
    return recs


def _cfg():
    cfg = get_cfg()
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 3
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 8
    cfg.INPUT.BUCKETS = [64, 128]
    cfg.INPUT.MIN_SIZE_TRAIN = (48, 64)
    cfg.INPUT.MAX_SIZE_TRAIN = 128
    cfg.INPUT.CROP.ENABLED = True
    cfg.INPUT.CROP.SIZE = [0.8, 0.8]
    return cfg


def test_plan_bucket_matches_decode(tmp_path):
    """The metadata-only bucket plan must equal the decoded sample's bucket
    for the SAME seed — the invariant multi-host bucket agreement rests on."""
    cfg = _cfg()
    mapper = DatasetMapper(cfg, is_train=True)
    for r in _records(tmp_path):
        for seed in (0, 1, 2, 3):
            planned = mapper.plan_bucket(r, np.random.RandomState(seed))
            sample = mapper(r, np.random.RandomState(seed))
            assert planned == sample["_bucket"], (r["image_id"], seed)


def test_trainloader_two_host_shim_partitions_global_batches(tmp_path):
    cfg = _cfg()
    # single bucket so the first epoch yields exactly len/G full batches
    # (an index may legitimately repeat in a batch straddling epochs)
    cfg.INPUT.BUCKETS = [128]
    mapper = DatasetMapper(cfg, is_train=True)
    recs = _records(tmp_path)
    G = 4  # global batch
    loaders = [TrainLoader(recs, mapper, G, seed=7, prefetch=0,
                           process_index=r, process_count=2)
               for r in (0, 1)]
    its = [iter(ld) for ld in loaders]
    epoch_ids = []
    for _ in range(len(recs) // G):
        b0 = next(its[0])
        b1 = next(its[1])
        # each host holds half the global batch
        assert b0.image.shape[0] == G // 2
        assert b1.image.shape[0] == G // 2
        # every image in the global batch shares one bucket => same shapes
        assert b0.image.shape == b1.image.shape
        ids0 = np.asarray(b0.image_id).tolist()
        ids1 = np.asarray(b1.image_id).tolist()
        assert not (set(ids0) & set(ids1))  # disjoint within a global batch
        epoch_ids += ids0 + ids1
    # one epoch: the two hosts together see every record exactly once
    assert sorted(epoch_ids) == list(range(len(recs)))

    # with multiple buckets the halves still agree on the batch bucket
    cfg2 = _cfg()
    mapper2 = DatasetMapper(cfg2, is_train=True)
    l2 = [iter(TrainLoader(recs, mapper2, G, seed=7, prefetch=0,
                           process_index=r, process_count=2))
          for r in (0, 1)]
    for _ in range(4):
        b0, b1 = next(l2[0]), next(l2[1])
        assert b0.image.shape == b1.image.shape


def test_trainloader_single_host_unchanged(tmp_path):
    cfg = _cfg()
    mapper = DatasetMapper(cfg, is_train=True)
    recs = _records(tmp_path)
    ld = TrainLoader(recs, mapper, 2, seed=7, prefetch=0,
                     process_index=0, process_count=1)
    b = next(iter(ld))
    assert b.image.shape[0] == 2


def test_testloader_shards_cover_dataset(tmp_path):
    cfg = _cfg()
    mapper = DatasetMapper(cfg, is_train=False)
    recs = _records(tmp_path)
    seen = []
    for rank in (0, 1, 2):
        ld = EvalLoader(recs, mapper, batch_size=1, prefetch=0,
                        process_index=rank, process_count=3)
        seen.extend(r["image_id"] for r in ld._records)
    assert sorted(seen) == sorted(r["image_id"] for r in recs)
    assert len(seen) == len(set(seen))


def test_evaluator_state_gather_equals_single(tmp_path):
    recs = _records(tmp_path)
    gt = {str(r["image_id"]): r["annotations"] for r in recs}
    names = ["a", "b", "c"]
    rng = np.random.RandomState(3)

    def preds_for(r):
        boxes = np.asarray([[2, 2, 30, 30], [10, 10, 50, 50]], np.float32)
        scores = rng.rand(2).astype(np.float32)
        classes = np.asarray([0, 1])
        return boxes, scores, classes

    single = PascalVOCDetectionEvaluator(names, gt)
    shards = [PascalVOCDetectionEvaluator(names, gt) for _ in range(2)]
    for i, r in enumerate(recs):
        boxes, scores, classes = preds_for(r)
        single.process_single(str(r["image_id"]), boxes, scores, classes)
        shards[i % 2].process_single(str(r["image_id"]), boxes, scores,
                                     classes)
    merged = PascalVOCDetectionEvaluator(names, gt)
    merged.merge_states([s.state_dict() for s in shards])
    assert merged.evaluate() == single.evaluate()


def test_gather_and_evaluate_multihost_path(tmp_path, monkeypatch):
    """Drive the actual gather code path with simulated 2-host comm."""
    from drn_wsod_tpu.evaluation import evaluator as ev_mod
    from drn_wsod_tpu.parallel import multihost

    recs = _records(tmp_path)
    gt = {str(r["image_id"]): r["annotations"] for r in recs}
    names = ["a", "b", "c"]

    ev0 = PascalVOCDetectionEvaluator(names, gt)
    ev1 = PascalVOCDetectionEvaluator(names, gt)
    full = PascalVOCDetectionEvaluator(names, gt)
    for i, r in enumerate(recs):
        boxes = np.asarray([[2, 2, 30, 30]], np.float32)
        scores = np.asarray([0.9], np.float32)
        classes = np.asarray([r["annotations"][0]["category_id"]])
        (ev0 if i % 2 == 0 else ev1).process_single(
            str(r["image_id"]), boxes, scores, classes)
        full.process_single(str(r["image_id"]), boxes, scores, classes)
    want = full.evaluate()

    other_state = ev1.state_dict()
    monkeypatch.setattr(multihost, "get_world_size", lambda: 2)
    monkeypatch.setattr(multihost, "all_gather_object",
                        lambda obj: [obj, other_state])
    monkeypatch.setattr(multihost, "is_main_process", lambda: True)
    got = ev_mod.gather_and_evaluate(ev0)
    assert got == want

    monkeypatch.setattr(multihost, "is_main_process", lambda: False)
    assert ev_mod.gather_and_evaluate(ev1) == {}
