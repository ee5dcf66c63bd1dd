"""Batch loaders.

Replaces the reference's torch DataLoader pipeline (detectron2/data/build.py:
249-410, common.py): an infinite shuffled training iterator with per-bucket
batch grouping (the static-shape analogue of AspectRatioGroupedDataset,
common.py:115-150) and a sequential sharded inference iterator, with a
background prefetch thread overlapping host decode with device compute.
"""

from __future__ import annotations

import itertools
import logging
import queue
import threading
from typing import Callable, Dict, Iterator, List, Optional, Sequence


import numpy as np

from ..structures import WSODBatch
from .catalog import DatasetCatalog
from .proposals import load_proposals_into_dataset

logger = logging.getLogger(__name__)


def get_detection_dataset_dicts(names: Sequence[str],
                                proposal_files: Sequence[str] = (),
                                filter_empty: bool = True) -> List[dict]:
    """Load + concatenate datasets, attaching per-dataset proposal files
    (reference build.py:207-247)."""
    if isinstance(names, str):
        names = [names]
    all_dicts = []
    for i, name in enumerate(names):
        dicts = DatasetCatalog.get(name)
        assert len(dicts), f"Dataset '{name}' is empty!"
        if proposal_files:
            dicts = load_proposals_into_dataset(dicts, proposal_files[i])
        all_dicts.append(dicts)
    records = list(itertools.chain.from_iterable(all_dicts))
    if filter_empty:
        records = [r for r in records if r.get("annotations")]
    return records


def _collate(samples: List[Dict[str, np.ndarray]]) -> WSODBatch:
    """Stack per-sample arrays into a HOST (numpy) WSODBatch.

    Deliberately NOT jnp.asarray: on a remote-TPU platform that would
    upload every batch through the tunnel at collate time, and the chunked
    trainer's stack step would then pull each one BACK to stack it — a
    full device round-trip per batch (measured ~500 ms/img on a degraded
    tunnel, PERF.md round-5). Host batches cost nothing to stack; the one
    upload happens when the (stacked) chunk is device_put by the prefetch
    worker, or implicitly at dispatch."""
    stack = {k: np.stack([s[k] for s in samples])
             for k in samples[0] if not k.startswith("_")}
    return WSODBatch(**stack)


class TrainLoader:
    """Infinite shuffled loader with bucket-grouped batches.

    ``batch_size`` is the GLOBAL batch (reference SOLVER.IMS_PER_BATCH
    semantics, data/build.py:300-356). On a multi-host job every process
    runs the SAME shuffled index stream (shared seed) and the same
    metadata-only bucket plan (DatasetMapper.plan_bucket), so all hosts
    agree on each global batch's membership and image bucket; each host then
    decodes only its ``rank::world`` slice. This is the static-shape
    equivalent of the reference's rank-sliced TrainingSampler
    (detectron2/data/samplers/distributed_sampler.py:12-57) — with the extra
    bucket agreement a jit'ed global-batch step requires.

    ``num_workers`` threads run the mapper concurrently (PIL decode releases
    the GIL) — the threaded analog of the reference's DataLoader worker
    processes (detectron2/data/build.py:249-410)."""

    def __init__(self, records: List[dict], mapper: Callable,
                 batch_size: int, seed: int = 0, prefetch: int = 2,
                 num_workers: int = 0, process_index: Optional[int] = None,
                 process_count: Optional[int] = None,
                 repeat_factors: Optional[np.ndarray] = None):
        assert len(records) > 0
        import jax

        self._records = records
        self._mapper = mapper
        self._batch_size = batch_size
        self._seed = seed
        self._prefetch = prefetch
        self._num_workers = num_workers
        self._repeat_factors = (None if repeat_factors is None
                                else np.asarray(repeat_factors, np.float64))
        self._rank = (jax.process_index() if process_index is None
                      else process_index)
        self._world = (jax.process_count() if process_count is None
                       else process_count)
        assert batch_size % self._world == 0,             f"IMS_PER_BATCH {batch_size} not divisible by {self._world} hosts"

    def _index_iter(self):
        rng = np.random.RandomState(self._seed)
        rf = self._repeat_factors
        while True:
            if rf is None:
                epoch = rng.permutation(len(self._records))
            else:
                # RepeatFactorTrainingSampler: integer part deterministic,
                # fractional part rounded stochastically per epoch
                # (reference distributed_sampler.py:173-257)
                reps = np.floor(rf).astype(np.int64)
                reps += (rng.rand(len(rf)) < (rf - np.floor(rf)))
                epoch = rng.permutation(np.repeat(
                    np.arange(len(self._records)), reps))
            for idx in epoch:
                # per-sample rng seeded deterministically from the stream
                yield int(idx), int(rng.randint(2 ** 31))

    def _sample_iter(self):
        """Single-host fast path: decode first, group by the decoded bucket."""
        indices = self._index_iter()
        if self._num_workers <= 1:
            for idx, seed in indices:
                sample = self._mapper(self._records[idx],
                                      np.random.RandomState(seed),
                                      dataset_index=idx)
                if sample is not None:
                    yield sample
            return
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(self._num_workers) as pool:
            inflight = []
            depth = self._num_workers * 2
            for idx, seed in indices:
                inflight.append(pool.submit(
                    self._mapper, self._records[idx],
                    np.random.RandomState(seed), dataset_index=idx))
                if len(inflight) >= depth:
                    sample = inflight.pop(0).result()
                    if sample is not None:
                        yield sample

    def _batch_iter_single(self):
        buffers: Dict[int, list] = {}
        for sample in self._sample_iter():
            b = buffers.setdefault(sample["_bucket"], [])
            b.append(sample)
            if len(b) == self._batch_size:
                yield _collate(b)
                buffers[sample["_bucket"]] = []

    def _batch_iter_multihost(self):
        """Plan buckets from metadata on the shared stream; decode only this
        host's slice of each global batch."""
        local_bs = self._batch_size // self._world

        def decode(item):
            idx, seed = item
            sample = self._mapper(self._records[idx],
                                  np.random.RandomState(seed),
                                  dataset_index=idx)
            assert sample is not None,                 "mapper dropped a sample inside a multi-host global batch"
            return sample

        buffers: Dict[int, list] = {}
        for idx, seed in self._index_iter():
            bucket = self._mapper.plan_bucket(self._records[idx],
                                              np.random.RandomState(seed))
            b = buffers.setdefault(bucket, [])
            b.append((idx, seed))
            if len(b) == self._batch_size:
                local = b[self._rank::self._world][:local_bs]
                yield _collate([decode(item) for item in local])
                buffers[bucket] = []

    def _batch_iter(self):
        if self._world == 1:
            return self._batch_iter_single()
        return self._batch_iter_multihost()

    def __iter__(self) -> Iterator[WSODBatch]:
        if self._prefetch <= 0:
            return self._batch_iter()
        return _prefetch_iter(self._batch_iter(), self._prefetch)


class EvalLoader:
    """Sequential single-pass loader. Batches are filled in dataset order and
    padded to a common bucket; the final partial batch is padded with copies
    of the last sample (masked out downstream via image_id bookkeeping)."""

    def __init__(self, records: List[dict], mapper: Callable,
                 batch_size: int = 1, prefetch: int = 2,
                 process_index: Optional[int] = None,
                 process_count: Optional[int] = None):
        import jax

        rank = jax.process_index() if process_index is None else process_index
        world = jax.process_count() if process_count is None else process_count
        # rank-strided shard of the dataset (reference InferenceSampler,
        # distributed_sampler.py:57-90); predictions are gathered back to
        # the main process before evaluate() (parallel/multihost.py)
        self._records = records[rank::world] if world > 1 else records
        self._mapper = mapper
        self._batch_size = batch_size
        self._prefetch = prefetch

    def __len__(self):
        return -(-len(self._records) // self._batch_size)

    def _batch_iter(self):
        rng = np.random.RandomState(0)  # test-time augs are deterministic
        bs = self._batch_size
        for i in range(0, len(self._records), bs):
            chunk = self._records[i:i + bs]
            samples = [self._mapper(r, rng, dataset_index=i + j)
                       for j, r in enumerate(chunk)]
            n_real = len(samples)
            while len(samples) < bs:
                samples.append(samples[-1])
            # re-pad all images in the batch to the max bucket
            bucket = max(s["_bucket"] for s in samples)
            for s in samples:
                if s["_bucket"] != bucket:
                    canvas = np.zeros((bucket, bucket, 3), dtype=np.float32)
                    img = s["image"]
                    canvas[:img.shape[0], :img.shape[1]] = img
                    s["image"] = canvas
                    if "gt_masks" in s:
                        m = np.zeros((s["gt_masks"].shape[0], bucket, bucket),
                                     dtype=np.float32)
                        old = s["gt_masks"]
                        m[:, :old.shape[1], :old.shape[2]] = old
                        s["gt_masks"] = m
                    if "sem_seg" in s:
                        sem = np.full((bucket, bucket), 255, dtype=np.int32)
                        old = s["sem_seg"]
                        sem[:old.shape[0], :old.shape[1]] = old
                        s["sem_seg"] = sem
                    s["_bucket"] = bucket
            batch = _collate(samples)
            yield batch, n_real

    def __iter__(self):
        if self._prefetch <= 0:
            return self._batch_iter()
        return _prefetch_iter(self._batch_iter(), self._prefetch)


def _prefetch_iter(it: Iterator, depth: int) -> Iterator:
    """Background-thread prefetch (the host-side overlap the reference gets
    from DataLoader workers; this container has few cores, so one decoder
    thread + device-compute overlap is the right shape)."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    _END = object()

    def worker():
        try:
            for item in it:
                q.put(item)
        except BaseException as e:  # propagate into the consumer
            q.put(("__error__", e))
        q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, tuple) and len(item) == 2 and item[0] == "__error__":
            raise item[1]
        yield item


def repeat_factors_from_category_frequency(records: List[dict],
                                           repeat_thresh: float) -> np.ndarray:
    """Per-image repeat factor r(I) = max over categories in I of
    max(1, sqrt(t / f(c))) (reference distributed_sampler.py:201-240;
    the LVIS oversampling recipe)."""
    freq: Dict[int, int] = {}
    for r in records:
        for c in {a["category_id"] for a in r.get("annotations", [])}:
            freq[c] = freq.get(c, 0) + 1
    n = len(records)
    cat_rep = {c: max(1.0, np.sqrt(repeat_thresh / (f / n)))
               for c, f in freq.items()}
    return np.asarray(
        [max([cat_rep[a["category_id"]]
              for a in r.get("annotations", [])] or [1.0])
         for r in records])


def build_detection_train_loader(cfg, mapper) -> TrainLoader:
    records = get_detection_dataset_dicts(
        cfg.DATASETS.TRAIN, cfg.DATASETS.PROPOSAL_FILES_TRAIN
        if cfg.MODEL.LOAD_PROPOSALS else (),
        filter_empty=cfg.DATALOADER.FILTER_EMPTY_ANNOTATIONS)
    sampler = cfg.DATALOADER.SAMPLER_TRAIN
    if sampler == "RepeatFactorTrainingSampler":
        rf = repeat_factors_from_category_frequency(
            records, cfg.DATALOADER.REPEAT_THRESHOLD)
    elif sampler == "TrainingSampler":
        rf = None
    else:
        raise ValueError(f"Unknown DATALOADER.SAMPLER_TRAIN: {sampler}")
    if not cfg.DATALOADER.ASPECT_RATIO_GROUPING:
        # static-shape batching always groups by size bucket; there is no
        # dynamic-shape alternative on TPU
        logger.warning("DATALOADER.ASPECT_RATIO_GROUPING=False has no "
                       "effect: batches are always bucket-grouped (static "
                       "shapes).")
    return TrainLoader(records, mapper, cfg.SOLVER.IMS_PER_BATCH,
                       seed=max(cfg.SEED, 0),
                       prefetch=cfg.DATALOADER.PREFETCH,
                       num_workers=cfg.DATALOADER.NUM_WORKERS,
                       repeat_factors=rf)


def build_detection_test_loader(cfg, dataset_name: str, mapper,
                                batch_size: int = 1,
                                proposal_file: Optional[str] = None
                                ) -> EvalLoader:
    """``proposal_file`` overrides the TEST-list lookup — needed when
    evaluating TRAIN datasets for CorLoc (reference test_with_TTA,
    projects/WSL/tools/train_net.py:169-201)."""
    if proposal_file is None and cfg.MODEL.LOAD_PROPOSALS:
        names = list(cfg.DATASETS.TEST)
        proposal_files = list(cfg.DATASETS.PROPOSAL_FILES_TEST)
        if dataset_name in names and proposal_files:
            proposal_file = proposal_files[names.index(dataset_name)]
    pf = [proposal_file] if (proposal_file and cfg.MODEL.LOAD_PROPOSALS) else ()
    records = get_detection_dataset_dicts([dataset_name], pf,
                                          filter_empty=False)
    return EvalLoader(records, mapper, batch_size,
                      prefetch=cfg.DATALOADER.PREFETCH)
