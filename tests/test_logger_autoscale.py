"""log_first_n/log_every_n throttling + auto_scale_workers semantics
(reference detectron2/utils/logger.py + DefaultTrainer.auto_scale_workers)."""

import logging

from drn_wsod_tpu.config import get_cfg
from drn_wsod_tpu.engine.defaults import auto_scale_workers
from drn_wsod_tpu.utils.logger import (log_every_n, log_first_n,
                                       log_every_n_seconds)


def test_log_first_n(caplog):
    with caplog.at_level(logging.INFO, logger="drn_wsod_tpu"):
        for _ in range(5):
            log_first_n(logging.INFO, "hello-first", n=2)
    assert sum("hello-first" in r.message for r in caplog.records) == 2


def test_log_every_n(caplog):
    with caplog.at_level(logging.INFO, logger="drn_wsod_tpu"):
        for _ in range(7):
            log_every_n(logging.INFO, "hello-every", n=3)
    # fires on calls 1, 4, 7
    assert sum("hello-every" in r.message for r in caplog.records) == 3


def test_log_every_n_seconds(caplog):
    with caplog.at_level(logging.INFO, logger="drn_wsod_tpu"):
        for _ in range(5):
            log_every_n_seconds(logging.INFO, "hello-sec", n=3600)
    assert sum("hello-sec" in r.message for r in caplog.records) == 1


def test_auto_scale_workers():
    cfg = get_cfg()
    cfg.SOLVER.REFERENCE_WORLD_SIZE = 4
    cfg.SOLVER.IMS_PER_BATCH = 4
    cfg.SOLVER.BASE_LR = 0.01
    cfg.SOLVER.MAX_ITER = 50000
    cfg.SOLVER.STEPS = (35000, 45000)
    cfg.SOLVER.WARMUP_ITERS = 200
    cfg.TEST.EVAL_PERIOD = 5000
    cfg.freeze()

    out = auto_scale_workers(cfg, 8)
    assert out.SOLVER.IMS_PER_BATCH == 8       # per-chip batch preserved
    assert abs(out.SOLVER.BASE_LR - 0.02) < 1e-9
    assert out.SOLVER.MAX_ITER == 25000
    assert out.SOLVER.STEPS == (17500, 22500)
    assert out.SOLVER.WARMUP_ITERS == 100
    assert out.TEST.EVAL_PERIOD == 2500
    assert out.SOLVER.REFERENCE_WORLD_SIZE == 8
    assert out.is_frozen()
    # original untouched
    assert cfg.SOLVER.IMS_PER_BATCH == 4


def test_auto_scale_noop():
    cfg = get_cfg()
    assert auto_scale_workers(cfg, 8) is cfg           # world size 0
    cfg.SOLVER.REFERENCE_WORLD_SIZE = 8
    assert auto_scale_workers(cfg, 8) is cfg           # already matching
