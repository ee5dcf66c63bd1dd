#!/usr/bin/env python
"""WSOD training / evaluation CLI.

Equivalent of the reference WSL entry point
(projects/WSL/tools/train_net.py:204-257): config-driven training with
gradient accumulation, periodic checkpoints and evaluation; --eval-only runs
inference (+TTA when TEST.AUG.ENABLED) over cfg.DATASETS.TEST — and also over
the TRAIN datasets for CorLoc when TEST.EVAL_TRAIN is set (reference
test_with_TTA, train_net.py:169-201).

TPU notes: no process-per-GPU launcher — one process drives the whole mesh
via jit shardings (see drn_wsod_tpu/parallel/).
"""

import logging
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# TPU-friendly PRNG for per-step dropout masks.
jax.config.update("jax_default_prng_impl", "rbg")

from drn_wsod_tpu.checkpoint import Checkpointer
from drn_wsod_tpu.config import add_wsl_config, get_cfg
from drn_wsod_tpu.data import (DatasetMapper, MetadataCatalog,
                               build_detection_test_loader,
                               build_detection_train_loader)
from drn_wsod_tpu.data.datasets.builtin_web import (register_all_voc_sbd,
                                                    register_all_web)
from drn_wsod_tpu.data.datasets.coco import register_all_coco
from drn_wsod_tpu.data.datasets.lvis import register_all_lvis
from drn_wsod_tpu.data.datasets.voc import register_all_pascal_voc
from drn_wsod_tpu.engine import (CommonMetricPrinter, EvalHook, IterationTimer,
                                 PGTVisualization, PreciseBNHook,
                                 TensorboardWriter,
                                 JSONWriter, PeriodicCheckpointer,
                                 PeriodicWriter, Trainer, create_train_state)
from drn_wsod_tpu.engine.defaults import (default_argument_parser,
                                          default_setup, _init_variables)
from drn_wsod_tpu.evaluation import (PascalVOCDetectionEvaluator,
                                     inference_on_dataset, make_detect_fn)
from drn_wsod_tpu.evaluation.evaluator import gather_and_evaluate
from drn_wsod_tpu.models import build_model
from drn_wsod_tpu.parallel import (create_mesh, make_sharded_csc_train_step,
                                   make_sharded_multi_train_step,
                                   make_sharded_train_step, replicated,
                                   stack_and_shard_batches, state_shardings,
                                   shard_batch)
from drn_wsod_tpu.parallel import multihost
from drn_wsod_tpu.solver import build_lr_schedule, build_optimizer

logger = logging.getLogger("drn_wsod_tpu")


def setup(args):
    cfg = get_cfg()
    add_wsl_config(cfg)
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()
    default_setup(cfg, args)
    return cfg


def build_evaluator(cfg, dataset_name, records):
    """Per-dataset evaluator dispatch (reference
    projects/WSL/tools/train_net.py:119-167 and core
    tools/train_net.py:build_evaluator)."""
    meta = MetadataCatalog.get(dataset_name)
    gt_by_image = {str(r["image_id"]): r.get("annotations", [])
                   for r in records}
    etype = meta.get("evaluator_type", "pascal_voc")
    if etype == "pascal_voc":
        return PascalVOCDetectionEvaluator(
            meta.thing_classes, gt_by_image, year=meta.get("year", 2007))
    if etype == "cityscapes_instance" and cfg.MODEL.MASK_ON:
        # Cityscapes-native instance-mask AP (reference
        # CityscapesInstanceEvaluator); without masks fall through to the
        # COCO bbox evaluator below.
        from drn_wsod_tpu.evaluation import CityscapesInstanceEvaluator

        return CityscapesInstanceEvaluator(meta.thing_classes, gt_by_image)
    if etype in ("coco", "coco_panoptic_seg", "cityscapes_instance"):
        from drn_wsod_tpu.evaluation.coco_eval import COCODetectionEvaluator

        tasks = ["bbox"]
        if cfg.MODEL.MASK_ON:
            tasks.append("segm")
        if cfg.MODEL.KEYPOINT_ON:
            tasks.append("keypoints")
        return COCODetectionEvaluator(meta.thing_classes, gt_by_image,
                                      tasks=tuple(tasks))
    if etype == "rotated_coco":
        from drn_wsod_tpu.evaluation import RotatedCOCODetectionEvaluator

        return RotatedCOCODetectionEvaluator(meta.thing_classes, gt_by_image)
    if etype == "cityscapes_sem_seg":
        # 19-class pixel IoU over raw gtFine labelIds maps (reference
        # CityscapesSemSegEvaluator); the labelId->trainId mapping happens
        # inside the evaluator.
        from drn_wsod_tpu.evaluation import CityscapesSemSegEvaluator

        return CityscapesSemSegEvaluator()
    if etype == "sem_seg":
        from drn_wsod_tpu.evaluation import SemSegEvaluator

        return SemSegEvaluator(
            meta.get("stuff_classes") or meta.thing_classes,
            ignore_label=meta.get("ignore_label", 255))
    if etype == "lvis":
        from drn_wsod_tpu.evaluation.lvis_eval import LVISDetectionEvaluator

        info = {str(r["image_id"]): {
            "neg_category_ids": r.get("neg_category_ids", []),
            "not_exhaustive_category_ids":
                r.get("not_exhaustive_category_ids", [])}
            for r in records}
        return LVISDetectionEvaluator(
            meta.thing_classes, gt_by_image, info,
            frequencies=meta.get("thing_frequencies"))
    raise NotImplementedError(f"evaluator type {etype}")


def do_test(cfg, model, variables, eval_train: bool = False):
    from drn_wsod_tpu.data.loader import get_detection_dataset_dicts

    results = {}
    # Pair each dataset with ITS OWN source's proposal list — indexing a
    # concatenated proposal list by a concatenated dataset index silently
    # crosses sources when their lengths differ (e.g. TEST: () overridden
    # while the base config's PROPOSAL_FILES_TEST stays populated fed the
    # TEST pkl to the TRAIN CorLoc eval).
    def _pairs(names, files):
        files = list(files)
        return [(n, files[i] if i < len(files) else None)
                for i, n in enumerate(names)]

    pairs = _pairs(cfg.DATASETS.TEST, cfg.DATASETS.PROPOSAL_FILES_TEST)
    if eval_train and cfg.TEST.EVAL_TRAIN:
        pairs += _pairs(cfg.DATASETS.TRAIN, cfg.DATASETS.PROPOSAL_FILES_TRAIN)

    mapper = DatasetMapper(cfg, is_train=False)
    for name, prop_file in pairs:
        pf = [prop_file] if cfg.MODEL.LOAD_PROPOSALS and prop_file else ()
        records = get_detection_dataset_dicts([name], pf, filter_empty=False)
        etype = MetadataCatalog.get(name).get("evaluator_type", "pascal_voc")
        if etype in ("sem_seg", "cityscapes_sem_seg") or \
                etype == "coco_panoptic_seg" or \
                (etype == "cityscapes_instance" and cfg.MODEL.MASK_ON):
            results[name] = do_dense_test(cfg, model, variables, name,
                                          mapper, records, etype, prop_file)
            logger.info(f"Results on {name}: {results[name]}")
            continue
        if cfg.TEST.AUG.ENABLED:
            from drn_wsod_tpu.tta import GeneralizedRCNNWithTTAAVG

            tta = GeneralizedRCNNWithTTAAVG(cfg, model, variables)
            evaluator = build_evaluator(cfg, name, records)
            evaluator.reset()
            # rank-strided image shard (reference InferenceSampler); the
            # gather below reassembles predictions on the main process
            local = records[multihost.get_rank()::multihost.get_world_size()]
            for r in local:
                dets = tta(r)
                evaluator.process_single(
                    str(r["image_id"]), dets["boxes"], dets["scores"],
                    dets["classes"], dets["valid"])
            results[name] = gather_and_evaluate(evaluator)
        else:
            loader = build_detection_test_loader(
                cfg, name, mapper, proposal_file=prop_file)
            # records inside the loader include proposals; reuse them
            detect = make_detect_fn(model,
                                    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST,
                                    cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST,
                                    cfg.TEST.DETECTIONS_PER_IMAGE,
                                    mask_on=cfg.MODEL.MASK_ON,
                                    keypoint_on=cfg.MODEL.KEYPOINT_ON)
            evaluator = build_evaluator(cfg, name, loader._records)
            results[name] = inference_on_dataset(
                detect, variables, loader, evaluator, loader._records)
        logger.info(f"Results on {name}: {results[name]}")
        from drn_wsod_tpu.evaluation.testing import print_csv_format

        print_csv_format(results[name])

    if cfg.TEST.EXPECTED_RESULTS and pairs:
        from drn_wsod_tpu.evaluation.testing import verify_results

        assert verify_results(cfg, results[pairs[0][0]]), \
            "Results verification failed!"
    return results


def do_dense_test(cfg, model, variables, name, mapper, records, etype,
                  proposal_file=None):
    """Dense-output evaluation paths (reference per-dataset evaluator lists,
    tools/train_net.py:build_evaluator): semantic segmentation (mIoU) and
    panoptic fusion (PQ) — plus instance AP for panoptic datasets."""
    from drn_wsod_tpu.evaluation import (make_sem_seg_fn,
                                         panoptic_inference_on_dataset,
                                         sem_seg_inference_on_dataset)

    meta = MetadataCatalog.get(name)
    loader = build_detection_test_loader(cfg, name, mapper,
                                         proposal_file=proposal_file)
    sem_fn = make_sem_seg_fn(model)
    if etype in ("sem_seg", "cityscapes_sem_seg"):
        evaluator = build_evaluator(cfg, name, records)
        return sem_seg_inference_on_dataset(
            sem_fn, variables, loader, evaluator, loader._records)

    # coco_panoptic_seg: instance AP (+ masks) and PQ over the fused output
    results = {}
    detect = make_detect_fn(model, cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST,
                            cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST,
                            cfg.TEST.DETECTIONS_PER_IMAGE,
                            mask_on=cfg.MODEL.MASK_ON)
    evaluator = build_evaluator(cfg, name, records)
    results.update(inference_on_dataset(
        detect, variables, loader, evaluator, loader._records))

    if any("pan_seg_file_name" in r for r in records):
        from drn_wsod_tpu.evaluation.panoptic_eval import \
            PanopticQualityEvaluator

        n_thing = len(meta.thing_classes)
        n_stuff = len(meta.get("stuff_classes") or []) or \
            cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES
        pq_eval = PanopticQualityEvaluator(n_thing + n_stuff - 1)
        loader2 = build_detection_test_loader(cfg, name, mapper,
                                              proposal_file=proposal_file)
        results.update(panoptic_inference_on_dataset(
            detect, sem_fn, variables, loader2, pq_eval, loader2._records,
            num_thing_classes=n_thing,
            overlap_threshold=cfg.MODEL.PANOPTIC_FPN.COMBINE.OVERLAP_THRESH,
            stuff_area_limit=cfg.MODEL.PANOPTIC_FPN.COMBINE.STUFF_AREA_LIMIT,
            conf_threshold=cfg.MODEL.PANOPTIC_FPN.COMBINE
            .INSTANCES_CONFIDENCE_THRESH))
    return results


def do_train(cfg, model, resume: bool = False):
    mapper = DatasetMapper(cfg, is_train=True)
    loader = build_detection_train_loader(cfg, mapper)

    variables = _init_variables(model, cfg)
    tx = build_optimizer(cfg, variables)
    state = create_train_state(variables, tx)

    checkpointer = Checkpointer(os.path.join(cfg.OUTPUT_DIR, "checkpoints"))
    state, start_iter = checkpointer.resume_or_load(
        state, cfg.MODEL.WEIGHTS, resume=resume)

    mesh = create_mesh(tuple(cfg.PARALLEL.MESH_AXES),
                       tuple(cfg.PARALLEL.MESH_SHAPE))
    # with a "model" axis in PARALLEL.MESH_AXES the DAN FC stack is
    # Megatron-split over it (parallel/mesh.py:dan_tp_spec)
    plain_step = make_sharded_train_step(model, tx, mesh, state=state)
    from drn_wsod_tpu.models.build import CSC_HEAD_NAMES

    # K steps per dispatch (one lax.scan program instead of K dispatches,
    # engine/trainer.py). gcd-reduce K against every active hook period so
    # each firing hook observes exactly the state it would have seen with
    # eager stepping; CSC training forces K=1 (host-side step-program
    # switch on the iteration counter below).
    log_period = 20
    vis_period = cfg.VIS_PERIOD or (
        cfg.SOLVER.CHECKPOINT_PERIOD if cfg.WSL.VIS_TEST else 0)
    steps_per_dispatch = max(int(cfg.SOLVER.STEPS_PER_DISPATCH), 1)
    if cfg.MODEL.ROI_HEADS.NAME in CSC_HEAD_NAMES:
        steps_per_dispatch = 1
    # (ITER_SIZE accumulation lives inside the step via optax.MultiSteps,
    # so it does not constrain K.)
    for period in (log_period, cfg.SOLVER.CHECKPOINT_PERIOD,
                   cfg.TEST.EVAL_PERIOD, vis_period):
        if period and period > 0:
            steps_per_dispatch = math.gcd(steps_per_dispatch, int(period))

    if cfg.MODEL.ROI_HEADS.NAME in CSC_HEAD_NAMES:
        # CSC/WSJDS: the CSC constraint (CPG backprop-to-image +
        # center-surround weights) is active while iter <= WSL.CSC_MAX_ITER,
        # after which the reference degenerates to neutral weights == the
        # plain WSDDN BCE (roi_heads_csc.py:428,481-499). Two jitted steps,
        # host-side switch on the iteration counter.
        csc_step = make_sharded_csc_train_step(model, tx, mesh, state=state)
        csc_max_iter = cfg.WSL.CSC_MAX_ITER
        _trainer_box = []

        def step(state, batch, rng):
            it = _trainer_box[0].iter if _trainer_box else 0
            fn = csc_step if it <= csc_max_iter else plain_step
            return fn(state, batch, rng)
    else:
        _trainer_box = None
        step = plain_step
    state = jax.device_put(state, state_shardings(state, mesh))

    def sharded_iter():
        for batch in loader:
            yield shard_batch(batch, mesh)

    rng = jax.device_put(
        jax.random.PRNGKey(max(cfg.SEED, 0)), replicated(mesh))
    if steps_per_dispatch > 1:
        multi_step = make_sharded_multi_train_step(model, tx, mesh,
                                                   state=state)
        trainer = Trainer(
            step, state, iter(loader), rng,
            lr_schedule=build_lr_schedule(cfg), log_period=log_period,
            multi_step_fn=multi_step, steps_per_dispatch=steps_per_dispatch,
            stack_fn=lambda bs: stack_and_shard_batches(bs, mesh))
        logger = logging.getLogger(__name__)
        logger.info(f"Chunked training: {steps_per_dispatch} steps/dispatch")
    else:
        trainer = Trainer(step, state, sharded_iter(), rng,
                          lr_schedule=build_lr_schedule(cfg),
                          log_period=log_period)
    if _trainer_box is not None:
        _trainer_box.append(trainer)
    hooks = [IterationTimer()]
    if multihost.is_main_process():
        # rank-0-only writers/checkpoints (reference defaults.py:321-366)
        writers = [CommonMetricPrinter(cfg.SOLVER.MAX_ITER),
                   JSONWriter(os.path.join(cfg.OUTPUT_DIR, "metrics.json")),
                   TensorboardWriter(os.path.join(cfg.OUTPUT_DIR, "tb"))]
        hooks += [PeriodicWriter(writers),
                  PeriodicCheckpointer(checkpointer,
                                       cfg.SOLVER.CHECKPOINT_PERIOD)]
        if cfg.MODEL.RESNETS.NORM in ("BN", "SyncBN") or \
                cfg.TEST.PRECISE_BN.ENABLED:
            from functools import partial

            hooks.append(PreciseBNHook(
                cfg.TEST.EVAL_PERIOD or cfg.SOLVER.CHECKPOINT_PERIOD,
                partial(model.apply, train=True,
                        rngs={"dropout": jax.random.PRNGKey(0)}),
                lambda: iter(loader),
                num_iters=cfg.TEST.PRECISE_BN.NUM_ITER))
        if vis_period > 0 and cfg.MODEL.ROI_HEADS.NAME in (
                "OICRROIHeads", "PCLROIHeads", "WSDDNROIHeads"):
            meta = (MetadataCatalog.get(cfg.DATASETS.TRAIN[0])
                    if cfg.DATASETS.TRAIN else None)
            hooks.append(PGTVisualization(
                vis_period, model, cfg.OUTPUT_DIR,
                class_names=meta.get("thing_classes") if meta else None))
    if cfg.TEST.EVAL_PERIOD > 0:
        hooks.append(EvalHook(
            cfg.TEST.EVAL_PERIOD,
            lambda: do_test(cfg, model, trainer.state.params)))
    trainer.register_hooks(hooks)
    trainer.train(start_iter, cfg.SOLVER.MAX_ITER)
    return trainer.state


def main(args):
    cfg = setup(args)
    data_root = os.environ.get("DETECTRON2_DATASETS", "datasets")
    register_all_pascal_voc(data_root)
    register_all_coco(data_root)
    register_all_lvis(data_root)
    register_all_web(data_root)
    register_all_voc_sbd(data_root)

    model = build_model(cfg)
    if args.eval_only:
        variables = _init_variables(model, cfg)
        checkpointer = Checkpointer(os.path.join(cfg.OUTPUT_DIR, "checkpoints"))
        state = create_train_state(variables, build_optimizer(cfg, variables))
        state, _ = checkpointer.resume_or_load(state, cfg.MODEL.WEIGHTS,
                                               resume=args.resume)
        return do_test(cfg, model, state.params, eval_train=True)

    state = do_train(cfg, model, resume=args.resume)
    return do_test(cfg, model, state.params, eval_train=True)


if __name__ == "__main__":
    main(default_argument_parser().parse_args())
