from .events import (CommonMetricPrinter, EventStorage, EventWriter,
                     JSONWriter, TensorboardWriter, get_event_storage)
from .hooks import (EvalHook, HookBase, IterationTimer, PeriodicCheckpointer,
                    PeriodicWriter, PGTVisualization, PreciseBNHook)
from .trainer import (TrainState, Trainer, create_train_state,
                      make_csc_train_step, make_multi_train_step,
                      make_train_step)

__all__ = [
    "CommonMetricPrinter", "EventStorage", "EventWriter", "JSONWriter",
    "TensorboardWriter", "PGTVisualization", "PreciseBNHook",
    "get_event_storage", "EvalHook", "HookBase", "IterationTimer",
    "PeriodicCheckpointer", "PeriodicWriter", "TrainState", "Trainer",
    "create_train_state", "make_csc_train_step", "make_multi_train_step",
    "make_train_step",
]
