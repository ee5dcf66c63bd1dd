from .build import (
    build_lr_schedule,
    build_optimizer,
    make_param_labels,
    warmup_cosine_schedule,
    warmup_multistep_schedule,
)

__all__ = [
    "build_lr_schedule", "build_optimizer", "make_param_labels",
    "warmup_cosine_schedule", "warmup_multistep_schedule",
]
