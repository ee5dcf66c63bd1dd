from .mesh import (batch_sharding, create_mesh, replicated, shard_batch,
                   stack_and_shard_batches, stacked_batch_sharding,
                   state_shardings)
from .train_parallel import (make_sharded_csc_train_step,
                             make_sharded_inference_fn,
                             make_sharded_multi_train_step,
                             make_sharded_train_step)

__all__ = [
    "batch_sharding", "create_mesh", "replicated", "shard_batch",
    "stack_and_shard_batches", "stacked_batch_sharding",
    "state_shardings",
    "make_sharded_csc_train_step", "make_sharded_inference_fn",
    "make_sharded_multi_train_step", "make_sharded_train_step",
]
