from .mesh import (batch_sharding, image_sharding, make_mesh,
                   param_shardings, replicated, shard_batch, shard_params)
from .multihost import allgather_host_rows
from .train import (TrainState, create_train_state, lr_schedule,
                    make_eval_step, make_optimizer, make_train_step)

__all__ = [
    "allgather_host_rows", "batch_sharding", "image_sharding", "make_mesh",
    "param_shardings", "replicated", "shard_batch", "shard_params",
    "TrainState", "create_train_state", "lr_schedule", "make_eval_step",
    "make_optimizer", "make_train_step",
]
