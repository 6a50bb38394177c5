from .mesh import (batch_sharding, make_mesh, param_shardings, replicated,
                   shard_batch, shard_params)
from .train import (TrainState, create_train_state, lr_schedule,
                    make_eval_step, make_optimizer, make_train_step)

__all__ = [
    "batch_sharding", "make_mesh", "param_shardings", "replicated",
    "shard_batch", "shard_params", "TrainState", "create_train_state",
    "lr_schedule", "make_eval_step", "make_optimizer", "make_train_step",
]
