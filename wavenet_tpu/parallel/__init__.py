"""Parallelism: mesh/sharding specs, multi-host init, time-axis SP.

The reference is single-device (SURVEY §2b: no DP/TP/SP and no comm
backend); everything here is new TPU-native capability. GSPMD inserts
the collectives from NamedSharding annotations (dp/tp); the time axis
uses an explicit shard_map + ppermute halo exchange (timeshard.py).
"""

from wavenet_tpu.parallel.sharding import (
    batch_spec,
    make_mesh,
    param_partition_specs,
    shard_batch,
    shard_params,
    shard_train_state,
)
from wavenet_tpu.parallel.timeshard import (
    TIME_AXIS,
    make_time_sharded_grad_fn,
    time_sharded_loss,
)
from wavenet_tpu.parallel.distributed import (
    global_batch_from_local,
    initialize_multihost,
    make_global_mesh,
)

__all__ = [
    "batch_spec",
    "make_mesh",
    "param_partition_specs",
    "shard_batch",
    "shard_params",
    "shard_train_state",
    "TIME_AXIS",
    "make_time_sharded_grad_fn",
    "time_sharded_loss",
    "global_batch_from_local",
    "initialize_multihost",
    "make_global_mesh",
]
