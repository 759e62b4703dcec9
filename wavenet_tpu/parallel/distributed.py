"""Multi-host (pod-slice) support: process init + global batch assembly.

The reference is strictly single-process (SURVEY §2b). This module is the
multi-host leg of the new parallelism stack:

* :func:`initialize_multihost` wraps ``jax.distributed.initialize`` —
  DCN rendezvous across hosts; each host then sees its local chips and
  the global mesh spans all of them.
* :func:`global_batch_from_local` turns each host's local numpy batch
  into one globally-sharded jax.Array (data-parallel over the global
  "data" axis) via ``jax.make_array_from_process_local_data`` — the
  multi-host equivalent of ``shard_batch``.
* The training step itself needs NO changes: ``jit`` over a global mesh
  compiles SPMD programs per host, gradient allreduce rides ICI within a
  slice and DCN across slices.

Testable only on real multi-host topology; on one host these helpers
degrade to the single-process path (initialize is a no-op unless
coordinator flags/env are present).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from wavenet_tpu.parallel.sharding import DATA_AXIS, MODEL_AXIS


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> bool:
    """Initialize JAX's distributed runtime if multi-host is configured.

    Returns True when running multi-host. Arguments may come from flags
    or the standard env vars (JAX_COORDINATOR_ADDRESS etc. / TPU pod
    metadata, which jax.distributed auto-detects on Cloud TPU).
    """
    explicit = coordinator_address is not None
    env_configured = bool(os.environ.get("COORDINATOR_ADDRESS")
                          or os.environ.get("JAX_COORDINATOR_ADDRESS")
                          or os.environ.get("TPU_WORKER_HOSTNAMES", "")
                          .count(",") > 0)
    if not explicit and not env_configured:
        return False
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return jax.process_count() > 1


def make_global_mesh(model_parallelism: int = 1) -> Mesh:
    """Mesh over ALL devices (all hosts), data x model.

    Model-parallel groups are kept within a host's chips when possible so
    tensor-parallel collectives ride ICI, and the data axis crosses
    hosts over DCN.
    """
    devices = np.asarray(jax.devices())
    n = len(devices)
    if n % model_parallelism != 0:
        raise ValueError(f"{n} devices not divisible by "
                         f"model_parallelism={model_parallelism}")
    grid = devices.reshape(n // model_parallelism, model_parallelism)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def global_batch_from_local(local_audio: np.ndarray, mesh: Mesh,
                            local_gc_ids: Optional[np.ndarray] = None,
                            local_lc: Optional[np.ndarray] = None):
    """Host-local [b_local, T] batches -> one global [b_global, T] array.

    Every host calls this with ITS shard of the global batch (the data
    reader is seeded per-process, reference sampling-with-replacement
    semantics make disjoint streams trivial); the result behaves like a
    single array of shape [b_local * process_count, T] sharded over the
    data axis. ``local_lc`` [b_local, T, C] rides the same data axis.
    """
    audio = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(DATA_AXIS, None)), local_audio)
    gc = None
    if local_gc_ids is not None:
        gc = jax.make_array_from_process_local_data(
            NamedSharding(mesh, P(DATA_AXIS)), local_gc_ids)
    lc = None
    if local_lc is not None:
        # Upsampled stream [b, T, C] or LCFrameChunk — every leaf is
        # batch-major, so the same per-leaf data sharding applies.
        lc = jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                NamedSharding(mesh, P(*((DATA_AXIS,)
                                        + (None,) * (x.ndim - 1)))), x),
            local_lc)
    return audio, gc, lc
