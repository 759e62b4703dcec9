"""Mesh + sharding layout: data parallel x tensor (channel) parallel.

The reference is single-device (SURVEY §2b: no parallelism of any kind) —
this module is new capability, designed per the GSPMD recipe: build a mesh,
annotate param/batch shardings with NamedSharding, let ``jit`` insert the
collectives (gradient allreduce over "data", activation psum over "model"
all ride ICI).

Tensor-parallel layout follows the Megatron column/row pattern mapped onto
the WaveNet gated unit:

  filter/gate  [L, fw, R, D] — COLUMN parallel: shard output D. Each chip
                               computes its slice of tanh/sigmoid locally.
  dense        [L, D, R]     — ROW parallel: shard input D; XLA psums the
                               partial residual projections.
  skip         [L, D, S]     — ROW parallel over D, like dense.
  postprocess1 [S, S]        — COLUMN parallel: shard output S.
  postprocess2 [S, Q]        — ROW parallel: shard input S; logits psum.
  gc weights   [L, G, D]     — column parallel with filter/gate.

Residual-channel activations [B, T, R] stay replicated over "model" (R is
small); batch shards over "data".
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from wavenet_tpu.models.config import WaveNetConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              model_parallelism: int = 1,
              axis_names: Tuple[str, str] = (DATA_AXIS, MODEL_AXIS)) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    ``model_parallelism`` chips cooperate on one model replica; the rest of
    the devices form the data axis. On one device this degrades to (1, 1).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_parallelism != 0:
        raise ValueError(f"{n} devices not divisible by "
                         f"model_parallelism={model_parallelism}")
    grid = np.asarray(devices).reshape(n // model_parallelism,
                                       model_parallelism)
    return Mesh(grid, axis_names)


def param_partition_specs(config: WaveNetConfig, params_like) -> dict:
    """PartitionSpec pytree matching ``init_params``'s structure."""
    c = config
    specs = {
        "causal_filter": P(None, None, None),     # small; replicated
        "filter": P(None, None, None, MODEL_AXIS),
        "gate": P(None, None, None, MODEL_AXIS),
        "dense": P(None, MODEL_AXIS, None),
        "skip": P(None, MODEL_AXIS, None),
        "postprocess1": P(None, MODEL_AXIS),
        "postprocess2": P(MODEL_AXIS, None),
    }
    if c.gc_enabled:
        specs["gc_embedding"] = P(None, None)
        specs["gc_filter"] = P(None, None, MODEL_AXIS)
        specs["gc_gate"] = P(None, None, MODEL_AXIS)
    if c.lc_enabled:
        # Column parallel with filter/gate, like the GC projections.
        specs["lc_filter"] = P(None, None, MODEL_AXIS)
        specs["lc_gate"] = P(None, None, MODEL_AXIS)
        if c.lc_refine_width:
            # The learned-upsampler refinement is tiny (C_lc-sized);
            # replicate it.
            specs["lc_up_depth"] = P(None, None)
            specs["lc_up_point"] = P(None, None)
            specs["lc_up_bias"] = P(None)
    if c.use_biases:
        specs["filter_bias"] = P(None, MODEL_AXIS)
        specs["gate_bias"] = P(None, MODEL_AXIS)
        specs["dense_bias"] = P(None, None)
        specs["skip_bias"] = P(None, None)
        specs["postprocess1_bias"] = P(MODEL_AXIS)
        specs["postprocess2_bias"] = P(None)
    # Sanity: cover exactly the keys present.
    missing = set(params_like) - set(specs)
    if missing:
        raise ValueError(f"No partition spec for params: {missing}")
    return {k: specs[k] for k in params_like}


def batch_spec() -> P:
    return P(DATA_AXIS, None)


def shard_params(params, config: WaveNetConfig, mesh: Mesh):
    """device_put the param pytree with its NamedShardings."""
    specs = param_partition_specs(config, params)
    return {k: jax.device_put(v, NamedSharding(mesh, specs[k]))
            for k, v in params.items()}


def shard_train_state(state, config: WaveNetConfig, mesh: Mesh):
    """Shard params and (structurally-matching) optimizer state."""
    from wavenet_tpu.train_lib import TrainState

    specs = param_partition_specs(config, state.params)

    def spec_for_opt_leaf(path, leaf):
        # optax states mirror the param tree under fields like mu/nu/trace;
        # match by the param key appearing in the path.
        for entry in reversed(path):
            key = getattr(entry, "key", None)
            if key in specs and hasattr(leaf, "ndim") and \
                    leaf.ndim == len(specs[key]):
                return specs[key]
        return P()

    params = shard_params(state.params, config, mesh)
    opt_state = jax.tree_util.tree_map_with_path(
        lambda path, leaf: jax.device_put(
            leaf, NamedSharding(mesh, spec_for_opt_leaf(path, leaf))),
        state.opt_state)
    step = jax.device_put(state.step, NamedSharding(mesh, P()))
    return TrainState(step=step, params=params, opt_state=opt_state)


def shard_batch(audio: np.ndarray, mesh: Mesh, gc_ids=None, lc=None,
                stacked: bool = False):
    """Shard a host batch over the data axis.

    Returns (audio, gc_ids, lc) — unused streams come back as None.

    ``stacked``: inputs carry a leading steps-per-dispatch axis
    (audio ``[K, B, T]``, gc ``[K, B]``, LC leaves ``[K, ...]``) for
    the multi-step ``lax.scan`` train program; the batch axis to shard
    is then axis 1, and the K axis stays replicated (each scan substep
    slices its own batch).
    """
    lead = (None,) if stacked else ()
    audio_spec = P(*lead, DATA_AXIS, *((None,) * (audio.ndim - len(lead) - 1)))
    audio_s = jax.device_put(audio, NamedSharding(mesh, audio_spec))
    gc_s = None
    if gc_ids is not None:
        gc_s = jax.device_put(gc_ids,
                              NamedSharding(mesh, P(*lead, DATA_AXIS)))
    lc_s = None
    if lc is not None:
        # Works for both the upsampled stream [B, T, C] and the
        # LCFrameChunk NamedTuple (every leaf is batch-major).
        lc_s = jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(
                mesh, P(*lead, DATA_AXIS,
                        *((None,) * (x.ndim - len(lead) - 1))))), lc)
    return audio_s, gc_s, lc_s
