"""Training loop building blocks: jit'd train step, checkpointing, metrics.

Replaces the reference's session-driven loop (reference: train.py ≈:210-320:
``sess.run([summaries, loss, optim])`` per step, ``tf.train.Saver``
checkpoints). Here a step is one compiled XLA program with donated state;
checkpoints go through orbax with step-numbered directories.
"""

from __future__ import annotations

import dataclasses
import os
import re
import time
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from wavenet_tpu.models.config import WaveNetConfig
from wavenet_tpu.models.wavenet import Params, init_params, loss_fn
from wavenet_tpu.ops.optimizers import optimizer_factory


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    """Params + optimizer state + step counter (a pytree)."""
    step: jnp.ndarray
    params: Params
    opt_state: Any


def create_train_state(key: jax.Array, config: WaveNetConfig,
                       optimizer: optax.GradientTransformation) -> TrainState:
    params = init_params(key, config)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=optimizer.init(params))


def make_optimizer(name: str, learning_rate: float,
                   momentum: float = 0.9) -> optax.GradientTransformation:
    """Reference optimizer_factory lookup (ops.py ≈:20)."""
    try:
        factory = optimizer_factory[name]
    except KeyError:
        raise ValueError(f"Unknown optimizer '{name}'. "
                         f"Choose from {sorted(optimizer_factory)}.")
    return factory(learning_rate, momentum)


def make_train_step(config: WaveNetConfig,
                    optimizer: optax.GradientTransformation,
                    l2_regularization_strength: Optional[float] = None,
                    lc_hop: Optional[int] = None,
                    lc_upsample: str = "repeat"):
    """Build the jit'd (state, audio[, gc_ids]) -> (state, metrics) step.

    The grad/update/apply chain is the whole program: one device dispatch
    per step, state donated (no reallocation), metrics returned as small
    scalars (reference printed loss per step, train.py ≈:305).

    ``lc`` accepts either the upsampled stream [B, T, C] or an
    ``lc.LCFrameChunk`` (frame windows + alignment; requires ``lc_hop``)
    — the TPU-native transfer format, upsampled ON DEVICE inside the
    step so the host ships ~0.3% of the bytes.
    """
    from wavenet_tpu.lc import LCFrameChunk, upsample_chunk_jax

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, audio: jnp.ndarray,
                   gc_ids: Optional[jnp.ndarray] = None,
                   lc: Optional[jnp.ndarray] = None
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        if isinstance(lc, LCFrameChunk):
            if lc_hop is None:
                raise ValueError("LCFrameChunk input needs lc_hop at "
                                 "make_train_step time")
            lc = upsample_chunk_jax(lc, lc_hop, lc_upsample,
                                    audio.shape[1])
        (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, config, audio, gc_ids,
            l2_regularization_strength, lc)
        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"loss": total, **aux,
                   "grad_norm": optax.global_norm(grads)}
        return TrainState(step=state.step + 1, params=new_params,
                          opt_state=new_opt_state), metrics

    return train_step


def make_train_multistep(config: WaveNetConfig,
                         optimizer: optax.GradientTransformation,
                         l2_regularization_strength: Optional[float] = None,
                         lc_hop: Optional[int] = None,
                         lc_upsample: str = "repeat",
                         steps_per_dispatch: int = 1):
    """K train steps in ONE compiled program via ``lax.scan``.

    Through a tunneled chip every dispatch pays a host round-trip
    (dispatch RPC + input staging); the round-3 soak spent ~3x the
    device compute on that per-step overhead. Scanning K steps inside
    one jit amortizes the round-trip K ways — the reference has no
    analogue (TF1 ``sess.run`` was always one step), this is the
    XLA-native answer to its threaded-queue feeding problem
    (audio_reader.py ≈:130-172).

    Inputs carry a leading K axis: audio ``[K, B, T]``, gc ``[K, B]``,
    LC leaves ``[K, ...]``. Returns ``(state, metrics)`` with every
    metric stacked ``[K]`` (per-substep losses, so the CLI still
    prints/logs one line per training step and the NaN guard can
    validate each substep before a save).
    """
    from wavenet_tpu.lc import LCFrameChunk, upsample_chunk_jax

    def one_step(state, audio, gc_ids, lc):
        if isinstance(lc, LCFrameChunk):
            if lc_hop is None:
                raise ValueError("LCFrameChunk input needs lc_hop at "
                                 "make_train_multistep time")
            lc = upsample_chunk_jax(lc, lc_hop, lc_upsample,
                                    audio.shape[1])
        (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, config, audio, gc_ids,
            l2_regularization_strength, lc)
        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"loss": total, **aux,
                   "grad_norm": optax.global_norm(grads)}
        return TrainState(step=state.step + 1, params=new_params,
                          opt_state=new_opt_state), metrics

    @partial(jax.jit, donate_argnums=(0,))
    def train_multistep(state: TrainState, audio: jnp.ndarray,
                        gc_ids: Optional[jnp.ndarray] = None,
                        lc: Optional[Any] = None
                        ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        def body(st, xs):
            a, g, l = xs
            return one_step(st, a, g, l)
        return jax.lax.scan(body, state, (audio, gc_ids, lc))

    return train_multistep


# ---------------------------------------------------------------------------
# Checkpointing (orbax) — reference train.py save()/load() ≈:150-170
# ---------------------------------------------------------------------------

_async_ckptr = None


def _get_async_checkpointer():
    global _async_ckptr
    if _async_ckptr is None:
        import orbax.checkpoint as ocp
        _async_ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _async_ckptr


def _prune_checkpoints(root: str, max_to_keep: Optional[int]) -> None:
    """Keep only the newest ``max_to_keep`` FINALIZED ckpt-* dirs.

    Orbax writes into ``*.orbax-checkpoint-tmp-*`` and renames on
    finalize, so an in-flight async save never matches the ckpt-N
    pattern and can't be pruned (nor picked up by
    ``latest_checkpoint_step``) — a kill mid-save leaves the previous
    newest checkpoint intact and loadable.
    """
    if max_to_keep is None or max_to_keep <= 0:
        return
    import shutil
    steps = sorted(
        int(m.group(1)) for d in os.listdir(root)
        if (m := re.fullmatch(r"ckpt-(\d+)", d))
        and os.path.isdir(os.path.join(root, d)))
    for old in steps[:-max_to_keep]:
        shutil.rmtree(os.path.join(root, f"ckpt-{old}"),
                      ignore_errors=True)


def save_checkpoint(directory: str, state: TrainState,
                    max_to_keep: Optional[int] = None,
                    use_async: bool = False) -> None:
    """Write logdir/ckpt-<step>/ (reference wrote model.ckpt-STEP).

    ``max_to_keep``: prune the oldest ckpt-* dirs down to this many
    AFTER a successful save — the reference's tf.train.Saver
    max_to_keep semantics (train.py ≈:270), which the --max_checkpoints
    flag feeds.

    ``use_async``: snapshot the state to host synchronously (the state
    buffers are donated to the next dispatch, so they must be copied
    out before training continues), then serialize/write in orbax's
    background thread. The train loop only ever blocks on the PREVIOUS
    save finishing — call :func:`wait_for_checkpoints` before exiting.
    NaN-safety ordering is unchanged: the CLI validates the loss
    synchronously BEFORE calling this, so a poisoned state is never
    handed to either path.
    """
    import orbax.checkpoint as ocp

    step = int(jax.device_get(state.step))
    root = os.path.abspath(directory)
    path = os.path.join(root, f"ckpt-{step}")
    payload = {"step": step,
               "params": jax.device_get(state.params),
               "opt_state": jax.device_get(state.opt_state)}
    if use_async:
        ckptr = _get_async_checkpointer()
        # One save in flight at a time; by the time the previous one
        # finished it is finalized, so pruning below never sees a
        # partial dir.
        ckptr.wait_until_finished()
        ckptr.save(path, payload, force=True)
    else:
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(path, payload, force=True)
    _prune_checkpoints(root, max_to_keep)


def wait_for_checkpoints() -> None:
    """Block until any in-flight async checkpoint save is finalized."""
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()


def latest_checkpoint_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = [int(m.group(1)) for name in os.listdir(directory)
             if (m := re.fullmatch(r"ckpt-(\d+)", name))]
    return max(steps) if steps else None


def restore_checkpoint(directory: str, state: TrainState,
                       step: Optional[int] = None) -> Optional[TrainState]:
    """Restore the latest (or given) step; None if no checkpoint exists."""
    import orbax.checkpoint as ocp

    if step is None:
        step = latest_checkpoint_step(directory)
        if step is None:
            return None
    path = os.path.join(os.path.abspath(directory), f"ckpt-{step}")
    template = {"step": 0,
                "params": jax.device_get(state.params),
                "opt_state": jax.device_get(state.opt_state)}
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path, item=template)
    return TrainState(step=jnp.asarray(restored["step"], jnp.int32),
                      params=jax.tree.map(jnp.asarray, restored["params"]),
                      opt_state=jax.tree.map(jnp.asarray,
                                             restored["opt_state"]))


def restore_params_only(directory: str, params_template: Params,
                        step: Optional[int] = None) -> Optional[Params]:
    """For generation: restore weights only (the reference's generate.py
    Saver excluded queue state, ≈:160; sampler state is never checkpointed
    here either — it's recomputed by priming)."""
    import orbax.checkpoint as ocp

    if step is None:
        step = latest_checkpoint_step(directory)
        if step is None:
            return None
    path = os.path.join(os.path.abspath(directory), f"ckpt-{step}")
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path)
    return jax.tree.map(jnp.asarray, restored["params"])


# ---------------------------------------------------------------------------
# Step timing / throughput (the reference's "(Y sec/step)" print, ≈:305)
# ---------------------------------------------------------------------------

class StepTimer:
    def __init__(self):
        self._last = time.time()

    def lap(self) -> float:
        now = time.time()
        dt = now - self._last
        self._last = now
        return dt


def audio_seconds_per_second(samples_per_batch: int, sample_rate: int,
                             sec_per_step: float) -> float:
    """North-star metric: seconds of audio consumed per wall second."""
    return (samples_per_batch / sample_rate) / sec_per_step
