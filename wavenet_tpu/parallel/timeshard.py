"""Sequence (time-axis) parallelism with receptive-field halo exchange.

The reference's only long-sequence mechanism is host-side ``sample_size``
chunking (audio_reader.py ≈:150-165); a single training chunk can never
span devices, so chunk length is capped by one chip's HBM. This module is
the SURVEY §2b "SP/CP" row: WaveNet has no attention, so sequence
parallelism needs no ring attention — every layer is causal with a finite
receptive field, which makes a ONE-SHOT halo exchange at the input level
sufficient:

* shard the time axis over a mesh axis (``shard_map``),
* each shard fetches the previous shard's last ``receptive_field`` raw
  samples with a single ``lax.ppermute`` (rides the ICI ring; shard 0's
  missing link arrives as ppermute's natural zero fill — exactly the
  reader's left zero-padding),
* each shard runs the normal stack on ``[halo | local]`` and drops the
  halo positions from the loss: recompute overhead is
  ``receptive_field / local_T`` (~6% at the default 100k sample_size),
  traded for an O(L)-fold reduction in per-chip activation memory.

Loss/grad parity with the unsharded ``loss_fn`` is exact up to float
reordering (asserted on the 8-device CPU mesh in tests/test_timeshard.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from wavenet_tpu.audio import mu_law_encode
from wavenet_tpu.models.config import WaveNetConfig
from wavenet_tpu.models.wavenet import embed_gc, forward, forward_codes

TIME_AXIS = "time"


def _local_ce_sum(params, config: WaveNetConfig, halo: jnp.ndarray,
                  local: jnp.ndarray, shard_index: jnp.ndarray,
                  gc_emb) -> jnp.ndarray:
    """Sum of per-position CE over this shard's VALID target positions.

    ``halo``: [B, rf] raw samples from the previous shard (zeros on shard
    0 == the reader's left padding). ``local``: [B, Tl] this shard's raw
    samples. Valid targets are local positions whose GLOBAL index is
    >= receptive_field — only shard 0 masks anything.
    """
    c = config
    rf = c.receptive_field
    B, Tl = local.shape
    window = jnp.concatenate([halo, local], axis=1)        # [B, rf + Tl]
    encoded = mu_law_encode(window, c.quantization_channels)

    if c.scalar_input:
        net_in = window[:, :-1, None].astype(jnp.float32)
        raw = forward(params, c, net_in, gc_emb)
    else:
        raw = forward_codes(params, c, encoded[:, :-1], gc_emb)

    # Predictions for window positions [rf, rf+Tl) live at logit rows
    # [rf-1, rf+Tl-1) — the same one-step alignment as loss_fn.
    logp = jax.nn.log_softmax(raw[:, rf - 1: rf + Tl - 1, :], axis=-1)
    targets = encoded[:, rf:]                              # [B, Tl]
    ce = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]

    global_pos = shard_index * Tl + jnp.arange(Tl)
    valid = (global_pos >= rf).astype(ce.dtype)            # [Tl]
    return jnp.sum(ce * valid[None, :])


def time_sharded_loss(params, config: WaveNetConfig, audio: jnp.ndarray,
                      gc_ids: Optional[jnp.ndarray] = None,
                      l2_regularization_strength: Optional[float] = None,
                      axis_name: str = TIME_AXIS,
                      data_axis: Optional[str] = None):
    """Loss over a time-sharded batch — call INSIDE shard_map.

    ``audio``: the local [B, Tl] time slice of a [B, T] chunk whose
    leading receptive_field samples are zero padding (reader layout).
    Returns the same (total, aux) contract as ``loss_fn``, with the CE
    mean taken over ALL shards' valid positions (psum over ``axis_name``
    and, if given, ``data_axis``).
    """
    c = config
    rf = c.receptive_field
    B, Tl = audio.shape
    if Tl <= rf:
        raise ValueError(f"local time slice ({Tl}) must exceed the "
                         f"receptive field ({rf})")
    n_shards = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)

    # Halo: previous shard's tail rides the ICI ring one hop right.
    perm = [(i, i + 1) for i in range(n_shards - 1)]
    halo = lax.ppermute(audio[:, -rf:], axis_name, perm)   # zeros on shard 0

    gc_emb = embed_gc(params, c, gc_ids) if gc_ids is not None else None
    ce_sum = _local_ce_sum(params, c, halo, audio, idx, gc_emb)

    axes = (axis_name,) if data_axis is None else (axis_name, data_axis)
    ce_sum = lax.psum(ce_sum, axes)
    n_batch = B * (lax.psum(1, data_axis) if data_axis is not None else 1)
    n_valid = n_batch * (n_shards * Tl - rf)
    ce = ce_sum / n_valid

    aux = {"ce_loss": ce}
    total = ce
    if l2_regularization_strength:
        # Params are replicated over the mesh: identical on every device,
        # so the L2 term is added once, outside the psum.
        l2 = sum(0.5 * jnp.sum(jnp.square(v)) for k, v in params.items()
                 if not k.endswith("_bias"))
        aux["l2_loss"] = l2
        total = ce + l2_regularization_strength * l2
    aux["total_loss"] = total
    return total, aux


def make_time_sharded_grad_fn(config: WaveNetConfig, mesh: Mesh,
                              l2_regularization_strength=None,
                              time_axis: str = TIME_AXIS,
                              data_axis: Optional[str] = None):
    """Build a jitted (params, audio[, gc_ids]) -> ((loss, aux), grads).

    ``mesh`` must contain ``time_axis`` (and ``data_axis`` if given);
    audio is consumed with P(data_axis, time_axis) sharding, params
    replicated. Gradients come back replicated (psum over all mesh axes),
    ready for a standard replicated optimizer update.
    """
    c = config

    lam = l2_regularization_strength

    def local_value_and_grad(params, audio, gc_ids):
        # Differentiate ONLY the local shard's CE sum, then combine values
        # and grads with explicit psums. (Differentiating through a psum
        # inside shard_map leans on its transpose rule, whose semantics
        # under check_vma=False scale cotangents by the axis size —
        # explicit arithmetic is correct under any version's rule.)
        rf = c.receptive_field
        B, Tl = audio.shape
        if Tl <= rf:
            raise ValueError(f"local time slice ({Tl}) must exceed the "
                             f"receptive field ({rf})")
        n_shards = lax.axis_size(time_axis)
        idx = lax.axis_index(time_axis)
        perm = [(i, i + 1) for i in range(n_shards - 1)]
        halo = lax.ppermute(audio[:, -rf:], time_axis, perm)

        def f(p):
            gc_emb = (embed_gc(p, c, gc_ids) if c.gc_enabled else None)
            return _local_ce_sum(p, c, halo, audio, idx, gc_emb)

        local_sum, local_grads = jax.value_and_grad(f)(params)

        axes = (time_axis,) if data_axis is None else (time_axis, data_axis)
        n_batch = B * (lax.psum(1, data_axis) if data_axis else 1)
        n_valid = n_batch * (n_shards * Tl - rf)
        ce = lax.psum(local_sum, axes) / n_valid
        grads = jax.tree.map(lambda g: lax.psum(g, axes) / n_valid,
                             local_grads)

        aux = {"ce_loss": ce}
        total = ce
        if lam:
            # Params are replicated: the L2 term and its gradient are
            # identical on every device — added once, outside the psums.
            l2 = sum(0.5 * jnp.sum(jnp.square(v))
                     for k, v in params.items() if not k.endswith("_bias"))
            aux["l2_loss"] = l2
            total = ce + lam * l2
            grads = {k: (g + lam * params[k] if not k.endswith("_bias")
                         else g) for k, g in grads.items()}
        aux["total_loss"] = total
        return (total, aux), grads

    audio_spec = P(data_axis, time_axis)
    gc_spec = P(data_axis)
    replicated = P()

    sharded = shard_map(
        local_value_and_grad, mesh=mesh,
        in_specs=(replicated, audio_spec, gc_spec),
        out_specs=((replicated, replicated), replicated),
        check_vma=False)

    @jax.jit
    def fn(params, audio, gc_ids=None):
        if gc_ids is None:
            # shard_map needs a concrete arg; when the config has no GC
            # the local function never touches it.
            gc_ids = jnp.zeros((audio.shape[0],), jnp.int32)
        return sharded(params, audio, gc_ids)

    return fn
