"""Fast autoregressive sampling: jit'd lax.scan over ring-buffered state.

The reference's fast-generation path (reference: wavenet/model.py
``_create_generator`` ≈:505-575, per the Fast WaveNet paper 1611.09482)
caches each layer's past activation in a ``tf.FIFOQueue`` of depth =
dilation and runs ONE ``sess.run`` per emitted sample (generate.py ≈:190 —
a Python->runtime roundtrip per sample). Here the whole loop is a single
compiled program:

* Per-layer activation queues -> one stacked ring buffer
  ``[L, max_dilation, B, R]``. Layer l reads and writes slot
  ``t mod dilation_l``: the value read was written dilation_l steps ago,
  which is exactly the FIFO dequeue/enqueue semantics.
* The causal input queue -> a ``[B, kw-1, C_in]`` shift register (kw =
  initial_filter_width in scalar mode, else filter_width). Unlike the
  reference (which raises NotImplementedError), scalar-input incremental
  generation is supported.
* The per-sample Python loop -> ``lax.scan`` with donated state: zero host
  roundtrips, state updated in place by XLA.
* Temperature sampling: ``jax.random.categorical(logits / T)`` draws from
  softmax(p)^(1/T) — the same distribution as the reference's
  exp(log(p)/T) renormalization + np.random.choice (generate.py ≈:205),
  under JAX's counter-based PRNG instead of NumPy's global seed.

Equivalence with the full conv forward (the reference's
fast-vs-slow keystone, SURVEY §3.5) is asserted in tests/test_generation.py.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from wavenet_tpu.models.config import WaveNetConfig
from wavenet_tpu.models.wavenet import Params, embed_gc


class SamplerState(NamedTuple):
    """Carry of the sampling scan (all buffers donated across steps)."""
    t: jnp.ndarray            # [] int32 — global step (ring-buffer clock)
    causal_buf: jnp.ndarray   # [B, kw-1, C_in] — last kw-1 raw inputs
    layer_bufs: jnp.ndarray   # [L, max_dilation, B, R] — past residual acts


def _input_kernel_width(config: WaveNetConfig) -> int:
    return (config.initial_filter_width if config.scalar_input
            else config.filter_width)


def init_sampler_state(config: WaveNetConfig, batch_size: int) -> SamplerState:
    """All-zero queues (reference ``init_ops`` enqueue zeros, ≈:515-535)."""
    c = config
    kw = _input_kernel_width(c)
    max_d = max(c.dilations)
    return SamplerState(
        t=jnp.zeros((), jnp.int32),
        causal_buf=jnp.zeros((batch_size, kw - 1, c.input_channels),
                             jnp.float32),
        layer_bufs=jnp.zeros(
            (c.num_layers, max_d, batch_size, c.residual_channels),
            jnp.float32),
    )


def sampler_step(params: Params, config: WaveNetConfig, state: SamplerState,
                 x: jnp.ndarray,
                 gc_embedding: Optional[jnp.ndarray] = None,
                 collect_layer_inputs: bool = False,
                 lc_t: Optional[jnp.ndarray] = None):
    """One incremental network evaluation.

    ``x``: current input features [B, C_in] (one-hot mu-law, or amplitude
    [B, 1] in scalar mode). ``lc_t``: [B, C_lc] local-conditioning vector
    for the sample this step PREDICTS (same convention as
    ``models.wavenet.forward``). Returns (new_state, logits [B, Q]) —
    plus a stacked [L, B, R] of each layer's input (the residual stream)
    when ``collect_layer_inputs`` is set (speculative decoding commits
    the draft state from these without a second stack pass).

    Mirrors the reference's ``_generator_dilation_layer`` math
    (model.py ≈:365-430): every conv collapses to matmuls on the current
    and queued activations.
    """
    c = config
    if c.filter_width != 2:
        raise NotImplementedError(
            "Incremental generation only implemented for filter_width=2 "
            "(the reference has the same restriction, model.py ≈:652).")

    # Causal layer: full kw-tap conv over [shift-register | current input].
    window = jnp.concatenate([state.causal_buf, x[:, None, :]], axis=1)
    # [B, kw, C_in] x [kw, C_in, R] -> [B, R]
    current = jnp.einsum("bkc,kcr->br", window, params["causal_filter"],
                         precision=lax.Precision.HIGHEST)
    new_causal_buf = window[:, 1:, :]

    t = state.t
    layer_bufs = state.layer_bufs
    skip_sum = None
    layer_inputs = []
    for i, dilation in enumerate(c.dilations):
        if collect_layer_inputs:
            layer_inputs.append(current)
        pos = lax.rem(t, jnp.int32(dilation))
        past = lax.dynamic_slice(
            layer_bufs, (i, pos, 0, 0),
            (1, 1, current.shape[0], c.residual_channels))[0, 0]  # [B, R]
        # Enqueue the layer's input at the slot we just read (it becomes
        # the dequeued value dilation steps from now).
        layer_bufs = lax.dynamic_update_slice(
            layer_bufs, current[None, None], (i, pos, 0, 0))

        w_f, w_g = params["filter"][i], params["gate"][i]  # [2, R, D]
        conv_f = (past @ w_f[0] + current @ w_f[1])
        conv_g = (past @ w_g[0] + current @ w_g[1])
        if gc_embedding is not None:
            conv_f = conv_f + gc_embedding @ params["gc_filter"][i]
            conv_g = conv_g + gc_embedding @ params["gc_gate"][i]
        if lc_t is not None:
            conv_f = conv_f + lc_t @ params["lc_filter"][i]
            conv_g = conv_g + lc_t @ params["lc_gate"][i]
        if c.use_biases:
            conv_f = conv_f + params["filter_bias"][i]
            conv_g = conv_g + params["gate_bias"][i]
        out = jnp.tanh(conv_f) * jax.nn.sigmoid(conv_g)

        transformed = out @ params["dense"][i]
        skip_c = out @ params["skip"][i]
        if c.use_biases:
            transformed = transformed + params["dense_bias"][i]
            skip_c = skip_c + params["skip_bias"][i]
        skip_sum = skip_c if skip_sum is None else skip_sum + skip_c
        current = current + transformed

    h = jax.nn.relu(skip_sum)
    h = h @ params["postprocess1"]
    if c.use_biases:
        h = h + params["postprocess1_bias"]
    h = jax.nn.relu(h)
    h = h @ params["postprocess2"]
    if c.use_biases:
        h = h + params["postprocess2_bias"]

    new_state = SamplerState(t=t + 1, causal_buf=new_causal_buf,
                             layer_bufs=layer_bufs)
    if collect_layer_inputs:
        return new_state, h.astype(jnp.float32), jnp.stack(layer_inputs)
    return new_state, h.astype(jnp.float32)


def _featurize(code_or_amp: jnp.ndarray, config: WaveNetConfig) -> jnp.ndarray:
    if config.scalar_input:
        return code_or_amp[..., None].astype(jnp.float32)  # [B] -> [B, 1]
    return jax.nn.one_hot(code_or_amp, config.quantization_channels,
                          dtype=jnp.float32)


def _code_to_input(code: jnp.ndarray, config: WaveNetConfig) -> jnp.ndarray:
    """Sampled class -> next-step network input features.

    In scalar mode the classification head still emits mu-law classes; the
    autoregressive input is the DECODED amplitude (this closes the loop
    the reference left NotImplementedError'd, model.py ≈:652).
    """
    if config.scalar_input:
        from wavenet_tpu.audio import mu_law_decode
        return mu_law_decode(code, config.quantization_channels)[..., None]
    return _featurize(code, config)


def prime_state(params: Params, config: WaveNetConfig, state: SamplerState,
                waveform: jnp.ndarray,
                gc_embedding: Optional[jnp.ndarray] = None,
                lc: Optional[jnp.ndarray] = None) -> SamplerState:
    """Push a seed waveform through the queues without sampling.

    ``waveform``: [B, T_seed] int codes (or float amplitudes in scalar
    mode). ``lc``: [B, T_seed, C_lc] — lc[:, j] is the conditioning of
    the (discarded) prediction made after consuming waveform[:, j]; it
    still shapes the queue state through the gate outputs. Equivalent to
    the reference's seed-priming loop (generate.py ≈:180: run
    next_sample+push_ops per seed sample, discard predictions). Kept as
    the sequential parity oracle; ``prefill_state`` computes the same
    state in one parallel forward.
    """
    if lc is None:
        def body(st, x_t):
            st, _ = sampler_step(params, config, st,
                                 _featurize(x_t, config), gc_embedding)
            return st, None
        xs = jnp.moveaxis(waveform, 1, 0)
    else:
        def body(st, xs_t):
            x_t, lc_t = xs_t
            st, _ = sampler_step(params, config, st,
                                 _featurize(x_t, config), gc_embedding,
                                 lc_t=lc_t)
            return st, None
        xs = (jnp.moveaxis(waveform, 1, 0), jnp.moveaxis(lc, 1, 0))

    state, _ = lax.scan(body, state, xs)
    return state


def ring_slot_blocks(layer_ins, dilations, T: int):
    """Per-layer ring-slot blocks for prefill: block_l[r] = x_l(tau_r).

    ``layer_ins[l]`` is [B, keep_l, R] — the last keep_l = min(d_l, T)
    residual-stream values entering layer l. Slot tau % d_l must hold
    x_l(tau) for the last keep_l positions tau < T and stay zero
    elsewhere (exactly the state sequential priming leaves): left-pad
    the kept window to d rows, then roll by T % d so window row j (time
    tau = T - d + j) lands on row tau % d. Shared by the scan-state
    prefill below and the Pallas stream-kernel prefill
    (kernels/sampler.prefill_carry) — one copy of the slot math.
    """
    blocks = []
    for l, d in enumerate(dilations):
        w = jnp.moveaxis(layer_ins[l], 1, 0)          # [keep_l, B, R]
        keep = w.shape[0]
        if keep < d:
            w = jnp.concatenate(
                [jnp.zeros((d - keep,) + w.shape[1:], jnp.float32), w],
                axis=0)
        blocks.append(jnp.roll(w, T % d, axis=0))     # [d, B, R]
    return blocks


@partial(jax.jit, static_argnames=("config",))
def prefill_state(params: Params, config: WaveNetConfig,
                  waveform: jnp.ndarray,
                  gc_embedding: Optional[jnp.ndarray] = None,
                  lc: Optional[jnp.ndarray] = None) -> SamplerState:
    """``prime_state`` in ONE parallel conv forward (prefill/decode split).

    The queue state after teacher-forcing ``waveform`` [B, T] is, layer
    by layer, the residual stream entering that layer at its last
    dilation_l positions — which the parallel forward computes on the
    MXU in one pass instead of T sequential scan steps. Matches
    ``prime_state`` to f32 round-off (tested); same trick as the Pallas
    path's ``kernels.sampler.prefill_carry``.
    """
    c = config
    B, T = waveform.shape
    R = c.residual_channels
    kw = _input_kernel_width(c)
    max_d = max(c.dilations)
    if T == 0:
        return init_sampler_state(c, B)

    import dataclasses

    from wavenet_tpu.models.wavenet import forward, forward_codes

    cfg32 = dataclasses.replace(c, compute_dtype="float32",
                                use_pallas_stack=False, remat=False)
    keep = tuple(min(d, T) for d in c.dilations)
    if c.scalar_input:
        layer_ins = forward(params, cfg32,
                            waveform[..., None].astype(jnp.float32),
                            gc_embedding, collect_layer_inputs=keep, lc=lc)
    else:
        layer_ins = forward_codes(params, cfg32, waveform.astype(jnp.int32),
                                  gc_embedding, collect_layer_inputs=keep,
                                  lc=lc)

    # Slot tau % d_l holds x_l(tau) for the last min(d_l, T) positions;
    # unwritten slots (and slots >= d_l) stay zero, as in init state.
    blocks = []
    for d, w in zip(c.dilations, ring_slot_blocks(layer_ins,
                                                  c.dilations, T)):
        if d < max_d:
            w = jnp.concatenate(
                [w, jnp.zeros((max_d - d, B, R), jnp.float32)], axis=0)
        blocks.append(w)
    layer_bufs = jnp.stack(blocks, axis=0)            # [L, max_d, B, R]

    # Causal shift register: raw input features of the last kw-1 steps
    # ([B, k, C_in]: one-hot rows, or amplitudes in scalar mode).
    n_tail = kw - 1
    feats = _featurize(waveform[:, max(0, T - n_tail):], c)
    if feats.shape[1] < n_tail:
        feats = jnp.concatenate(
            [jnp.zeros((B, n_tail - feats.shape[1], c.input_channels),
                       jnp.float32), feats], axis=1)
    return SamplerState(t=jnp.asarray(T, jnp.int32), causal_buf=feats,
                        layer_bufs=layer_bufs)


def extend_state(params: Params, config: WaveNetConfig,
                 state: SamplerState, codes: jnp.ndarray,
                 gc_embedding: Optional[jnp.ndarray] = None,
                 valid_len: Optional[jnp.ndarray] = None,
                 lc: Optional[jnp.ndarray] = None):
    """Advance the sampler state by up to k teacher-forced steps in ONE
    parallel pass: (logits [B, k, Q], new_state).

    ``codes`` [B, k] (int mu-law classes, or f32 amplitudes in scalar
    mode) are consumed at absolute positions t .. t+k-1; logits[:, j]
    predicts position t+j+1 — exactly what k calls of ``sampler_step``
    would produce, but MXU-parallel over the k positions (each layer's
    left context comes from the ring buffers, so no recompute and no
    sequential dependence inside the window). This is the incremental
    form of ``prefill_state`` and the verifier primitive for
    speculative decoding (``generate_speculative``).

    ``valid_len`` (traced scalar, 0 <= v <= k, default k) commits the
    state as if only the FIRST v inputs had been consumed — logits are
    still returned for all k positions. This is the rollback-free
    partial-acceptance commit: each ring row is written with the value
    it must hold after v steps (a dynamic gather over
    [old ring | window] — rows whose content predates the window get
    their old value rewritten, a semantic no-op), the causal shift
    register is a dynamic slice at v, and t advances by v.
    """
    logits, parts = _extend_forward(params, config, state, codes,
                                    gc_embedding, lc)
    v = jnp.int32(codes.shape[1]) if valid_len is None \
        else jnp.int32(valid_len)
    return logits, _extend_commit(config, state, parts, v)


def _ordered_ring(layer_bufs: jnp.ndarray, l: int, d: int, t):
    """Layer l's ring rows in TIME order: out[i] = x_l(t - d + i)."""
    idx = lax.rem(t + jnp.arange(d, dtype=jnp.int32), jnp.int32(d))
    return jnp.take(layer_bufs[l, :d], idx, axis=0)   # [d, B, R]


def _extend_forward(params: Params, config: WaveNetConfig,
                    state: SamplerState, codes: jnp.ndarray,
                    gc_embedding: Optional[jnp.ndarray],
                    lc: Optional[jnp.ndarray] = None):
    """Stack pass of ``extend_state``: (logits [B, k, Q], parts).

    ``parts`` carries the per-layer time-extended windows
    (``[old ring | window inputs]``) plus the featurized input window —
    everything ``_extend_commit`` needs to write the state for ANY
    valid length without re-running the stack (speculative decoding
    computes the accepted length FROM these logits).
    """
    c = config
    if c.filter_width != 2:
        raise NotImplementedError(
            "extend_state requires filter_width=2 (same restriction as "
            "every incremental path; the dilated taps are hardcoded "
            "to past|current)")
    B, k = codes.shape
    L, R, D, S, Q = (c.num_layers, c.residual_channels, c.dilation_channels,
                     c.skip_channels, c.quantization_channels)
    kw = _input_kernel_width(c)
    prec = lax.Precision.HIGHEST
    t = state.t

    x = _featurize(codes, c)                       # [B, k, C_in]
    full_in = jnp.concatenate([state.causal_buf, x], axis=1)
    # full_in column j holds the features of position t - (kw-1) + j.
    # Causal conv: current[j] = sum_tap full_in[j + tap] @ w[tap].
    w = params["causal_filter"]                    # [kw, C_in, R]
    cur = sum(jnp.einsum("bkc,cr->bkr", full_in[:, tap:tap + k], w[tap],
                         precision=prec)
              for tap in range(kw))                # [B, k, R]

    layer_bufs = state.layer_bufs
    gate_outs = []
    arrs = []
    for l, d in enumerate(c.dilations):
        ordered = _ordered_ring(layer_bufs, l, d, t)        # [d, B, R]
        # arr column i holds x_l at time t - d + i (ring, then window).
        arr = jnp.concatenate([jnp.moveaxis(ordered, 0, 1), cur], axis=1)
        arrs.append(arr)
        past = arr[:, :k]                          # times t-d .. t-d+k-1

        conv_f = (jnp.einsum("bkr,rd->bkd", past, params["filter"][l][0],
                             precision=prec)
                  + jnp.einsum("bkr,rd->bkd", cur, params["filter"][l][1],
                               precision=prec))
        conv_g = (jnp.einsum("bkr,rd->bkd", past, params["gate"][l][0],
                             precision=prec)
                  + jnp.einsum("bkr,rd->bkd", cur, params["gate"][l][1],
                               precision=prec))
        if gc_embedding is not None:
            conv_f = conv_f + (gc_embedding @ params["gc_filter"][l])[:, None]
            conv_g = conv_g + (gc_embedding @ params["gc_gate"][l])[:, None]
        if lc is not None:
            # lc [B, k, C_lc]: column j conditions the prediction at
            # window position j (same per-step convention as sampler_step).
            conv_f = conv_f + jnp.einsum("bkc,cd->bkd", lc,
                                         params["lc_filter"][l],
                                         precision=prec)
            conv_g = conv_g + jnp.einsum("bkc,cd->bkd", lc,
                                         params["lc_gate"][l],
                                         precision=prec)
        if c.use_biases:
            conv_f = conv_f + params["filter_bias"][l]
            conv_g = conv_g + params["gate_bias"][l]
        out = jnp.tanh(conv_f) * jax.nn.sigmoid(conv_g)
        gate_outs.append(out)

        transformed = jnp.einsum("bkd,dr->bkr", out, params["dense"][l],
                                 precision=prec)
        if c.use_biases:
            transformed = transformed + params["dense_bias"][l]
        cur = cur + transformed

    all_outs = jnp.concatenate(gate_outs, axis=-1)  # [B, k, L*D]
    h = jnp.einsum("bkc,co->bko", all_outs,
                   params["skip"].reshape(L * D, S), precision=prec)
    if c.use_biases:
        h = h + jnp.sum(params["skip_bias"], axis=0)
    h = jax.nn.relu(h)
    h = jnp.einsum("bks,so->bko", h, params["postprocess1"], precision=prec)
    if c.use_biases:
        h = h + params["postprocess1_bias"]
    h = jax.nn.relu(h)
    h = jnp.einsum("bks,so->bko", h, params["postprocess2"], precision=prec)
    if c.use_biases:
        h = h + params["postprocess2_bias"]
    return h.astype(jnp.float32), (full_in, arrs)


def _extend_commit(config: WaveNetConfig, state: SamplerState, parts,
                   v) -> SamplerState:
    """Write the post-extend state for a dynamic valid length v."""
    c = config
    full_in, arrs = parts
    B = full_in.shape[0]
    kw = _input_kernel_width(c)
    t = state.t
    v = jnp.int32(v)

    # After v consumed steps the register must hold positions
    # t+v-(kw-1) .. t+v-1 = full_in columns v .. v+kw-2.
    new_causal = lax.dynamic_slice(
        full_in, (0, v, 0), (B, kw - 1, c.input_channels))

    new_bufs = state.layer_bufs
    for l, d in enumerate(c.dilations):
        # Commit: after v consumed steps, row r must hold x_l(tau_r),
        # tau_r = largest time < t+v congruent to r (mod d) within the
        # last d steps = t+v-d + ((r - (t+v)) mod d) — i.e. arr column
        # v + ((r - (t+v)) mod d). Rows whose tau_r predates the window
        # gather their OLD value from the ring part of arr (no-op).
        r_ids = jnp.arange(d, dtype=jnp.int32)
        dd = jnp.int32(d)
        cols = v + lax.rem(lax.rem(r_ids - t - v, dd) + dd, dd)
        vals = jnp.take(arrs[l], cols, axis=1)     # [B, d, R]
        new_bufs = new_bufs.at[l, :d].set(jnp.moveaxis(vals, 0, 1))

    return SamplerState(t=t + v, causal_buf=new_causal,
                        layer_bufs=new_bufs)


@partial(jax.jit, static_argnames=("config", "n_samples"),
         donate_argnames=("state",))
def generate_codes_resumable(params: Params, config: WaveNetConfig,
                             state: SamplerState, first_input: jnp.ndarray,
                             n_samples: int, key: jax.Array,
                             temperature: float = 1.0,
                             gc_embedding: Optional[jnp.ndarray] = None,
                             lc: Optional[jnp.ndarray] = None):
    """Sample n codes; also return (state, next_input) for continuation.

    One XLA program for the whole chunk: state donated, logits never
    leave the device (contrast: reference generate.py ≈:190 does one
    sess.run per sample). The returned carry lets callers generate in
    chunks (e.g. --save_every partial wav dumps) with zero recompute.
    ``lc``: [B, n_samples, C_lc] — lc[:, j] conditions generated sample j.
    """
    keys = jax.random.split(key, n_samples)

    if lc is None:
        def body(carry, key_t):
            st, x = carry
            st, logits = sampler_step(params, config, st, x, gc_embedding)
            code = jax.random.categorical(key_t, logits / temperature,
                                          axis=-1)
            return (st, _code_to_input(code, config)), code
        xs = keys
    else:
        def body(carry, xs_t):
            key_t, lc_t = xs_t
            st, x = carry
            st, logits = sampler_step(params, config, st, x, gc_embedding,
                                      lc_t=lc_t)
            code = jax.random.categorical(key_t, logits / temperature,
                                          axis=-1)
            return (st, _code_to_input(code, config)), code
        xs = (keys, jnp.moveaxis(lc, 1, 0))

    (state, next_input), codes = lax.scan(body, (state, first_input), xs)
    return jnp.moveaxis(codes, 0, 1), state, next_input


def generate_codes(params: Params, config: WaveNetConfig,
                   state: SamplerState, first_input: jnp.ndarray,
                   n_samples: int, key: jax.Array,
                   temperature: float = 1.0,
                   gc_embedding: Optional[jnp.ndarray] = None,
                   lc: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Sample ``n_samples`` mu-law codes autoregressively. Returns [B, n]."""
    codes, _, _ = generate_codes_resumable(
        params, config, state, first_input, n_samples, key, temperature,
        gc_embedding, lc)
    return codes


def generate_sharded(params: Params, config: WaveNetConfig, n_samples: int,
                     key: jax.Array, mesh, batch_size: int,
                     gc_ids: Optional[jnp.ndarray] = None,
                     temperature: float = 1.0,
                     seed_codes: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Batched generation over a device mesh (dp over batch, tp optional).

    The sampling state (ring buffers [L, max_d, B, R]) is sharded over the
    mesh's "data" axis on its batch dim; ``jit`` partitions the whole scan
    SPMD so every device advances its own streams, and any model-axis
    sharding of the weights turns the per-step matmuls into collective
    ones (psum over ICI) automatically. This is the BASELINE
    "multi-host batched sampling with state exchanged via collectives"
    path — on a multi-host mesh the same code spans DCN.

    Priming follows ``generate``'s recipe (seed, or receptive_field-1
    silence + one random first code) via ``prefill_state`` — the
    parallel prefill forward SPMDs over the same mesh.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    from wavenet_tpu.parallel.sharding import DATA_AXIS, shard_params

    c = config
    if batch_size % mesh.shape[DATA_AXIS] != 0:
        raise ValueError(f"batch {batch_size} not divisible by data axis "
                         f"{mesh.shape[DATA_AXIS]}")
    sharded_params = shard_params(params, c, mesh)
    gc_emb = embed_gc(sharded_params, c, gc_ids) \
        if gc_ids is not None else None

    key_first, key_gen = jax.random.split(key)
    batch_spec = NamedSharding(mesh, P(DATA_AXIS, None))
    if seed_codes is None:
        if c.scalar_input:
            prime = jnp.zeros((batch_size, c.receptive_field - 1),
                              jnp.float32)
            first = jnp.zeros((batch_size,), jnp.float32)
        else:
            prime = jnp.full((batch_size, c.receptive_field - 1),
                             c.quantization_channels // 2, jnp.int32)
            first = jax.random.randint(key_first, (batch_size,), 0,
                                       c.quantization_channels)
    else:
        prime = seed_codes[:, :-1]
        first = seed_codes[:, -1]
    state = prefill_state(sharded_params, c,
                          jax.device_put(prime, batch_spec), gc_emb)
    state = SamplerState(
        t=state.t,
        causal_buf=jax.device_put(
            state.causal_buf, NamedSharding(mesh, P(DATA_AXIS, None, None))),
        layer_bufs=jax.device_put(
            state.layer_bufs,
            NamedSharding(mesh, P(None, None, DATA_AXIS, None))),
    )
    first_in = jax.device_put(_featurize(first, c), batch_spec)
    return generate_codes(sharded_params, c, state, first_in,
                          n_samples, key_gen, temperature, gc_emb)


def _lc_for_prime(lc: Optional[jnp.ndarray],
                  lc_prime: Optional[jnp.ndarray],
                  n_prime: int) -> Optional[jnp.ndarray]:
    """Conditioning for the priming region (length n_prime).

    When the caller gives none, hold the first generated sample's
    conditioning backward in time (edge extension) — the natural choice
    for features that vary slowly relative to the receptive field.
    """
    if lc is None:
        return None
    if lc_prime is not None:
        if lc_prime.shape[1] != n_prime:
            raise ValueError(f"lc_prime length {lc_prime.shape[1]} != "
                             f"priming length {n_prime}")
        return lc_prime
    B, _, C = lc.shape
    return jnp.broadcast_to(lc[:, :1], (B, n_prime, C))


def generate(params: Params, config: WaveNetConfig, n_samples: int,
             key: jax.Array, batch_size: int = 1,
             gc_ids: Optional[jnp.ndarray] = None,
             temperature: float = 1.0,
             seed_codes: Optional[jnp.ndarray] = None,
             lc: Optional[jnp.ndarray] = None,
             lc_prime: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """End-to-end generation -> mu-law codes [B, n_samples].

    Without a seed, the queues are primed with receptive_field-1 silence
    codes (Q//2 — mu-law code of amplitude ~0) followed by one random
    sample, matching the reference's unseeded start (generate.py ≈:170).

    Local conditioning: ``lc`` [B, n_samples, C_lc] gives one vector per
    GENERATED sample; ``lc_prime`` [B, n_prime, C_lc] conditions the
    priming region (n_prime = receptive_field-1 unseeded, len(seed)-1
    seeded) and defaults to lc[:, 0] held backward in time.
    """
    c = config
    gc_emb = embed_gc(params, c, gc_ids) if gc_ids is not None else None
    if c.lc_enabled and lc is None:
        raise ValueError(
            "config has lc_channels set: pass lc=[B, n_samples, "
            f"{c.lc_channels}] (zeros for unconditioned sampling)")
    # Learned upsampling refinement (models.wavenet.refine_lc) happens
    # here, once, on the raw feature streams — the per-step machinery
    # below consumes refined features.
    from wavenet_tpu.models.wavenet import maybe_refine_lc
    lc = maybe_refine_lc(params, c, lc)
    lc_prime = maybe_refine_lc(params, c, lc_prime)

    # One key discipline for every mode (scalar/seeded included) so
    # generate_sharded can reproduce the exact draws for parity.
    key_first, key_gen = jax.random.split(key)

    if c.scalar_input and seed_codes is not None:
        # In scalar mode the seed is raw amplitudes [B, T]; prime with the
        # amplitudes, then continue from the decoded last sample.
        lc_p = _lc_for_prime(lc, lc_prime, seed_codes.shape[1] - 1)
        state = prefill_state(params, c, seed_codes[:, :-1], gc_emb, lc_p)
        first_input = seed_codes[:, -1][..., None].astype(jnp.float32)
        return generate_codes(params, c, state, first_input, n_samples,
                              key_gen, temperature, gc_emb, lc)
    if seed_codes is None:
        n_prime = c.receptive_field - 1
        lc_p = _lc_for_prime(lc, lc_prime, n_prime)
        if c.scalar_input:
            silence = jnp.zeros((batch_size, n_prime), jnp.float32)
            state = prefill_state(params, c, silence, gc_emb, lc_p)
            first = jnp.zeros((batch_size,), jnp.float32)
            return generate_codes(params, c, state, first[..., None],
                                  n_samples, key_gen, temperature, gc_emb,
                                  lc)
        silence = jnp.full((batch_size, n_prime),
                           c.quantization_channels // 2, jnp.int32)
        state = prefill_state(params, c, silence, gc_emb, lc_p)
        first = jax.random.randint(key_first, (batch_size,), 0,
                                   c.quantization_channels)
    else:
        lc_p = _lc_for_prime(lc, lc_prime, seed_codes.shape[1] - 1)
        state = prefill_state(params, c, seed_codes[:, :-1], gc_emb, lc_p)
        first = seed_codes[:, -1]

    return generate_codes(params, c, state, _featurize(first, c),
                          n_samples, key_gen, temperature, gc_emb, lc)
