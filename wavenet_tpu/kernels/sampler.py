"""Pallas TPU kernel: whole-network autoregressive sampler in VMEM.

The reference's fast-generation path pays one Python->TF-runtime dispatch
per emitted sample (reference: generate.py ≈:190, model.py
``_create_generator`` ≈:505-575 with per-layer tf.FIFOQueues). The
lax.scan sampler (wavenet_tpu/sample.py) already collapses that to one
device program; this kernel goes the rest of the way to speed-of-light:

* ALL weights live in VMEM for the whole generation run (paper config
  ~5 MB fp32 — fits the ~16 MB budget with room for state).
* The per-layer activation queues are ONE offset-packed VMEM ring buffer
  of shape [sum(dilations), B, R]; layer l owns rows
  [offset_l, offset_l + dilation_l) and reads/writes row
  offset_l + (t mod dilation_l) — FIFO semantics with zero data movement.
* filter+gate are fused into a single [B, 2R] x [2R, 2D] matmul per layer
  (taps concatenated on the K axis, filter|gate concatenated on N), and
  tanh·sigmoid collapses to ONE [B, 2D] tanh (gate weights pre-scaled
  by 0.5; sigmoid(g) = 0.5 + 0.5·tanh(g/2), exact). The projection is
  split: the dense matmul (N=R) is the only thing the next layer waits
  on; the wide skip matmul (N=S) pipelines behind it off the critical
  path.
* Per-layer bias + global-condition contributions are folded into ONE
  precomputed additive term outside the kernel (they are constant across
  timesteps), so the kernel's inner loop is purely matmul+gate.
* Sampling happens in-kernel with the TPU PRNG: Gumbel-argmax over
  logits/T. No logits ever leave the chip; only int32 codes do.

Mosaic layout notes: every tensor value inside the kernel is kept >= 2-D
(1-D vectors trip TPU layout inference), so the autoregressive "current
code" travels as [B, 1] and the forced/emitted code streams are laid out
[B, n_total] (batch-major).

The grid is 1 — a single program owns the chip and loops over samples with
``lax.fori_loop``. Teacher-forcing mode (seed_codes) runs the same loop
over given inputs to prime the queues, and is also what the parity tests
drive (the emitted logits must match the scan sampler / conv forward).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import dataclasses

from wavenet_tpu.kernels.mxu import mxu_dot
from wavenet_tpu.models.config import WaveNetConfig
from wavenet_tpu.models.wavenet import (
    Params, embed_gc, forward, forward_codes)

# Mosaic's default scoped-VMEM budget (~16 MB) rejects wider logits
# windows / bigger batches that the hardware (v5e: 128 MB VMEM/core)
# holds comfortably; raise the per-kernel budget and let the ordered
# fallback in sampler_select handle genuine overflows.
_VMEM_LIMIT = 100 * 1024 * 1024

# (config, shape, dtype, ...) keys whose prefilled VMEM-decode compile
# already failed this process: skip straight to the streamed decode on
# later calls instead of re-paying seconds of failing compile each time.
_VMEM_DECODE_FAILED: set = set()

# Auto-route eligible prefill decodes (B >= 512, no lc, R <= 64)
# through the packed-ring kernel (kernels/sampler_packed.py): +43%
# decode throughput at b512, bitwise-identical output (hardware stress
# run baselines/sampler_stress_r6.txt; A/B in docs/performance.md
# round 5). generate_pallas(ring_pack=False) still forces the v1
# streamed decode per call.
RING_PACK_AUTO = True


class PackedSampler(NamedTuple):
    """Kernel-ready weight layout (all fp32, every leaf >= 2-D).

    Round-3 latency layout: the gate half of ``layer_w``/``layer_add`` is
    PRE-SCALED by 0.5 so the kernel evaluates tanh+sigmoid as ONE
    transcendental over [B, 2D] (sigmoid(g) == 0.5 + 0.5*tanh(g/2) —
    exact), and the per-layer projection is SPLIT into the dense part
    (on the autoregressive critical path, N=R) and the skip part (off
    the critical path, N=S), with the layer-summed skip bias folded into
    a single pre-relu additive.
    """
    causal_w: jnp.ndarray      # [kw * C_in, R]  (taps stacked on K axis)
    layer_w: jnp.ndarray       # [L, 2R, 2D]     (K = past|current, N = filt|gate/2)
    layer_add: jnp.ndarray     # [L, B, 2D]      (bias + gc; gate half / 2)
    dense_w: jnp.ndarray       # [L, D, R]
    dense_add: jnp.ndarray     # [L, 1, R]       (dense_bias)
    skip_w: jnp.ndarray        # [L, D, S]
    skip_b: jnp.ndarray        # [1, S]          (sum of per-layer skip biases)
    post1_w: jnp.ndarray       # [S, S]
    post1_b: jnp.ndarray       # [1, S]
    post2_w: jnp.ndarray       # [S, Q]
    post2_b: jnp.ndarray       # [1, Q]
    # Local conditioning (None unless config.lc_enabled): per-layer
    # filter|gate projections of the per-step feature vector, gate half
    # pre-scaled by 0.5 like layer_w. Unlike layer_add (constant across
    # time), the LC contribution is time-varying and computed in-kernel
    # from the streamed feature row: fg += lc_t @ lc_w[l].
    lc_w: Optional[jnp.ndarray] = None   # [L, C_lc, 2D]
    # Round-4 b=1 latency layout (packed only when batch_size == 1): the
    # fg/dense chain products run on the VPU as broadcast-multiply-reduce
    # matvecs instead of MXU matmuls (~83 ns vs ~136 ns of MXU pipeline
    # latency per dependent product — tools/r4_matvec_probe.py). The fg
    # product consumes the TRANSPOSED weights (reduce over lanes yields a
    # column vector); the dense/skip products reuse the standard layouts
    # (reduce over sublanes yields a row) — alternating row/column vector
    # forms so no transposes enter the dependency chain.
    layer_wT: Optional[jnp.ndarray] = None    # [L, 2D, 2R]
    layer_addT: Optional[jnp.ndarray] = None  # [L, 2D, B]  (B == 1)
    lc_wT: Optional[jnp.ndarray] = None       # [L, 2D, C_lc]
    # NOTE: no static metadata here — PackedSampler crosses jit boundaries
    # as a pytree, so int fields would turn into traced scalars (which a
    # pallas kernel closure must not capture). Ring offsets are derived
    # from the STATIC config via `ring_offsets`.


@functools.partial(jax.jit, static_argnames=("config", "batch_size",
                                             "weight_dtype"))
def pack_sampler_weights(params: Params, config: WaveNetConfig,
                         batch_size: int,
                         gc_embedding: Optional[jnp.ndarray] = None,
                         weight_dtype=jnp.float32) -> PackedSampler:
    """Rearrange the model pytree into the kernel's fused layout.

    ``weight_dtype=bfloat16`` stores the matmul weights in bf16 (halves
    their VMEM footprint; additive terms stay f32; all accumulation f32).
    Jitted (config/batch/dtype static): eagerly these ~50 reshapes cost
    ~50 dispatches through the device relay per generation call.
    """
    c = config
    L, R, D, S, Q = (c.num_layers, c.residual_channels, c.dilation_channels,
                     c.skip_channels, c.quantization_channels)
    f32 = jnp.float32

    # Causal layer: [kw, C_in, R] -> [kw*C_in, R]; input window flattens
    # to [B, kw*C_in] in the same order.
    cw = params["causal_filter"].astype(f32)
    causal_w = cw.reshape(-1, R)

    # [L, 2, R, D] filter & gate -> [L, 2R, 2D]. The GATE half is scaled
    # by 0.5 (weights AND additive terms) so the kernel computes
    # sigmoid(g) as 0.5 + 0.5*tanh(g/2) with a single [B, 2D] tanh.
    wf, wg = params["filter"].astype(f32), 0.5 * params["gate"].astype(f32)
    # K axis order: [past (tap 0) | current (tap 1)].
    layer_w = jnp.concatenate([
        jnp.concatenate([wf[:, 0], wg[:, 0]], axis=-1),   # past rows
        jnp.concatenate([wf[:, 1], wg[:, 1]], axis=-1),   # current rows
    ], axis=1)  # [L, 2R, 2D]

    add = jnp.zeros((L, batch_size, 2 * D), f32)
    if c.use_biases:
        b = jnp.concatenate([params["filter_bias"],
                             0.5 * params["gate_bias"]],
                            axis=-1).astype(f32)  # [L, 2D]
        add = add + b[:, None, :]
    if gc_embedding is not None:
        gcf = jnp.einsum("bg,lgd->lbd", gc_embedding.astype(f32),
                         params["gc_filter"].astype(f32))
        gcg = jnp.einsum("bg,lgd->lbd", gc_embedding.astype(f32),
                         params["gc_gate"].astype(f32))
        add = add + jnp.concatenate([gcf, 0.5 * gcg], axis=-1)

    dense_w = params["dense"].astype(f32)          # [L, D, R]
    skip_w = params["skip"].astype(f32)            # [L, D, S]
    if c.use_biases:
        dense_add = params["dense_bias"].astype(f32)[:, None, :]
        skip_b = jnp.sum(params["skip_bias"].astype(f32), axis=0)[None, :]
        post1_b = params["postprocess1_bias"].astype(f32)[None, :]
        post2_b = params["postprocess2_bias"].astype(f32)[None, :]
    else:
        dense_add = jnp.zeros((L, 1, R), f32)
        skip_b = jnp.zeros((1, S), f32)
        post1_b = jnp.zeros((1, S), f32)
        post2_b = jnp.zeros((1, Q), f32)

    wd = weight_dtype
    lc_w = None
    if c.lc_enabled:
        lc_w = jnp.concatenate(
            [params["lc_filter"].astype(f32),
             0.5 * params["lc_gate"].astype(f32)], axis=-1).astype(wd)
    layer_wT = layer_addT = lc_wT = None
    if batch_size == 1:
        # b=1 VPU-chain layout (see PackedSampler docstring).
        layer_wT = jnp.transpose(layer_w, (0, 2, 1))      # [L, 2D, 2R]
        layer_addT = jnp.transpose(add, (0, 2, 1))        # [L, 2D, 1]
        if lc_w is not None:
            lc_wT = jnp.transpose(lc_w, (0, 2, 1))        # [L, 2D, C_lc]
    return PackedSampler(
        causal_w=causal_w.astype(wd), layer_w=layer_w.astype(wd),
        layer_add=add,
        dense_w=dense_w.astype(wd), dense_add=dense_add,
        skip_w=skip_w.astype(wd), skip_b=skip_b,
        post1_w=params["postprocess1"].astype(wd), post1_b=post1_b,
        post2_w=params["postprocess2"].astype(wd), post2_b=post2_b,
        lc_w=lc_w,
        layer_wT=None if layer_wT is None else layer_wT.astype(wd),
        layer_addT=layer_addT,
        lc_wT=None if lc_wT is None else lc_wT.astype(wd))


def ring_offsets(config: WaveNetConfig) -> Tuple[int, ...]:
    """Static per-layer start rows in the packed ring buffer."""
    return tuple(int(o) for o in np.cumsum((0,) + config.dilations[:-1]))


def unseeded_seed_codes(config: WaveNetConfig, batch_size: int,
                        seed: int) -> jnp.ndarray:
    """The unseeded priming recipe, shared by every sampler path.

    Matches sample.generate (and the reference, generate.py ≈:170):
    receptive_field-1 silence steps, then one uniform-random first code
    — so --sampler auto does not change the initial transient depending
    on which path compiles (only the PRNG stream differs, as
    documented). Scalar mode primes raw 0.0 amplitudes and starts from
    silence.
    """
    c = config
    if c.scalar_input:
        return jnp.zeros((batch_size, c.receptive_field), jnp.float32)
    silence = jnp.full((batch_size, c.receptive_field - 1),
                       c.quantization_channels // 2, jnp.int32)
    first = jax.random.randint(jax.random.PRNGKey(seed), (batch_size,), 0,
                               c.quantization_channels)
    return jnp.concatenate([silence, first[:, None]], axis=1)


def _sampler_kernel(
    # scalar prefetch
    seed_ref,            # [1] int32
    # inputs
    causal_w_ref, layer_w_ref, layer_add_ref,
    dense_w_ref, dense_add_ref, skip_w_ref, skip_b_ref,
    post1_w_ref, post1_b_ref, post2_w_ref, post2_b_ref,
    forced_ref,          # [1, n_total, bc] — int codes (mu-law mode) or
                         #  f32 amplitudes (scalar mode); time-major (dynamic
                         #  time index must be on a sublane/batch dim) with
                         #  a leading batch-CHUNK dim (lane dims cannot be
                         #  block-sliced, so chunking rides dim 0)
    # then, when has_lc (parsed from *rest):
    #   lc_w_ref         [L, C_lc, 2D]      (input)
    #   lc_ref           [1, n_total, bc, C_lc] f32 (input) — row t
    #                    conditions step t's prediction (the scan
    #                    sampler's per-step lc_t convention)
    # outputs
    #   codes_ref        [1, n_total, bc] int32
    #   logits_ref       [1, n_total | 1, bc, Q] f32
    # scratch
    #   ring_ref         [sum_d, B, R] f32
    #   causal_buf_ref   [B, C_in] f32 (previous input, kw=2)
    *rest,
    config: WaveNetConfig, offsets: Tuple[int, ...], n_total: int,
    n_forced: int, batch_size: int, inv_temperature: float,
    has_lc: bool = False, vpu_chain: bool = False, resume: bool = False,
):
    # Optional input groups, in operand order: [ring_init, causal_init]
    # when resume (prefilled state; seed_ref is then [seed, t0]);
    # [layer_wT, layer_addT] when vpu_chain (b=1 VPU matvec path);
    # [lc_w, lc(, lc_wT)] when has_lc.
    ring_init_ref = causal_init_ref = None
    layer_wT_ref = layer_addT_ref = lc_wT_ref = None
    lc_w_ref = lc_ref = None
    i0 = 0
    if resume:
        ring_init_ref, causal_init_ref = rest[0], rest[1]
        i0 = 2
    if vpu_chain:
        layer_wT_ref, layer_addT_ref = rest[i0], rest[i0 + 1]
        i0 += 2
    if has_lc:
        lc_w_ref, lc_ref = rest[i0], rest[i0 + 1]
        i0 += 2
        if vpu_chain:
            lc_wT_ref = rest[i0]
            i0 += 1
    codes_ref, logits_ref, ring_ref, causal_buf_ref = rest[i0:]
    # ring_ref dtype may be bf16 (state_dtype option): halves the VMEM
    # state so batch fits ~2x further; past values requantize on store.
    c = config
    L, R, D, S, Q = (c.num_layers, c.residual_channels, c.dilation_channels,
                     c.skip_channels, c.quantization_channels)
    B = batch_size
    C_in = c.input_channels

    # One program per batch chunk (grid over batch); decorrelate the
    # sampling streams across chunks.
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    if resume:
        # Prefilled state (prefill_carry): ring rows + causal shift
        # register land in VMEM once; the ring phase follows the
        # ABSOLUTE step t0 + t like the streamed kernel's resume path.
        ring_ref[...] = ring_init_ref[...].astype(ring_ref.dtype)
        causal_buf_ref[...] = causal_init_ref[...]
        t0 = seed_ref[1]
    else:
        ring_ref[...] = jnp.zeros_like(ring_ref)
        causal_buf_ref[...] = jnp.zeros_like(causal_buf_ref)
        t0 = 0

    def featurize(x_col):  # [B, 1] f32 carry -> [B, C_in] features
        if c.scalar_input:
            return x_col                       # raw amplitude, C_in == 1
        iota = lax.broadcasted_iota(jnp.int32, (B, C_in), 1)
        return (iota.astype(jnp.float32) == x_col).astype(jnp.float32)

    mu = float(Q - 1)

    def decode_amp(code_f):    # mu-law decode (audio.py formulas), [B, 1]
        sgn = 2.0 * (code_f / mu) - 1.0
        mag = (1.0 / mu) * (jnp.exp(jnp.abs(sgn) * float(np.log1p(mu)))
                            - 1.0)
        return jnp.sign(sgn) * mag

    def step(t, x_col):
        """x_col [B, 1] f32 carry -> logits [B, Q], updating queues."""
        x = featurize(x_col)
        # Causal layer: window = [oldest .. prev | current], flattened
        # on K. The shift register holds the last kw-1 feature vectors.
        prev = causal_buf_ref[...]             # [B, (kw-1)*C_in]
        window = jnp.concatenate([prev, x], axis=-1)  # [B, kw*C_in]
        current = mxu_dot(window.astype(causal_w_ref.dtype),
                          causal_w_ref[...])  # [B, R]
        causal_buf_ref[...] = window[:, C_in:]

        lc_t = None
        if has_lc:
            lc_t = lc_ref[0, t].astype(lc_w_ref.dtype)  # [B, C_lc]

        skip_sum = jnp.zeros((B, S), jnp.float32)
        for i, dilation in enumerate(c.dilations):
            pos = offsets[i] + (t0 + t) % dilation
            past = ring_ref[pos].astype(jnp.float32)  # [B, R]
            ring_ref[pos] = current.astype(ring_ref.dtype)
            x_cat = jnp.concatenate([past, current], axis=-1)  # [B, 2R]
            if vpu_chain:
                # b=1 VPU matvec chain — identical math/layout to the
                # streamed kernel's branch (PackedSampler docstring).
                fg = jnp.sum(x_cat * layer_wT_ref[i].astype(jnp.float32),
                             axis=1, keepdims=True)       # [2D, 1]
                fg = fg + layer_addT_ref[i]
                if has_lc:
                    fg = fg + jnp.sum(
                        lc_t * lc_wT_ref[i].astype(jnp.float32),
                        axis=1, keepdims=True)
                tg = jnp.tanh(fg)
                out_col = tg[:D] * (0.5 + 0.5 * tg[D:])   # [D, 1]
                d = jnp.sum(out_col * dense_w_ref[i].astype(jnp.float32),
                            axis=0, keepdims=True)        # [1, R]
                current = current + d + dense_add_ref[i]
                skip_sum = skip_sum + jnp.sum(
                    out_col * skip_w_ref[i].astype(jnp.float32),
                    axis=0, keepdims=True)                # [1, S]
                continue
            fg = mxu_dot(x_cat.astype(layer_w_ref.dtype), layer_w_ref[i])
            fg = fg + layer_add_ref[0, i]
            if has_lc:
                fg = fg + mxu_dot(lc_t, lc_w_ref[i])
            # Gate half pre-scaled by 0.5 at pack time: ONE tanh over
            # [B, 2D] gives both tanh(f) and sigmoid(g) (exact identity).
            tg = jnp.tanh(fg)
            out = tg[:, :D] * (0.5 + 0.5 * tg[:, D:])
            # Dense (N=R) gates the next layer; skip (N=S) rides off the
            # critical path behind it.
            d = mxu_dot(out.astype(dense_w_ref.dtype), dense_w_ref[i])
            current = current + d + dense_add_ref[i]
            skip_sum = skip_sum + mxu_dot(out.astype(skip_w_ref.dtype),
                                          skip_w_ref[i])

        h = jnp.maximum(skip_sum + skip_b_ref[...], 0.0)
        h = mxu_dot(h.astype(post1_w_ref.dtype), post1_w_ref[...]) + post1_b_ref[...]
        h = jnp.maximum(h, 0.0)
        h = mxu_dot(h.astype(post2_w_ref.dtype), post2_w_ref[...]) + post2_b_ref[...]
        return h  # [B, Q]

    def sample_from(logits):
        """Gumbel-argmax draw [B, 1]: argmax(logits/T + G), G ~ Gumbel."""
        bits = pltpu.prng_random_bits((B, Q))
        # uint32 -> uniform (0, 1): set exponent to [1, 2), subtract 1.
        u = pltpu.bitcast(
            (pltpu.bitcast(bits, jnp.uint32) >> 9) | 0x3F800000,
            jnp.float32) - 1.0
        u = jnp.maximum(u, 1e-20)
        gumbel = -jnp.log(-jnp.log(u))
        scores = logits * inv_temperature + gumbel
        return jnp.argmax(scores, axis=-1, keepdims=True).astype(jnp.int32)

    def body(t, x_col):
        logits = step(t, x_col)
        # When logits collection is off the output buffer has one row —
        # wrap the index so every step writes in-bounds (last write wins).
        logits_ref[0, lax.rem(t, logits_ref.shape[1])] = logits
        sampled = sample_from(logits)  # [B, 1] int32
        nxt = jnp.minimum(t + 1, n_total - 1)
        forced_next = jnp.transpose(forced_ref[0, pl.ds(nxt, 1), :])  # [B,1]
        take_forced = t + 1 < n_forced
        emitted = jnp.where(
            t < n_forced - 1,
            (mu_law_encode_f(forced_next) if c.scalar_input
             else forced_next.astype(jnp.int32)),
            sampled)
        codes_ref[0, pl.ds(t, 1), :] = jnp.transpose(emitted)  # [1, B]
        if c.scalar_input:
            # Feed back the decoded amplitude of the sampled class; the
            # forced stream is already amplitudes.
            next_col = jnp.where(take_forced, forced_next,
                                 decode_amp(sampled.astype(jnp.float32)))
        else:
            next_col = jnp.where(take_forced, forced_next,
                                 sampled.astype(jnp.float32))
        return next_col

    def mu_law_encode_f(amp):   # [B, 1] f32 -> int32 codes
        safe = jnp.minimum(jnp.abs(amp), 1.0)
        magnitude = jnp.log1p(mu * safe) * float(1.0 / np.log1p(mu))
        signal = jnp.sign(amp) * magnitude
        return ((signal + 1.0) / 2.0 * mu + 0.5).astype(jnp.int32)

    first = jnp.transpose(forced_ref[0, pl.ds(0, 1), :]).astype(jnp.float32)
    lax.fori_loop(0, n_total, body, first, unroll=False)


@functools.partial(
    jax.jit,
    static_argnames=("config", "n_total", "n_forced", "batch_size",
                     "temperature", "collect_logits", "state_dtype",
                     "batch_chunk"))
def _run_sampler_kernel(packed: PackedSampler, forced: jnp.ndarray,
                        seed: jnp.ndarray,
                        config: WaveNetConfig, n_total: int, n_forced: int,
                        batch_size: int, temperature: float,
                        collect_logits: bool, state_dtype=jnp.float32,
                        batch_chunk: int = 0,
                        lc_stream: Optional[jnp.ndarray] = None,
                        ring_init: Optional[jnp.ndarray] = None,
                        causal_init: Optional[jnp.ndarray] = None):
    c = config
    B, Q, R = batch_size, c.quantization_channels, c.residual_channels
    sum_d = sum(c.dilations)
    bc = batch_chunk if batch_chunk else B
    if B % bc != 0:
        raise ValueError(f"batch {B} not divisible by chunk {bc}")
    nb = B // bc
    has_lc = lc_stream is not None
    # Prefilled-state resume: ring_init [sum_d, B, R] + causal_init
    # [B, (kw-1)*C_in], with seed = [prng_seed, t0].
    resume = ring_init is not None
    if resume and nb != 1:
        raise ValueError("prefilled VMEM decode does not support "
                         "batch_chunk")
    # b=1 VPU-chain path (same auto-enable rule as the streamed kernel).
    vpu_chain = (B == 1 and packed.layer_wT is not None
                 and (not has_lc or packed.lc_wT is not None))
    kw_in = (c.initial_filter_width if c.scalar_input else c.filter_width)
    kernel = functools.partial(
        _sampler_kernel, config=c, offsets=ring_offsets(c),
        n_total=n_total, n_forced=n_forced, batch_size=bc,
        inv_temperature=1.0 / temperature, has_lc=has_lc,
        vpu_chain=vpu_chain, resume=resume)

    # Grid over batch chunks: each (sequential) program generates its own
    # bc streams with chunk-local ring state and a decorrelated PRNG.
    # Lane dims can't be block-sliced, so the chunk axis leads.
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    # collect_logits: True = every step; int W = ring of the last
    # W steps (bounded VMEM for arbitrarily long runs); False = 1.
    n_log = (n_total if collect_logits is True
             else int(collect_logits) if collect_logits else 1)
    L, D = c.num_layers, c.dilation_channels
    # [n_total, B] -> [nb, n_total, bc]; [L, B, 2D] -> [nb, L, bc, 2D].
    forced_c = jnp.moveaxis(forced.reshape(n_total, nb, bc), 1, 0)
    add_c = jnp.moveaxis(packed.layer_add.reshape(L, nb, bc, 2 * D), 1, 0)
    in_specs = [
        full(),                                             # causal_w
        full(),                                             # layer_w
        pl.BlockSpec((1, L, bc, 2 * D), lambda i, *_: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        full(), full(), full(), full(),   # dense_w/add, skip_w/b
        full(), full(), full(), full(),   # post1/2 w+b
        pl.BlockSpec((1, n_total, bc), lambda i, *_: (i, 0, 0),
                     memory_space=pltpu.VMEM),               # forced
    ]
    operands = [seed, packed.causal_w, packed.layer_w, add_c,
                packed.dense_w, packed.dense_add, packed.skip_w,
                packed.skip_b, packed.post1_w, packed.post1_b,
                packed.post2_w, packed.post2_b, forced_c]
    if resume:
        in_specs += [full(), full()]        # ring_init, causal_init
        operands += [ring_init, causal_init]
    if vpu_chain:
        in_specs += [full(), full()]        # layer_wT, layer_addT
        operands += [packed.layer_wT, packed.layer_addT]
    if has_lc:
        # lc_stream [n_total, B, C_lc] -> chunk-major [nb, n_total, bc, C].
        C_lc = lc_stream.shape[-1]
        lc_c = jnp.moveaxis(
            lc_stream.reshape(n_total, nb, bc, C_lc), 1, 0)
        in_specs += [
            full(),                                          # lc_w
            pl.BlockSpec((1, n_total, bc, C_lc), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),           # lc stream
        ]
        operands += [packed.lc_w, lc_c]
        if vpu_chain:
            in_specs.append(full())                          # lc_wT
            operands.append(packed.lc_wT)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, n_total, bc), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_log, bc, Q), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((sum_d, bc, R), state_dtype),
            pltpu.VMEM((bc, (kw_in - 1) * c.input_channels), jnp.float32),
        ],
    )
    codes, logits = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((nb, n_total, bc), jnp.int32),
            jax.ShapeDtypeStruct((nb, n_log, bc, Q), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
    )(*operands)
    # [nb, n_total, bc] -> [B, n_total]; [nb, n_log, bc, Q] -> [n_log, B, Q]
    codes_bt = jnp.moveaxis(codes, 0, 1).reshape(n_total, B)
    logits_out = jnp.moveaxis(logits, 0, 1).reshape(n_log, B, Q)
    return jnp.transpose(codes_bt), logits_out


def _lanes(n: int) -> int:
    """Mosaic pads the last (lane) dim of VMEM buffers to 128."""
    return -(-n // 128) * 128


def sampler_vmem_bytes(config: WaveNetConfig, batch_size: int,
                       n_samples: int, collect_logits=False,
                       state_bytes: int = 4,
                       resume_inputs: bool = False,
                       transposed_weights: bool = False) -> int:
    """VMEM footprint of the all-VMEM kernel, INCLUDING Mosaic's 128-lane
    padding of every buffer's last dimension (measured: the ring state
    really costs sum_d*B*128 lanes, 4x its logical bytes at R=32).

    Used to decide the sampler path automatically; the working set must
    fit the ~16 MB/core VMEM. ``collect_logits`` takes the kernel's own
    convention (True = every step, int W = window of W rows, falsy = 1).
    ``resume_inputs`` counts the prefilled ring_init/causal_init operand
    blocks; ``transposed_weights`` counts the b=1 VPU chain's transposed
    weight copies (over-counted as a second full weight set).
    """
    c = config
    L, R, D, S, Q = (c.num_layers, c.residual_channels, c.dilation_channels,
                     c.skip_channels, c.quantization_channels)
    B = batch_size
    weights = (2 * c.input_channels * _lanes(R)
               + L * (2 * R * _lanes(2 * D) + B * _lanes(2 * D)
                      + D * (_lanes(R) + _lanes(S)) + _lanes(R))
               + _lanes(S)  # layer-summed skip bias
               + S * _lanes(S) + _lanes(S) + S * _lanes(Q) + _lanes(Q))
    if transposed_weights:
        weights *= 2
    state = sum(c.dilations) * B * _lanes(R)
    n_log = (n_samples if collect_logits is True
             else int(collect_logits) if collect_logits else 1)
    outputs = n_samples * _lanes(B) + n_log * B * _lanes(Q)
    resume = 0
    if resume_inputs:
        # ring_init [sum_d, B, R] f32 + causal_init [B, (kw-1)*C_in] f32.
        resume = (sum(c.dilations) * B * _lanes(R)
                  + B * _lanes((c.filter_width - 1) * c.input_channels))
    lc = 0
    if c.lc_enabled:
        # Per-layer projection weights + the whole [n_total, B, C_lc]
        # feature stream resident in VMEM.
        lc = (L * c.lc_channels * _lanes(2 * D)
              + n_samples * B * _lanes(c.lc_channels))
        if transposed_weights:
            lc += L * c.lc_channels * _lanes(2 * D)
    return (4 * (weights + outputs + lc + resume
                 + B * _lanes(c.input_channels))
            + state_bytes * state)


def hbm_sampler_vmem_bytes(config: WaveNetConfig, batch_size: int,
                           n_samples: int) -> int:
    """VMEM footprint of the HBM-ring path (ring itself lives in HBM):
    dominated by the forced/codes stream blocks and the lane-padded
    per-layer row slots (rbuf+wbuf = 2*L*B*128 floats)."""
    c = config
    L, R, D, S, Q = (c.num_layers, c.residual_channels, c.dilation_channels,
                     c.skip_channels, c.quantization_channels)
    B = batch_size
    weights = (2 * c.input_channels * _lanes(R)
               + L * (2 * R * _lanes(2 * D) + B * _lanes(2 * D)
                      + D * (_lanes(R) + _lanes(S)) + _lanes(R))
               + _lanes(S)  # layer-summed skip bias
               + S * _lanes(S) + _lanes(S) + S * _lanes(Q) + _lanes(Q))
    streams = 2 * n_samples * _lanes(B)  # forced + codes int32
    slots = 2 * L * B * 128 + 64 * B * 128
    return 4 * (weights + streams + slots + B * _lanes(Q))


def stream_hbm_sampler_vmem_bytes(config: WaveNetConfig,
                                  batch_size: int) -> int:
    """VMEM footprint of the streamed-IO HBM-ring path: independent of
    run length (forced/codes live in HBM behind
    [2, _io_chunk_for(B), _lanes(B)] double buffers — multi-tile
    batches shrink the chunk rows to hold the byte budget)."""
    c = config
    L, R, D, S, Q = (c.num_layers, c.residual_channels, c.dilation_channels,
                     c.skip_channels, c.quantization_channels)
    B = batch_size
    weights = (2 * c.input_channels * _lanes(R)
               + L * (2 * R * _lanes(2 * D) + B * _lanes(2 * D)
                      + D * (_lanes(R) + _lanes(S)) + _lanes(R))
               + _lanes(S)  # layer-summed skip bias
               + S * _lanes(S) + _lanes(S) + S * _lanes(Q) + _lanes(Q))
    zc = min(64, sum(c.dilations), max(8, (1 << 21) // (max(B, 1) * 128 * 4)))
    slots = 2 * L * B * 128 + zc * B * 128
    io = 2 * 2 * _io_chunk_for(B) * _lanes(B)
    if c.lc_enabled:
        # lc projection weights + double-buffered feature chunks (slot
        # bytes capped at ~2 MB by the run wrapper's LCC choice).
        weights += L * c.lc_channels * _lanes(2 * D)
        io += 2 * (1 << 19)
    return 4 * (weights + slots + io + B * _lanes(Q))



def chunk_seed(seed: int, i: int) -> int:
    """PRNG seed for batch chunk ``i`` of a chunked prefill run.

    A splitmix-style mix (golden-ratio multiply) instead of ``seed + i``:
    with a stride of 1, two batched requests with ADJACENT seeds (e.g.
    /generate_batch seed=0 then seed=1 at B > 512) would share chunk
    seeds — request A's chunk 1 would emit the same audio as request B's
    chunk 0 under the same params. The mix decorrelates every
    (seed, chunk) pair; int32-safe for the kernel's scalar-prefetch seed.
    """
    return int((seed * 0x9E3779B9 + i) & 0x7FFFFFFF)


def _logits_in_step_order(logits, collect_logits, n_total: int):
    """Undo the ring layout of a windowed logits buffer.

    ``logits`` [n_log, B, Q] has step t at row t % n_log; the buffer
    holds the LAST n_log steps. Returns those steps in order.
    """
    if collect_logits is True:
        return logits
    n_log = logits.shape[0]
    if n_total <= n_log:
        return logits[:n_total]
    idx = (n_total - n_log + jnp.arange(n_log)) % n_log
    return logits[idx]


def _generate_prefill_chunked(params, config, n_samples, seed, batch_size,
                              seed_codes, temperature, collect_logits,
                              gc_ids, weight_dtype, batch_chunk, lc,
                              lc_prime, vpu_b1, interpret,
                              state_dtype=jnp.float32):
    """Serve batch_size > batch_chunk as sequential prefill+streamed runs.

    Chunk i runs the full prefill + decode pipeline on rows
    [i*bc, min((i+1)*bc, B)) with PRNG seed ``chunk_seed(seed, i)`` (a
    splitmix-style mix — adjacent request seeds must not share chunk
    seeds). Output is the row-wise concatenation — bitwise equal to
    running each chunk as its own generate_pallas call with that seed. All full chunks share one compiled
    program; a ragged remainder compiles once more. Measured 2026-08-20
    (v5-lite): the b512 chunk sustains ~4.6M samples/s, vs ~0.55M for
    the lax.scan fallback this path replaces at b > 512.
    """
    B, bc = batch_size, batch_chunk
    outs, logits_all = [], []
    for i, lo in enumerate(range(0, B, bc)):
        hi = min(lo + bc, B)
        sl = slice(lo, hi)
        out = generate_pallas(
            params, config, n_samples, seed=chunk_seed(seed, i),
            batch_size=hi - lo,
            gc_ids=None if gc_ids is None else gc_ids[sl],
            temperature=temperature,
            seed_codes=None if seed_codes is None else seed_codes[sl],
            collect_logits=collect_logits, interpret=interpret,
            weight_dtype=weight_dtype, state_dtype=state_dtype,
            prefill=True,
            lc=None if lc is None else lc[sl],
            lc_prime=None if lc_prime is None else lc_prime[sl],
            vpu_b1=vpu_b1)
        if collect_logits:
            out, lg = out
            logits_all.append(lg)
        outs.append(out)
    codes = jnp.concatenate(outs, axis=0)
    if collect_logits:
        return codes, jnp.concatenate(logits_all, axis=0)
    return codes


def generate_pallas(params: Params, config: WaveNetConfig, n_samples: int,
                    seed: int, batch_size: int = 1,
                    gc_ids: Optional[jnp.ndarray] = None,
                    temperature: float = 1.0,
                    seed_codes: Optional[jnp.ndarray] = None,
                    collect_logits: bool = False,
                    interpret: bool = False,
                    weight_dtype=jnp.float32,
                    state_dtype=jnp.float32,
                    batch_chunk: int = 0,
                    ring_in_hbm: bool = False,
                    stream_io: bool = False,
                    prefill: bool = False,
                    lc: Optional[jnp.ndarray] = None,
                    lc_prime: Optional[jnp.ndarray] = None,
                    vpu_b1: bool = True,
                    ring_pack: Optional[bool] = None,
                    ring_interleave: int = 1):
    """Generate mu-law codes [B, n_samples] in a single kernel launch.

    ``seed_codes`` [B, T_seed] teacher-forces the first T_seed steps (queue
    priming); the remaining n_samples are sampled. Distribution matches the
    scan sampler (softmax(logits/T)); the PRNG stream differs (TPU
    hardware PRNG vs jax.random), as documented for seeds.

    ``prefill=True`` primes the queues with ONE parallel conv forward
    over the seed (``prefill_carry``) instead of T_seed sequential kernel
    steps, then decodes with the streamed-IO kernel — removing the
    receptive-field priming steps (38% of a 16k-sample paper-config run)
    at every batch size. Ring state matches sequential priming to f32
    round-off; with ``collect_logits`` only DECODE-phase logits exist.

    ``lc``/``lc_prime``: local conditioning with the scan sampler's
    conventions (sample.generate): lc [B, n_samples, C_lc] conditions
    the generated samples; lc_prime [B, n_prime, C_lc] conditions the
    priming region (default: lc[:, 0] held backward). Supported by the
    VMEM kernels (incl. batch_chunk) and the prefill/streamed paths;
    the legacy single-pass HBM-ring kernel raises NotImplementedError
    (the ordered fallback skips it).

    ``ring_pack`` (prefill path): route the decode through the
    packed-ring kernel (kernels/sampler_packed.py — contiguous G-row
    ring blocks + VMEM-resident small-dilation layers; round-5
    DMA-count optimization, +43% at b512). True = force (raises if
    unsupported); None = auto (on when eligible: B >= 512, no lc,
    residual_channels <= 64); False = always the v1 streamed decode.

    ``ring_interleave`` (packed path, experimental): split the batch
    into that many independent row chains with alternated instruction
    issue in the layer loop. Bitwise-identical outputs (hardware-
    verified at b512); measured NEUTRAL at IL=2 and SLOWER at IL=4 on
    an idle chip (tools/r5_interleave_ab.py, docs/performance.md round
    5) — Mosaic already overlaps what it can — so the default stays 1.
    """
    c = config
    if c.filter_width != 2:
        raise NotImplementedError("Pallas sampler requires filter_width=2")
    B = batch_size
    if lc is not None and ring_in_hbm and not stream_io:
        raise NotImplementedError(
            "local conditioning is not wired into the legacy single-pass "
            "HBM-ring kernel; use the streamed-IO or VMEM paths")
    if lc is not None and lc.shape[1] != n_samples:
        raise ValueError(f"lc length {lc.shape[1]} != n_samples "
                         f"{n_samples}")
    if prefill:
        if batch_chunk:
            # Python-level batch chunking: any batch is served as
            # sequential <=512-lane prefill+streamed runs (one compile
            # for the full chunks, one for a ragged remainder). Chunk i
            # seeds the hardware PRNG with chunk_seed(seed, i) — a
            # splitmix mix, so adjacent request seeds never share chunk
            # seeds — and the output equals the concatenation of
            # independent runs with those seeds.
            if not 1 <= batch_chunk <= 512:
                raise ValueError("prefill batch_chunk must be in "
                                 f"[1, 512], got {batch_chunk}")
            if B > batch_chunk:
                return _generate_prefill_chunked(
                    params, config, n_samples, seed, batch_size,
                    seed_codes, temperature, collect_logits, gc_ids,
                    weight_dtype, batch_chunk, lc, lc_prime, vpu_b1,
                    interpret, state_dtype)
            batch_chunk = 0     # fits in one call
        if B > 512:
            # The streamed decode packs the batch into the lanes of the
            # forced/codes records (multi-tile rows past 128); beyond
            # 512 lanes the per-layer VMEM row slots alone blow the
            # budget — pass batch_chunk=512 (sampler_select does) to
            # serve larger batches as sequential chunked runs.
            # NotImplementedError so the ordered fallback
            # (sampler_select.is_compile_failure) moves on to the
            # chunked/scan samplers instead of aborting.
            raise NotImplementedError(
                "prefill + streamed decode supports batch_size <= 512 "
                f"per kernel launch; got {B} (use batch_chunk)")
        # state_dtype applies to the streamed decode's HBM ring too
        # (round 5): bf16 halves the decode's dominant HBM traffic —
        # past rows requantize on store (small logit drift, same class
        # as weight_dtype=bf16); f32 remains the parity default.

    gc_emb = embed_gc(params, c, gc_ids) if gc_ids is not None else None
    packed = pack_sampler_weights(params, c, B, gc_emb, weight_dtype)
    if not vpu_b1:
        # A/B escape hatch: strip the transposed fields so the streamed
        # kernel compiles its MXU chain at B == 1 too.
        packed = packed._replace(layer_wT=None, layer_addT=None, lc_wT=None)

    # In scalar-input mode seed_codes are raw AMPLITUDES [B, T] f32 and
    # the unseeded start is silence (0.0); in mu-law mode they are int
    # classes and silence is Q//2 (see unseeded_seed_codes).
    fdtype = jnp.float32 if c.scalar_input else jnp.int32
    if seed_codes is None:
        seed_codes = unseeded_seed_codes(c, B, seed)
    n_forced = int(seed_codes.shape[1])
    n_total = n_forced - 1 + n_samples

    # Local conditioning streams (scan-sampler alignment): kernel step t
    # is conditioned by row t of [lc_prime (n_forced-1 rows) | lc].
    # Learned upsampling refinement happens here, once, on the raw
    # streams (same entry-point contract as sample.generate).
    lc_p = None
    if lc is not None:
        from wavenet_tpu.models.wavenet import maybe_refine_lc
        from wavenet_tpu.sample import _lc_for_prime
        lc = maybe_refine_lc(params, c, lc)
        lc_p = _lc_for_prime(lc, maybe_refine_lc(params, c, lc_prime),
                             n_forced - 1)

    if prefill:
        carry = prefill_carry(params, c, seed_codes.astype(fdtype), gc_ids,
                              lc=lc_p)
        lc_tm = (jnp.moveaxis(lc.astype(jnp.float32), 1, 0)
                 if lc is not None else None)
        # Packed-ring decode (round 5): contiguous G-row blocks cut the
        # per-step ring DMA count (the measured 40% of step latency at
        # b512) G-fold, and d<=8 layers go VMEM-resident. Measured A/B
        # vs the v1 streamed decode (device rate, 16k samples, bf16w):
        # b512 15.9M vs 11.1M (+43%); b256/b128 neutral-to-slightly-
        # slower (quad orchestration offsets the smaller DMA savings)
        # — hence the B >= 512 auto threshold.
        from wavenet_tpu.kernels import sampler_packed as _sp
        supported = (lc is None and not batch_chunk
                     and _sp.pack_factor(c) >= 2)
        pk_key = (c, B, n_samples,
                  True if collect_logits is True
                  else int(collect_logits) if collect_logits else 0,
                  jnp.dtype(weight_dtype).name, "ring_pack")
        auto_on = (supported and B >= 512 and RING_PACK_AUTO
                   and pk_key not in _VMEM_DECODE_FAILED)
        if ring_pack or (ring_pack is None and auto_on):
            if not supported:
                raise NotImplementedError(
                    "ring_pack needs a no-lc prefill decode with "
                    "residual_channels <= 64")
            from wavenet_tpu.sampler_select import is_compile_failure
            ring_v2 = _sp.pack_ring_rows(carry.ring, c, carry.t_abs,
                                         state_dtype)
            C = _io_chunk_for(B)
            T_pad = -(-n_samples // C) * C
            forced_lanes = jnp.zeros((T_pad, _lanes(B)), fdtype)
            forced_lanes = forced_lanes.at[0, 0:B].set(
                carry.last.astype(fdtype))
            G = _sp.pack_factor(c)
            seed3 = jnp.asarray(
                [seed, carry.t_abs, carry.t_abs // G], jnp.int32)
            try:
                if interpret:
                    with pltpu.force_tpu_interpret_mode():
                        codes, logits, _, _ = _sp.run_packed_decode(
                            packed, forced_lanes, seed3, ring_v2,
                            carry.causal, c, n_samples, 1, B,
                            temperature, collect_logits, resume=True,
                            interleave=ring_interleave)
                else:
                    codes, logits, _, _ = _sp.run_packed_decode(
                        packed, forced_lanes, seed3, ring_v2,
                        carry.causal, c, n_samples, 1, B, temperature,
                        collect_logits, resume=True,
                        interleave=ring_interleave)
            except Exception as e:  # noqa: BLE001 — compile-failure gate
                # An auto-routed packed decode that fails to compile
                # (e.g. a big collect_logits window pushing the packed
                # buffers past VMEM) degrades to the v1 streamed
                # decode; an explicit ring_pack=True propagates.
                if ring_pack or not is_compile_failure(e):
                    raise
                _VMEM_DECODE_FAILED.add(pk_key)
            else:
                if collect_logits:
                    logits = _logits_in_step_order(
                        logits, collect_logits, n_samples)
                    return codes, jnp.moveaxis(logits, 0, 1)
                return codes
        # Short-enough runs decode in the all-VMEM kernel from the
        # prefilled ring: no per-layer HBM ring DMA (measured 11.1 vs
        # 12.4 us/step at b1 — the round-4 b1 production path). The
        # byte estimate prunes hopeless shapes; a compile/resource
        # failure falls through to the streamed decode below.
        from wavenet_tpu.sampler_select import (
            GENEROUS_VMEM, is_compile_failure)
        vmem_key = (c, B, n_samples,
                    True if collect_logits is True else int(collect_logits)
                    if collect_logits else 0,
                    jnp.dtype(weight_dtype).name, lc is not None,
                    packed.layer_wT is not None)
        if (not batch_chunk and vmem_key not in _VMEM_DECODE_FAILED
                and sampler_vmem_bytes(
                    c, B, n_samples, collect_logits,
                    resume_inputs=True,
                    transposed_weights=packed.layer_wT is not None)
                < GENEROUS_VMEM):
            forced_v = jnp.zeros((n_samples, B), fdtype)
            forced_v = forced_v.at[0].set(carry.last.astype(fdtype))
            ring_small = carry.ring[:, :, 0:c.residual_channels]
            args_v = (packed, forced_v,
                      jnp.asarray([seed, carry.t_abs], jnp.int32), c,
                      n_samples, 1, B, temperature, collect_logits,
                      jnp.float32, 0)
            try:
                if interpret:
                    with pltpu.force_tpu_interpret_mode():
                        codes, logits = _run_sampler_kernel(
                            *args_v, lc_stream=lc_tm,
                            ring_init=ring_small,
                            causal_init=carry.causal)
                else:
                    codes, logits = _run_sampler_kernel(
                        *args_v, lc_stream=lc_tm, ring_init=ring_small,
                        causal_init=carry.causal)
            except Exception as e:  # noqa: BLE001 — compile-failure gate
                if not is_compile_failure(e):
                    raise
                # Remember the failed (config, shape) so subsequent
                # generate calls skip straight to the streamed decode
                # instead of re-paying the failing compile each time.
                _VMEM_DECODE_FAILED.add(vmem_key)
            else:
                if collect_logits:
                    logits = _logits_in_step_order(logits, collect_logits,
                                                   n_samples)
                    return codes, jnp.moveaxis(logits, 0, 1)
                return codes
        C = _io_chunk_for(B)
        T_pad = -(-n_samples // C) * C
        forced_lanes = jnp.zeros((T_pad, _lanes(B)), fdtype)
        forced_lanes = forced_lanes.at[0, 0:B].set(carry.last.astype(fdtype))
        ring0 = carry.ring
        if jnp.dtype(state_dtype) != ring0.dtype:
            ring0 = ring0.astype(state_dtype)
        args_p = (packed, forced_lanes,
                  jnp.asarray([seed, carry.t_abs], jnp.int32),
                  ring0, carry.causal, c, n_samples, 1, B,
                  temperature, collect_logits, True)
        if interpret:
            with pltpu.force_tpu_interpret_mode():
                codes, logits, _, _ = _run_sampler_kernel_hbm_stream(
                    *args_p, lc_stream=lc_tm)
        else:
            codes, logits, _, _ = _run_sampler_kernel_hbm_stream(
                *args_p, lc_stream=lc_tm)
        if collect_logits:
            logits = _logits_in_step_order(logits, collect_logits, n_samples)
            return codes, jnp.moveaxis(logits, 0, 1)
        return codes

    lc_tm = None
    if lc is not None:
        lc_full = jnp.concatenate([lc_p, lc], axis=1)[:, :n_total]
        lc_tm = jnp.moveaxis(lc_full.astype(jnp.float32), 1, 0)

    forced = jnp.transpose(seed_codes.astype(fdtype))  # [Tf, B]
    pad = n_total - n_forced
    if pad > 0:
        forced = jnp.concatenate(
            [forced, jnp.zeros((pad, B), fdtype)], axis=0)
    elif pad < 0:
        forced = forced[:n_total]

    if ring_in_hbm and stream_io:
        # Streamed-IO path: forced/codes live in HBM as [T_pad, lanes(B)]
        # lane-padded streams (b >= 96 and arbitrarily long runs; b > 128
        # packs multiple 128-lane tiles per record row).
        C = _io_chunk_for(B)
        T_pad = -(-n_total // C) * C
        forced_lanes = jnp.zeros((T_pad, _lanes(B)), forced.dtype)
        forced_lanes = forced_lanes.at[:n_total, 0:B].set(forced)
        ring0, causal0 = _stream_zero_state(c, B, state_dtype)
        args_s = (packed, forced_lanes, jnp.asarray([seed, 0], jnp.int32),
                  ring0, causal0, c, n_total, n_forced, B, temperature,
                  collect_logits)
        if interpret:
            with pltpu.force_tpu_interpret_mode():
                codes, logits, _, _ = _run_sampler_kernel_hbm_stream(
                    *args_s, lc_stream=lc_tm)
        else:
            codes, logits, _, _ = _run_sampler_kernel_hbm_stream(
                *args_s, lc_stream=lc_tm)
        out_codes = codes[:, n_forced - 1:]
        if collect_logits:
            logits = _logits_in_step_order(logits, collect_logits, n_total)
            return out_codes, jnp.moveaxis(logits, 0, 1)
        return out_codes

    if ring_in_hbm:
        # Single-pass HBM-ring path: forced needs the chunk-major [1, T, B]
        # layout the kernel shares with the chunked variant.
        forced_c = forced.reshape(n_total, 1, B)
        forced_c = jnp.moveaxis(forced_c, 1, 0)
        args_h = (packed, forced_c, jnp.asarray([seed], jnp.int32), c,
                  n_total, n_forced, B, temperature, collect_logits)
        if interpret:
            with pltpu.force_tpu_interpret_mode():
                codes, logits = _run_sampler_kernel_hbm(*args_h)
        else:
            codes, logits = _run_sampler_kernel_hbm(*args_h)
        out_codes = codes[:, n_forced - 1:]
        if collect_logits:
            logits = _logits_in_step_order(logits, collect_logits, n_total)
            return out_codes, jnp.moveaxis(logits, 0, 1)
        return out_codes

    args = (packed, forced, jnp.asarray([seed], jnp.int32), c, n_total,
            n_forced, B, temperature, collect_logits, state_dtype,
            batch_chunk)
    if interpret:
        with pltpu.force_tpu_interpret_mode():
            codes, logits = _run_sampler_kernel(*args, lc_stream=lc_tm)
    else:
        codes, logits = _run_sampler_kernel(*args, lc_stream=lc_tm)
    # Emitted stream: forced[1:] then sampled — return only the sampled tail.
    out_codes = codes[:, n_forced - 1:]
    if collect_logits:
        logits = _logits_in_step_order(logits, collect_logits, n_total)
        return out_codes, jnp.moveaxis(logits, 0, 1)  # [B, n_log, Q]
    return out_codes


# ---------------------------------------------------------------------------
# HBM-ring variant: batches beyond the VMEM ceiling in ONE pass
# ---------------------------------------------------------------------------

def _sampler_kernel_hbm(
    # scalar prefetch
    seed_ref,
    # inputs
    causal_w_ref, layer_w_ref, layer_add_ref,
    dense_w_ref, dense_add_ref, skip_w_ref, skip_b_ref,
    post1_w_ref, post1_b_ref, post2_w_ref, post2_b_ref,
    forced_ref,          # [1, n_total, B]
    # outputs
    codes_ref,           # [1, n_total, B]
    logits_ref,          # [1, n_log, B, Q]
    ring_ref,            # [sum_d, B, 128] — ANY memspace (HBM); lane dim
                         #  explicitly padded to the 128-lane tile so HBM
                         #  views and DMA shapes agree
    # scratch
    causal_buf_ref, rbuf_ref, wbuf_ref, zbuf_ref, rsem, wsem, zsem,
    *,
    config: WaveNetConfig, offsets: Tuple[int, ...], n_total: int,
    n_forced: int, batch_size: int, inv_temperature: float,
):
    """Single-pass sampler with the ring buffer resident in HBM.

    The VMEM kernel's batch ceiling comes from lane-padding the
    [sum_d, B, R] state (R=32 pads to 128 lanes -> 4x bytes). Here the
    state lives in HBM (no lane tiling) and the kernel streams one row
    per layer per step:

      * at step start ALL L row-reads are issued onto per-layer DMA
        semaphores (positions are known from t), so by the time layer l
        runs, ~l layers of matmuls have hidden its read latency;
      * each layer waits its row, computes, snapshots its input into a
        per-layer VMEM write-source slot, and issues the write-back;
      * before re-issuing layer l's read on the next step, one wait on
        its write semaphore balances the books — after t waits, all t
        prior writes are complete, so a d=1 row re-read is safe;
      * all writes are drained before the kernel exits.
    """
    c = config
    L, R, D, S, Q = (c.num_layers, c.residual_channels, c.dilation_channels,
                     c.skip_channels, c.quantization_channels)
    B = batch_size
    C_in = c.input_channels

    pltpu.prng_seed(seed_ref[0])
    causal_buf_ref[...] = jnp.zeros_like(causal_buf_ref)
    wbuf_ref[...] = jnp.zeros_like(wbuf_ref)   # defined pad lanes

    # Zero the HBM ring in chunks.
    zbuf_ref[...] = jnp.zeros_like(zbuf_ref)
    ZC = zbuf_ref.shape[0]
    sum_d = sum(c.dilations)
    n_full = sum_d // ZC
    for ci in range(n_full):
        cp = pltpu.make_async_copy(zbuf_ref, ring_ref.at[ci * ZC:(ci + 1) * ZC],
                                   zsem)
        cp.start()
        cp.wait()
    rem = sum_d - n_full * ZC
    if rem:
        cp = pltpu.make_async_copy(zbuf_ref.at[0:rem],
                                   ring_ref.at[n_full * ZC:sum_d], zsem)
        cp.start()
        cp.wait()

    def featurize(x_col):
        if c.scalar_input:
            return x_col
        iota = lax.broadcasted_iota(jnp.int32, (B, C_in), 1)
        return (iota.astype(jnp.float32) == x_col).astype(jnp.float32)

    mu = float(Q - 1)

    def decode_amp(code_f):
        sgn = 2.0 * (code_f / mu) - 1.0
        mag = (1.0 / mu) * (jnp.exp(jnp.abs(sgn) * float(np.log1p(mu)))
                            - 1.0)
        return jnp.sign(sgn) * mag

    def mu_law_encode_f(amp):
        safe = jnp.minimum(jnp.abs(amp), 1.0)
        magnitude = jnp.log1p(mu * safe) * float(1.0 / np.log1p(mu))
        signal = jnp.sign(amp) * magnitude
        return ((signal + 1.0) / 2.0 * mu + 0.5).astype(jnp.int32)

    def read_dma(l, pos):
        return pltpu.make_async_copy(ring_ref.at[pos], rbuf_ref.at[l],
                                     rsem.at[l])

    def write_dma(l, pos):
        return pltpu.make_async_copy(wbuf_ref.at[l], ring_ref.at[pos],
                                     wsem.at[l])

    def row_pos(l, t):
        return offsets[l] + t % c.dilations[l]

    def step(t, x_col):
        x = featurize(x_col)
        prev = causal_buf_ref[...]
        window = jnp.concatenate([prev, x], axis=-1)
        current = mxu_dot(window.astype(causal_w_ref.dtype),
                          causal_w_ref[...])
        causal_buf_ref[...] = window[:, C_in:]

        # Balance write semaphores, then prefetch ALL row reads.
        for l in range(L):
            @pl.when(t > 0)
            def _(l=l):
                write_dma(l, row_pos(l, t - 1)).wait()
            read_dma(l, row_pos(l, t)).start()

        skip_sum = jnp.zeros((B, S), jnp.float32)
        for i in range(L):
            read_dma(i, row_pos(i, t)).wait()
            past = rbuf_ref[i, :, 0:R].astype(jnp.float32)
            wbuf_ref[i, :, 0:R] = current
            write_dma(i, row_pos(i, t)).start()
            x_cat = jnp.concatenate([past, current], axis=-1)
            fg = mxu_dot(x_cat.astype(layer_w_ref.dtype), layer_w_ref[i])
            fg = fg + layer_add_ref[0, i]
            tg = jnp.tanh(fg)   # gate half pre-scaled 0.5 at pack time
            out = tg[:, :D] * (0.5 + 0.5 * tg[:, D:])
            d = mxu_dot(out.astype(dense_w_ref.dtype), dense_w_ref[i])
            current = current + d + dense_add_ref[i]
            skip_sum = skip_sum + mxu_dot(out.astype(skip_w_ref.dtype),
                                          skip_w_ref[i])

        h = jnp.maximum(skip_sum + skip_b_ref[...], 0.0)
        h = mxu_dot(h.astype(post1_w_ref.dtype), post1_w_ref[...]) + post1_b_ref[...]
        h = jnp.maximum(h, 0.0)
        h = mxu_dot(h.astype(post2_w_ref.dtype), post2_w_ref[...]) + post2_b_ref[...]
        return h

    def sample_from(logits):
        bits = pltpu.prng_random_bits((B, Q))
        u = pltpu.bitcast(
            (pltpu.bitcast(bits, jnp.uint32) >> 9) | 0x3F800000,
            jnp.float32) - 1.0
        u = jnp.maximum(u, 1e-20)
        gumbel = -jnp.log(-jnp.log(u))
        scores = logits * inv_temperature + gumbel
        return jnp.argmax(scores, axis=-1, keepdims=True).astype(jnp.int32)

    def body(t, x_col):
        logits = step(t, x_col)
        logits_ref[0, lax.rem(t, logits_ref.shape[1])] = logits
        sampled = sample_from(logits)
        nxt = jnp.minimum(t + 1, n_total - 1)
        forced_next = jnp.transpose(forced_ref[0, pl.ds(nxt, 1), :])
        take_forced = t + 1 < n_forced
        emitted = jnp.where(
            t < n_forced - 1,
            (mu_law_encode_f(forced_next) if c.scalar_input
             else forced_next.astype(jnp.int32)),
            sampled)
        codes_ref[0, pl.ds(t, 1), :] = jnp.transpose(emitted)
        if c.scalar_input:
            next_col = jnp.where(take_forced, forced_next,
                                 decode_amp(sampled.astype(jnp.float32)))
        else:
            next_col = jnp.where(take_forced, forced_next,
                                 sampled.astype(jnp.float32))
        return next_col

    first = jnp.transpose(forced_ref[0, pl.ds(0, 1), :]).astype(jnp.float32)
    final = lax.fori_loop(0, n_total, body, first, unroll=False)

    # Drain outstanding writes (one pending per layer from the last step).
    for l in range(L):
        write_dma(l, row_pos(l, n_total - 1)).wait()


@functools.partial(
    jax.jit,
    static_argnames=("config", "n_total", "n_forced", "batch_size",
                     "temperature", "collect_logits"))
def _run_sampler_kernel_hbm(packed: PackedSampler, forced: jnp.ndarray,
                            seed: jnp.ndarray,
                            config: WaveNetConfig, n_total: int,
                            n_forced: int, batch_size: int,
                            temperature: float, collect_logits: bool):
    c = config
    B, Q, R = batch_size, c.quantization_channels, c.residual_channels
    L = c.num_layers
    sum_d = sum(c.dilations)
    kw_in = (c.initial_filter_width if c.scalar_input else c.filter_width)
    kernel = functools.partial(
        _sampler_kernel_hbm, config=c, offsets=ring_offsets(c),
        n_total=n_total, n_forced=n_forced, batch_size=B,
        inv_temperature=1.0 / temperature)
    # collect_logits: True = every step; int W = ring of the last
    # W steps (bounded VMEM for arbitrarily long runs); False = 1.
    n_log = (n_total if collect_logits is True
             else int(collect_logits) if collect_logits else 1)
    zc = min(64, sum_d)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 11
                 + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),     # codes
            pl.BlockSpec(memory_space=pltpu.VMEM),     # logits
            pl.BlockSpec(memory_space=pl.ANY),         # ring (HBM)
        ),
        scratch_shapes=[
            pltpu.VMEM((B, (kw_in - 1) * c.input_channels), jnp.float32),
            pltpu.VMEM((L, B, 128), jnp.float32),      # rbuf (lane-padded)
            pltpu.VMEM((L, B, 128), jnp.float32),      # wbuf (lane-padded)
            pltpu.VMEM((zc, B, 128), jnp.float32),     # zbuf
            pltpu.SemaphoreType.DMA((L,)),
            pltpu.SemaphoreType.DMA((L,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    codes, logits, _ring = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((1, n_total, B), jnp.int32),
            jax.ShapeDtypeStruct((1, n_log, B, Q), jnp.float32),
            jax.ShapeDtypeStruct((sum_d, B, 128), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT),
    )(seed, packed.causal_w, packed.layer_w,
      packed.layer_add[None],   # kernel uses the chunk-major [1,L,B,2D] view
      packed.dense_w, packed.dense_add, packed.skip_w, packed.skip_b,
      packed.post1_w, packed.post1_b,
      packed.post2_w, packed.post2_b, forced)
    return jnp.transpose(codes[0]), logits[0]


# ---------------------------------------------------------------------------
# HBM-ring + streamed IO: forced/codes streams in HBM (b >= 96, any length)
# ---------------------------------------------------------------------------

_IO_CHUNK = 1024     # rows per forced/codes DMA chunk (at <= 128 lanes)


def _io_chunk_for(batch_size: int) -> int:
    """Rows per forced/codes DMA chunk, shrunk for multi-tile batches.

    Batches wider than one 128-lane tile pack into ``_lanes(B)``-lane
    records (b256 = two tiles per row); halving the chunk rows keeps
    the double-buffered VMEM IO slots at the same byte budget the
    b<=128 path was tuned for.
    """
    return max(8, (_IO_CHUNK * 128) // _lanes(batch_size))


def _sampler_kernel_hbm_stream(
    # scalar prefetch: [seed, t0] — t0 is the absolute step offset of
    # this segment (ring-row phase for resumed generation)
    seed_ref,
    # inputs
    causal_w_ref, layer_w_ref, layer_add_ref,
    dense_w_ref, dense_add_ref, skip_w_ref, skip_b_ref,
    post1_w_ref, post1_b_ref, post2_w_ref, post2_b_ref,
    forced_hbm,          # [T_pad, lanes(B)] fdtype — ANY (HBM), lanes 0:B
    ring_in_ref,         # [sum_d, B, 128] — ANY (HBM), ALIASED to ring_ref
    causal_in_ref,       # [B, (kw-1)*C_in] f32 — carried shift register
    # then, when has_lc (parsed from *rest):
    #   lc_w_ref         [L, C_lc, 2D]     (VMEM input)
    #   lc_hbm           [T_lc_pad, B, 128] f32 — ANY (HBM), lanes 0:C_lc
    #                    used; row t conditions step t's prediction
    # outputs
    #   codes_hbm        [T_pad, lanes(B)] int32 — ANY (HBM)
    #   logits_ref       [1, n_log, B, Q] VMEM
    #   ring_ref         [sum_d, B, 128] — ANY (HBM)
    #   causal_out_ref   [B, (kw-1)*C_in] f32
    # scratch
    #   causal_buf_ref, rbuf_ref, wbuf_ref, zbuf_ref,
    #   fbuf_ref         [2, io_chunk, lanes(B)] fdtype — forced chunks
    #   cbuf_ref         [2, io_chunk, lanes(B)] int32 — codes chunks
    #   (when has_lc) lcbuf_ref [2, lc_chunk, B, 128] f32 — lc chunks
    #   rsem, wsem, zsem, fsem, csem (+ lcsem when has_lc)
    *rest,
    config: WaveNetConfig, offsets: Tuple[int, ...], n_total: int,
    n_forced: int, batch_size: int, inv_temperature: float, io_chunk: int,
    resume: bool, has_lc: bool = False, lc_chunk: int = 0,
    vpu_chain: bool = False, ablate: str = "",
):
    # Optional input groups, in operand order: [layer_wT, layer_addT]
    # when vpu_chain; [lc_w, lc_hbm(, lc_wT)] when has_lc.
    layer_wT_ref = layer_addT_ref = lc_wT_ref = None
    lc_w_ref = lc_hbm = lcbuf_ref = lcsem = None
    i0 = 0
    if vpu_chain:
        layer_wT_ref, layer_addT_ref = rest[0], rest[1]
        i0 = 2
    if has_lc:
        lc_w_ref, lc_hbm = rest[i0], rest[i0 + 1]
        i0 += 2
        if vpu_chain:
            lc_wT_ref = rest[i0]
            i0 += 1
    (codes_hbm, logits_ref, ring_ref, causal_out_ref,
     causal_buf_ref, rbuf_ref, wbuf_ref, zbuf_ref, fbuf_ref, cbuf_ref,
     *tail) = rest[i0:]
    if has_lc:
        lcbuf_ref, rsem, wsem, zsem, fsem, csem, lcsem = tail
    else:
        rsem, wsem, zsem, fsem, csem = tail
    """The HBM-ring sampler with forced/codes streamed through HBM.

    The plain HBM-ring kernel keeps the whole [n_total, B] forced and
    codes streams in VMEM, capping batch at ~64 and run length by VMEM.
    Here both live in HBM ([T_pad, 128] — lanes padded to the tile so
    full-lane DMA slices are legal) and move through double-buffered
    [io_chunk, 128] VMEM windows:

      * forced: chunk c is prefetched while chunk c-1 is consumed. The
        loop body at step t reads forced[t+1], so the chunk boundary
        work runs at t % C == C-1 (wait chunk ct+1, then prefetch
        ct+2 into the slot chunk ct just vacated);
      * codes: rows accumulate in a chunk slot; a full (or final
        partial) slot is DMA'd out and the slot two chunks later waits
        on it before its first write.

    Ring protocol, sampling, and logits window are identical to
    ``_sampler_kernel_hbm``.
    """
    c = config
    L, R, D, S, Q = (c.num_layers, c.residual_channels, c.dilation_channels,
                     c.skip_channels, c.quantization_channels)
    B = batch_size
    C_in = c.input_channels
    C = io_chunk
    n_chunks = -(-n_total // C)

    pltpu.prng_seed(seed_ref[0])
    t0 = seed_ref[1]
    wbuf_ref[...] = jnp.zeros_like(wbuf_ref)
    cbuf_ref[...] = jnp.zeros_like(cbuf_ref)   # pad lanes stay zero

    sum_d = sum(c.dilations)
    if resume:
        # ring_in is aliased onto ring_ref: prior state is already in
        # place; the shift register resumes from the carried window.
        causal_buf_ref[...] = causal_in_ref[...]
    else:
        causal_buf_ref[...] = jnp.zeros_like(causal_buf_ref)
        # Zero the HBM ring in chunks.
        zbuf_ref[...] = jnp.zeros_like(zbuf_ref)
        ZC = zbuf_ref.shape[0]
        n_full = sum_d // ZC
        for ci in range(n_full):
            cp = pltpu.make_async_copy(
                zbuf_ref, ring_ref.at[ci * ZC:(ci + 1) * ZC], zsem)
            cp.start()
            cp.wait()
        rem_rows = sum_d - n_full * ZC
        if rem_rows:
            cp = pltpu.make_async_copy(zbuf_ref.at[0:rem_rows],
                                       ring_ref.at[n_full * ZC:sum_d], zsem)
            cp.start()
            cp.wait()

    def f_dma(ci):
        return pltpu.make_async_copy(
            forced_hbm.at[pl.ds(ci * C, C)], fbuf_ref.at[lax.rem(ci, 2)],
            fsem.at[lax.rem(ci, 2)])

    def c_dma(ci):
        return pltpu.make_async_copy(
            cbuf_ref.at[lax.rem(ci, 2)], codes_hbm.at[pl.ds(ci * C, C)],
            csem.at[lax.rem(ci, 2)])

    # LC stream: row t is read in body t (one row earlier than forced,
    # which reads t+1), so it follows the same chunk cadence with its
    # own chunk size (lc rows are [B, 128-lane] blocks, features in
    # lanes 0:C_lc — DMA slices must be lane-tile aligned).
    LCC = lc_chunk
    n_lc_chunks = -(-n_total // LCC) if has_lc else 0

    def lc_dma(ci):
        return pltpu.make_async_copy(
            lc_hbm.at[pl.ds(ci * LCC, LCC)], lcbuf_ref.at[lax.rem(ci, 2)],
            lcsem.at[lax.rem(ci, 2)])

    def featurize(x_col):
        if c.scalar_input:
            return x_col
        iota = lax.broadcasted_iota(jnp.int32, (B, C_in), 1)
        return (iota.astype(jnp.float32) == x_col).astype(jnp.float32)

    mu = float(Q - 1)

    def decode_amp(code_f):
        sgn = 2.0 * (code_f / mu) - 1.0
        mag = (1.0 / mu) * (jnp.exp(jnp.abs(sgn) * float(np.log1p(mu)))
                            - 1.0)
        return jnp.sign(sgn) * mag

    def mu_law_encode_f(amp):
        safe = jnp.minimum(jnp.abs(amp), 1.0)
        magnitude = jnp.log1p(mu * safe) * float(1.0 / np.log1p(mu))
        signal = jnp.sign(amp) * magnitude
        return ((signal + 1.0) / 2.0 * mu + 0.5).astype(jnp.int32)

    def read_dma(l, pos):
        return pltpu.make_async_copy(ring_ref.at[pos], rbuf_ref.at[l],
                                     rsem.at[l])

    def write_dma(l, pos):
        return pltpu.make_async_copy(wbuf_ref.at[l], ring_ref.at[pos],
                                     wsem.at[l])

    def row_pos(l, t):
        # Ring phase follows the ABSOLUTE step so resumed segments keep
        # reading/writing the rows where the previous segment left off.
        return offsets[l] + (t0 + t) % c.dilations[l]

    def step(t, x_col):
        x = featurize(x_col)
        prev = causal_buf_ref[...]
        window = jnp.concatenate([prev, x], axis=-1)
        current = mxu_dot(window.astype(causal_w_ref.dtype),
                          causal_w_ref[...])
        causal_buf_ref[...] = window[:, C_in:]

        lc_t = None
        if has_lc:
            # Load the full 128-lane row, slice to the feature lanes.
            row = lcbuf_ref[lax.rem(t // LCC, 2), lax.rem(t, LCC)]
            lc_t = row[:, 0:lc_w_ref.shape[1]].astype(lc_w_ref.dtype)

        # ``ablate`` (timing diagnostics only — numerically WRONG, used
        # by tools/r5_decode_latency.py to attribute the per-step cost):
        # "ring_dma" drops every ring read/write (past rows are stale
        # VMEM garbage); "skip_mm" drops the per-layer skip matmul.
        if ablate != "ring_dma":
            for l in range(L):
                @pl.when(t > 0)
                def _(l=l):
                    write_dma(l, row_pos(l, t - 1)).wait()
                read_dma(l, row_pos(l, t)).start()

        skip_sum = jnp.zeros((B, S), jnp.float32)
        for i in range(L):
            if ablate != "ring_dma":
                read_dma(i, row_pos(i, t)).wait()
            past = rbuf_ref[i, :, 0:R].astype(jnp.float32)
            wbuf_ref[i, :, 0:R] = current.astype(wbuf_ref.dtype)
            if ablate != "ring_dma":
                write_dma(i, row_pos(i, t)).start()
            x_cat = jnp.concatenate([past, current], axis=-1)
            if vpu_chain:
                # b=1 VPU matvec chain (PackedSampler docstring): the fg
                # product reduces over LANES of the transposed weights
                # (row [1,2R] -> column [2D,1]); gating runs in column
                # form; the dense/skip products reduce over SUBLANES of
                # the standard weights (column -> row). f32 accumulate
                # (bf16 weights upcast elementwise).
                fg = jnp.sum(x_cat * layer_wT_ref[i].astype(jnp.float32),
                             axis=1, keepdims=True)       # [2D, 1]
                fg = fg + layer_addT_ref[i]
                if has_lc:
                    fg = fg + jnp.sum(
                        lc_t * lc_wT_ref[i].astype(jnp.float32),
                        axis=1, keepdims=True)
                tg = jnp.tanh(fg)
                out_col = tg[:D] * (0.5 + 0.5 * tg[D:])   # [D, 1]
                d = jnp.sum(out_col * dense_w_ref[i].astype(jnp.float32),
                            axis=0, keepdims=True)        # [1, R]
                current = current + d + dense_add_ref[i]
                # Skip stays on the VPU too: routing it to the MXU via a
                # per-layer transpose of out_col measured SLOWER (14.82
                # vs 12.38 us/step — the [D,1]->[1,D] relayout costs
                # more than the [D,S] multiply-reduce).
                skip_sum = skip_sum + jnp.sum(
                    out_col * skip_w_ref[i].astype(jnp.float32),
                    axis=0, keepdims=True)                # [1, S]
                continue
            fg = mxu_dot(x_cat.astype(layer_w_ref.dtype), layer_w_ref[i])
            fg = fg + layer_add_ref[0, i]
            if has_lc:
                fg = fg + mxu_dot(lc_t, lc_w_ref[i])
            tg = jnp.tanh(fg)   # gate half pre-scaled 0.5 at pack time
            out = tg[:, :D] * (0.5 + 0.5 * tg[:, D:])
            d = mxu_dot(out.astype(dense_w_ref.dtype), dense_w_ref[i])
            current = current + d + dense_add_ref[i]
            if ablate != "skip_mm":
                skip_sum = skip_sum + mxu_dot(out.astype(skip_w_ref.dtype),
                                              skip_w_ref[i])

        h = jnp.maximum(skip_sum + skip_b_ref[...], 0.0)
        h = mxu_dot(h.astype(post1_w_ref.dtype), post1_w_ref[...]) + post1_b_ref[...]
        h = jnp.maximum(h, 0.0)
        h = mxu_dot(h.astype(post2_w_ref.dtype), post2_w_ref[...]) + post2_b_ref[...]
        return h

    def sample_from(logits):
        bits = pltpu.prng_random_bits((B, Q))
        u = pltpu.bitcast(
            (pltpu.bitcast(bits, jnp.uint32) >> 9) | 0x3F800000,
            jnp.float32) - 1.0
        u = jnp.maximum(u, 1e-20)
        gumbel = -jnp.log(-jnp.log(u))
        scores = logits * inv_temperature + gumbel
        return jnp.argmax(scores, axis=-1, keepdims=True).astype(jnp.int32)

    def get_forced(tt):
        """forced row tt -> [B, 1] (from the chunk slot holding tt)."""
        row = fbuf_ref[lax.rem(tt // C, 2), pl.ds(lax.rem(tt, C), 1), 0:B]
        return jnp.transpose(row)

    def body(t, x_col):
        ct = t // C

        # Forced-stream chunk boundary: body t reads forced[t+1], so the
        # next chunk must land HERE (one step before the boundary).
        @pl.when(jnp.logical_and(lax.rem(t, C) == C - 1,
                                 ct + 1 < n_chunks))
        def _():
            f_dma(ct + 1).wait()

            @pl.when(ct + 2 < n_chunks)
            def _():
                f_dma(ct + 2).start()

        # Codes-stream slot reuse: chunk ct's first write waits out the
        # DMA issued for chunk ct-2 (same slot).
        @pl.when(jnp.logical_and(lax.rem(t, C) == 0, ct >= 2))
        def _():
            c_dma(ct - 2).wait()

        logits = step(t, x_col)

        # LC chunk boundary: body t+1 reads lc row t+1, so chunk lct+1
        # must land before the NEXT body. Unlike the forced stream
        # (whose body-t read is row t+1, already in the OTHER slot),
        # step(t) reads lc row t — the LAST row of chunk lct at this
        # boundary — so the prefetch of lct+2 into chunk lct's slot
        # must be issued AFTER the step, not before. Issuing it before
        # the step races the in-flight DMA against the row read: the
        # stress suite caught exactly that on hardware (lc stream-io
        # max|d|=0.22 vs 3e-5 for vmem; interpret mode hid it because
        # its copies land at wait()).
        if has_lc:
            lct = t // LCC

            @pl.when(jnp.logical_and(lax.rem(t, LCC) == LCC - 1,
                                     lct + 1 < n_lc_chunks))
            def _():
                lc_dma(lct + 1).wait()

                @pl.when(lct + 2 < n_lc_chunks)
                def _():
                    lc_dma(lct + 2).start()
        logits_ref[0, lax.rem(t, logits_ref.shape[1])] = logits
        sampled = sample_from(logits)
        nxt = jnp.minimum(t + 1, n_total - 1)
        forced_next = get_forced(nxt)
        take_forced = t + 1 < n_forced
        emitted = jnp.where(
            t < n_forced - 1,
            (mu_law_encode_f(forced_next) if c.scalar_input
             else forced_next.astype(jnp.int32)),
            sampled)
        cbuf_ref[lax.rem(ct, 2), pl.ds(lax.rem(t, C), 1), 0:B] = (
            jnp.transpose(emitted))

        # Flush a completed (or final partial) codes chunk.
        @pl.when(jnp.logical_or(lax.rem(t, C) == C - 1, t == n_total - 1))
        def _():
            c_dma(ct).start()

        if c.scalar_input:
            next_col = jnp.where(take_forced, forced_next,
                                 decode_amp(sampled.astype(jnp.float32)))
        else:
            next_col = jnp.where(take_forced, forced_next,
                                 sampled.astype(jnp.float32))
        return next_col

    # Prime the forced stream: chunk 0 must land before reading row 0.
    f_dma(0).start()
    f_dma(0).wait()

    if n_chunks > 1:
        f_dma(1).start()

    if has_lc:
        lc_dma(0).start()
        lc_dma(0).wait()
        if n_lc_chunks > 1:
            lc_dma(1).start()

    first = get_forced(0).astype(jnp.float32)
    lax.fori_loop(0, n_total, body, first, unroll=False)
    causal_out_ref[...] = causal_buf_ref[...]

    # Drain outstanding ring writes and codes flushes.
    if ablate != "ring_dma":
        for l in range(L):
            write_dma(l, row_pos(l, n_total - 1)).wait()
    if n_chunks >= 2:
        c_dma(n_chunks - 2).wait()
    c_dma(n_chunks - 1).wait()


@functools.partial(
    jax.jit,
    static_argnames=("config", "n_total", "n_forced", "batch_size",
                     "temperature", "collect_logits", "resume", "ablate"),
    donate_argnames=("ring_in",))
def _run_sampler_kernel_hbm_stream(packed: PackedSampler,
                                   forced_lanes: jnp.ndarray,
                                   seed: jnp.ndarray,
                                   ring_in: jnp.ndarray,
                                   causal_in: jnp.ndarray,
                                   config: WaveNetConfig, n_total: int,
                                   n_forced: int, batch_size: int,
                                   temperature: float, collect_logits,
                                   resume: bool = False,
                                   lc_stream: Optional[jnp.ndarray] = None,
                                   ablate: str = ""):
    """seed: [2] int32 = [prng_seed, t0]. ring_in is DONATED and aliased
    onto the ring output; pass zeros when resume=False. ``lc_stream``
    [n_total, B, C_lc] f32 (local conditioning; row t conditions step
    t's prediction) is streamed from HBM through double-buffered,
    lane-padded chunks."""
    c = config
    B, Q, R = batch_size, c.quantization_channels, c.residual_channels
    L = c.num_layers
    sum_d = sum(c.dilations)
    kw_in = (c.initial_filter_width if c.scalar_input else c.filter_width)
    BP = _lanes(B)       # forced/codes record width: 1 tile per 128 lanes
    C = _io_chunk_for(B)
    T_pad = forced_lanes.shape[0]
    assert T_pad % C == 0 and T_pad >= n_total
    assert forced_lanes.shape[1] == BP
    fdtype = forced_lanes.dtype
    # Ring dtype follows the ring_in operand (part of its aval — static
    # under jit): bf16 halves the dominant HBM traffic of the decode
    # (round 5 measured the f32 ring at ~49% of peak bandwidth at b512).
    # Past rows requantize on store; reads upcast to f32.
    ring_dtype = ring_in.dtype
    has_lc = lc_stream is not None
    # b=1 VPU-chain path: enabled by the presence of the transposed
    # weight fields (packed only at batch_size == 1; stripped by the
    # vpu_b1=False escape hatch). Presence is part of the pytree
    # STRUCTURE, so it is static under jit.
    vpu_chain = (batch_size == 1 and packed.layer_wT is not None
                 and (not has_lc or packed.lc_wT is not None))
    # LC chunk rows: cap each [LCC, B, 128]-lane VMEM slot at ~2 MB.
    LCC = min(_IO_CHUNK, max(8, (1 << 21) // (B * 128 * 4)))
    kernel = functools.partial(
        _sampler_kernel_hbm_stream, config=c, offsets=ring_offsets(c),
        n_total=n_total, n_forced=n_forced, batch_size=B,
        inv_temperature=1.0 / temperature, io_chunk=C, resume=resume,
        has_lc=has_lc, lc_chunk=LCC, vpu_chain=vpu_chain, ablate=ablate)
    # collect_logits: True = every step; int W = ring of the last
    # W steps (bounded VMEM for arbitrarily long runs); False = 1.
    n_log = (n_total if collect_logits is True
             else int(collect_logits) if collect_logits else 1)
    # Ring-zeroing staging rows: keep the [zc, B, 128] slot near the
    # 2 MB it was tuned at for b<=64 (b256 at zc=64 would cost 8.4 MB).
    zc = min(64, sum_d, max(8, (1 << 21) // (max(B, 1) * 128 * 4)))

    in_specs = ([pl.BlockSpec(memory_space=pltpu.VMEM)] * 11
                + [pl.BlockSpec(memory_space=pl.ANY),       # forced
                   pl.BlockSpec(memory_space=pl.ANY),       # ring_in
                   pl.BlockSpec(memory_space=pltpu.VMEM)])  # causal_in
    operands = [seed, packed.causal_w, packed.layer_w,
                packed.layer_add[None],
                packed.dense_w, packed.dense_add, packed.skip_w,
                packed.skip_b, packed.post1_w, packed.post1_b,
                packed.post2_w, packed.post2_b, forced_lanes, ring_in,
                causal_in]
    if vpu_chain:
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM),  # layer_wT
                     pl.BlockSpec(memory_space=pltpu.VMEM)]  # layer_addT
        operands += [packed.layer_wT, packed.layer_addT]
    scratch = [
        pltpu.VMEM((B, (kw_in - 1) * c.input_channels), jnp.float32),
        pltpu.VMEM((L, B, 128), ring_dtype),       # rbuf
        pltpu.VMEM((L, B, 128), ring_dtype),       # wbuf
        pltpu.VMEM((zc, B, 128), ring_dtype),      # zbuf
        pltpu.VMEM((2, C, BP), fdtype),            # forced chunks
        pltpu.VMEM((2, C, BP), jnp.int32),         # codes chunks
    ]
    sems = [
        pltpu.SemaphoreType.DMA((L,)),
        pltpu.SemaphoreType.DMA((L,)),
        pltpu.SemaphoreType.DMA(()),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if has_lc:
        C_lc = lc_stream.shape[-1]
        T_lc_pad = -(-n_total // LCC) * LCC
        # Lane-pad the feature dim to the 128 tile: DMA slice shapes
        # must be lane-aligned (Mosaic rejects a [.., C_lc<128] copy).
        lc_lanes = jnp.zeros((T_lc_pad, B, 128), jnp.float32)
        lc_lanes = lc_lanes.at[:lc_stream.shape[0], :, :C_lc].set(lc_stream)
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM),  # lc_w
                     pl.BlockSpec(memory_space=pl.ANY)]      # lc stream
        operands += [packed.lc_w, lc_lanes]
        if vpu_chain:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            operands.append(packed.lc_wT)
        scratch.append(pltpu.VMEM((2, LCC, B, 128), jnp.float32))
        sems.append(pltpu.SemaphoreType.DMA((2,)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),         # codes (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),     # logits window
            pl.BlockSpec(memory_space=pl.ANY),         # ring (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),     # causal_out
        ),
        scratch_shapes=scratch + sems,
    )
    # Operand index 13 (seed, 11 weights, forced, RING_IN) aliases output
    # index 2 (the ring): prior segment state is updated in place.
    codes, logits, ring, causal_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((T_pad, BP), jnp.int32),
            jax.ShapeDtypeStruct((1, n_log, B, Q), jnp.float32),
            jax.ShapeDtypeStruct((sum_d, B, 128), ring_dtype),
            jax.ShapeDtypeStruct((B, (kw_in - 1) * c.input_channels),
                                 jnp.float32),
        ),
        input_output_aliases={13: 2},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT),
    )(*operands)
    return (jnp.transpose(codes[:n_total, 0:B]), logits[0], ring,
            causal_out)


# ---------------------------------------------------------------------------
# Resumable streamed generation (kernel state export): --save_every et al.
# ---------------------------------------------------------------------------

class StreamSamplerCarry(NamedTuple):
    """State between resumable streamed-sampler segments."""
    ring: jnp.ndarray       # [sum_d, B, 128] f32 — HBM ring (donated in)
    causal: jnp.ndarray     # [B, (kw-1)*C_in] f32 — causal shift register
    t_abs: int              # absolute steps completed (ring phase)
    last: jnp.ndarray       # [B] last emitted code (or amplitude, scalar)


def _stream_zero_state(config: WaveNetConfig, batch_size: int,
                       state_dtype=jnp.float32):
    c = config
    kw_in = (c.initial_filter_width if c.scalar_input else c.filter_width)
    ring = jnp.zeros((sum(c.dilations), batch_size, 128), state_dtype)
    causal = jnp.zeros((batch_size, (kw_in - 1) * c.input_channels),
                       jnp.float32)
    return ring, causal


def prefill_carry(params: Params, config: WaveNetConfig,
                  seed_codes: jnp.ndarray,
                  gc_ids: Optional[jnp.ndarray] = None,
                  lc: Optional[jnp.ndarray] = None
                  ) -> StreamSamplerCarry:
    """Parallel queue priming: one conv forward replaces T-1 kernel steps.

    The sequential sampler spends receptive_field-1 teacher-forced steps
    (~6k for the paper config — 38% of a 16k-sample run) just filling its
    ring buffers before the first free sample. But the ring state after
    teacher-forcing steps 0..T-2 is, by construction, the residual stream
    entering each layer at the last dilation_l positions — exactly what
    the PARALLEL conv forward computes in one XLA pass over the seed
    (milliseconds, MXU-batched). This is the prompt-prefill / decode
    split of LLM serving applied to WaveNet: prefill with the parallel
    network, decode with the fused sampler kernel.

    Equivalence: the kernel's zeroed ring == causal left-zero-padding of
    every layer's activations, which is precisely ``forward``'s padding
    semantics (tests/test_pallas_sampler.py asserts kernel logits ==
    forward logits at ALL positions, including the edge region), so the
    prefilled ring matches sequential priming to f32 round-off.

    ``seed_codes`` is [B, T]: int mu-law codes, or raw f32 amplitudes in
    scalar-input mode (same convention as ``generate_pallas``). The
    returned carry resumes decoding at absolute step T-1 with
    ``carry.last = seed_codes[:, -1]`` as the first decode input —
    identical indexing to the sequential forced path.
    """
    c = config
    B, T = seed_codes.shape
    T_pre = T - 1            # sequential steps replaced: 0 .. T-2

    if c.scalar_input:
        last = seed_codes[:, -1].astype(jnp.float32)
    else:
        last = seed_codes[:, -1].astype(jnp.int32)

    if T_pre == 0:
        ring, causal = _stream_zero_state(c, B)
        return StreamSamplerCarry(ring=ring, causal=causal, t_abs=0,
                                  last=last)

    ring, causal = _prefill_state(params, c, seed_codes, gc_ids, lc)
    return StreamSamplerCarry(ring=ring, causal=causal, t_abs=T_pre,
                              last=last)


@functools.partial(jax.jit, static_argnames=("config",))
def _prefill_state(params: Params, config: WaveNetConfig,
                   seed_codes: jnp.ndarray,
                   gc_ids: Optional[jnp.ndarray],
                   lc: Optional[jnp.ndarray] = None):
    """(ring, causal) after teacher-forcing steps 0..T-2, via ONE jitted
    XLA program (eagerly this is ~300 dispatches through the device
    relay — seconds of pure launch latency)."""
    c = config
    B, T = seed_codes.shape
    R = c.residual_channels
    T_pre = T - 1
    sum_d = sum(c.dilations)
    kw_in = (c.initial_filter_width if c.scalar_input else c.filter_width)
    n_keep = (kw_in - 1) * c.input_channels

    # Layer inputs from the parallel forward, in parity-exact f32
    # (HIGHEST matmuls — matches the kernel's mxu_dot discipline).
    cfg32 = dataclasses.replace(c, compute_dtype="float32",
                                use_pallas_stack=False, remat=False)
    gc_emb = embed_gc(params, c, gc_ids) if gc_ids is not None else None
    keep = tuple(min(d, T_pre) for d in c.dilations)
    lc_in = lc[:, :T_pre] if lc is not None else None
    if c.scalar_input:
        x = seed_codes[:, :T_pre, None].astype(jnp.float32)
        layer_ins = forward(params, cfg32, x, gc_emb,
                            collect_layer_inputs=keep, lc=lc_in)
    else:
        layer_ins = forward_codes(params, cfg32,
                                  seed_codes[:, :T_pre].astype(jnp.int32),
                                  gc_emb, collect_layer_inputs=keep,
                                  lc=lc_in)

    # Ring row offsets[l] + tau % d must hold x_l(tau) for the last
    # min(d, T_pre) positions tau < T_pre (untouched rows stay zero, as
    # after sequential priming). Slot math shared with the scan-state
    # prefill: sample.ring_slot_blocks.
    from wavenet_tpu.sample import ring_slot_blocks
    blocks = ring_slot_blocks(layer_ins, c.dilations, T_pre)
    ring_small = jnp.concatenate(blocks, axis=0)      # [sum_d, B, R]
    ring = jnp.zeros((sum_d, B, 128), jnp.float32)
    ring = ring.at[:, :, 0:R].set(ring_small)

    # Causal shift register: features of positions T_pre-kw+1 .. T_pre-1,
    # oldest first (kernel invariant: buf == window[:, C_in:] after the
    # last primed step).
    n_tail = kw_in - 1
    if c.scalar_input:
        tail = seed_codes[:, max(0, T_pre - n_tail):T_pre]
        tail = tail.astype(jnp.float32)
        if tail.shape[1] < n_tail:
            tail = jnp.concatenate(
                [jnp.zeros((B, n_tail - tail.shape[1]), jnp.float32), tail],
                axis=1)
        causal = tail                                  # C_in == 1
    else:
        tail = seed_codes[:, max(0, T_pre - n_tail):T_pre].astype(jnp.int32)
        oh = jax.nn.one_hot(tail, c.quantization_channels,
                            dtype=jnp.float32)         # [B, k, Q]
        if oh.shape[1] < n_tail:
            oh = jnp.concatenate(
                [jnp.zeros((B, n_tail - oh.shape[1],
                            c.quantization_channels), jnp.float32), oh],
                axis=1)
        causal = oh.reshape(B, n_keep)
    return ring, causal


def generate_pallas_resumable(params: Params, config: WaveNetConfig,
                              n_samples: int, seed: int,
                              batch_size: int = 1,
                              gc_ids: Optional[jnp.ndarray] = None,
                              temperature: float = 1.0,
                              seed_codes: Optional[jnp.ndarray] = None,
                              carry: Optional[StreamSamplerCarry] = None,
                              weight_dtype=jnp.float32,
                              interpret: bool = False,
                              prefill: bool = True,
                              lc: Optional[jnp.ndarray] = None,
                              lc_prime: Optional[jnp.ndarray] = None,
                              vpu_b1: bool = True):
    """One SEGMENT of streamed generation; returns (codes, carry').

    ``lc`` [B, n_samples, C_lc] conditions THIS segment's samples;
    ``lc_prime`` conditions the first segment's priming region (default:
    lc[:, 0] held backward — slice one long stream across segments for
    single-run-equivalent semantics).

    First call (carry=None): primes exactly like ``generate_pallas``
    (seed_codes, or the rf-1-silence + random-first unseeded recipe) —
    by default via ``prefill_carry`` (one parallel conv forward instead
    of T_seed sequential steps; pass ``prefill=False`` for the
    sequential in-kernel forced path). Continuations pass the returned
    carry — the kernel resumes from the HBM ring (donated and updated in
    place), the causal shift register, and the absolute ring phase, so
    the concatenated segments equal one single long run
    sample-for-sample (same PRNG seed stream per segment; vary ``seed``
    per segment for fresh randomness).

    This is what --save_every uses on the Pallas path: generate a
    segment, dump the partial wav, resume (reference generate.py ≈:225
    semantics without leaving the fused kernel).
    """
    c = config
    if c.filter_width != 2:
        raise NotImplementedError("Pallas sampler requires filter_width=2")
    B = batch_size
    gc_emb = embed_gc(params, c, gc_ids) if gc_ids is not None else None
    packed = pack_sampler_weights(params, c, B, gc_emb, weight_dtype)
    if not vpu_b1:
        # Same A/B escape hatch as generate_pallas: strip the transposed
        # fields so b=1 segments run the MXU chain instead of the VPU one.
        packed = packed._replace(layer_wT=None, layer_addT=None, lc_wT=None)
    fdtype = jnp.float32 if c.scalar_input else jnp.int32

    first_segment = carry is None
    if carry is None:
        if seed_codes is None:
            seed_codes = unseeded_seed_codes(c, B, seed)
        lc_p = None
        if lc is not None:
            from wavenet_tpu.sample import _lc_for_prime
            lc_p = _lc_for_prime(lc, lc_prime, int(seed_codes.shape[1]) - 1)
        if prefill:
            # Parallel priming, then decode as a continuation segment.
            carry = prefill_carry(params, c, seed_codes.astype(fdtype),
                                  gc_ids, lc=lc_p)
            resume = True
            t0 = carry.t_abs
            ring_in, causal_in = carry.ring, carry.causal
            seed_codes = carry.last[:, None].astype(fdtype)
        else:
            resume = False
            t0 = 0
            ring_in, causal_in = _stream_zero_state(c, B)
    else:
        resume = True
        t0 = carry.t_abs
        ring_in, causal_in = carry.ring, carry.causal
        if seed_codes is not None:
            raise ValueError("seed_codes only apply to the first segment")
        if lc_prime is not None:
            raise ValueError("lc_prime only applies to the first segment")
        seed_codes = carry.last[:, None].astype(fdtype)

    n_forced = int(seed_codes.shape[1])
    n_total = n_forced - 1 + n_samples
    forced = jnp.transpose(seed_codes.astype(fdtype))
    pad = n_total - n_forced
    if pad > 0:
        forced = jnp.concatenate([forced, jnp.zeros((pad, B), fdtype)],
                                 axis=0)
    elif pad < 0:
        forced = forced[:n_total]

    lc_tm = None
    if lc is not None:
        # Kernel rows [0, n_forced-1) are priming (first sequential
        # segment only), the rest are this segment's samples.
        lc_full = lc
        if first_segment and not prefill and n_forced > 1:
            lc_full = jnp.concatenate([lc_p, lc], axis=1)
        lc_tm = jnp.moveaxis(
            lc_full[:, :n_total].astype(jnp.float32), 1, 0)

    C = _io_chunk_for(B)
    T_pad = -(-n_total // C) * C
    forced_lanes = jnp.zeros((T_pad, _lanes(B)), forced.dtype)
    forced_lanes = forced_lanes.at[:n_total, 0:B].set(forced)
    args = (packed, forced_lanes, jnp.asarray([seed, t0], jnp.int32),
            ring_in, causal_in, c, n_total, n_forced, B, temperature,
            False, resume)
    if interpret:
        with pltpu.force_tpu_interpret_mode():
            codes, _, ring, causal = _run_sampler_kernel_hbm_stream(
                *args, lc_stream=lc_tm)
    else:
        codes, _, ring, causal = _run_sampler_kernel_hbm_stream(
            *args, lc_stream=lc_tm)

    out_codes = codes[:, n_forced - 1:]
    if c.scalar_input:
        # The autoregressive carry is the decoded amplitude of the last
        # emitted code (what the next segment must feed first).
        from wavenet_tpu.audio import mu_law_decode
        last = mu_law_decode(out_codes[:, -1], c.quantization_channels)
    else:
        last = out_codes[:, -1]
    new_carry = StreamSamplerCarry(ring=ring, causal=causal,
                                   t_abs=t0 + n_total, last=last)
    return out_codes, new_carry
