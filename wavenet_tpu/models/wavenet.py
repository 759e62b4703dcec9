"""Functional WaveNet: parameter init, forward pass, loss.

This is a ground-up TPU-native re-design of the reference's ``WaveNetModel``
(reference: wavenet/model.py ≈:70-740). Differences in HOW, parity in WHAT:

* Parameters are a plain pytree (dict of stacked arrays), not named TF
  variables. All per-layer weights are stacked along a leading layer axis
  ``[L, ...]`` — one leaf per weight kind. That keeps the pytree small,
  makes tensor-parallel PartitionSpecs one-liners, and lets a future
  scan-over-layers / remat policy operate on a single array.
* Every layer keeps the FULL time axis: dilated convs are causally
  left-padded (``ops.conv.causal_conv_padded``) instead of VALID-and-slice.
  For output positions ``t >= receptive_field - 1`` this is exactly equal to
  the reference's shrinking VALID chain (tests assert it), and it gives XLA
  static, layer-invariant shapes to fuse.
* The loss slices once at the end (predictions ``[RF-1 : T-1]`` vs targets
  ``[RF:]``), reproducing the reference's slice alignment
  (model.py ≈:700-740: drop last input sample; targets start at
  receptive_field).

Init parity quirks preserved from the reference:
* conv weights: Glorot/Xavier *uniform* with conv fan-in/out
  (= tf.contrib.layers.xavier_initializer on [fw, in, out] shapes),
* biases: zeros (model.py ≈:25),
* GC embedding: IDENTITY matrix when gc_cardinality == gc_channels — i.e.
  one-hot semantics — else Xavier (model.py ``create_embedding_table`` ≈:14).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from wavenet_tpu.audio import mu_law_encode
from wavenet_tpu.models.config import WaveNetConfig
from wavenet_tpu.ops.conv import causal_conv_padded, conv1x1

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------

def _xavier_uniform(key, shape, dtype=jnp.float32):
    """Glorot uniform with TF conv fan semantics: fan = prod(spatial)*channels."""
    if len(shape) == 2:
        fan_in, fan_out = shape
    elif len(shape) == 3:  # [filter_width, in, out]
        fan_in = shape[0] * shape[1]
        fan_out = shape[0] * shape[2]
    elif len(shape) == 4:  # [L, filter_width, in, out] — stacked layers:
        # each layer must be initialized as an independent [fw, in, out] draw.
        fan_in = shape[1] * shape[2]
        fan_out = shape[1] * shape[3]
    else:
        raise ValueError(f"unsupported shape {shape}")
    limit = (6.0 / (fan_in + fan_out)) ** 0.5
    return jax.random.uniform(key, shape, dtype, minval=-limit, maxval=limit)


def create_embedding_table(key, cardinality: int, channels: int,
                           dtype=jnp.float32) -> jnp.ndarray:
    """Identity when square (one-hot semantics), else Xavier.

    Parity with reference ``create_embedding_table`` (model.py ≈:14-24).
    """
    if cardinality == channels:
        return jnp.eye(cardinality, dtype=dtype)
    return _xavier_uniform(key, (cardinality, channels), dtype)


def init_params(key: jax.Array, config: WaveNetConfig) -> Params:
    """Build the parameter pytree (reference ``_create_variables`` ≈:130-260).

    Layout (L = num layers, fw = filter_width, R/D/S/Q = residual / dilation
    / skip / quantization channels, G = gc_channels):

        causal_filter             [ifw|fw, 1|Q, R]
        filter, gate              [L, fw, R, D]
        dense                     [L, D, R]
        skip                      [L, D, S]
        gc_filter, gc_gate        [L, G, D]          (if GC)
        lc_filter, lc_gate        [L, C_lc, D]       (if LC)
        filter_bias, gate_bias    [L, D]             (if use_biases)
        dense_bias                [L, R]             (if use_biases)
        skip_bias                 [L, S]             (if use_biases)
        postprocess1              [S, S]
        postprocess2              [S, Q]
        postprocess1_bias/2_bias  [S] / [Q]          (if use_biases)
        gc_embedding              [cardinality, G]   (if GC)
    """
    c = config
    L = c.num_layers
    fw, R, D, S, Q = (c.filter_width, c.residual_channels,
                      c.dilation_channels, c.skip_channels,
                      c.quantization_channels)
    keys = iter(jax.random.split(key, 16))
    params: Params = {}

    if c.scalar_input:
        params["causal_filter"] = _xavier_uniform(
            next(keys), (c.initial_filter_width, 1, R))
    else:
        params["causal_filter"] = _xavier_uniform(next(keys), (fw, Q, R))

    params["filter"] = _xavier_uniform(next(keys), (L, fw, R, D))
    params["gate"] = _xavier_uniform(next(keys), (L, fw, R, D))
    # 1x1 convs stored as plain matrices (their filter_width-1 axis dropped);
    # xavier fans match the reference's [1, in, out] conv shapes.
    params["dense"] = _xavier_uniform(next(keys), (L, 1, D, R))[:, 0]
    params["skip"] = _xavier_uniform(next(keys), (L, 1, D, S))[:, 0]
    params["postprocess1"] = _xavier_uniform(next(keys), (1, S, S))[0]
    params["postprocess2"] = _xavier_uniform(next(keys), (1, S, Q))[0]

    if c.gc_enabled:
        G = c.gc_channels
        params["gc_embedding"] = create_embedding_table(
            next(keys), c.gc_cardinality, G)
        params["gc_filter"] = _xavier_uniform(next(keys), (L, 1, G, D))[:, 0]
        params["gc_gate"] = _xavier_uniform(next(keys), (L, 1, G, D))[:, 0]

    if c.lc_enabled:
        # Local conditioning (new capability — WaveNet paper §2.5, no
        # reference counterpart): per-layer 1x1 projections of the
        # upsampled feature stream into the filter/gate pre-activations,
        # same shape family as the GC projections.
        Cl = c.lc_channels
        params["lc_filter"] = _xavier_uniform(next(keys), (L, 1, Cl, D))[:, 0]
        params["lc_gate"] = _xavier_uniform(next(keys), (L, 1, Cl, D))[:, 0]
        if c.lc_refine_width:
            # Learned upsampling refinement (paper §2.5 learned mapping,
            # as repeat + separable conv): identity init — depthwise
            # delta at the center tap, identity pointwise mix, zero bias
            # — so training starts exactly at the non-learned behavior.
            w = c.lc_refine_width
            depth = jnp.zeros((Cl, w))
            params["lc_up_depth"] = depth.at[:, w // 2].set(1.0)
            params["lc_up_point"] = jnp.eye(Cl)
            params["lc_up_bias"] = jnp.zeros((Cl,))

    if c.use_biases:
        params["filter_bias"] = jnp.zeros((L, D))
        params["gate_bias"] = jnp.zeros((L, D))
        params["dense_bias"] = jnp.zeros((L, R))
        params["skip_bias"] = jnp.zeros((L, S))
        params["postprocess1_bias"] = jnp.zeros((S,))
        params["postprocess2_bias"] = jnp.zeros((Q,))

    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def one_hot(encoded: jnp.ndarray, quantization_channels: int) -> jnp.ndarray:
    """int [B, T] -> float32 one-hot [B, T, Q] (reference ``_one_hot`` ≈:580)."""
    return jax.nn.one_hot(encoded, quantization_channels, dtype=jnp.float32)


def embed_gc(params: Params, config: WaveNetConfig,
             gc_ids: jnp.ndarray) -> jnp.ndarray:
    """Speaker ids [B] -> embeddings [B, G].

    Reference ``_embed_gc`` (model.py ≈:595-625) uses
    ``tf.nn.embedding_lookup``; on TPU a one-hot matmul is the
    shard-friendly form — it rides the MXU and shards over the model axis
    with no gather.
    """
    oh = jax.nn.one_hot(gc_ids, config.gc_cardinality, dtype=jnp.float32)
    return oh @ params["gc_embedding"]


def refine_lc(params: Params, config: WaveNetConfig,
              lc: jnp.ndarray) -> jnp.ndarray:
    """Learned LC upsampling refinement [B, T, C] -> [B, T, C].

    The WaveNet paper's §2.5 learned mapping (transposed-conv
    upsampling), expressed TPU-first as repeat-upsample (done by the
    data pipeline) + a learned SEPARABLE conv over the sample-rate
    stream: depthwise width ``lc_refine_width`` then a pointwise C x C
    mix — the resize+conv equivalent of a transposed conv (same
    function class for width >= hop, none of its checkerboard
    artifacts), and the incremental samplers consume the refined stream
    with zero changes because refinement happens once, ahead of
    decoding. Identity at init (delta depthwise tap, identity mix).

    Applied automatically by the stream-complete entry points
    (``loss_fn``, ``predict_proba``, ``score.log_likelihood``,
    ``sample.generate``, ``generate_pallas``); the low-level resumable
    primitives take already-refined streams — chunked callers (the
    --save_every CLI) refine the full stream once before slicing so
    segment boundaries see full context.
    """
    c = config
    w = c.lc_refine_width
    C = c.lc_channels
    x = jnp.moveaxis(lc.astype(jnp.float32), 1, 2)          # [B, C, T]
    depth = params["lc_up_depth"].astype(jnp.float32)[:, None, :]
    y = lax.conv_general_dilated(
        x, depth, window_strides=(1,), padding=[(w // 2, w // 2)],
        feature_group_count=C,
        dimension_numbers=("NCH", "OIH", "NCH"))
    y = jnp.moveaxis(y, 1, 2)                               # [B, T, C]
    return (y @ params["lc_up_point"].astype(jnp.float32)
            + params["lc_up_bias"].astype(jnp.float32))


def maybe_refine_lc(params: Params, config: WaveNetConfig, lc):
    """``refine_lc`` when enabled and a stream is present, else pass-through."""
    if lc is None or not config.lc_refine_width:
        return lc
    return refine_lc(params, config, lc)


def _maybe_cast(x, config: WaveNetConfig):
    if config.compute_dtype == "bfloat16":
        return x.astype(jnp.bfloat16)
    return x


@jax.custom_vjp
def _embed_rows(table, codes):
    """Row-gather with a matmul backward.

    ``jnp.take``'s native VJP is a scatter-add, which profiled at ~2.1
    ms/step on v5-lite (fusion.3+fusion.4, tools/r2_profile.py) — 3x the
    skip-head matmul. The gradient is mathematically
    one_hot(codes)^T @ dout: an MXU contraction, ~20x faster. Forward
    numerics are the plain gather, bit-identical.
    """
    return jnp.take(table, codes, axis=0)


def _embed_rows_fwd(table, codes):
    return jnp.take(table, codes, axis=0), (codes, table.shape[0])


def _embed_rows_bwd(res, dout):
    codes, q = res
    oh = jax.nn.one_hot(codes, q, dtype=dout.dtype)
    dtable = jnp.einsum("btq,btr->qr", oh, dout,
                        precision=lax.Precision.HIGHEST)
    return dtable, None


_embed_rows.defvjp(_embed_rows_fwd, _embed_rows_bwd)


def forward(params: Params, config: WaveNetConfig,
            network_input: jnp.ndarray,
            gc_embedding: Optional[jnp.ndarray] = None,
            head_from: int = 0,
            collect_layer_inputs: Optional[Tuple[int, ...]] = None,
            lc: Optional[jnp.ndarray] = None):
    """Full-length forward pass: [B, T, C_in] -> logits [B, T, Q].

    ``network_input`` is one-hot mu-law floats (or [B, T, 1] raw amplitude
    in scalar-input mode). ``gc_embedding`` is [B, G] or None. Output
    position t is the model's prediction for input position t+1; only
    positions t >= receptive_field - 1 have a full receptive field (and are
    exactly equal to the reference's VALID-conv outputs).

    ``lc`` (local conditioning, new capability): [B, T, C_lc] feature
    stream, same length as the input. Alignment convention: ``lc[:, t]``
    conditions OUTPUT position t — i.e. the prediction of timeline
    sample t+1 (the paper's p(x_t | x_<t, h_t) with h upsampled to
    sample rate; see wavenet_tpu.lc for upsampling). The incremental
    samplers use the identical convention, so fast ≡ slow holds with LC.

    Mirrors reference ``_create_network`` (model.py ≈:435-500):
    causal layer -> L gated dilation layers accumulating skips ->
    relu . 1x1 . relu . 1x1 -> logits.
    """
    c = config
    compute_dtype = jnp.bfloat16 if c.compute_dtype == "bfloat16" else jnp.float32
    precision = (lax.Precision.DEFAULT if c.compute_dtype == "bfloat16"
                 else lax.Precision.HIGHEST)

    x = _maybe_cast(network_input, c)
    causal_w = _maybe_cast(params["causal_filter"], c)
    # Initial causal layer (reference ``_create_causal_layer`` ≈:265).
    current = causal_conv_padded(x, causal_w, dilation=1, precision=precision)
    return _dilated_stack(params, c, current, gc_embedding, compute_dtype,
                          precision, head_from, collect_layer_inputs, lc)


def _dilated_stack(params: Params, c: WaveNetConfig, current: jnp.ndarray,
                   gc_embedding: Optional[jnp.ndarray], compute_dtype,
                   precision, head_from: int = 0,
                   collect_layer_inputs: Optional[Tuple[int, ...]] = None,
                   lc: Optional[jnp.ndarray] = None):
    """Gated dilation layers + skip sum + postprocessing head.

    Layer math parity with reference ``_create_dilation_layer``
    ≈:280-360, with one bandwidth-driven re-association: the per-layer
    skip projections are DEFERRED. ``head_from`` drops output positions
    before that index from the skip/postprocess head (the stack itself
    always runs full-length for causality): the training loss discards
    the first receptive_field-1 positions anyway, and ~85% of the
    network's FLOPs are in the head, so slicing BEFORE the head instead
    of after the logits removes that fraction of wasted head compute
    with bit-identical results on the kept positions.

    The reference (and a naive port)
    accumulates ``skip_sum [B,T,S]`` every layer — at S=512 that is a
    full read+write of the largest tensor in the network x L layers, and
    it dominates HBM traffic. Since

        sum_l(out_l @ Ws_l) == concat_l(out_l) @ concat_rows(Ws_l),

    we keep each layer's small gate output ``out_l [B,T,D]`` and apply
    ONE [B·T, L·D] x [L·D, S] matmul at the end — ~L x less skip-path
    traffic and a K dimension that actually fills the MXU. (A hand-fused
    [x_shift|x] @ [Wf|Wg] concat variant was measured SLOWER than XLA's
    own schedule, so taps/filter/gate stay as separate matmuls.)
    """
    use_biases = c.use_biases
    L, D, S = c.num_layers, c.dilation_channels, c.skip_channels
    gc = None
    if gc_embedding is not None:
        gc = _maybe_cast(gc_embedding, c)  # [B, G]
    lc_c = None
    if lc is not None:
        if lc.shape[1] != current.shape[1]:
            raise ValueError(
                f"lc length {lc.shape[1]} must match the input length "
                f"{current.shape[1]} (one conditioning vector per input "
                "position)")
        lc_c = _maybe_cast(lc, c)          # [B, T, C_lc]

    # The fused-stack kernels don't take a per-timestep conditioning
    # stream; LC routes through the XLA path (whose per-layer einsum adds
    # fuse into the conv epilogues anyway).
    if c.use_pallas_stack and collect_layer_inputs is None and lc_c is None:
        if c.filter_width != 2:
            raise NotImplementedError(
                "use_pallas_stack requires filter_width=2")
        return _dilated_stack_pallas(params, c, current, gc_embedding,
                                     compute_dtype, precision, head_from)

    def layer_fn(current, layer_params, dilation):
        # Gated unit: out = tanh(Wf*x [+gc+b]) . sigmoid(Wg*x [+gc+b])
        w_f = _maybe_cast(layer_params["filter"], c)
        w_g = _maybe_cast(layer_params["gate"], c)
        if c.merged_filter_gate:
            # One conv with [fw, R, 2D] weights instead of two [fw, R, D]
            # convs: halves the conv count and doubles the matmul N dim
            # (identical numerics — the filter|gate split is just columns).
            w_cat = jnp.concatenate([w_f, w_g], axis=-1)
            conv_fg = causal_conv_padded(current, w_cat, dilation, precision)
            D_ = w_f.shape[-1]
            conv_filter = conv_fg[..., :D_]
            conv_gate = conv_fg[..., D_:]
        else:
            conv_filter = causal_conv_padded(current, w_f, dilation,
                                             precision)
            conv_gate = causal_conv_padded(current, w_g, dilation, precision)

        if gc is not None:
            gcf = (gc @ _maybe_cast(layer_params["gc_filter"], c))[:, None, :]
            gcg = (gc @ _maybe_cast(layer_params["gc_gate"], c))[:, None, :]
            conv_filter = conv_filter + gcf
            conv_gate = conv_gate + gcg

        if lc_c is not None:
            conv_filter = conv_filter + jnp.einsum(
                "btc,cd->btd", lc_c,
                _maybe_cast(layer_params["lc_filter"], c),
                precision=precision)
            conv_gate = conv_gate + jnp.einsum(
                "btc,cd->btd", lc_c,
                _maybe_cast(layer_params["lc_gate"], c),
                precision=precision)

        if use_biases:
            conv_filter = conv_filter + _maybe_cast(layer_params["filter_bias"], c)
            conv_gate = conv_gate + _maybe_cast(layer_params["gate_bias"], c)

        out = jnp.tanh(conv_filter) * jax.nn.sigmoid(conv_gate)

        transformed = conv1x1(out, _maybe_cast(layer_params["dense"], c),
                              precision)
        if use_biases:
            transformed = transformed + _maybe_cast(layer_params["dense_bias"], c)
        return current + transformed, out

    if c.remat:
        layer_fn = jax.checkpoint(layer_fn, static_argnums=(2,))

    layer_keys = ["filter", "gate", "dense"]
    if use_biases:
        layer_keys += ["filter_bias", "gate_bias", "dense_bias"]
    if gc is not None:
        layer_keys += ["gc_filter", "gc_gate"]
    if lc_c is not None:
        layer_keys += ["lc_filter", "lc_gate"]

    gate_outs = []
    layer_inputs = []
    for i, dilation in enumerate(c.dilations):
        if collect_layer_inputs is not None:
            # Sampler prefill (kernels/sampler.py:prefill_carry): the
            # ring-buffer state after teacher-forcing IS the residual
            # stream entering each layer — keep the last
            # collect_layer_inputs[i] positions, in f32.
            keep = collect_layer_inputs[i]
            layer_inputs.append(current[:, -keep:].astype(jnp.float32))
        layer_params = {k: params[k][i] for k in layer_keys}
        current, out = layer_fn(current, layer_params, dilation)
        gate_outs.append(out)
    if collect_layer_inputs is not None:
        return layer_inputs

    # Deferred skip head: one big matmul over all layers' gate outputs.
    all_outs = jnp.concatenate(gate_outs, axis=-1)          # [B, T, L*D]
    if head_from:
        all_outs = all_outs[:, head_from:]
    w_skip_all = _maybe_cast(
        params["skip"].reshape(L * D, S), c)                # [L*D, S]
    skip_sum = jnp.einsum("btc,co->bto", all_outs, w_skip_all,
                          precision=precision)
    if use_biases:
        skip_sum = skip_sum + _maybe_cast(
            jnp.sum(params["skip_bias"], axis=0), c)

    # Postprocessing head (reference ≈:480-500).
    h = jax.nn.relu(skip_sum)
    h = conv1x1(h, _maybe_cast(params["postprocess1"], c), precision)
    if use_biases:
        h = h + _maybe_cast(params["postprocess1_bias"], c)
    h = jax.nn.relu(h)
    h = conv1x1(h, _maybe_cast(params["postprocess2"], c), precision)
    if use_biases:
        h = h + _maybe_cast(params["postprocess2_bias"], c)
    return h.astype(jnp.float32)


def forward_codes(params: Params, config: WaveNetConfig,
                  codes: jnp.ndarray,
                  gc_embedding: Optional[jnp.ndarray] = None,
                  head_from: int = 0,
                  collect_layer_inputs: Optional[Tuple[int, ...]] = None,
                  lc: Optional[jnp.ndarray] = None):
    """Forward pass from integer mu-law codes [B, T] (no one-hot tensor).

    The initial causal conv applied to one-hot input is algebraically a
    row-gather of the filter: out[t] = W[0][code[t-1]] + W[1][code[t]]
    (zero contribution for t-1 < 0). Skipping the [B, T, Q] one-hot saves
    ~Q x the input bandwidth — the dominant HBM traffic at batch size > 1.
    Identical numerics to forward(one_hot(codes)) (tested).
    """
    c = config
    if c.scalar_input:
        raise ValueError("forward_codes is the mu-law path; scalar input "
                         "uses forward() on raw amplitudes.")
    compute_dtype = jnp.bfloat16 if c.compute_dtype == "bfloat16" else jnp.float32
    precision = (lax.Precision.DEFAULT if c.compute_dtype == "bfloat16"
                 else lax.Precision.HIGHEST)

    w = params["causal_filter"]  # [fw, Q, R]
    fw = w.shape[0]
    T = codes.shape[1]
    current = _embed_rows(w[fw - 1], codes)  # [B, T, R]
    for k in range(fw - 1):
        shift = fw - 1 - k
        tap = _embed_rows(w[k], codes[:, :T - shift])
        current = current.at[:, shift:, :].add(tap)
    current = current.astype(compute_dtype)
    return _dilated_stack(params, c, current, gc_embedding, compute_dtype,
                          precision, head_from, collect_layer_inputs, lc)


def _dilated_stack_pallas(params: Params, c: WaveNetConfig,
                          current: jnp.ndarray,
                          gc_embedding: Optional[jnp.ndarray],
                          compute_dtype, precision,
                          head_from: int = 0) -> jnp.ndarray:
    """Dilated stack via the whole-stack fused kernel (+ deferred skip).

    One pallas_call runs all L layers with a recompute-free custom VJP;
    the deferred skip head and postprocessing stay in XLA. Version 3
    (kernels/fused_stack3.py, default) is the documented frontier;
    versions 1/2 are retired negative results kept importable under
    wavenet_tpu/experiments/ (see that package's docstring).
    """
    B = current.shape[0]
    L, D, S = c.num_layers, c.dilation_channels, c.skip_channels
    kernel_dtype = (jnp.bfloat16 if c.compute_dtype == "bfloat16"
                    else jnp.float32)

    if c.pallas_stack_version == 3:
        from wavenet_tpu.kernels.fused_stack3 import (
            fused_stack3, pack_stack_weights, supports)
        if not supports(c):
            raise NotImplementedError(
                "use_pallas_stack requires filter_width=2 and max "
                "dilation <= the kernel tile size")
        from wavenet_tpu.kernels.fused_stack3 import (
            _T_TILE_BWD, _T_TILE_FWD)
        w_fg, wd, add, bd = pack_stack_weights(params, c, gc_embedding, B)
        # custom_vjp functions take positional args only.
        _, all_outs = fused_stack3(
            current.astype(jnp.float32), w_fg, wd, add, bd, c,
            kernel_dtype, _T_TILE_FWD, _T_TILE_BWD,
            gc_embedding is None, False)
    elif c.pallas_stack_version == 2:
        from wavenet_tpu.experiments.fused_stack2 import (
            fused_stack2, pack_stack_weights, supports)
        if not supports(c):
            raise NotImplementedError(
                "use_pallas_stack requires filter_width=2 and max "
                "dilation <= the kernel tile size")
        w_fg, wd, add, bd = pack_stack_weights(params, c, gc_embedding, B)
        _, all_outs = fused_stack2(current.astype(jnp.float32), w_fg, wd,
                                   add, bd, c, kernel_dtype)
    else:
        from wavenet_tpu.experiments.fused_stack import (
            fused_stack, pack_stack_weights, supports)
        if not supports(c):
            raise NotImplementedError(
                "use_pallas_stack requires filter_width=2 and max "
                "dilation <= the kernel tile size")
        w_fg, wd, add, bd = pack_stack_weights(params, c, gc_embedding, B)
        _, all_outs = fused_stack(current.astype(jnp.float32), w_fg, wd,
                                  add, bd, c, kernel_dtype)

    # v3 emits z padded to 128-lane records ([..., :L*D] real, tail
    # zero); zero-pad the skip weight rows to match — the pad rows add
    # nothing to the logits and route zero cotangent back to the pads.
    if head_from:
        all_outs = all_outs[:, head_from:]
    w_skip_all = params["skip"].reshape(L * D, S)
    K = all_outs.shape[-1]
    if K != L * D:
        w_skip_all = jnp.pad(w_skip_all, ((0, K - L * D), (0, 0)))
    w_skip_all = _maybe_cast(w_skip_all, c)
    skip_sum = jnp.einsum("btc,co->bto", _maybe_cast(all_outs, c),
                          w_skip_all, precision=precision)
    if c.use_biases:
        skip_sum = skip_sum + _maybe_cast(
            jnp.sum(params["skip_bias"], axis=0), c)

    h = jax.nn.relu(skip_sum)
    h = conv1x1(h, _maybe_cast(params["postprocess1"], c), precision)
    if c.use_biases:
        h = h + _maybe_cast(params["postprocess1_bias"], c)
    h = jax.nn.relu(h)
    h = conv1x1(h, _maybe_cast(params["postprocess2"], c), precision)
    if c.use_biases:
        h = h + _maybe_cast(params["postprocess2_bias"], c)
    return h.astype(jnp.float32)


def predict_proba(params: Params, config: WaveNetConfig,
                  waveform: jnp.ndarray,
                  gc_ids: Optional[jnp.ndarray] = None,
                  lc: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Probabilities of the NEXT sample given an encoded window.

    ``waveform``: int mu-law classes [B, T] (or float amplitudes [B, T] in
    scalar-input mode). Returns softmax probs [B, Q] for sample T (parity
    with reference ``predict_proba`` ≈:630, which runs the full network on
    the window and softmaxes the last output position). ``lc``: [B, T,
    C_lc] — lc[:, t] conditions the prediction of position t+1, so the
    returned distribution is conditioned on lc[:, -1].
    """
    gc_emb = embed_gc(params, config, gc_ids) if gc_ids is not None else None
    lc = maybe_refine_lc(params, config, lc)
    if config.scalar_input:
        net_in = waveform[..., None].astype(jnp.float32)
        logits = forward(params, config, net_in, gc_emb, lc=lc)
    else:
        logits = forward_codes(params, config, waveform, gc_emb, lc=lc)
    return jax.nn.softmax(logits[:, -1, :], axis=-1)


# ---------------------------------------------------------------------------
# Loss
# ---------------------------------------------------------------------------

def loss_fn(params: Params, config: WaveNetConfig,
            audio_batch: jnp.ndarray,
            gc_ids: Optional[jnp.ndarray] = None,
            l2_regularization_strength: Optional[float] = None,
            lc: Optional[jnp.ndarray] = None):
    """Teacher-forced cross-entropy (reference ``loss`` model.py ≈:675-740).

    ``audio_batch``: float waveform [B, T] (already left-padded with
    receptive_field zeros by the data pipeline, like the reference's
    reader). Slice alignment parity:

        network input = featurized(audio)[:, :T-1]
        predictions   = outputs[:, RF-1 : ]          (length T - RF)
        targets       = mu_law_encode(audio)[:, RF:] (length T - RF)

    Returns (total_loss, aux_dict) where aux has 'ce_loss' and 'l2_loss'.
    L2 excludes bias terms, as in the reference (≈:725).
    """
    c = config
    rf = c.receptive_field
    if audio_batch.ndim == 3:  # tolerate the reference's [B, T, 1] layout
        audio_batch = audio_batch[..., 0]

    encoded = mu_law_encode(audio_batch, c.quantization_channels)  # [B, T]
    gc_emb = embed_gc(params, c, gc_ids) if gc_ids is not None else None
    # LC stream [B, T, C_lc] rides the audio timeline; lc[:, t] conditions
    # the prediction OF sample t, so the forward (whose output position j
    # predicts input position j+1) receives lc[:, 1:] — same length as
    # the [:, :-1] input slice.
    lc_in = None
    if lc is not None:
        if lc.shape[:2] != audio_batch.shape[:2]:
            raise ValueError(
                f"lc shape {lc.shape} must align with the audio batch "
                f"{audio_batch.shape} (one conditioning vector per sample)")
        # Learned upsampling refinement over the FULL timeline, then the
        # alignment slice — gradients flow into the refiner params.
        lc_in = maybe_refine_lc(params, c, lc)[:, 1:]
    # head_from = rf-1: only the positions the loss keeps go through the
    # skip/postprocess head (identical numerics, ~16% fewer head FLOPs
    # at the paper config's rf/sample_size ratio).
    if c.scalar_input:
        network_input = audio_batch[:, :-1, None].astype(jnp.float32)
        raw_output = forward(params, c, network_input, gc_emb,
                             head_from=rf - 1, lc=lc_in)
    else:
        # Integer-code path: the one-hot x conv collapses to a weight-row
        # gather (forward_codes) — no [B, T, Q] input tensor.
        raw_output = forward_codes(params, c, encoded[:, :-1], gc_emb,
                                   head_from=rf - 1, lc=lc_in)

    prediction = raw_output
    target = encoded[:, rf:]

    # softmax_cross_entropy_with_logits, reduce_mean (reference ≈:720).
    # The target pick is a one-hot contraction, not take_along_axis:
    # the gather lowers to ~2 ms/step on TPU (profiled: fusion.2,
    # tools/r2_profile.py) while the select-and-reduce fuses to ~nothing.
    logp = jax.nn.log_softmax(prediction, axis=-1)
    oh = jax.nn.one_hot(target, c.quantization_channels, dtype=logp.dtype)
    ce = -jnp.mean(jnp.sum(logp * oh, axis=-1))

    aux = {"ce_loss": ce}
    total = ce
    if l2_regularization_strength:
        # tf.nn.l2_loss(v) = sum(v**2) / 2 — keep the same scale so a given
        # --l2_regularization_strength matches the reference's penalty.
        l2 = sum(0.5 * jnp.sum(jnp.square(v)) for k, v in params.items()
                 if not k.endswith("_bias"))
        aux["l2_loss"] = l2
        total = ce + l2_regularization_strength * l2
    aux["total_loss"] = total
    return total, aux
