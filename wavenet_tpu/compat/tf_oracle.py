"""tf.compat.v1 graph-mode re-execution of the reference formulas.

An INDEPENDENT numerical oracle: the reconstructed reference computation
(wavenet/ops.py ≈:28-110 time_to_batch / causal_conv / mu-law,
wavenet/model.py ≈:265-500 _create_causal_layer / _create_dilation_layer /
_create_network, ≈:675-740 loss) rebuilt on TensorFlow's own kernels —
`tf.nn.conv1d` with the transpose trick, `tf.nn.softmax_cross_entropy_with_
logits`, `tf.nn.l2_loss` — and executed in a `tf.compat.v1.Session`.

Round-1 parity tests checked the jnp model against a jnp
`reference_forward` by the same author: circular. This module is the
circuit breaker — if the jnp formulas diverged from what TF1 actually
computes (conv semantics, slice alignment, epsilon placement, mu-law
rounding), these graphs would catch it, because none of the math here
shares code with wavenet_tpu's compute path.

Everything takes NUMPY params (the jnp pytree converted with
``np.asarray``) and returns numpy. TF is imported lazily so the package
never depends on it outside the test suite.
"""

from __future__ import annotations

import numpy as np


def _tf():
    import tensorflow as tf
    return tf


# ---------------------------------------------------------------------------
# ops.py reconstructions (reference wavenet/ops.py ≈:28-110)
# ---------------------------------------------------------------------------

def time_to_batch(value, dilation):
    tf = _tf()
    shape = tf.shape(value)
    pad_elements = dilation - 1 - (shape[1] + dilation - 1) % dilation
    padded = tf.pad(value, [[0, 0], [0, pad_elements], [0, 0]])
    reshaped = tf.reshape(padded, [-1, dilation, shape[2]])
    transposed = tf.transpose(reshaped, perm=[1, 0, 2])
    return tf.reshape(transposed, [shape[0] * dilation, -1, shape[2]])


def batch_to_time(value, dilation):
    tf = _tf()
    shape = tf.shape(value)
    prepared = tf.reshape(value, [dilation, -1, shape[2]])
    transposed = tf.transpose(prepared, perm=[1, 0, 2])
    return tf.reshape(transposed, [tf.math.floordiv(shape[0], dilation),
                                   -1, shape[2]])


def causal_conv(value, filter_, dilation):
    """VALID dilated conv via the transpose trick (ops.py ≈:50-70)."""
    tf = _tf()
    filter_width = int(filter_.shape[0])
    if dilation > 1:
        transformed = time_to_batch(value, dilation)
        conv = tf.nn.conv1d(transformed, filter_, stride=1, padding="VALID")
        restored = batch_to_time(conv, dilation)
    else:
        restored = tf.nn.conv1d(value, filter_, stride=1, padding="VALID")
    out_width = tf.shape(value)[1] - (filter_width - 1) * dilation
    return tf.slice(restored, [0, 0, 0], [-1, out_width, -1])


def mu_law_encode(audio, quantization_channels):
    """ops.py ≈:75-90, including the +0.5 round-to-nearest cast."""
    tf = _tf()
    mu = tf.cast(quantization_channels - 1, tf.float32)
    safe_audio_abs = tf.minimum(tf.abs(audio), 1.0)
    magnitude = tf.math.log1p(mu * safe_audio_abs) / tf.math.log1p(mu)
    signal = tf.sign(audio) * magnitude
    return tf.cast((signal + 1) / 2 * mu + 0.5, tf.int32)


def mu_law_decode(output, quantization_channels):
    """ops.py ≈:95-110."""
    tf = _tf()
    mu = quantization_channels - 1
    signal = 2 * (tf.cast(output, tf.float32) / mu) - 1
    magnitude = (1.0 / mu) * ((1 + mu) ** tf.abs(signal) - 1)
    return tf.sign(signal) * magnitude


# ---------------------------------------------------------------------------
# model.py reconstructions (≈:265-500): VALID convs, shrinking time axis,
# per-layer skip slicing — the reference's graph shape, NOT wavenet_tpu's
# padded/full-length design.
# ---------------------------------------------------------------------------

def _one_hot(tf, codes, quantization_channels):
    return tf.one_hot(codes, depth=quantization_channels, dtype=tf.float32)


def _create_network(tf, p, config, network_input, gc_embedding):
    """Reference ``_create_network`` (model.py ≈:435-500).

    ``p``: dict of numpy parameter arrays in wavenet_tpu's stacked layout
    (converted to per-layer tf constants here). ``network_input``:
    [B, T', C_in] float tensor (one-hot or scalar). Returns raw logits
    [B, T' - receptive_field + 1, Q].
    """
    c = config
    const = tf.constant

    # output_width as the reference computes it (≈:450).
    output_width = tf.shape(network_input)[1] - c.receptive_field + 1

    # Initial causal layer (≈:265).
    current = causal_conv(network_input, const(p["causal_filter"]), 1)

    skip_sum = None
    for i, dilation in enumerate(c.dilations):
        # _create_dilation_layer (≈:280-360).
        conv_filter = causal_conv(current, const(p["filter"][i]), dilation)
        conv_gate = causal_conv(current, const(p["gate"][i]), dilation)

        if gc_embedding is not None:
            # Reference adds a 1x1 conv of the [B, 1, G] embedding, which
            # broadcasts over time (≈:300).
            w_gcf = const(p["gc_filter"][i][None])   # [1, G, D]
            w_gcg = const(p["gc_gate"][i][None])
            conv_filter = conv_filter + tf.nn.conv1d(
                gc_embedding, w_gcf, stride=1, padding="SAME")
            conv_gate = conv_gate + tf.nn.conv1d(
                gc_embedding, w_gcg, stride=1, padding="SAME")

        if c.use_biases:
            conv_filter = tf.add(conv_filter, const(p["filter_bias"][i]))
            conv_gate = tf.add(conv_gate, const(p["gate_bias"][i]))

        out = tf.tanh(conv_filter) * tf.sigmoid(conv_gate)

        # Skip contribution: slice to output_width, then 1x1 (≈:340).
        skip_cut = tf.shape(out)[1] - output_width
        out_skip = tf.slice(out, [0, skip_cut, 0], [-1, -1, -1])
        w_skip = const(p["skip"][i][None])           # [1, D, S]
        skip_contrib = tf.nn.conv1d(out_skip, w_skip, stride=1,
                                    padding="SAME")
        if c.use_biases:
            skip_contrib = skip_contrib + const(p["skip_bias"][i])
        skip_sum = (skip_contrib if skip_sum is None
                    else skip_sum + skip_contrib)

        # Residual: 1x1 dense + input slice-aligned add (≈:330, :355).
        w_dense = const(p["dense"][i][None])         # [1, D, R]
        transformed = tf.nn.conv1d(out, w_dense, stride=1, padding="SAME")
        if c.use_biases:
            transformed = transformed + const(p["dense_bias"][i])
        input_cut = tf.shape(current)[1] - tf.shape(transformed)[1]
        current = tf.slice(current, [0, input_cut, 0],
                           [-1, -1, -1]) + transformed

    # Postprocessing (≈:480-500).
    h = tf.nn.relu(skip_sum)
    h = tf.nn.conv1d(h, const(p["postprocess1"][None]), stride=1,
                     padding="SAME")
    if c.use_biases:
        h = h + const(p["postprocess1_bias"])
    h = tf.nn.relu(h)
    h = tf.nn.conv1d(h, const(p["postprocess2"][None]), stride=1,
                     padding="SAME")
    if c.use_biases:
        h = h + const(p["postprocess2_bias"])
    return h


def _np_params(params):
    return {k: np.asarray(v, np.float32) for k, v in params.items()}


def _embed(tf, p, config, gc_ids):
    if gc_ids is None:
        return None
    table = tf.constant(p["gc_embedding"])
    emb = tf.nn.embedding_lookup(table, tf.constant(gc_ids, tf.int32))
    return tf.reshape(emb, [len(gc_ids), 1, config.gc_channels])


def forward_logits(params, config, codes, gc_ids=None):
    """TF-kernel logits for positions with a full receptive field.

    ``codes``: int [B, T] mu-law classes (or float [B, T] amplitudes in
    scalar-input mode). Returns numpy [B, T - receptive_field + 1, Q] —
    comparable to wavenet_tpu's padded ``forward(...)[:, rf-1:, :]``.
    """
    tf = _tf()
    p = _np_params(params)
    graph = tf.Graph()
    with graph.as_default():
        if config.scalar_input:
            net_in = tf.constant(np.asarray(codes, np.float32)[..., None])
        else:
            net_in = _one_hot(tf, tf.constant(codes, tf.int32),
                              config.quantization_channels)
        gc_embedding = _embed(tf, p, config, gc_ids)
        logits = _create_network(tf, p, config, net_in, gc_embedding)
    with tf.compat.v1.Session(graph=graph) as sess:
        return sess.run(logits)


def loss(params, config, audio, gc_ids=None,
         l2_regularization_strength=None):
    """Reference ``loss`` (model.py ≈:675-740) on TF kernels.

    ``audio``: float waveform [B, T]. Returns (total, ce, l2) floats
    (l2 is None when the strength is falsy), with the reference's exact
    slice alignment: drop the last input sample, targets start at
    receptive_field, softmax CE reduce_mean, tf.nn.l2_loss over non-bias.
    """
    tf = _tf()
    c = config
    p = _np_params(params)
    graph = tf.Graph()
    with graph.as_default():
        input_batch = tf.constant(np.asarray(audio, np.float32))
        encoded_input = mu_law_encode(input_batch,
                                      c.quantization_channels)
        gc_embedding = _embed(tf, p, c, gc_ids)
        encoded = _one_hot(tf, encoded_input, c.quantization_channels)
        if c.scalar_input:
            network_input = tf.reshape(
                input_batch, [int(audio.shape[0]), -1, 1])
        else:
            network_input = encoded

        # Cut off the last sample (≈:700).
        network_input_width = tf.shape(network_input)[1] - 1
        network_input = tf.slice(network_input, [0, 0, 0],
                                 [-1, network_input_width, -1])

        raw_output = _create_network(tf, p, c, network_input, gc_embedding)

        # Targets start at receptive_field (≈:710).
        target_output = tf.slice(
            tf.reshape(encoded,
                       [int(audio.shape[0]), -1, c.quantization_channels]),
            [0, c.receptive_field, 0], [-1, -1, -1])
        target_output = tf.reshape(target_output,
                                   [-1, c.quantization_channels])
        prediction = tf.reshape(raw_output, [-1, c.quantization_channels])
        ce = tf.reduce_mean(
            tf.nn.softmax_cross_entropy_with_logits(
                logits=prediction, labels=target_output))

        if l2_regularization_strength:
            l2 = tf.add_n([tf.nn.l2_loss(tf.constant(v))
                           for k, v in p.items()
                           if not k.endswith("_bias")])
            total = ce + l2_regularization_strength * l2
            fetches = (total, ce, l2)
        else:
            fetches = (ce, ce, tf.constant(0.0))
    with tf.compat.v1.Session(graph=graph) as sess:
        total_v, ce_v, l2_v = sess.run(fetches)
    return (float(total_v), float(ce_v),
            float(l2_v) if l2_regularization_strength else None)


def predict_proba(params, config, window, gc_ids=None):
    """Reference ``predict_proba`` (≈:630): softmax of the LAST network
    output over a trailing window. Returns numpy [B, Q]."""
    tf = _tf()
    logits = forward_logits(params, config, window, gc_ids)
    graph = tf.Graph()
    with graph.as_default():
        probs = tf.nn.softmax(tf.constant(logits[:, -1, :]))
    with tf.compat.v1.Session(graph=graph) as sess:
        return sess.run(probs)
