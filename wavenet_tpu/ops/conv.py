"""Dilated causal convolution, the TPU-native way.

The reference implements dilated conv via the "time_to_batch" transpose trick
(reference: wavenet/ops.py ≈:28-70: pad to a multiple of the dilation,
reshape time into batch, run a dense ``tf.nn.conv1d``, reshape back). XLA on
TPU needs none of that: ``lax.conv_general_dilated`` takes an
``rhs_dilation`` and lowers dilated 1-D conv directly onto the MXU as
shifted matmuls. We keep jnp ports of ``time_to_batch``/``batch_to_time``
purely as parity oracles for the test suite.

Two conv flavors:

* ``causal_conv`` — VALID semantics, output length ``T - (fw-1)*d``.
  Bit-for-bit the reference's ``causal_conv`` contract (ops.py ≈:50-70).
* ``causal_conv_padded`` — left-pads by ``(fw-1)*d`` so output length == T.
  This is what the model uses internally: every layer keeps the full time
  axis (static shapes, no per-layer slice chains), and the loss slices once
  at the end. For output positions ``t >= receptive_field - 1`` the two
  flavors agree exactly (the padded positions never enter those outputs),
  which tests assert.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# NWC input, WIO kernel: [batch, time, channels] x [width, in, out].
_DIMENSION_NUMBERS = ("NWC", "WIO", "NWC")


def causal_conv(value: jnp.ndarray, filter_: jnp.ndarray,
                dilation: int = 1,
                precision=lax.Precision.HIGHEST) -> jnp.ndarray:
    """Dilated causal conv, VALID padding: out[t] = sum_k x[t + k*d] @ W[k].

    Output time length is ``T - (filter_width - 1) * dilation`` — identical
    to the reference's causal_conv (wavenet/ops.py ≈:50-70). fp32
    accumulation via HIGHEST precision for reference parity.
    """
    return lax.conv_general_dilated(
        value, filter_,
        window_strides=(1,),
        padding="VALID",
        rhs_dilation=(dilation,),
        dimension_numbers=_DIMENSION_NUMBERS,
        precision=precision,
        preferred_element_type=jnp.float32 if value.dtype == jnp.float32 else None,
    )


def causal_conv_padded(value: jnp.ndarray, filter_: jnp.ndarray,
                       dilation: int = 1,
                       precision=lax.Precision.HIGHEST) -> jnp.ndarray:
    """Dilated causal conv with left zero-padding: output length == input length.

    out[t] = sum_k x[t - (fw-1-k)*d] @ W[k], with x[<0] = 0.

    Implemented as filter-tap-many SHIFTED MATMULS rather than an XLA conv
    op: for filter_width=2 (the WaveNet case) that is exactly two [B*T, C]
    x [C, O] matmuls on the MXU — the same decomposition the Pallas kernel
    uses. Besides being the natural MXU mapping, this sidesteps a TPU XLA
    crash observed in the space_to_batch_converter pass when
    differentiating ``conv_general_dilated`` with rhs_dilation
    (Check failed: PropagateOnBackpropFilterConv — see SURVEY hard-parts;
    pad/slice + einsum has clean, fusion-friendly autodiff).
    """
    fw = filter_.shape[0]
    T = value.shape[1]
    acc_t = jnp.float32 if value.dtype == jnp.float32 else value.dtype
    out = jnp.einsum("btc,co->bto", value, filter_[fw - 1],
                     precision=precision).astype(acc_t)
    for k in range(fw - 1):
        shift = (fw - 1 - k) * dilation
        shifted = jnp.pad(value, ((0, 0), (shift, 0), (0, 0)))[:, :T, :]
        out = out + jnp.einsum("btc,co->bto", shifted, filter_[k],
                               precision=precision)
    return out


def conv1x1(value: jnp.ndarray, filter_: jnp.ndarray,
            precision=lax.Precision.HIGHEST) -> jnp.ndarray:
    """1x1 conv == per-timestep matmul. filter_ is [1, in, out] or [in, out]."""
    w = filter_[0] if filter_.ndim == 3 else filter_
    return jnp.einsum("btc,co->bto", value, w, precision=precision)


# ---------------------------------------------------------------------------
# Parity oracles: jnp ports of the reference's transpose trick
# (wavenet/ops.py ≈:28-48). Not used by the model — tests only.
# ---------------------------------------------------------------------------

def time_to_batch(value: jnp.ndarray, dilation: int) -> jnp.ndarray:
    """[b, t, c] -> [b*dilation, ceil(t/d), c], time strided into batch."""
    b, t, c = value.shape
    pad_elements = dilation - 1 - (t + dilation - 1) % dilation
    padded = jnp.pad(value, [[0, 0], [0, pad_elements], [0, 0]])
    reshaped = padded.reshape(-1, dilation, c)
    transposed = jnp.transpose(reshaped, [1, 0, 2])
    return transposed.reshape(b * dilation, -1, c)


def batch_to_time(value: jnp.ndarray, dilation: int) -> jnp.ndarray:
    """Inverse of time_to_batch."""
    bd, t, c = value.shape
    b = bd // dilation
    prepared = value.reshape(dilation, -1, c)
    transposed = jnp.transpose(prepared, [1, 0, 2])
    return transposed.reshape(b, -1, c)


def causal_conv_reference(value: jnp.ndarray, filter_: jnp.ndarray,
                          dilation: int = 1) -> jnp.ndarray:
    """The reference algorithm verbatim in jnp (oracle for causal_conv)."""
    fw = filter_.shape[0]
    if dilation > 1:
        transformed = time_to_batch(value, dilation)
        conv = lax.conv_general_dilated(
            transformed, filter_, (1,), "VALID",
            dimension_numbers=_DIMENSION_NUMBERS,
            precision=lax.Precision.HIGHEST)
        restored = batch_to_time(conv, dilation)
    else:
        restored = lax.conv_general_dilated(
            value, filter_, (1,), "VALID",
            dimension_numbers=_DIMENSION_NUMBERS,
            precision=lax.Precision.HIGHEST)
    out_width = value.shape[1] - (fw - 1) * dilation
    return restored[:, :out_width, :]
