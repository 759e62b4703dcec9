"""Pallas TPU kernels: fused gated dilated-conv layer (training path).

One WaveNet layer is (reference wavenet/model.py ``_create_dilation_layer``
≈:280-360):

    f, g = conv_d(x, Wf), conv_d(x, Wg)        # fw=2 dilated causal convs
    z    = tanh(f + af) * sigmoid(g + ag)      # a* = bias + gc (const/time)
    y    = x + z @ Wd + bd                     # residual update
    (z also feeds the deferred skip head outside this op)

Under XLA this is many HBM round-trips of the [B,T,R] activation per
layer; channel counts (R=D=32..64) sit far below the MXU tile so every
matmul is bandwidth-bound. The fused kernel computes the whole layer in
VMEM per time tile: the activation and its d-shifted copy are each read
once, and only y and z are written.

The shifted tap x[t-d] is materialized OUTSIDE the kernel (one cheap XLA
pad+slice copy) because Pallas block index maps work in block units —
overlapping halo windows are not expressible, and an extra [B,T,R] read
is still ~3x less traffic than the unfused chain.

Backward is a custom VJP, flash-style: nothing but the INPUTS are saved;
f, g, z are recomputed in-kernel. The tap-0 input gradient (da @ W0^T
lands at t-d) is emitted as its own tensor and shift-added outside —
weight/bias/gc gradients accumulate into revisited output blocks across
the sequential TPU grid (zeroed on the first program).

Used by the model when ``config.use_pallas_stack`` (filter_width=2 only);
parity with the jnp path is pinned by tests in interpret mode and on HW.

STATUS — EXPERIMENTAL, currently SLOWER than the XLA path. Measured on
one v5-lite chip (paper config, b8/16k): 110 audio-s/s (bf16) vs 405 for
the XLA-scheduled jnp stack. Per-layer pallas_call launch overhead (60
calls/step incl. backward) and [Tt, 32]x[32, 64] matmuls below the MXU
tile dominate; XLA's own fusion+layout choices win at these channel
counts. Beating it needs multi-layer fusion with DMA'd halos and a
lane-packed channel layout — tracked for a later round. The kernel stays
because (a) its correctness machinery (flash-style custom VJP, revisited-
block gradient accumulation) is the foundation for that work and (b) it
is fully parity-tested.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wavenet_tpu.kernels.mxu import mxu_dot, mxu_dot_tA, mxu_dot_tB


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


_T_TILE = 2048


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _fwd_kernel(cur_ref, past_ref, w_ref, wd_ref, add_ref, bd_ref,
                y_ref, z_ref, *, D: int):
    b = pl.program_id(0)
    cur = cur_ref[0]                      # [Tt, R]
    past = past_ref[0]
    fg = (mxu_dot(cur, w_ref[1])
          + mxu_dot(past, w_ref[0])
          + add_ref[pl.ds(b, 1), :])      # [Tt, 2D]
    z = jnp.tanh(fg[:, :D]) * jax.nn.sigmoid(fg[:, D:])
    y_ref[0] = (cur.astype(jnp.float32)
                + mxu_dot(z.astype(wd_ref.dtype), wd_ref[...]) + bd_ref[0])
    z_ref[0] = z


def _bwd_kernel(cur_ref, past_ref, w_ref, wd_ref, add_ref,
                dy_ref, dz_extra_ref,
                dx_ref, dpast_ref, dw_ref, dwd_ref, dadd_ref, dbd_ref,
                *, D: int):
    b = pl.program_id(0)
    jt = pl.program_id(1)

    cur = cur_ref[0]
    past = past_ref[0]
    fg = (mxu_dot(cur, w_ref[1])
          + mxu_dot(past, w_ref[0])
          + add_ref[pl.ds(b, 1), :])
    t_ = jnp.tanh(fg[:, :D])
    s_ = jax.nn.sigmoid(fg[:, D:])
    z = t_ * s_

    dy = dy_ref[0].astype(jnp.float32)    # [Tt, R]
    dz = (dz_extra_ref[0].astype(jnp.float32)
          + mxu_dot_tB(dy_ref[0].astype(wd_ref.dtype), wd_ref[...]))  # [Tt, D]

    da_f = dz * s_ * (1.0 - t_ * t_)
    da_g = dz * t_ * s_ * (1.0 - s_)
    da = jnp.concatenate([da_f, da_g], axis=-1)   # [Tt, 2D]
    # Match operand dtype to the (possibly bf16) weights for the MXU.
    da_c = da.astype(w_ref.dtype)
    dy_c = dy.astype(w_ref.dtype)
    z_c = z.astype(w_ref.dtype)

    # dx at t: residual + current-tap backprop. Tap-0 term (lands at t-d)
    # goes out separately; the host shift-adds it.
    dx_ref[0] = dy + mxu_dot_tB(da_c, w_ref[1])
    dpast_ref[0] = mxu_dot_tB(da_c, w_ref[0])

    # Gradient accumulation across the (sequential) grid.
    first = jnp.logical_and(b == 0, jt == 0)
    dw0 = mxu_dot_tA(past, da_c)
    dw1 = mxu_dot_tA(cur, da_c)
    dwd = mxu_dot_tA(z_c, dy_c)
    dbd_row = jnp.sum(dy, axis=0, keepdims=True)        # [1, R]
    dadd_row = jnp.sum(da, axis=0, keepdims=True)       # [1, 2D]

    @pl.when(first)
    def _():
        dw_ref[0] = dw0
        dw_ref[1] = dw1
        dwd_ref[...] = dwd
        dbd_ref[...] = dbd_row

    @pl.when(jnp.logical_not(first))
    def _():
        dw_ref[0] += dw0
        dw_ref[1] += dw1
        dwd_ref[...] += dwd
        dbd_ref[...] += dbd_row

    # Per-example add-grad (gc differs per example); the full [B, 2D]
    # array is the output block, rows touched by their own (b, *) programs.
    @pl.when(first)
    def _():
        dadd_ref[...] = jnp.zeros_like(dadd_ref)

    @pl.when(jt == 0)
    def _():
        dadd_ref[pl.ds(b, 1), :] = dadd_row

    @pl.when(jt > 0)
    def _():
        dadd_ref[pl.ds(b, 1), :] += dadd_row


# ---------------------------------------------------------------------------
# Host-side wrappers + custom VJP
# ---------------------------------------------------------------------------

def _shift_right(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """x[t] -> x[t-d] with zero fill (the dilated 'past' tap)."""
    T = x.shape[1]
    return jnp.pad(x, ((0, 0), (d, 0), (0, 0)))[:, :T, :]


def _shift_left_add(base: jnp.ndarray, contrib: jnp.ndarray,
                    d: int) -> jnp.ndarray:
    """base[t] += contrib[t + d] (tap-0 gradient landing at t-d)."""
    T = base.shape[1]
    return base + jnp.pad(contrib[:, d:, :], ((0, 0), (0, d), (0, 0)))


def _pad_time(x: jnp.ndarray, t_tile: int) -> jnp.ndarray:
    T = x.shape[1]
    T_pad = _round_up(T, t_tile)
    if T_pad != T:
        x = jnp.pad(x, ((0, 0), (0, T_pad - T), (0, 0)))
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_dilated_layer(x, w, wd, add, bd, dilation,
                        compute_dtype=jnp.float32):
    """(y, z) for one gated dilated layer.

    x: [B, T, R] f32; w: [2, R, 2D] (taps x filter|gate); wd: [D, R];
    add: [B, 2D] (bias + gc, per example); bd: [1, R]; dilation static.
    compute_dtype=bfloat16 casts matmul operands (f32 accumulation and
    f32 elementwise math stay).
    """
    y, z = _fwd_impl(x, w, wd, add, bd, dilation, compute_dtype)
    return y, z


def _fwd_impl(x, w, wd, add, bd, dilation, compute_dtype=jnp.float32):
    B, T, R = x.shape
    D = wd.shape[0]
    t_tile = _T_TILE
    x = x.astype(compute_dtype)
    w = w.astype(compute_dtype)
    wd = wd.astype(compute_dtype)
    cur = _pad_time(x, t_tile)
    past = _pad_time(_shift_right(x, dilation), t_tile)
    T_pad = cur.shape[1]
    n_t = T_pad // t_tile

    tile3 = lambda C: pl.BlockSpec((1, t_tile, C), lambda b, j: (b, j, 0),
                                   memory_space=pltpu.VMEM)
    y, z = pl.pallas_call(
        functools.partial(_fwd_kernel, D=D),
        grid=(B, n_t),
        in_specs=[
            tile3(R), tile3(R),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(tile3(R), tile3(D)),
        out_shape=(
            jax.ShapeDtypeStruct((B, T_pad, R), jnp.float32),
            jax.ShapeDtypeStruct((B, T_pad, D), jnp.float32),
        ),
    )(cur, past, w, wd, add, bd)
    return y[:, :T, :], z[:, :T, :]


def _fwd_rule(x, w, wd, add, bd, dilation, compute_dtype=jnp.float32):
    y, z = _fwd_impl(x, w, wd, add, bd, dilation, compute_dtype)
    return (y, z), (x, w, wd, add, bd)


def _bwd_rule(dilation, compute_dtype, res, grads):
    x, w, wd, add, bd = res
    dy, dz_extra = grads
    B, T, R = x.shape
    D = wd.shape[0]
    t_tile = _T_TILE
    x = x.astype(compute_dtype)
    w = w.astype(compute_dtype)
    wd = wd.astype(compute_dtype)
    cur = _pad_time(x, t_tile)
    past = _pad_time(_shift_right(x, dilation), t_tile)
    dy_p = _pad_time(dy.astype(compute_dtype), t_tile)
    dz_p = _pad_time(dz_extra.astype(compute_dtype), t_tile)
    T_pad = cur.shape[1]
    n_t = T_pad // t_tile

    tile3 = lambda C: pl.BlockSpec((1, t_tile, C), lambda b, j: (b, j, 0),
                                   memory_space=pltpu.VMEM)
    dx_local, dpast, dw, dwd, dadd, dbd = pl.pallas_call(
        functools.partial(_bwd_kernel, D=D),
        grid=(B, n_t),
        in_specs=[
            tile3(R), tile3(R),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            tile3(R), tile3(D),
        ],
        out_specs=(
            tile3(R), tile3(R),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, T_pad, R), jnp.float32),
            jax.ShapeDtypeStruct((B, T_pad, R), jnp.float32),
            jax.ShapeDtypeStruct((2, R, 2 * D), jnp.float32),
            jax.ShapeDtypeStruct((D, R), jnp.float32),
            jax.ShapeDtypeStruct((B, 2 * D), jnp.float32),
            jax.ShapeDtypeStruct((1, R), jnp.float32),
        ),
    )(cur, past, w, wd, add, dy_p, dz_p)
    dx = _shift_left_add(dx_local[:, :T, :], dpast[:, :T, :], dilation)
    return dx, dw, dwd, dadd, dbd


fused_dilated_layer.defvjp(_fwd_rule, _bwd_rule)


# ---------------------------------------------------------------------------
# Reference (jnp) twin for parity tests
# ---------------------------------------------------------------------------

def fused_dilated_layer_reference(x, w, wd, add, bd, dilation):
    D = wd.shape[0]
    past = _shift_right(x, dilation)
    fg = (jnp.einsum("btr,rd->btd", x, w[1],
                     precision=lax.Precision.HIGHEST)
          + jnp.einsum("btr,rd->btd", past, w[0],
                       precision=lax.Precision.HIGHEST)
          + add[:, None, :])
    z = jnp.tanh(fg[..., :D]) * jax.nn.sigmoid(fg[..., D:])
    y = x + jnp.einsum("btd,dr->btr", z, wd,
                       precision=lax.Precision.HIGHEST) + bd[0][None, None, :]
    return y, z
