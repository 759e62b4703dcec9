"""Fat-matmul re-association of the dilated stack (v4 foundation).

The standard layer recurrence (reference ``_create_dilation_layer``
≈:280-360) runs TWO small matmuls per layer on the MXU — the K=2R
filter/gate conv and the K=D residual dense — chained through the
residual stream:

    a_s = S_d(c_s) @ W1_s + c_s @ W2_s + add_s          (preactivation)
    z_s = tanh(a_f) * sigmoid(a_g)
    c_{s+1} = c_s + z_s @ Wd_s + bd_s

Substituting c_s = c_{s-1} + z_{s-1} @ Wd_{s-1} + bd_{s-1} into layer
s's conv (bd is time-uniform, so it commutes with the dilation shift)
re-associates every layer into ONE fat matmul over the widened state
X_s = [S_d(c_{s-1}) | c_{s-1} | S_d(z_{s-1}) | z_{s-1}]:

    [a_s | c_s] = X_s @ F_s + beta_s

with the block weight

    F_s = [[ W1_s            | 0        ]      rows 0:R    (c past)
           [ W2_s            | I_R      ]      rows R:2R   (c)
           [ Wd_{s-1} @ W1_s | 0        ]      rows 2R:2R+D (z past)
           [ Wd_{s-1} @ W2_s | Wd_{s-1} ]]     rows 2R+D:  (z)
    beta_s = [ bd_{s-1} @ (W1_s + W2_s) + add_s | bd_{s-1} ]

One subtlety: the dense bias is time-uniform EXCEPT under the causal
shift — S_d(c_s) is zero-padded at t < d, so the shifted copy of the
bd_{s-1} component must vanish there while beta applies it uniformly.
The fix costs nothing: pad the shifted c-stream with -bd_{s-1} instead
of zeros (``c_pad_fill``; in a kernel this is the tap-carry INIT
constant), which cancels the uniform bd@W1 term exactly at t < d.

For the paper config (R=D=32) the fat matmul is K=2R+2D=128 x
N=2D+R=96: a single FULL-K MXU pass per layer instead of two
quarter-filled ones, and the residual add rides the identity block for
free. Step 0 feeds X_0 = [S(x)|x|0|0] (no previous layer), and an
optional step L with W1=W2=0 emits the final residual y = c_L.

The trade: products Wd@W1 round differently than sequential matmuls, so
this path is mathematically equal but not bit-identical to the
two-matmul association (~1e-6 relative at f32; parity-tested).

``one_tanh=True`` additionally folds 0.5 into the gate columns so that
sigmoid(a_g) = 0.5 + 0.5*tanh(a_g/2) — ONE transcendental over
[M, 2D] per layer instead of tanh+sigmoid (measured: the single tanh
hides entirely under the MXU work; the pair does not).

Assembly is plain differentiable jnp: a kernel consuming (F, beta) gets
its (dF, dbeta) cotangents mapped back to (w_fg, wd, add, bd) by XLA
autodiff — no hand-derived unpack pass.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from wavenet_tpu.models.config import WaveNetConfig


def fat_widths(config: WaveNetConfig) -> Tuple[int, int]:
    """(K, N) of the fat matmul: K = 2R+2D input lanes, N = 2D+R out."""
    R, D = config.residual_channels, config.dilation_channels
    return 2 * R + 2 * D, 2 * D + R


def assemble_fat_weights(w_fg, wd, add, bd, config: WaveNetConfig,
                         one_tanh: bool = True, with_y_step: bool = True):
    """Build fat step weights from the packed stack weights.

    Args:
      w_fg: [L, 2R, 2D] packed [past; current] filter|gate weights.
      wd:   [L, D, R] residual dense weights.
      add:  [L, B, 2D] per-batch preactivation bias (GC + conv biases).
      bd:   [L, 1, R] dense bias rows.
      one_tanh: scale gate columns by 0.5 (sigmoid-via-tanh fusion).
      with_y_step: append step L emitting y = c_L (the final residual).

    Returns (F [L(+1), 2R+2D, 2D+R], beta [L(+1), B, 2D+R],
    c_pad_fill [L, R] — the value the SHIFTED c-stream must be padded
    with at sequence start for step s, i.e. -bd_{s-1} (zeros at s=0)).
    """
    c = config
    L, R, D = c.num_layers, c.residual_channels, c.dilation_channels
    B = add.shape[1]
    eye = jnp.eye(R, dtype=w_fg.dtype)
    zR = jnp.zeros((R, R), w_fg.dtype)
    zD = jnp.zeros((D, R), w_fg.dtype)

    fs, betas = [], []
    for s in range(L):
        w1, w2 = w_fg[s, :R], w_fg[s, R:]
        if s == 0:
            rows_zp = jnp.zeros((D, 2 * D), w_fg.dtype)
            rows_z = rows_zp
            col_c = jnp.concatenate([zR, eye, zD, zD], axis=0)
            beta_a = add[s]
            beta_c = jnp.zeros((B, R), w_fg.dtype)
        else:
            wd_p, bd_p = wd[s - 1], bd[s - 1]          # [D, R], [1, R]
            rows_zp = wd_p @ w1
            rows_z = wd_p @ w2
            col_c = jnp.concatenate([zR, eye, zD, wd_p], axis=0)
            beta_a = bd_p @ (w1 + w2) + add[s]          # [1|B, 2D]
            beta_c = jnp.broadcast_to(bd_p, (B, R))
        cols_a = jnp.concatenate([w1, w2, rows_zp, rows_z], axis=0)
        fs.append(jnp.concatenate([cols_a, col_c], axis=1))
        betas.append(jnp.concatenate(
            [jnp.broadcast_to(beta_a, (B, 2 * D)), beta_c], axis=1))

    if with_y_step:
        wd_p, bd_p = wd[L - 1], bd[L - 1]
        cols_a = jnp.zeros((2 * R + 2 * D, 2 * D), w_fg.dtype)
        col_c = jnp.concatenate([zR, eye, zD, wd_p], axis=0)
        fs.append(jnp.concatenate([cols_a, col_c], axis=1))
        betas.append(jnp.concatenate(
            [jnp.zeros((B, 2 * D), w_fg.dtype),
             jnp.broadcast_to(bd_p, (B, R))], axis=1))

    F = jnp.stack(fs)                                   # [L(+1), K, N]
    beta = jnp.stack(betas)                             # [L(+1), B, N]
    if one_tanh:
        gate = jnp.concatenate(
            [jnp.ones((D,), F.dtype), 0.5 * jnp.ones((D,), F.dtype),
             jnp.ones((R,), F.dtype)])
        F = F * gate
        beta = beta * gate
    c_pad_fill = jnp.concatenate(
        [jnp.zeros((1, R), w_fg.dtype), -bd[:L - 1, 0, :]], axis=0)
    return F, beta, c_pad_fill


def gated_from_onetanh(th, D: int):
    """z = tanh(a_f) * sigmoid(a_g) from th = tanh([a_f | a_g/2])."""
    return th[..., :D] * (0.5 + 0.5 * th[..., D:])


def fat_forward_reference(x, F, beta, c_pad_fill, config: WaveNetConfig,
                          one_tanh: bool = True):
    """Pure-jnp fat recurrence — the kernel's numerical oracle.

    Args:
      x: [B, T, R] stack input (post initial causal conv).
      F, beta, c_pad_fill: from assemble_fat_weights (with_y_step=True).

    Returns (y [B,T,R], z_all [B,T,L*D]).
    """
    c = config
    L, R, D = c.num_layers, c.residual_channels, c.dilation_channels
    B, T, _ = x.shape

    def shift(v, d, fill=None):
        if fill is None:
            return jnp.pad(v, ((0, 0), (d, 0), (0, 0)))[:, :T]
        head = jnp.broadcast_to(fill, (B, d, v.shape[-1])).astype(v.dtype)
        return jnp.concatenate([head, v[:, :T - d]], axis=1)

    cur = x
    z = jnp.zeros((B, T, D), x.dtype)
    outs = []
    for s in range(L):
        d = c.dilations[s]
        X = jnp.concatenate(
            [shift(cur, d, c_pad_fill[s]), cur, shift(z, d), z], axis=-1)
        O = jnp.einsum("btk,kn->btn", X, F[s]) + beta[s][:, None, :]
        if one_tanh:
            z = gated_from_onetanh(jnp.tanh(O[..., :2 * D]), D)
        else:
            z = jnp.tanh(O[..., :D]) * jax.nn.sigmoid(O[..., D:2 * D])
        cur = O[..., 2 * D:]
        outs.append(z)
    # y step: no shifts contribute (W1=W2=0 blocks).
    Xl = jnp.concatenate([jnp.zeros_like(cur), cur,
                          jnp.zeros_like(z), z], axis=-1)
    y = (jnp.einsum("btk,kn->btn", Xl, F[L])
         + beta[L][:, None, :])[..., 2 * D:]
    return y, jnp.concatenate(outs, axis=-1)


__all__ = ["assemble_fat_weights", "fat_forward_reference",
           "gated_from_onetanh", "fat_widths"]
