"""Streamed-DMA fused stack (v2) parity tests.

Same contract as the v1 tests: forward must match the jnp stack EXACTLY
at every position (a zeroed tap carry is literally causal zero-padding),
and the recompute-free backward must reproduce jnp gradients — here with
the fg/z/dz streams crossing HBM via manual DMA and the packed K=2R
matmuls.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# Retired kernel generation (wavenet_tpu/experiments/): parity tests are
# opt-in so the default CI run spends its time on the production surface.
pytestmark = pytest.mark.skipif(
    not os.environ.get("WAVENET_RUN_EXPERIMENTS"),
    reason="retired experimental kernel; set WAVENET_RUN_EXPERIMENTS=1")

from jax.experimental.pallas import tpu as pltpu

from wavenet_tpu.experiments.fused_stack2 import (
    fused_stack2, fused_stack2_forward, pack_stack_weights, supports)
from wavenet_tpu.models.config import WaveNetConfig
from wavenet_tpu.models.wavenet import embed_gc, init_params

from test_fused_stack import jnp_stack, small_cfg


@pytest.mark.parametrize("gc", [False, True])
def test_forward_exact_everywhere(gc, rng):
    cfg = small_cfg(gc_channels=4 if gc else None,
                    gc_cardinality=4 if gc else None)
    assert supports(cfg, 64)
    params = init_params(jax.random.PRNGKey(0), cfg)
    B, T = 2, 150   # several 64-tiles; carries cross tile boundaries
    x = jnp.asarray(rng.randn(B, T, cfg.residual_channels)
                    .astype(np.float32)) * 0.5
    gc_emb = embed_gc(params, cfg, jnp.asarray([0, 3])) if gc else None

    w_fg, wd, add, bd = pack_stack_weights(params, cfg, gc_emb, B)
    y, fgz = fused_stack2_forward(x, w_fg, wd, add, bd, cfg,
                                  jnp.float32, jnp.float32, 64,
                                  interpret=True)
    y_ref, z_ref = jnp_stack(x, params, cfg, gc_emb)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-5)
    # The record stream: lanes [0:2D) = fg, [2D:3D) = z, rest zeros.
    D = cfg.dilation_channels
    rec = np.asarray(fgz).reshape(B, T, cfg.num_layers, 128)
    f = rec[..., :2 * D]
    z = rec[..., 2 * D:3 * D].reshape(B, T, -1)
    np.testing.assert_allclose(z, np.asarray(z_ref), rtol=1e-4, atol=1e-5)
    z_from_fg = (np.tanh(f[..., :D]) * (1 / (1 + np.exp(-f[..., D:]))))
    np.testing.assert_allclose(
        z_from_fg.reshape(B, T, -1), z, rtol=1e-4, atol=1e-5)
    assert np.all(rec[..., 3 * D:] == 0), "record pad lanes must be zero"


def test_backward_matches_jnp(rng):
    cfg = small_cfg(gc_channels=4, gc_cardinality=4)
    params = init_params(jax.random.PRNGKey(1), cfg)
    B, T = 2, 150
    x = jnp.asarray(rng.randn(B, T, cfg.residual_channels)
                    .astype(np.float32)) * 0.5
    gc_emb = embed_gc(params, cfg, jnp.asarray([1, 2]))
    w_fg, wd, add, bd = pack_stack_weights(params, cfg, gc_emb, B)

    cy = jnp.asarray(rng.randn(B, T, cfg.residual_channels)
                     .astype(np.float32))
    cz = jnp.asarray(
        rng.randn(B, T, cfg.num_layers * cfg.dilation_channels)
        .astype(np.float32))

    def loss_pallas(x, w_fg, wd, add, bd):
        y, z = fused_stack2(x, w_fg, wd, add, bd, cfg, jnp.float32,
                            64, 64, True)
        return jnp.sum(y * cy) + jnp.sum(z * cz)

    def loss_ref(x, w_fg, wd, add, bd):
        L, R, D = (cfg.num_layers, cfg.residual_channels,
                   cfg.dilation_channels)
        current = x
        total = 0.0
        for l in range(L):
            d = cfg.dilations[l]
            past = jnp.pad(current, ((0, 0), (d, 0), (0, 0)))[:, :T, :]
            fg = (jnp.einsum("btr,rd->btd", current, w_fg[l, R:, :])
                  + jnp.einsum("btr,rd->btd", past, w_fg[l, :R, :])
                  + add[l][:, None, :])
            z = jnp.tanh(fg[..., :D]) * jax.nn.sigmoid(fg[..., D:])
            total = total + jnp.sum(z * cz[..., D * l:D * (l + 1)])
            current = (current + jnp.einsum("btd,dr->btr", z, wd[l])
                       + bd[l][None])
        return total + jnp.sum(current * cy)

    grads_p = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(
        x, w_fg, wd, add, bd)
    grads_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(
        x, w_fg, wd, add, bd)

    names = ["dx", "dw_fg", "dwd", "dadd", "dbd"]
    for name, gp, gr in zip(names, grads_p, grads_r):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   rtol=2e-3, atol=2e-4, err_msg=name)


def test_dilation_equal_to_tile(rng):
    # d == t_tile: the past tap is entirely the carry (static branch).
    cfg = small_cfg(dilations=(1, 4, 16, 64))
    params = init_params(jax.random.PRNGKey(2), cfg)
    B, T = 1, 200
    x = jnp.asarray(rng.randn(B, T, cfg.residual_channels)
                    .astype(np.float32)) * 0.5
    w_fg, wd, add, bd = pack_stack_weights(params, cfg, None, B)

    cy = jnp.asarray(rng.randn(B, T, cfg.residual_channels)
                     .astype(np.float32))
    cz = jnp.asarray(rng.randn(B, T, 4 * cfg.dilation_channels)
                     .astype(np.float32))

    def loss(fn_x, fn_w):
        y, z = fused_stack2(fn_x, fn_w, wd, add, bd, cfg, jnp.float32,
                            64, 64, True)
        return jnp.sum(y * cy) + jnp.sum(z * cz)

    y, z = fused_stack2(x, w_fg, wd, add, bd, cfg, jnp.float32,
                        64, 64, True)
    gx, gw = jax.grad(loss, argnums=(0, 1))(x, w_fg)
    y_ref, z_ref = jnp_stack(x, params, cfg, None)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-5)

    def loss_ref(xx, ww):
        T_ = xx.shape[1]
        R, D = cfg.residual_channels, cfg.dilation_channels
        current = xx
        total = 0.0
        for l, d in enumerate(cfg.dilations):
            past = jnp.pad(current, ((0, 0), (d, 0), (0, 0)))[:, :T_, :]
            fg = (jnp.einsum("btr,rd->btd", current, ww[l, R:, :])
                  + jnp.einsum("btr,rd->btd", past, ww[l, :R, :])
                  + add[l][:, None, :])
            zz = jnp.tanh(fg[..., :D]) * jax.nn.sigmoid(fg[..., D:])
            total = total + jnp.sum(zz * cz[..., D * l:D * (l + 1)])
            current = (current + jnp.einsum("btd,dr->btr", zz, wd[l])
                       + bd[l][None])
        return total + jnp.sum(current * cy)

    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, w_fg)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_r),
                               rtol=2e-3, atol=2e-4)


def test_mismatched_fwd_bwd_tiles(rng):
    """Different fwd/bwd tile sizes must still agree with jnp grads."""
    cfg = small_cfg()
    params = init_params(jax.random.PRNGKey(3), cfg)
    B, T = 1, 100
    x = jnp.asarray(rng.randn(B, T, cfg.residual_channels)
                    .astype(np.float32)) * 0.5
    w_fg, wd, add, bd = pack_stack_weights(params, cfg, None, B)
    cy = jnp.asarray(rng.randn(B, T, cfg.residual_channels)
                     .astype(np.float32))

    def loss(fn_x):
        y, _ = fused_stack2(fn_x, w_fg, wd, add, bd, cfg, jnp.float32,
                            64, 32, True)
        return jnp.sum(y * cy)

    def loss_ref(fn_x):
        y, _ = jnp_stack(fn_x, params, cfg, None)
        return jnp.sum(y * cy)

    gx = jax.grad(loss)(x)
    gx_r = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r),
                               rtol=2e-3, atol=2e-4)
