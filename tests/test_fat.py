"""Fat-matmul re-association parity: the assembled single-matmul-per-
layer recurrence must reproduce the standard two-matmul stack (forward
AND gradients through the assembly) to float tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavenet_tpu.kernels.fat import (assemble_fat_weights,
                                     fat_forward_reference, fat_widths)
from wavenet_tpu.kernels.stack_pack import pack_stack_weights
from wavenet_tpu.models.config import WaveNetConfig
from wavenet_tpu.models.wavenet import embed_gc, init_params
from tests.test_fused_stack import jnp_stack, small_cfg


@pytest.mark.parametrize("gc", [False, True])
@pytest.mark.parametrize("one_tanh", [False, True])
def test_fat_forward_matches_stack(gc, one_tanh, rng):
    cfg = small_cfg(gc_channels=4 if gc else None,
                    gc_cardinality=4 if gc else None)
    params = init_params(jax.random.PRNGKey(0), cfg)
    B, T = 2, 150
    x = jnp.asarray(rng.randn(B, T, cfg.residual_channels)
                    .astype(np.float32)) * 0.5
    gc_emb = embed_gc(params, cfg, jnp.asarray([0, 3])) if gc else None

    # Non-zero dense biases: the init is zero-bias (reference parity),
    # which would mask the shifted-bias pad subtlety entirely.
    params = dict(params)
    params["dense_bias"] = jnp.asarray(
        rng.randn(*params["dense_bias"].shape).astype(np.float32)) * 0.3

    w_fg, wd, add, bd = pack_stack_weights(params, cfg, gc_emb, B)
    F, beta, cfill = assemble_fat_weights(w_fg, wd, add, bd, cfg,
                                          one_tanh=one_tanh)
    K, N = fat_widths(cfg)
    assert F.shape == (cfg.num_layers + 1, K, N)
    y, z = fat_forward_reference(x, F, beta, cfill, cfg,
                                 one_tanh=one_tanh)
    y_ref, z_ref = jnp_stack(x, params, cfg, gc_emb)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref),
                               rtol=1e-4, atol=1e-5)


def test_fat_gradients_match_packed_param_gradients(rng):
    # Differentiating THROUGH the assembly must give the same packed-
    # weight gradients as the standard recurrence (this is what lets a
    # kernel return (dF, dbeta) and have XLA unpack them for free).
    cfg = small_cfg(gc_channels=4, gc_cardinality=4)
    params = init_params(jax.random.PRNGKey(1), cfg)
    B, T = 2, 150
    R, D, L = (cfg.residual_channels, cfg.dilation_channels,
               cfg.num_layers)
    x = jnp.asarray(rng.randn(B, T, R).astype(np.float32)) * 0.5
    gc_emb = embed_gc(params, cfg, jnp.asarray([1, 2]))
    params = dict(params)
    params["dense_bias"] = jnp.asarray(
        rng.randn(*params["dense_bias"].shape).astype(np.float32)) * 0.3
    w_fg, wd, add, bd = pack_stack_weights(params, cfg, gc_emb, B)
    cy = jnp.asarray(rng.randn(B, T, R).astype(np.float32))
    cz = jnp.asarray(rng.randn(B, T, L * D).astype(np.float32))

    def loss_fat(x, w_fg, wd, add, bd):
        F, beta, cfill = assemble_fat_weights(w_fg, wd, add, bd, cfg)
        y, z = fat_forward_reference(x, F, beta, cfill, cfg)
        return jnp.sum(y * cy) + jnp.sum(z * cz)

    def loss_std(x, w_fg, wd, add, bd):
        current = x
        total = 0.0
        for l, d in enumerate(cfg.dilations):
            past = jnp.pad(current, ((0, 0), (d, 0), (0, 0)))[:, :T, :]
            fg = (jnp.einsum("btr,rd->btd", current, w_fg[l, R:, :])
                  + jnp.einsum("btr,rd->btd", past, w_fg[l, :R, :])
                  + add[l][:, None, :])
            z = jnp.tanh(fg[..., :D]) * jax.nn.sigmoid(fg[..., D:])
            total = total + jnp.sum(z * cz[..., D * l:D * (l + 1)])
            current = (current + jnp.einsum("btd,dr->btr", z, wd[l])
                       + bd[l][None])
        return total + jnp.sum(current * cy)

    g_fat = jax.grad(loss_fat, argnums=(0, 1, 2, 3, 4))(
        x, w_fg, wd, add, bd)
    g_std = jax.grad(loss_std, argnums=(0, 1, 2, 3, 4))(
        x, w_fg, wd, add, bd)
    for name, gf, gs in zip(["dx", "dw_fg", "dwd", "dadd", "dbd"],
                            g_fat, g_std):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gs),
                                   rtol=2e-3, atol=2e-4, err_msg=name)
