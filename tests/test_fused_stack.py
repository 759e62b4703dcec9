"""Whole-stack fused kernel parity (interpret mode): output of the single
pallas_call must match the jnp dilated stack exactly, including across
tile boundaries and with gc/bias terms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from wavenet_tpu.kernels.fused_stack import (
    fits_vmem, fused_stack_forward, pack_stack_weights, stack_geometry)
from wavenet_tpu.models.config import WaveNetConfig
from wavenet_tpu.models.wavenet import embed_gc, init_params


def small_cfg(**kw):
    d = dict(dilations=(1, 2, 4, 8, 16), residual_channels=8,
             dilation_channels=8, skip_channels=16,
             quantization_channels=32, use_biases=True)
    d.update(kw)
    return WaveNetConfig(**d)


def jnp_stack(x, params, cfg, gc_emb):
    """The model's own jnp stack, restricted to (current, gate_outs)."""
    from wavenet_tpu.ops.conv import causal_conv_padded, conv1x1
    current = x
    outs = []
    for i, dilation in enumerate(cfg.dilations):
        f = causal_conv_padded(current, params["filter"][i], dilation)
        g = causal_conv_padded(current, params["gate"][i], dilation)
        if gc_emb is not None:
            f = f + (gc_emb @ params["gc_filter"][i])[:, None, :]
            g = g + (gc_emb @ params["gc_gate"][i])[:, None, :]
        if cfg.use_biases:
            f = f + params["filter_bias"][i]
            g = g + params["gate_bias"][i]
        z = jnp.tanh(f) * jax.nn.sigmoid(g)
        outs.append(z)
        t = conv1x1(z, params["dense"][i])
        if cfg.use_biases:
            t = t + params["dense_bias"][i]
        current = current + t
    return current, jnp.concatenate(outs, axis=-1)


@pytest.mark.parametrize("gc", [False, True])
def test_fused_stack_matches_jnp(gc, rng):
    cfg = small_cfg(gc_channels=4 if gc else None,
                    gc_cardinality=4 if gc else None)
    params = init_params(jax.random.PRNGKey(0), cfg)
    B, T = 2, 150   # t_tile=64 -> multiple tiles with halo crossing
    x = jnp.asarray(rng.randn(B, T, cfg.residual_channels)
                    .astype(np.float32)) * 0.5
    gc_emb = embed_gc(params, cfg, jnp.asarray([0, 3])) if gc else None

    w_fg, wd, add, bd = pack_stack_weights(params, cfg, gc_emb, B)
    with pltpu.force_tpu_interpret_mode():
        y, z = fused_stack_forward(x, w_fg, wd, add, bd, cfg, t_tile=64)
    y_ref, z_ref = jnp_stack(x, params, cfg, gc_emb)
    # Equality contract: exact for t >= sum(dilations) (the loss only
    # consumes t >= receptive_field - 1; see kernel docstring).
    H = sum(cfg.dilations)
    np.testing.assert_allclose(np.asarray(y[:, H:]), np.asarray(y_ref[:, H:]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(z[:, H:]), np.asarray(z_ref[:, H:]),
                               rtol=1e-4, atol=1e-5)


def test_geometry_and_gate():
    cfg = small_cfg()   # H = 31
    K, W = stack_geometry(cfg, t_tile=64)
    assert K == 2 and W == 128 and W - 64 >= 31
    assert fits_vmem(cfg, t_tile=64)
    from wavenet_tpu.models.config import sharded_config
    # 80-layer 256-channel config blows the window budget at Tt=2048.
    assert not fits_vmem(sharded_config())


def test_nonmultiple_length_padding(rng):
    cfg = small_cfg()
    params = init_params(jax.random.PRNGKey(1), cfg)
    x = jnp.asarray(rng.randn(1, 97, cfg.residual_channels)
                    .astype(np.float32))
    w_fg, wd, add, bd = pack_stack_weights(params, cfg, None, 1)
    with pltpu.force_tpu_interpret_mode():
        y, z = fused_stack_forward(x, w_fg, wd, add, bd, cfg, t_tile=64)
    y_ref, z_ref = jnp_stack(x, params, cfg, None)
    assert y.shape == (1, 97, cfg.residual_channels)
    H = sum(cfg.dilations)
    np.testing.assert_allclose(np.asarray(y[:, H:]), np.asarray(y_ref[:, H:]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(z[:, H:]), np.asarray(z_ref[:, H:]),
                               rtol=1e-4, atol=1e-5)
