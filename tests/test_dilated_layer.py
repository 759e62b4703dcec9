"""Fused dilated-layer kernel parity (interpret mode on CPU): forward and
custom-VJP gradients vs the jnp twin."""

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

from wavenet_tpu.experiments.dilated_layer import (
    fused_dilated_layer, fused_dilated_layer_reference)


def make_inputs(rng, B=2, T=100, R=4, D=4):
    x = jnp.asarray(rng.randn(B, T, R).astype(np.float32)) * 0.5
    w = jnp.asarray(rng.randn(2, R, 2 * D).astype(np.float32)) * 0.3
    wd = jnp.asarray(rng.randn(D, R).astype(np.float32)) * 0.3
    add = jnp.asarray(rng.randn(B, 2 * D).astype(np.float32)) * 0.1
    bd = jnp.asarray(rng.randn(1, R).astype(np.float32)) * 0.1
    return x, w, wd, add, bd


@pytest.mark.parametrize("dilation", [1, 4, 64])
def test_forward_matches_reference(dilation, rng):
    args = make_inputs(rng)
    with pltpu.force_tpu_interpret_mode():
        y, z = fused_dilated_layer(*args, dilation)
    y_ref, z_ref = fused_dilated_layer_reference(*args, dilation)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("dilation", [1, 8])
def test_gradients_match_reference(dilation, rng):
    args = make_inputs(rng, T=70)
    # Scalar losses touching both outputs (y feeds the residual chain,
    # z feeds the skip head) with different weights.
    cy = jnp.asarray(rng.randn(*args[0].shape).astype(np.float32))
    cz_shape = (args[0].shape[0], args[0].shape[1], args[2].shape[0])
    cz = jnp.asarray(rng.randn(*cz_shape).astype(np.float32))

    def loss(fn, *a):
        y, z = fn(*a, dilation)
        return jnp.sum(y * cy) + jnp.sum(z * cz)

    with pltpu.force_tpu_interpret_mode():
        g_pallas = jax.grad(lambda *a: loss(fused_dilated_layer, *a),
                            argnums=(0, 1, 2, 3, 4))(*args)
    g_ref = jax.grad(lambda *a: loss(fused_dilated_layer_reference, *a),
                     argnums=(0, 1, 2, 3, 4))(*args)
    names = ["dx", "dw", "dwd", "dadd", "dbd"]
    for name, gp, gr in zip(names, g_pallas, g_ref):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_time_padding_path(rng):
    # T deliberately not a multiple of the tile — padded rows must not
    # pollute outputs or weight gradients.
    args = make_inputs(rng, T=33)
    d = 4
    with pltpu.force_tpu_interpret_mode():
        y, z = fused_dilated_layer(*args, d)
    y_ref, z_ref = fused_dilated_layer_reference(*args, d)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-6)

    def s(fn, *a):
        y, z = fn(*a, d)
        return jnp.sum(y) + jnp.sum(z)

    with pltpu.force_tpu_interpret_mode():
        gw_p = jax.grad(lambda *a: s(fused_dilated_layer, *a), argnums=1)(*args)
    gw_r = jax.grad(lambda *a: s(fused_dilated_layer_reference, *a),
                    argnums=1)(*args)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("version", [2, 3])
def test_model_pallas_stack_matches_jnp(rng, version):
    # Full-model integration: loss and gradients with use_pallas_stack
    # must match the jnp stack (v3 additionally exercises the padded-z
    # record layout + zero-row-padded skip weights in the head).
    from wavenet_tpu.models.config import WaveNetConfig
    from wavenet_tpu.models.wavenet import init_params, loss_fn

    base = dict(dilations=(1, 2, 4, 8), residual_channels=4,
                dilation_channels=4, skip_channels=8,
                quantization_channels=32, use_biases=True,
                gc_channels=4, gc_cardinality=4)
    cfg_j = WaveNetConfig(**base)
    cfg_p = WaveNetConfig(**base, use_pallas_stack=True,
                          pallas_stack_version=version)
    params = init_params(jax.random.PRNGKey(0), cfg_j)
    T = cfg_j.receptive_field + 20
    audio = jnp.asarray(
        np.random.RandomState(1).uniform(-1, 1, (2, T)).astype(np.float32))
    gc_ids = jnp.asarray([0, 3])

    (l_j, _), g_j = jax.value_and_grad(loss_fn, has_aux=True)(
        params, cfg_j, audio, gc_ids, 0.01)
    with pltpu.force_tpu_interpret_mode():
        (l_p, _), g_p = jax.value_and_grad(loss_fn, has_aux=True)(
            params, cfg_p, audio, gc_ids, 0.01)

    np.testing.assert_allclose(float(l_p), float(l_j), rtol=1e-5)
    for k in g_j:
        np.testing.assert_allclose(np.asarray(g_p[k]), np.asarray(g_j[k]),
                                   rtol=2e-4, atol=1e-5, err_msg=k)


def test_bf16_kernel_close_to_fp32(rng):
    args = make_inputs(rng, T=64)
    with pltpu.force_tpu_interpret_mode():
        y32, z32 = fused_dilated_layer(*args, 4, jnp.float32)
        y16, z16 = fused_dilated_layer(*args, 4, jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(y16), np.asarray(y32),
                               rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(z16), np.asarray(z32),
                               rtol=0.05, atol=0.05)
