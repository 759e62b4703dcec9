"""Time-axis (sequence) parallelism parity on the 8-device CPU mesh.

The halo-exchanged, time-sharded loss/grad must match the unsharded
``loss_fn`` exactly (up to float reordering): same CE, same gradients.
This is the SURVEY §2b SP row — a training chunk spanning devices.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from wavenet_tpu.models.config import WaveNetConfig
from wavenet_tpu.models.wavenet import init_params, loss_fn
from wavenet_tpu.parallel.timeshard import (
    make_time_sharded_grad_fn, time_sharded_loss)


def small_cfg(**kw):
    d = dict(dilations=(1, 2, 4, 8), residual_channels=6,
             dilation_channels=5, skip_channels=9,
             quantization_channels=32, use_biases=True, sample_rate=2000)
    d.update(kw)
    return WaveNetConfig(**d)


def padded_audio(rng, cfg, B, T):
    """Reader-layout chunk: receptive_field zeros then signal."""
    audio = rng.uniform(-0.9, 0.9, (B, T)).astype(np.float32)
    audio[:, :cfg.receptive_field] = 0.0
    return jnp.asarray(audio)


def time_mesh(data=1, time=8):
    devs = np.asarray(jax.devices()[:data * time]).reshape(data, time)
    return Mesh(devs, ("data", "time"))


def test_loss_matches_unsharded(rng):
    cfg = small_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    B, T = 2, 256               # Tl = 32 > rf = 16
    audio = padded_audio(rng, cfg, B, T)
    mesh = time_mesh(1, 8)

    fn = make_time_sharded_grad_fn(cfg, mesh, time_axis="time")
    with jax.set_mesh(mesh):
        (total_s, aux_s), grads_s = fn(params, audio)
    total_u, aux_u = loss_fn(params, cfg, audio)
    np.testing.assert_allclose(float(total_s), float(total_u), rtol=1e-5)
    np.testing.assert_allclose(float(aux_s["ce_loss"]),
                               float(aux_u["ce_loss"]), rtol=1e-5)


def test_grads_match_unsharded(rng):
    cfg = small_cfg()
    params = init_params(jax.random.PRNGKey(1), cfg)
    B, T = 1, 256
    audio = padded_audio(rng, cfg, B, T)
    mesh = time_mesh(1, 8)

    fn = make_time_sharded_grad_fn(cfg, mesh, time_axis="time")
    with jax.set_mesh(mesh):
        _, grads_s = fn(params, audio)
    grads_u = jax.grad(lambda p: loss_fn(p, cfg, audio)[0])(params)
    for k in grads_u:
        np.testing.assert_allclose(
            np.asarray(grads_s[k]), np.asarray(grads_u[k]),
            rtol=2e-4, atol=1e-6, err_msg=k)


def test_data_and_time_axes_combined(rng):
    """2-way batch sharding x 4-way time sharding on one mesh."""
    cfg = small_cfg()
    params = init_params(jax.random.PRNGKey(2), cfg)
    B, T = 2, 256               # Tl = 64 > rf
    audio = padded_audio(rng, cfg, B, T)
    mesh = time_mesh(2, 4)

    fn = make_time_sharded_grad_fn(cfg, mesh, time_axis="time",
                                   data_axis="data")
    with jax.set_mesh(mesh):
        (total_s, _), grads_s = fn(params, audio)
    total_u, _ = loss_fn(params, cfg, audio)
    grads_u = jax.grad(lambda p: loss_fn(p, cfg, audio)[0])(params)
    np.testing.assert_allclose(float(total_s), float(total_u), rtol=1e-5)
    for k in grads_u:
        np.testing.assert_allclose(
            np.asarray(grads_s[k]), np.asarray(grads_u[k]),
            rtol=2e-4, atol=1e-6, err_msg=k)


def test_gc_and_l2(rng):
    cfg = small_cfg(gc_channels=4, gc_cardinality=5)
    params = init_params(jax.random.PRNGKey(3), cfg)
    B, T = 2, 256
    audio = padded_audio(rng, cfg, B, T)
    gc_ids = jnp.asarray([1, 4])
    mesh = time_mesh(1, 8)

    fn = make_time_sharded_grad_fn(cfg, mesh, time_axis="time",
                                   l2_regularization_strength=0.01)
    with jax.set_mesh(mesh):
        (total_s, aux_s), grads_s = fn(params, audio, gc_ids)
    total_u, aux_u = loss_fn(params, cfg, audio, gc_ids, 0.01)
    np.testing.assert_allclose(float(total_s), float(total_u), rtol=1e-5)
    np.testing.assert_allclose(float(aux_s["l2_loss"]),
                               float(aux_u["l2_loss"]), rtol=1e-5)
    grads_u = jax.grad(lambda p: loss_fn(p, cfg, audio, gc_ids, 0.01)[0])(
        params)
    for k in grads_u:
        np.testing.assert_allclose(
            np.asarray(grads_s[k]), np.asarray(grads_u[k]),
            rtol=2e-4, atol=1e-6, err_msg=k)


def test_local_slice_must_exceed_receptive_field():
    cfg = small_cfg(dilations=(1, 2, 4, 8, 16, 32))  # rf = 64
    params = init_params(jax.random.PRNGKey(4), cfg)
    mesh = time_mesh(1, 8)
    audio = jnp.zeros((1, 256))  # Tl = 32 < rf = 64
    fn = make_time_sharded_grad_fn(cfg, mesh, time_axis="time")
    with pytest.raises(ValueError, match="receptive field"):
        with jax.set_mesh(mesh):
            fn(params, audio)
