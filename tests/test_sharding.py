"""Mesh sharding tests on the virtual 8-device CPU mesh.

The reference has no distributed anything (SURVEY §2b); these tests cover
the new dp x tp capability: sharded training steps must produce the same
numbers as single-device, and the sharded train step must actually
partition params/batches across devices.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from wavenet_tpu.models.config import WaveNetConfig
from wavenet_tpu.parallel.sharding import (
    make_mesh, param_partition_specs, shard_batch, shard_params,
    shard_train_state)
from wavenet_tpu.train_lib import (
    create_train_state, make_optimizer, make_train_step)


def cfg_for_tp():
    # dilation/skip channels divisible by model axis sizes (2 and 4).
    return WaveNetConfig(dilations=(1, 2, 4, 8), residual_channels=8,
                         dilation_channels=8, skip_channels=16,
                         quantization_channels=64, use_biases=True,
                         gc_channels=4, gc_cardinality=4)


def make_batch(cfg, batch=8, extra=24, seed=0):
    rng = np.random.RandomState(seed)
    T = cfg.receptive_field + extra
    audio = rng.uniform(-1, 1, (batch, T)).astype(np.float32)
    gc = (rng.randint(0, cfg.gc_cardinality, batch).astype(np.int32)
          if cfg.gc_enabled else None)
    return audio, gc


def run_steps(cfg, mesh=None, model_parallelism=1, n_steps=3):
    optimizer = make_optimizer("adam", 1e-3)
    state = create_train_state(jax.random.PRNGKey(0), cfg, optimizer)
    if mesh is not None:
        state = shard_train_state(state, cfg, mesh)
    step_fn = make_train_step(cfg, optimizer, 0.001)
    losses = []
    for i in range(n_steps):
        audio, gc = make_batch(cfg, seed=i)
        if mesh is not None:
            audio, gc, _ = shard_batch(audio, mesh, gc)
        state, metrics = step_fn(state, jnp.asarray(audio),
                                 None if gc is None else jnp.asarray(gc))
        losses.append(float(jax.device_get(metrics["loss"])))
    return losses, state


def test_device_count():
    assert jax.device_count() == 8


@pytest.mark.parametrize("model_parallelism", [1, 2, 4])
def test_sharded_matches_single_device(model_parallelism):
    cfg = cfg_for_tp()
    ref_losses, _ = run_steps(cfg, mesh=None)
    mesh = make_mesh(model_parallelism=model_parallelism)
    shard_losses, _ = run_steps(cfg, mesh=mesh)
    np.testing.assert_allclose(ref_losses, shard_losses, rtol=5e-5,
                               atol=1e-6)


def test_params_actually_sharded():
    cfg = cfg_for_tp()
    mesh = make_mesh(model_parallelism=4)  # (2 data, 4 model)
    from wavenet_tpu.models.wavenet import init_params
    params = init_params(jax.random.PRNGKey(0), cfg)
    sharded = shard_params(params, cfg, mesh)
    # filter [L, fw, R, D]: D split 4 ways.
    shards = sharded["filter"].addressable_shards
    assert len({s.device for s in shards}) == 8
    assert shards[0].data.shape[-1] == cfg.dilation_channels // 4


def test_batch_sharded_over_data_axis():
    cfg = cfg_for_tp()
    mesh = make_mesh(model_parallelism=2)  # (4 data, 2 model)
    audio, gc = make_batch(cfg, batch=8)
    audio_s, gc_s, _ = shard_batch(audio, mesh, gc)
    assert audio_s.addressable_shards[0].data.shape[0] == 2  # 8 / 4
    np.testing.assert_array_equal(np.asarray(audio_s), audio)


def test_spec_covers_every_param():
    for cfg in (cfg_for_tp(),
                WaveNetConfig(dilations=(1, 2), use_biases=False,
                              scalar_input=True)):
        from wavenet_tpu.models.wavenet import init_params
        params = init_params(jax.random.PRNGKey(0), cfg)
        specs = param_partition_specs(cfg, params)
        assert set(specs) == set(params)
        for k, spec in specs.items():
            assert len(spec) <= params[k].ndim, k


def test_dryrun_multichip_entry():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_multihost_helpers_single_process_degrade():
    # On one process these behave exactly like the local path.
    from wavenet_tpu.parallel.distributed import (
        global_batch_from_local, initialize_multihost, make_global_mesh)
    assert initialize_multihost() is False  # no coordinator configured
    mesh = make_global_mesh(model_parallelism=2)
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
        "data": 4, "model": 2}
    cfg = cfg_for_tp()
    audio, gc = make_batch(cfg, batch=8)
    audio_g, gc_g, _ = global_batch_from_local(audio, mesh, gc)
    assert audio_g.shape == audio.shape
    np.testing.assert_array_equal(np.asarray(audio_g), audio)
    np.testing.assert_array_equal(np.asarray(gc_g), gc)


def test_sharded_generation_matches_single_device():
    # dp x tp sharded sampling must emit the same codes as one device
    # (same jax.random keys -> same draws; both use the unseeded
    # prefill recipe: rf-1 silence + one random first code).
    from wavenet_tpu.sample import generate, generate_sharded

    cfg = cfg_for_tp()
    from wavenet_tpu.models.wavenet import init_params
    params = init_params(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(9)
    n, B = 40, 8

    ref = np.asarray(generate(params, cfg, n, key, batch_size=B))

    mesh = make_mesh(model_parallelism=2)  # (4 data, 2 model)
    out = np.asarray(generate_sharded(params, cfg, n, key, mesh, B))
    np.testing.assert_array_equal(out, ref)
