"""Fast-vs-slow generation equivalence — the correctness keystone.

Reference: test/test_generation.py asserts predict_proba ==
predict_proba_incremental on the same waveform (SURVEY §3.5). Here: the
ring-buffer sampler_step chain must reproduce the full causal-padded conv
forward exactly, position by position.
"""

import jax
import jax.numpy as jnp
import numpy as np

from wavenet_tpu.models.config import WaveNetConfig
from wavenet_tpu.models.wavenet import (
    embed_gc, forward, init_params, one_hot)
from wavenet_tpu.sample import (
    generate, init_sampler_state, prime_state, sampler_step)


def small_config(**kw):
    d = dict(dilations=(1, 2, 4, 8, 16), residual_channels=4,
             dilation_channels=4, skip_channels=8,
             quantization_channels=32, use_biases=True)
    d.update(kw)
    return WaveNetConfig(**d)


def incremental_logits(params, cfg, codes, gc_emb=None):
    """Run sampler_step over a fixed waveform, collecting logits at each t."""
    state = init_sampler_state(cfg, codes.shape[0])
    outs = []
    for t in range(codes.shape[1]):
        x = one_hot(codes[:, t], cfg.quantization_channels)
        state, logits = sampler_step(params, cfg, state, x, gc_emb)
        outs.append(np.asarray(logits))
    return np.stack(outs, axis=1)  # [B, T, Q]


def test_incremental_matches_full_forward(rng):
    cfg = small_config()
    params = init_params(jax.random.PRNGKey(0), cfg)
    T = cfg.receptive_field + 10
    codes = jnp.asarray(rng.randint(0, cfg.quantization_channels, (2, T)))

    full = np.asarray(forward(params, cfg,
                              one_hot(codes, cfg.quantization_channels)))
    inc = incremental_logits(params, cfg, codes)
    # The ring-buffer chain equals the causally-padded conv net at EVERY
    # position (both see zeros before t=0).
    np.testing.assert_allclose(inc, full, rtol=1e-4, atol=1e-5)


def test_incremental_matches_full_forward_gc(rng):
    cfg = small_config(gc_channels=4, gc_cardinality=4)
    params = init_params(jax.random.PRNGKey(1), cfg)
    T = cfg.receptive_field + 5
    codes = jnp.asarray(rng.randint(0, cfg.quantization_channels, (2, T)))
    gc_emb = embed_gc(params, cfg, jnp.asarray([1, 3]))

    full = np.asarray(forward(params, cfg,
                              one_hot(codes, cfg.quantization_channels),
                              gc_emb))
    inc = incremental_logits(params, cfg, codes, gc_emb)
    np.testing.assert_allclose(inc, full, rtol=1e-4, atol=1e-5)


def test_prime_state_equals_stepping(rng):
    cfg = small_config()
    params = init_params(jax.random.PRNGKey(0), cfg)
    codes = jnp.asarray(rng.randint(0, cfg.quantization_channels, (1, 12)))

    primed = prime_state(params, cfg, init_sampler_state(cfg, 1), codes)

    manual = init_sampler_state(cfg, 1)
    for t in range(codes.shape[1]):
        manual, _ = sampler_step(
            params, cfg, manual, one_hot(codes[:, t], cfg.quantization_channels))

    assert int(primed.t) == int(manual.t)
    np.testing.assert_allclose(np.asarray(primed.causal_buf),
                               np.asarray(manual.causal_buf),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(primed.layer_bufs),
                               np.asarray(manual.layer_bufs),
                               rtol=1e-5, atol=1e-6)


def test_generate_end_to_end_shapes_and_determinism():
    cfg = small_config(dilations=(1, 2, 4))
    params = init_params(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(7)
    codes1 = np.asarray(generate(params, cfg, 50, key, batch_size=2))
    codes2 = np.asarray(generate(params, cfg, 50, key, batch_size=2))
    assert codes1.shape == (2, 50)
    assert codes1.min() >= 0 and codes1.max() < cfg.quantization_channels
    np.testing.assert_array_equal(codes1, codes2)  # fixed-seed determinism
    codes3 = np.asarray(generate(params, cfg, 50, jax.random.PRNGKey(8),
                                 batch_size=2))
    assert not np.array_equal(codes1, codes3)


def test_generate_with_seed_matches_teacher_forcing(rng):
    # Priming with a seed then generating 1 sample must draw from the same
    # logits as the full forward on [seed] — end-to-end seam check.
    cfg = small_config()
    params = init_params(jax.random.PRNGKey(0), cfg)
    T = cfg.receptive_field + 4
    seed_codes = jnp.asarray(rng.randint(0, cfg.quantization_channels, (1, T)))

    state = init_sampler_state(cfg, 1)
    state = prime_state(params, cfg, state, seed_codes[:, :-1])
    x = one_hot(seed_codes[:, -1], cfg.quantization_channels)
    _, logits_inc = sampler_step(params, cfg, state, x)

    full = forward(params, cfg, one_hot(seed_codes, cfg.quantization_channels))
    np.testing.assert_allclose(np.asarray(logits_inc),
                               np.asarray(full[:, -1, :]),
                               rtol=1e-4, atol=1e-5)


def test_scalar_input_incremental_matches_forward(rng):
    # Scalar-input incremental generation (the reference raises
    # NotImplementedError here — new capability): teacher-forced stepping
    # must match the full conv forward.
    cfg = small_config(scalar_input=True, initial_filter_width=4)
    params = init_params(jax.random.PRNGKey(3), cfg)
    T = cfg.receptive_field + 6
    audio = jnp.asarray(rng.uniform(-1, 1, (2, T)).astype(np.float32))

    state = init_sampler_state(cfg, 2)
    outs = []
    for t in range(T):
        state, logits = sampler_step(params, cfg, state,
                                     audio[:, t][..., None])
        outs.append(np.asarray(logits))
    inc = np.stack(outs, axis=1)

    full = np.asarray(forward(params, cfg, audio[..., None]))
    np.testing.assert_allclose(inc, full, rtol=1e-4, atol=1e-5)


def test_scalar_input_generate_end_to_end():
    cfg = small_config(scalar_input=True, initial_filter_width=4,
                       dilations=(1, 2, 4))
    params = init_params(jax.random.PRNGKey(0), cfg)
    codes = np.asarray(generate(params, cfg, 30, jax.random.PRNGKey(5),
                                batch_size=2))
    assert codes.shape == (2, 30)
    assert codes.min() >= 0 and codes.max() < cfg.quantization_channels
