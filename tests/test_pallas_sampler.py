"""Pallas sampler kernel parity tests (interpret mode on CPU).

The kernel's teacher-forced logits must match the full conv forward
exactly — the same keystone as the scan sampler (SURVEY §3.5), one level
deeper in the stack.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavenet_tpu.models.config import WaveNetConfig
from wavenet_tpu.models.wavenet import embed_gc, forward, init_params, one_hot
from wavenet_tpu.kernels.sampler import (
    generate_pallas, pack_sampler_weights, ring_offsets)


def small_config(**kw):
    d = dict(dilations=(1, 2, 4, 8), residual_channels=4,
             dilation_channels=4, skip_channels=8,
             quantization_channels=32, use_biases=True)
    d.update(kw)
    return WaveNetConfig(**d)


@pytest.mark.parametrize("gc", [False, True])
def test_forced_logits_match_forward(gc, rng):
    cfg = small_config(gc_channels=4 if gc else None,
                       gc_cardinality=4 if gc else None)
    params = init_params(jax.random.PRNGKey(0), cfg)
    B, T = 2, cfg.receptive_field + 6
    codes = jnp.asarray(rng.randint(0, cfg.quantization_channels, (B, T)))
    gc_ids = jnp.asarray([0, 3]) if gc else None

    _, logits = generate_pallas(
        params, cfg, n_samples=1, seed=0, batch_size=B,
        gc_ids=gc_ids, seed_codes=codes, collect_logits=True,
        interpret=True)

    gc_emb = embed_gc(params, cfg, gc_ids) if gc else None
    full = forward(params, cfg, one_hot(codes, cfg.quantization_channels),
                   gc_emb)
    # Kernel logits[t] answer "what follows codes[:, t]" — compare the
    # teacher-forced prefix (T positions).
    np.testing.assert_allclose(np.asarray(logits[:, :T, :]),
                               np.asarray(full), rtol=1e-4, atol=1e-5)


def test_sampled_codes_shape_and_range(rng):
    cfg = small_config()
    params = init_params(jax.random.PRNGKey(0), cfg)
    codes = generate_pallas(params, cfg, n_samples=20, seed=7,
                            batch_size=2, interpret=True)
    codes = np.asarray(codes)
    assert codes.shape == (2, 20)
    assert codes.min() >= 0 and codes.max() < cfg.quantization_channels


def test_pack_layout_shapes():
    cfg = small_config(gc_channels=4, gc_cardinality=4)
    params = init_params(jax.random.PRNGKey(1), cfg)
    gc_emb = embed_gc(params, cfg, jnp.asarray([1, 2, 3]))
    packed = pack_sampler_weights(params, cfg, 3, gc_emb)
    L, R, D, S = (cfg.num_layers, cfg.residual_channels,
                  cfg.dilation_channels, cfg.skip_channels)
    assert packed.layer_w.shape == (L, 2 * R, 2 * D)
    assert packed.layer_add.shape == (L, 3, 2 * D)
    assert packed.dense_w.shape == (L, D, R)
    assert packed.skip_w.shape == (L, D, S)
    assert packed.skip_b.shape == (1, S)
    # Gate pre-scaling: the gate half of layer_w is 0.5x the raw weights.
    np.testing.assert_allclose(
        np.asarray(packed.layer_w[:, :R, D:]),
        0.5 * np.asarray(params["gate"][:, 0]), rtol=1e-6)
    assert ring_offsets(cfg) == (0, 1, 3, 7)


def test_seeded_continuation_consistency(rng):
    # Forcing a seed then sampling: the forced prefix of the emitted
    # stream must echo the seed's continuation exactly.
    cfg = small_config()
    params = init_params(jax.random.PRNGKey(0), cfg)
    seed_codes = jnp.asarray(
        rng.randint(0, cfg.quantization_channels, (1, 10)))
    out, logits = generate_pallas(params, cfg, n_samples=5, seed=3,
                                  batch_size=1, seed_codes=seed_codes,
                                  collect_logits=True, interpret=True)
    assert out.shape == (1, 5)
    # Deterministic per seed.
    out2 = generate_pallas(params, cfg, n_samples=5, seed=3, batch_size=1,
                           seed_codes=seed_codes, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_batch_chunked_matches_full(rng):
    # Grid over batch chunks: forced-logits must be identical to the
    # single-program run (state is chunk-local; only the PRNG differs).
    cfg = small_config()
    params = init_params(jax.random.PRNGKey(0), cfg)
    B, T = 4, cfg.receptive_field + 5
    codes = jnp.asarray(rng.randint(0, cfg.quantization_channels, (B, T)))

    _, logits_full = generate_pallas(
        params, cfg, n_samples=1, seed=0, batch_size=B, seed_codes=codes,
        collect_logits=True, interpret=True)
    _, logits_chunked = generate_pallas(
        params, cfg, n_samples=1, seed=0, batch_size=B, seed_codes=codes,
        collect_logits=True, interpret=True, batch_chunk=2)
    np.testing.assert_allclose(np.asarray(logits_chunked),
                               np.asarray(logits_full),
                               rtol=1e-5, atol=1e-6)

    # Sampled streams must NOT be identical across chunks (decorrelated
    # PRNG per program).
    out = np.asarray(generate_pallas(params, cfg, n_samples=40, seed=3,
                                     batch_size=4, interpret=True,
                                     batch_chunk=1))
    assert out.shape == (4, 40)


def test_scalar_input_pallas_matches_forward(rng):
    # Scalar-input mode: teacher-forced logits == full conv forward, and
    # free-running generation feeds back decoded amplitudes.
    cfg = small_config(scalar_input=True, initial_filter_width=4)
    params = init_params(jax.random.PRNGKey(4), cfg)
    B, T = 2, cfg.receptive_field + 6
    audio = jnp.asarray(rng.uniform(-1, 1, (B, T)).astype(np.float32))

    _, logits = generate_pallas(params, cfg, n_samples=1, seed=0,
                                batch_size=B, seed_codes=audio,
                                collect_logits=True, interpret=True)
    full = forward(params, cfg, audio[..., None])
    np.testing.assert_allclose(np.asarray(logits[:, :T, :]),
                               np.asarray(full), rtol=1e-4, atol=1e-5)

    codes = np.asarray(generate_pallas(params, cfg, n_samples=25, seed=3,
                                       batch_size=B, interpret=True))
    assert codes.shape == (B, 25)
    assert codes.min() >= 0 and codes.max() < cfg.quantization_channels


@pytest.mark.parametrize("spec", [
    dict(dilations=(1, 1, 2, 2), quantization_channels=64,
         residual_channels=8, dilation_channels=8, skip_channels=8,
         use_biases=False),
    dict(dilations=(1, 3, 9), quantization_channels=16,
         residual_channels=4, dilation_channels=8, skip_channels=32,
         use_biases=True),                      # non-power-of-2 dilations
    dict(dilations=(1, 2, 4, 8, 16, 32), quantization_channels=32,
         residual_channels=16, dilation_channels=4, skip_channels=8,
         use_biases=True, gc_channels=6, gc_cardinality=11),
])
def test_parity_sweep_configs(spec, rng):
    # Sweep odd configurations (repeated dilations, non-power-of-2, R!=D,
    # no biases, non-square gc): pallas forced logits == conv forward ==
    # scan sampler.
    from wavenet_tpu.sample import init_sampler_state, sampler_step
    cfg = WaveNetConfig(**spec)
    params = init_params(jax.random.PRNGKey(7), cfg)
    B, T = 2, cfg.receptive_field + 4
    codes = jnp.asarray(rng.randint(0, cfg.quantization_channels, (B, T)))
    gc_ids = (jnp.asarray([0, spec.get("gc_cardinality", 1) - 1])
              if cfg.gc_enabled else None)
    gc_emb = embed_gc(params, cfg, gc_ids) if cfg.gc_enabled else None

    full = np.asarray(forward(params, cfg,
                              one_hot(codes, cfg.quantization_channels),
                              gc_emb))
    _, logits_p = generate_pallas(params, cfg, n_samples=1, seed=0,
                                  batch_size=B, gc_ids=gc_ids,
                                  seed_codes=codes, collect_logits=True,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(logits_p[:, :T, :]), full,
                               rtol=1e-4, atol=1e-5)

    state = init_sampler_state(cfg, B)
    outs = []
    for t in range(T):
        state, lg = sampler_step(params, cfg, state,
                                 one_hot(codes[:, t],
                                         cfg.quantization_channels), gc_emb)
        outs.append(np.asarray(lg))
    np.testing.assert_allclose(np.stack(outs, 1), full, rtol=1e-4,
                               atol=1e-5)


def test_hbm_ring_matches_forward(rng):
    # The HBM-ring single-pass kernel must produce the same teacher-forced
    # logits as the conv forward.
    cfg = small_config()
    params = init_params(jax.random.PRNGKey(0), cfg)
    B, T = 3, cfg.receptive_field + 5
    codes = jnp.asarray(rng.randint(0, cfg.quantization_channels, (B, T)))
    _, logits = generate_pallas(params, cfg, n_samples=1, seed=0,
                                batch_size=B, seed_codes=codes,
                                collect_logits=True, interpret=True,
                                ring_in_hbm=True)
    full = forward(params, cfg, one_hot(codes, cfg.quantization_channels))
    np.testing.assert_allclose(np.asarray(logits[:, :T, :]),
                               np.asarray(full), rtol=1e-4, atol=1e-5)

    out = np.asarray(generate_pallas(params, cfg, n_samples=20, seed=3,
                                     batch_size=B, interpret=True,
                                     ring_in_hbm=True))
    assert out.shape == (B, 20)


@pytest.mark.parametrize("variant", ["gc", "scalar"])
def test_hbm_ring_variants(variant, rng):
    if variant == "gc":
        cfg = small_config(gc_channels=4, gc_cardinality=4)
        gc_ids = jnp.asarray([1, 3])
    else:
        cfg = small_config(scalar_input=True, initial_filter_width=4)
        gc_ids = None
    params = init_params(jax.random.PRNGKey(5), cfg)
    B, T = 2, cfg.receptive_field + 5
    if variant == "scalar":
        seed_codes = jnp.asarray(rng.uniform(-1, 1, (B, T)).astype(np.float32))
        net_in = seed_codes[..., None]
        gc_emb = None
    else:
        seed_codes = jnp.asarray(
            rng.randint(0, cfg.quantization_channels, (B, T)))
        net_in = one_hot(seed_codes, cfg.quantization_channels)
        gc_emb = embed_gc(params, cfg, gc_ids)

    _, logits = generate_pallas(params, cfg, n_samples=1, seed=0,
                                batch_size=B, gc_ids=gc_ids,
                                seed_codes=seed_codes, collect_logits=True,
                                interpret=True, ring_in_hbm=True)
    full = forward(params, cfg, net_in, gc_emb)
    np.testing.assert_allclose(np.asarray(logits[:, :T, :]),
                               np.asarray(full), rtol=1e-4, atol=1e-5)


def test_windowed_logits_match_full_collection(rng):
    """collect_logits=W (int) returns the LAST W steps' logits in order.

    Bounded-VMEM window collection is what the >=100k-sample hardware
    stress test uses — the ring unscramble must reproduce the tail of
    the full collection exactly.
    """
    cfg = small_config()
    params = init_params(jax.random.PRNGKey(0), cfg)
    B, T = 2, cfg.receptive_field + 11
    codes = jnp.asarray(rng.randint(0, cfg.quantization_channels, (B, T)))

    _, full = generate_pallas(
        params, cfg, n_samples=4, seed=0, batch_size=B,
        seed_codes=codes, collect_logits=True, interpret=True)
    W = 7
    _, win = generate_pallas(
        params, cfg, n_samples=4, seed=0, batch_size=B,
        seed_codes=codes, collect_logits=W, interpret=True)
    assert win.shape == (B, W, full.shape[2])
    np.testing.assert_array_equal(np.asarray(win),
                                  np.asarray(full[:, -W:, :]))


def test_windowed_logits_hbm_ring(rng):
    cfg = small_config()
    params = init_params(jax.random.PRNGKey(0), cfg)
    B, T = 2, cfg.receptive_field + 11
    codes = jnp.asarray(rng.randint(0, cfg.quantization_channels, (B, T)))

    _, full = generate_pallas(
        params, cfg, n_samples=4, seed=0, batch_size=B,
        seed_codes=codes, collect_logits=True, ring_in_hbm=True,
        interpret=True)
    W = 5
    _, win = generate_pallas(
        params, cfg, n_samples=4, seed=0, batch_size=B,
        seed_codes=codes, collect_logits=W, ring_in_hbm=True,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(win),
                                  np.asarray(full[:, -W:, :]))


def test_stream_io_matches_vmem_path(rng, monkeypatch):
    """HBM-streamed forced/codes IO reproduces the in-VMEM kernel.

    Shrink the IO chunk so a short interpret run crosses several chunk
    boundaries in both the forced-prefetch and codes-flush pipelines.
    """
    import wavenet_tpu.kernels.sampler as sampler_mod
    monkeypatch.setattr(sampler_mod, "_IO_CHUNK", 8)

    cfg = small_config()
    params = init_params(jax.random.PRNGKey(0), cfg)
    B, T = 2, cfg.receptive_field + 21   # ~4.5 chunks of 8
    codes = jnp.asarray(rng.randint(0, cfg.quantization_channels, (B, T)))

    _, ref_logits = generate_pallas(
        params, cfg, n_samples=1, seed=0, batch_size=B,
        seed_codes=codes, collect_logits=True, interpret=True)
    out_s, logits_s = generate_pallas(
        params, cfg, n_samples=1, seed=0, batch_size=B,
        seed_codes=codes, collect_logits=True, ring_in_hbm=True,
        stream_io=True, interpret=True)
    np.testing.assert_allclose(np.asarray(logits_s), np.asarray(ref_logits),
                               rtol=1e-4, atol=1e-5)

    # Teacher-forced codes come back through the HBM stream unchanged.
    ref_out = generate_pallas(
        params, cfg, n_samples=1, seed=0, batch_size=B, seed_codes=codes,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(out_s)[:, :-1],
                                  np.asarray(ref_out)[:, :-1])


def test_stream_io_windowed_logits(rng, monkeypatch):
    import wavenet_tpu.kernels.sampler as sampler_mod
    monkeypatch.setattr(sampler_mod, "_IO_CHUNK", 8)

    cfg = small_config()
    params = init_params(jax.random.PRNGKey(0), cfg)
    B, T = 2, cfg.receptive_field + 13
    codes = jnp.asarray(rng.randint(0, cfg.quantization_channels, (B, T)))

    _, full = generate_pallas(
        params, cfg, n_samples=1, seed=0, batch_size=B, seed_codes=codes,
        collect_logits=True, ring_in_hbm=True, stream_io=True,
        interpret=True)
    _, win = generate_pallas(
        params, cfg, n_samples=1, seed=0, batch_size=B, seed_codes=codes,
        collect_logits=5, ring_in_hbm=True, stream_io=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(win),
                                  np.asarray(full[:, -5:, :]))


def test_resumable_stream_segments_equal_one_run(rng, monkeypatch):
    """Two resumed segments == one long run, sample for sample.

    Teacher-forced determinism: force the whole stream so the PRNG never
    matters, and check the kernel's exported state (HBM ring + causal
    register + absolute phase) reproduces the single-run codes exactly.
    """
    import wavenet_tpu.kernels.sampler as sampler_mod
    monkeypatch.setattr(sampler_mod, "_IO_CHUNK", 8)
    from wavenet_tpu.kernels.sampler import generate_pallas_resumable

    cfg = small_config()
    params = init_params(jax.random.PRNGKey(0), cfg)
    B = 2
    rf = cfg.receptive_field
    seed_codes = jnp.asarray(
        rng.randint(0, cfg.quantization_channels, (B, rf)))

    # Single run: logits argmax made deterministic via temperature ~ 0.
    one, _ = None, None
    full = generate_pallas(params, cfg, n_samples=20, seed=0, batch_size=B,
                           seed_codes=seed_codes, temperature=1e-6,
                           ring_in_hbm=True, stream_io=True, interpret=True)

    seg1, carry = generate_pallas_resumable(
        params, cfg, n_samples=9, seed=0, batch_size=B,
        seed_codes=seed_codes, temperature=1e-6, interpret=True)
    seg2, carry = generate_pallas_resumable(
        params, cfg, n_samples=11, seed=0, batch_size=B,
        temperature=1e-6, carry=carry, interpret=True)
    joined = np.concatenate([np.asarray(seg1), np.asarray(seg2)], axis=1)
    np.testing.assert_array_equal(joined, np.asarray(full))


def test_resumable_stream_three_segments(rng, monkeypatch):
    import wavenet_tpu.kernels.sampler as sampler_mod
    monkeypatch.setattr(sampler_mod, "_IO_CHUNK", 8)
    from wavenet_tpu.kernels.sampler import generate_pallas_resumable

    cfg = small_config()
    params = init_params(jax.random.PRNGKey(1), cfg)
    B = 1
    seed_codes = jnp.asarray(
        rng.randint(0, cfg.quantization_channels, (B, cfg.receptive_field)))
    full = generate_pallas(params, cfg, n_samples=18, seed=0, batch_size=B,
                           seed_codes=seed_codes, temperature=1e-6,
                           ring_in_hbm=True, stream_io=True, interpret=True)
    outs, carry = [], None
    for n in (5, 6, 7):
        seg, carry = generate_pallas_resumable(
            params, cfg, n_samples=n, seed=0, batch_size=B,
            seed_codes=seed_codes if carry is None else None,
            temperature=1e-6, carry=carry, interpret=True)
        outs.append(np.asarray(seg))
    np.testing.assert_array_equal(np.concatenate(outs, axis=1),
                                  np.asarray(full))


# ---------------------------------------------------------------------------
# Local conditioning through the kernels
# ---------------------------------------------------------------------------

def _lc_cfg(**kw):
    return small_config(lc_channels=3, **kw)


def _lc_split(stream):
    """Full [B, T, C] stream -> (lc_prime rows 0..T-2, lc row T-1) for a
    forced run of T codes + 1 sampled step (generate_pallas convention:
    kernel step t is conditioned by stream row t)."""
    return stream[:, :-1], stream[:, -1:]


def test_lc_forced_logits_match_forward(rng):
    cfg = _lc_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    B, T = 2, cfg.receptive_field + 6
    codes = jnp.asarray(rng.randint(0, cfg.quantization_channels, (B, T)))
    stream = jnp.asarray(rng.standard_normal((B, T, 3)).astype(np.float32))
    lc_prime, lc = _lc_split(stream)

    _, logits = generate_pallas(
        params, cfg, n_samples=1, seed=0, batch_size=B, seed_codes=codes,
        lc=lc, lc_prime=lc_prime, collect_logits=True, interpret=True)

    full = forward(params, cfg, one_hot(codes, cfg.quantization_channels),
                   None, lc=stream)
    np.testing.assert_allclose(np.asarray(logits[:, :T, :]),
                               np.asarray(full), rtol=1e-4, atol=1e-5)


def test_lc_stream_io_matches_vmem(rng, monkeypatch):
    import wavenet_tpu.kernels.sampler as sampler_mod
    monkeypatch.setattr(sampler_mod, "_IO_CHUNK", 8)

    cfg = _lc_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    B, T = 2, cfg.receptive_field + 21
    codes = jnp.asarray(rng.randint(0, cfg.quantization_channels, (B, T)))
    stream = jnp.asarray(rng.standard_normal((B, T, 3)).astype(np.float32))
    lc_prime, lc = _lc_split(stream)

    _, ref = generate_pallas(
        params, cfg, n_samples=1, seed=0, batch_size=B, seed_codes=codes,
        lc=lc, lc_prime=lc_prime, collect_logits=True, interpret=True)
    _, got = generate_pallas(
        params, cfg, n_samples=1, seed=0, batch_size=B, seed_codes=codes,
        lc=lc, lc_prime=lc_prime, collect_logits=True, ring_in_hbm=True,
        stream_io=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_lc_prefill_matches_sequential(rng, monkeypatch):
    import wavenet_tpu.kernels.sampler as sampler_mod
    monkeypatch.setattr(sampler_mod, "_IO_CHUNK", 8)

    cfg = _lc_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    B, T = 2, cfg.receptive_field + 4
    codes = jnp.asarray(rng.randint(0, cfg.quantization_channels, (B, T)))
    stream = jnp.asarray(rng.standard_normal((B, T, 3)).astype(np.float32))
    lc_prime, lc = _lc_split(stream)

    _, seq = generate_pallas(
        params, cfg, n_samples=1, seed=0, batch_size=B, seed_codes=codes,
        lc=lc, lc_prime=lc_prime, collect_logits=True, interpret=True)
    _, pre = generate_pallas(
        params, cfg, n_samples=1, seed=0, batch_size=B, seed_codes=codes,
        lc=lc, lc_prime=lc_prime, collect_logits=True, prefill=True,
        interpret=True)
    # Prefill collects decode-phase logits only (the last position).
    np.testing.assert_allclose(np.asarray(pre[:, -1]),
                               np.asarray(seq[:, -1]),
                               rtol=1e-4, atol=1e-5)


def test_lc_batch_chunked_matches_full(rng):
    cfg = _lc_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    B, T = 4, cfg.receptive_field + 5
    codes = jnp.asarray(rng.randint(0, cfg.quantization_channels, (B, T)))
    stream = jnp.asarray(rng.standard_normal((B, T, 3)).astype(np.float32))
    lc_prime, lc = _lc_split(stream)

    _, ref = generate_pallas(
        params, cfg, n_samples=1, seed=0, batch_size=B, seed_codes=codes,
        lc=lc, lc_prime=lc_prime, collect_logits=True, interpret=True)
    _, got = generate_pallas(
        params, cfg, n_samples=1, seed=0, batch_size=B, seed_codes=codes,
        lc=lc, lc_prime=lc_prime, collect_logits=True, interpret=True,
        batch_chunk=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_lc_resumable_segments_equal_one_run(rng, monkeypatch):
    """Resumed LC segments (stream sliced per segment) == one long run."""
    import wavenet_tpu.kernels.sampler as sampler_mod
    monkeypatch.setattr(sampler_mod, "_IO_CHUNK", 8)
    from wavenet_tpu.kernels.sampler import generate_pallas_resumable

    cfg = _lc_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    B, n = 2, 20
    rf = cfg.receptive_field
    seed_codes = jnp.asarray(
        rng.randint(0, cfg.quantization_channels, (B, rf)))
    lc = jnp.asarray(rng.standard_normal((B, n, 3)).astype(np.float32))

    full = generate_pallas(params, cfg, n_samples=n, seed=0, batch_size=B,
                           seed_codes=seed_codes, temperature=1e-6, lc=lc,
                           prefill=True, interpret=True)

    seg1, carry = generate_pallas_resumable(
        params, cfg, n_samples=9, seed=0, batch_size=B,
        seed_codes=seed_codes, temperature=1e-6, lc=lc[:, :9],
        interpret=True)
    seg2, carry = generate_pallas_resumable(
        params, cfg, n_samples=11, seed=0, batch_size=B,
        temperature=1e-6, carry=carry, lc=lc[:, 9:], interpret=True)
    joined = np.concatenate([np.asarray(seg1), np.asarray(seg2)], axis=1)
    np.testing.assert_array_equal(joined, np.asarray(full))


def test_lc_scan_vs_pallas_free_run_argmax(rng):
    """Greedy (T->0) free-running generation matches the scan sampler
    with the same LC stream — the fast==slow keystone with LC, across
    implementations (PRNG never matters at temperature ~ 0)."""
    from wavenet_tpu.sample import generate

    cfg = _lc_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    B, n = 2, 12
    rf = cfg.receptive_field
    seed_codes = jnp.asarray(
        rng.randint(0, cfg.quantization_channels, (B, rf)))
    lc = jnp.asarray(rng.standard_normal((B, n, 3)).astype(np.float32))

    pal = generate_pallas(params, cfg, n_samples=n, seed=0, batch_size=B,
                          seed_codes=seed_codes, temperature=1e-6, lc=lc,
                          interpret=True)
    scan = generate(params, cfg, n, jax.random.PRNGKey(0), batch_size=B,
                    seed_codes=seed_codes, temperature=1e-6, lc=lc)
    np.testing.assert_array_equal(np.asarray(pal), np.asarray(scan))


def test_stream_io_multitile_batch_matches_vmem(rng, monkeypatch):
    """b > 128 packs the forced/codes streams into multi-tile lane
    records ([T_pad, 256] at b130-256); teacher-forced logits must
    still match the in-VMEM kernel lane for lane (round-4: the b256
    probe past the old b<=128 streamed-decode cap)."""
    import wavenet_tpu.kernels.sampler as sampler_mod
    monkeypatch.setattr(sampler_mod, "_IO_CHUNK", 16)

    cfg = small_config()
    params = init_params(jax.random.PRNGKey(0), cfg)
    B, T = 130, cfg.receptive_field + 9   # 2 lane tiles, ragged lanes
    assert sampler_mod._io_chunk_for(B) == 8   # 16 * 128 // 256
    codes = jnp.asarray(rng.randint(0, cfg.quantization_channels, (B, T)))

    _, ref_logits = generate_pallas(
        params, cfg, n_samples=1, seed=0, batch_size=B,
        seed_codes=codes, collect_logits=True, interpret=True)
    out_s, logits_s = generate_pallas(
        params, cfg, n_samples=1, seed=0, batch_size=B,
        seed_codes=codes, collect_logits=True, ring_in_hbm=True,
        stream_io=True, interpret=True)
    np.testing.assert_allclose(np.asarray(logits_s), np.asarray(ref_logits),
                               rtol=1e-4, atol=1e-5)

    ref_out = generate_pallas(
        params, cfg, n_samples=1, seed=0, batch_size=B, seed_codes=codes,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(out_s)[:, :-1],
                                  np.asarray(ref_out)[:, :-1])


def test_multitile_batch_vmem_estimate_and_attempts():
    """The streamed path's VMEM estimate stays sane past b128 and the
    selector now offers the prefill+streamed attempt up to b512."""
    from wavenet_tpu.kernels.sampler import (_io_chunk_for,
                                             stream_hbm_sampler_vmem_bytes)

    cfg = small_config()
    b128 = stream_hbm_sampler_vmem_bytes(cfg, 128)
    b256 = stream_hbm_sampler_vmem_bytes(cfg, 256)
    assert b128 < b256 < 4 * b128          # grows, but sub-linearly in tiles
    # IO chunk halves per extra lane tile: byte budget is constant.
    assert _io_chunk_for(1) == _io_chunk_for(128) == 1024
    assert _io_chunk_for(129) == _io_chunk_for(256) == 512
    assert _io_chunk_for(512) == 256


def test_lc_multitile_prefill_matches_single_tile_lanes(rng, monkeypatch):
    """LC conditioning rides the multi-tile (b>128) prefill+streamed
    path: the lc_hbm records are [T, B, 128] (B-indexed, unaffected by
    the record-lane packing), so teacher-forced logits at b130 must
    match the parallel conv forward lane for lane."""
    import wavenet_tpu.kernels.sampler as sampler_mod
    monkeypatch.setattr(sampler_mod, "_IO_CHUNK", 16)

    cfg = _lc_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    B, T = 130, cfg.receptive_field + 5
    codes = jnp.asarray(rng.randint(0, cfg.quantization_channels, (B, T)))
    stream = jnp.asarray(rng.standard_normal((B, T, 3)).astype(np.float32))
    lc_prime, lc = _lc_split(stream)

    _, logits = generate_pallas(
        params, cfg, n_samples=1, seed=0, batch_size=B, seed_codes=codes,
        lc=lc, lc_prime=lc_prime, collect_logits=True, prefill=True,
        interpret=True)

    full = forward(params, cfg, one_hot(codes, cfg.quantization_channels),
                   None, lc=stream)
    # Prefill = decode-phase logits only (the final step).
    np.testing.assert_allclose(np.asarray(logits[:, -1, :]),
                               np.asarray(full[:, -1, :]),
                               rtol=1e-4, atol=1e-5)
