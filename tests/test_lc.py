"""Local conditioning (new capability — WaveNet paper §2.5; the
reference ships GC only, so there is no reference test to mirror).

Covers: init/key parity, the zero-weight no-op identity, the fast≡slow
keystone extended to LC, prefill/extend parity, the upsampling
utilities, reader sidecar lockstep (trim/pad/chunk), training, and an
end-to-end steering check (slow): a model trained on audio whose pitch
follows a per-timestep one-hot feature must follow that feature at
generation time.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavenet_tpu.audio import mu_law_decode_np
from wavenet_tpu.lc import fit_lc_to_length, upsample_lc
from wavenet_tpu.models.config import WaveNetConfig
from wavenet_tpu.models.wavenet import (
    embed_gc, forward_codes, init_params, loss_fn)
from wavenet_tpu.sample import (
    _featurize, extend_state, generate, init_sampler_state, prefill_state,
    prime_state, sampler_step)


def lc_cfg(**kw):
    d = dict(dilations=(1, 2, 4, 8, 1, 2, 4), residual_channels=16,
             dilation_channels=16, skip_channels=24,
             quantization_channels=64, use_biases=True, lc_channels=3)
    d.update(kw)
    return WaveNetConfig(**d)


def _rand_inputs(cfg, B=2, extra=20, seed=0):
    rng = np.random.RandomState(seed)
    T = cfg.receptive_field + extra
    codes = jnp.asarray(rng.randint(0, cfg.quantization_channels, (B, T)),
                        jnp.int32)
    lc = jnp.asarray(rng.randn(B, T, cfg.lc_channels), jnp.float32)
    return codes, lc


def test_init_shapes_and_key_parity():
    cfg = lc_cfg()
    params = init_params(jax.random.PRNGKey(7), cfg)
    L, Cl, D = cfg.num_layers, cfg.lc_channels, cfg.dilation_channels
    assert params["lc_filter"].shape == (L, Cl, D)
    assert params["lc_gate"].shape == (L, Cl, D)
    # Adding LC must not change the draws of the shared parameters
    # (the lc keys consume keys AFTER every other group).
    base = init_params(jax.random.PRNGKey(7),
                       lc_cfg(lc_channels=None))
    for k in base:
        np.testing.assert_array_equal(np.asarray(base[k]),
                                      np.asarray(params[k]))


def test_zero_lc_weights_is_identity():
    # With zeroed projections, any conditioning stream is a no-op and
    # the logits equal the unconditioned model's (same shared weights).
    cfg = lc_cfg()
    params = init_params(jax.random.PRNGKey(1), cfg)
    params = dict(params, lc_filter=jnp.zeros_like(params["lc_filter"]),
                  lc_gate=jnp.zeros_like(params["lc_gate"]))
    codes, lc = _rand_inputs(cfg)
    with_lc = forward_codes(params, cfg, codes, lc=lc)
    base_params = {k: v for k, v in params.items()
                   if k not in ("lc_filter", "lc_gate")}
    without = forward_codes(base_params, lc_cfg(lc_channels=None), codes)
    np.testing.assert_allclose(np.asarray(with_lc), np.asarray(without),
                               atol=1e-6)


def test_incremental_matches_forward_with_lc():
    # The fast≡slow keystone (reference test_generation.py intent),
    # extended: teacher-forced incremental logits == parallel forward.
    cfg = lc_cfg(gc_channels=4, gc_cardinality=4)
    params = init_params(jax.random.PRNGKey(2), cfg)
    codes, lc = _rand_inputs(cfg)
    gc_emb = embed_gc(params, cfg, jnp.asarray([1, 3], jnp.int32))
    T = codes.shape[1]
    ref = forward_codes(params, cfg, codes[:, :-1], gc_emb, lc=lc[:, 1:])

    st = init_sampler_state(cfg, 2)
    out = []
    for t in range(T - 1):
        st, logits = sampler_step(params, cfg, st,
                                  _featurize(codes[:, t], cfg), gc_emb,
                                  lc_t=lc[:, t + 1])
        out.append(logits)
    inc = jnp.stack(out, axis=1)
    np.testing.assert_allclose(np.asarray(inc), np.asarray(ref), atol=2e-4)


def test_prefill_and_extend_match_sequential_with_lc():
    cfg = lc_cfg()
    params = init_params(jax.random.PRNGKey(3), cfg)
    codes, lc = _rand_inputs(cfg, extra=12, seed=4)
    P = cfg.receptive_field
    seq = prime_state(params, cfg, init_sampler_state(cfg, 2),
                      codes[:, :P - 1], lc=lc[:, 1:P])
    par = prefill_state(params, cfg, codes[:, :P - 1], lc=lc[:, 1:P])
    for a, b in zip(jax.tree.leaves(seq), jax.tree.leaves(par)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    k = 6
    ext_logits, ext_state = extend_state(params, cfg, par,
                                         codes[:, P - 1:P - 1 + k],
                                         lc=lc[:, P:P + k])
    st = seq
    out = []
    for j in range(k):
        st, logits = sampler_step(params, cfg, st,
                                  _featurize(codes[:, P - 1 + j], cfg),
                                  lc_t=lc[:, P + j])
        out.append(logits)
    np.testing.assert_allclose(np.asarray(jnp.stack(out, 1)),
                               np.asarray(ext_logits), atol=2e-4)
    for a, b in zip(jax.tree.leaves(st), jax.tree.leaves(ext_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_loss_and_training_step_with_lc():
    cfg = lc_cfg()
    params = init_params(jax.random.PRNGKey(5), cfg)
    rng = np.random.RandomState(1)
    B, T = 2, cfg.receptive_field + 64
    audio = jnp.asarray(rng.uniform(-0.8, 0.8, (B, T)), jnp.float32)
    lc = jnp.asarray(rng.randn(B, T, cfg.lc_channels), jnp.float32)
    total, aux = loss_fn(params, cfg, audio, None, 0.01, lc=lc)
    assert np.isfinite(float(total))
    grads = jax.grad(
        lambda p: loss_fn(p, cfg, audio, None, None, lc)[0])(params)
    for k in ("lc_filter", "lc_gate"):
        assert float(jnp.linalg.norm(grads[k])) > 0.0, k
    # shape mismatch must be loud
    with pytest.raises(ValueError):
        loss_fn(params, cfg, audio, None, None, lc[:, :-1])


def test_generate_requires_and_accepts_lc():
    cfg = lc_cfg()
    params = init_params(jax.random.PRNGKey(6), cfg)
    with pytest.raises(ValueError):
        generate(params, cfg, 8, jax.random.PRNGKey(0), batch_size=1)
    lc = jnp.zeros((2, 8, cfg.lc_channels))
    codes = generate(params, cfg, 8, jax.random.PRNGKey(0), batch_size=2,
                     lc=lc)
    assert codes.shape == (2, 8)


def test_upsample_and_fit():
    feats = np.asarray([[0.0, 1.0], [2.0, 3.0], [4.0, 5.0]], np.float32)
    rep = upsample_lc(feats, 4, "repeat")
    assert rep.shape == (12, 2)
    np.testing.assert_array_equal(rep[0], rep[3])
    np.testing.assert_array_equal(rep[4], feats[1])
    lin = upsample_lc(feats, 4, "linear")
    assert lin.shape == (12, 2)
    # at frame centers the linear stream hits the frame values exactly
    np.testing.assert_allclose(lin[2], feats[0])
    np.testing.assert_allclose(lin[6], feats[1])
    np.testing.assert_allclose(lin[10], feats[2])
    # strictly increasing channel stays monotonic between centers
    assert np.all(np.diff(lin[2:10, 0]) > 0)
    # crop & pad
    assert fit_lc_to_length(rep, 7).shape == (7, 2)
    padded = fit_lc_to_length(rep, 15)
    np.testing.assert_array_equal(padded[-1], rep[-1])     # edge pad
    zp = fit_lc_to_length(rep, 15, pad_mode="zero")
    np.testing.assert_array_equal(zp[-1], np.zeros(2))


def test_reader_lc_lockstep(tmp_path):
    # Audio encodes the sample index (a ramp); the sidecar encodes the
    # same index at hop 4. After trim/pad/chunk, every dequeued (audio,
    # lc) pair must satisfy lc ≈ index(audio) wherever audio is nonzero.
    from scipy.io import wavfile
    from wavenet_tpu.data.reader import AudioReader

    sr = 1000
    n = 1200
    ramp = (np.arange(n, dtype=np.float32) + 1.0) / n  # loud everywhere
    wavfile.write(str(tmp_path / "p1_000.wav"), sr,
                  (ramp * 20000).astype(np.int16))
    feats = ((np.arange(n // 4, dtype=np.float32) * 4 + 1) / n)[:, None]
    np.save(str(tmp_path / "p1_000.lc.npy"), feats)

    rf, ss = 32, 256
    with AudioReader(str(tmp_path), sr, receptive_field=rf, sample_size=ss,
                     silence_threshold=None, lc_enabled=True,
                     lc_channels=1, lc_hop=4, seed=0) as reader:
        audio = reader.dequeue(2)
        lc = reader.dequeue_lc(2)
    assert audio.shape == (2, rf + ss)
    assert lc.shape == (2, rf + ss, 1)
    # Wherever audio is a real (nonzero) sample, the lc value must be
    # the hop-4 'repeat' upsampling of the same timeline: within 4/n of
    # the index ramp recovered from the decoded audio (int16 write
    # scaled by 20000/32768).
    live = np.abs(audio) > 1e-4
    assert live.any()
    recovered = audio * (32768.0 / 20000.0)
    err = np.abs(lc[..., 0] - recovered)[live]
    assert err.max() < 4.5 / n + 2e-3, err.max()
    # Left pad region: both silent/zero.
    assert np.allclose(audio[:, :rf][~live[:, :rf]], 0.0)
    assert np.allclose(lc[:, :rf, 0][~live[:, :rf]], 0.0)


def test_reader_lc_trim_lockstep(tmp_path):
    # Leading silence must be trimmed from BOTH streams by the same
    # indices: the sidecar marks tone samples with 1.0, so after a trim
    # of ~1.5k samples any lockstep slip would misalign marker and tone
    # by far more than the hop.
    from scipy.io import wavfile
    from wavenet_tpu.data.reader import AudioReader

    sr = 1000
    silence = np.zeros(2000, np.float32)
    tone = 0.5 * np.sin(2 * np.pi * 50 * np.arange(3000) / sr).astype(
        np.float32)
    audio = np.concatenate([silence, tone])
    wavfile.write(str(tmp_path / "p1_000.wav"), sr,
                  (audio * 20000).astype(np.int16))
    # Feature channel 0 = 1.0 on the tone REGION (by index, so the
    # sine's zero crossings don't poke holes in the marker).
    marker = (np.arange(len(audio)) >= len(silence)).astype(np.float32)
    np.save(str(tmp_path / "p1_000.lc.npy"), marker[::4][:, None])

    rf, ss = 16, 256
    with AudioReader(str(tmp_path), sr, receptive_field=rf, sample_size=ss,
                     silence_threshold=0.05, lc_enabled=True,
                     lc_channels=1, lc_hop=4, seed=0) as reader:
        a = reader.dequeue(8)
        lc = reader.dequeue_lc(8)
    # The RMS-frame trim (hop 512) cuts ≈1.5k leading silence samples —
    # verify it fired: the tone must start within the first two chunks
    # (untrimmed it would only appear after 2000 samples ≈ chunk 8).
    assert np.abs(a[:2, rf:]).max() > 0.05
    # Pointwise lockstep: wherever audio is clearly tone, the marker is 1
    # (hop-4 quantization can only blur ±3 samples at region edges).
    loud = np.abs(a) > 0.05
    assert loud.any()
    assert lc[..., 0][loud].mean() > 0.98
    # Receptive-field left-pad: both streams zero at the very start.
    assert np.allclose(a[0, :4], 0.0)
    assert np.allclose(lc[0, :4, 0], 0.0)


@pytest.mark.slow
def test_end_to_end_lc_steers_generation():
    """Train on audio whose pitch follows a one-hot LC feature; at
    generation time a constant LC class must produce THAT class's
    frequency (the LC analogue of the reference's GC steering test)."""
    from wavenet_tpu.train_lib import (
        create_train_state, make_optimizer, make_train_step)

    sr = 2000.0
    freqs = (155.56, 233.08)
    cfg = WaveNetConfig(dilations=(1, 2, 4, 8, 16, 32, 64, 128),
                        residual_channels=16, dilation_channels=16,
                        skip_channels=32, quantization_channels=128,
                        use_biases=True, lc_channels=2)
    # Training clips: pitch switches halfway; LC one-hot marks the
    # active pitch per sample. Phase-continuous at the switch.
    n_half = 1000
    t1 = np.arange(n_half) / sr
    clips, lcs = [], []
    for order in ((0, 1), (1, 0)):
        f_a, f_b = freqs[order[0]], freqs[order[1]]
        ph = 2 * np.pi * f_a * n_half / sr
        seg = np.concatenate([
            0.6 * np.sin(2 * np.pi * f_a * t1),
            0.6 * np.sin(ph + 2 * np.pi * f_b * t1)])
        lc = np.zeros((2 * n_half, 2), np.float32)
        lc[:n_half, order[0]] = 1.0
        lc[n_half:, order[1]] = 1.0
        clips.append(seg.astype(np.float32))
        lcs.append(lc)
    audio = jnp.asarray(np.stack(clips))
    lc = jnp.asarray(np.stack(lcs))

    optimizer = make_optimizer("adam", 4e-3)
    state = create_train_state(jax.random.PRNGKey(0), cfg, optimizer)
    step_fn = make_train_step(cfg, optimizer, None)
    first = last = None
    for i in range(900):
        state, metrics = step_fn(state, audio, None, lc)
        if first is None:
            first = float(jax.device_get(metrics["loss"]))
    last = float(jax.device_get(metrics["loss"]))
    assert last < first * 0.5, (first, last)

    n_gen = 1000
    for cls, expected_f in enumerate(freqs):
        stream = np.zeros((1, n_gen, 2), np.float32)
        stream[..., cls] = 1.0
        codes = generate(state.params, cfg, n_gen, jax.random.PRNGKey(42),
                         batch_size=1, temperature=0.3,
                         lc=jnp.asarray(stream))
        wave = mu_law_decode_np(np.asarray(codes)[0],
                                cfg.quantization_channels)
        w = wave[200:] - wave[200:].mean()
        spectrum = np.abs(np.fft.rfft(w))
        fr = np.fft.rfftfreq(len(w), d=1.0 / sr)
        mask = fr > 50
        peak_f = fr[mask][np.argmax(spectrum[mask])]
        assert abs(peak_f - expected_f) < 25.0, (
            f"lc class {cls}: expected ~{expected_f} Hz, got {peak_f} Hz")


# ---------------------------------------------------------------------------
# Learned upsampling refinement (lc_refine_width — paper §2.5 learned map)
# ---------------------------------------------------------------------------

def _refine_cfg(**kw):
    import dataclasses
    from wavenet_tpu.models.config import WaveNetConfig
    d = dict(dilations=(1, 2, 4, 8), residual_channels=4,
             dilation_channels=4, skip_channels=8,
             quantization_channels=32, use_biases=True,
             lc_channels=3, lc_refine_width=9)
    d.update(kw)
    return WaveNetConfig(**d)


def test_refine_identity_at_init():
    """Identity init: refined loss == unrefined loss at step 0."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    from wavenet_tpu.models.wavenet import init_params, loss_fn, refine_lc

    cfg = _refine_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    B, T = 2, cfg.receptive_field + 40
    audio = jnp.asarray(rng.uniform(-1, 1, (B, T)).astype(np.float32))
    lc = jnp.asarray(rng.standard_normal((B, T, 3)).astype(np.float32))

    np.testing.assert_allclose(np.asarray(refine_lc(params, cfg, lc)),
                               np.asarray(lc), rtol=1e-6, atol=1e-6)

    cfg_off = dataclasses.replace(cfg, lc_refine_width=0)
    ref, _ = loss_fn(params, cfg_off, audio, lc=lc)
    got, _ = loss_fn(params, cfg, audio, lc=lc)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-6)


def test_refine_gradients_flow():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from wavenet_tpu.models.wavenet import init_params, loss_fn

    cfg = _refine_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(1)
    B, T = 2, cfg.receptive_field + 40
    audio = jnp.asarray(rng.uniform(-1, 1, (B, T)).astype(np.float32))
    lc = jnp.asarray(rng.standard_normal((B, T, 3)).astype(np.float32))

    grads, _ = jax.grad(lambda p: loss_fn(p, cfg, audio, lc=lc),
                        has_aux=True)(params)
    for k in ("lc_up_depth", "lc_up_point", "lc_up_bias"):
        assert float(jnp.abs(grads[k]).max()) > 0.0, k


def test_refine_fast_equals_slow():
    """The fast==slow keystone with a NON-identity refiner: perturb the
    refiner params, then greedy scan generation must equal the slow
    window path (predict_proba refines internally too)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from wavenet_tpu.models.wavenet import (
        init_params, maybe_refine_lc, predict_proba)
    from wavenet_tpu.sample import generate

    cfg = _refine_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(5)
    params = dict(params)
    params["lc_up_depth"] = params["lc_up_depth"] + 0.3 * \
        jax.random.normal(key, params["lc_up_depth"].shape)
    params["lc_up_point"] = params["lc_up_point"] + 0.2 * \
        jax.random.normal(key, params["lc_up_point"].shape)

    rng = np.random.RandomState(2)
    B, n = 1, 10
    rf = cfg.receptive_field
    seed_codes = jnp.asarray(rng.randint(0, 32, (B, rf)))
    lc = jnp.asarray(rng.standard_normal((B, n, 3)).astype(np.float32))

    fast = np.asarray(generate(params, cfg, n, jax.random.PRNGKey(0),
                               batch_size=B, seed_codes=seed_codes,
                               temperature=1e-6, lc=lc))

    # Slow path: roll a window; conditioning stream refined ONCE like
    # the fast path (prime region = lc[:, 0] held back), then windowed.
    from wavenet_tpu.sample import _lc_for_prime
    lc_ref = maybe_refine_lc(params, cfg, lc)
    lc_p = _lc_for_prime(lc_ref, None, rf - 1)
    stream = np.concatenate([np.asarray(lc_p), np.asarray(lc_ref)], axis=1)
    import dataclasses
    cfg_noref = dataclasses.replace(cfg, lc_refine_width=0)

    window = np.asarray(seed_codes)
    out = []
    for i in range(n):
        win = window[:, -rf:]
        if win.shape[1] < rf:
            win = np.pad(win, ((0, 0), (rf - win.shape[1], 0)),
                         constant_values=16)
        # Conditioning rows for this window: positions shifted so the
        # last row conditions THIS draw (stream index rf-1+i).
        lo = rf - 1 + i - (rf - 1)
        lc_win = stream[:, lo:rf + i]
        probs = predict_proba(params, cfg_noref, jnp.asarray(win),
                              lc=jnp.asarray(lc_win))
        code = int(np.argmax(np.asarray(probs)[0]))
        out.append(code)
        window = np.concatenate(
            [window, np.full((B, 1), code, window.dtype)], axis=1)
    np.testing.assert_array_equal(fast[0], np.asarray(out))


def test_refine_width_validation():
    import pytest
    with pytest.raises(ValueError):
        _refine_cfg(lc_refine_width=8)      # even
    with pytest.raises(ValueError):
        _refine_cfg(lc_channels=None)       # refine without lc
