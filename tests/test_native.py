"""Native C++ data-path parity tests (native/wavenet_data.cpp vs the
pure-Python/scipy implementations)."""

import numpy as np
import pytest
from scipy.io import wavfile

from wavenet_tpu.audio import (
    mu_law_decode_np, mu_law_encode_np, read_wav, resample as resample_py,
    trim_silence as trim_py, write_wav)
from wavenet_tpu.data import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def test_mulaw_encode_exact(rng):
    x = rng.uniform(-1.5, 1.5, 10000).astype(np.float32)
    np.testing.assert_array_equal(native.mu_law_encode(x, 256),
                                  mu_law_encode_np(x, 256))
    np.testing.assert_array_equal(native.mu_law_encode(x, 64),
                                  mu_law_encode_np(x, 64))


def test_mulaw_decode_close(rng):
    codes = rng.randint(0, 256, 5000).astype(np.int32)
    np.testing.assert_allclose(native.mu_law_decode(codes, 256),
                               mu_law_decode_np(codes, 256),
                               rtol=1e-6, atol=1e-7)


def test_load_wav_pcm16_matches_scipy(tmp_path, rng):
    sr = 8000
    x = (0.4 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(
        np.float32)
    path = str(tmp_path / "a.wav")
    write_wav(path, x, sr)
    nat = native.load_wav(path)
    assert nat is not None
    audio_n, sr_n = nat
    audio_p, sr_p = read_wav(path)
    assert sr_n == sr_p == sr
    np.testing.assert_allclose(audio_n, audio_p, atol=1e-7)


def test_load_wav_stereo_mix(tmp_path):
    sr = 4000
    left = np.linspace(-0.5, 0.5, sr).astype(np.float32)
    right = -left
    stereo = np.stack([left, right], axis=1)
    path = str(tmp_path / "st.wav")
    wavfile.write(path, sr, (stereo * 32767).astype(np.int16))
    audio_n, _ = native.load_wav(path)
    audio_p, _ = read_wav(path)
    np.testing.assert_allclose(audio_n, audio_p, atol=1e-6)


def test_resample_close_to_scipy(rng):
    sr_in, sr_out = 48000, 16000
    t = np.arange(sr_in) / sr_in
    x = (0.5 * np.sin(2 * np.pi * 440 * t)
         + 0.2 * np.sin(2 * np.pi * 1320 * t)).astype(np.float32)
    nat = native.resample(x, sr_in, sr_out)
    ref = resample_py(x, sr_in, sr_out)
    assert nat is not None
    assert abs(len(nat) - len(ref)) <= 1
    n = min(len(nat), len(ref))
    # Different filter designs; compare away from the edges.
    err = np.abs(nat[100:n - 100] - ref[100:n - 100])
    assert float(err.max()) < 0.01, float(err.max())


def test_resample_identity():
    x = np.random.RandomState(0).randn(1000).astype(np.float32)
    out = native.resample(x, 16000, 16000)
    np.testing.assert_array_equal(out, x)


def test_trim_silence_matches_python():
    sr = 4000
    silence = np.zeros(sr, np.float32)
    loud = (0.5 * np.sin(2 * np.pi * 200 * np.arange(sr) / sr)).astype(
        np.float32)
    audio = np.concatenate([silence, loud, silence])
    nat = native.trim_silence(audio, 0.05)
    ref = trim_py(audio, 0.05)
    assert nat is not None
    np.testing.assert_array_equal(nat, ref)


def test_trim_silence_all_quiet():
    audio = (1e-4 * np.random.RandomState(0).randn(5000)).astype(np.float32)
    assert native.trim_silence(audio, 0.05).size == 0


def test_reader_uses_native(tmp_path):
    sr = 4000
    x = (0.5 * np.sin(2 * np.pi * 200 * np.arange(sr) / sr)).astype(
        np.float32)
    wavfile.write(str(tmp_path / "p1_001.wav"), sr,
                  (x * 32767).astype(np.int16))
    from wavenet_tpu.data.reader import AudioReader
    with AudioReader(str(tmp_path), sample_rate=sr, receptive_field=16,
                     sample_size=64, seed=0, use_native=True) as r:
        batch = r.dequeue(2)
    assert batch.shape == (2, 80)
    assert np.isfinite(batch).all()
