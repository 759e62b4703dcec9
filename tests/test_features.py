"""Log-mel feature extraction (wavenet_tpu/features.py) units.

New capability (no reference counterpart): sanity of the mel algebra,
frame/sample alignment with the lc upsampling convention, and the
sidecar-writing CLI driving the data reader end-to-end.
"""

import os

import numpy as np
import pytest

from wavenet_tpu.features import (
    hz_to_mel, log_mel_spectrogram, main as features_main, mel_filterbank,
    mel_to_hz, stft_magnitude, write_sidecars)


def test_mel_scale_roundtrip():
    f = np.array([0.0, 100.0, 440.0, 4000.0, 7999.0])
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(f)), f, rtol=1e-10)


def test_filterbank_shapes_and_coverage():
    fb = mel_filterbank(16000, 1024, 80)
    assert fb.shape == (80, 513)
    # Every filter has some support; interior bins are covered.
    assert (fb.sum(axis=1) > 0).all()
    covered = fb.sum(axis=0)
    assert (covered[5:-5] > 0).all()


def test_tone_lands_in_expected_mel_bin():
    sr, n_fft, n_mels = 16000, 1024, 40
    t = np.arange(sr) / sr
    freq = 1000.0
    audio = 0.5 * np.sin(2 * np.pi * freq * t).astype(np.float32)
    mel = log_mel_spectrogram(audio, sr, n_mels=n_mels, hop=200,
                              n_fft=n_fft)
    # Which mel filter has max center response at 1 kHz?
    fb = mel_filterbank(sr, n_fft, n_mels)
    bin_1k = int(round(freq * n_fft / sr))
    expect = int(np.argmax(fb[:, bin_1k]))
    got = int(np.argmax(mel.mean(axis=0)))
    assert abs(got - expect) <= 1


def test_frame_count_matches_lc_hop_convention():
    sr, hop = 16000, 200
    for T in (sr, sr + 1, sr + hop - 1, hop, hop + 1):
        audio = np.zeros(T, np.float32)
        mel = log_mel_spectrogram(audio, sr, n_mels=8, hop=hop)
        assert mel.shape[0] == -(-T // hop), (T, mel.shape)


def test_stft_frame_alignment_center():
    # An impulse at sample k*hop dominates frame k (center semantics).
    sr, hop, n_fft = 16000, 200, 1024
    audio = np.zeros(sr, np.float32)
    audio[10 * hop] = 1.0
    mag = stft_magnitude(audio, n_fft, hop)
    energy = (mag ** 2).sum(axis=1)
    assert int(np.argmax(energy)) == 10


def test_write_sidecars_and_reader_roundtrip(tmp_path):
    from scipy.io import wavfile
    from wavenet_tpu.data.reader import AudioReader

    sr, hop, n_mels = 2000, 50, 8
    d = tmp_path / "corpus"
    d.mkdir()
    rng = np.random.RandomState(0)
    for spk in (1, 2):
        t = np.arange(sr) / sr
        x = 0.5 * np.sin(2 * np.pi * (200 + 100 * spk) * t)
        wavfile.write(str(d / f"p{spk}_001.wav"), sr,
                      (x * 32767).astype(np.int16))
    n = write_sidecars(str(d), sr, n_mels, hop, n_fft=256,
                       log=lambda *a: None)
    assert n == 2
    assert os.path.exists(str(d / "lc_stats.npz"))
    side = np.load(str(d / "p1_001.lc.npy"))
    assert side.shape == (sr // hop, n_mels)
    # Standardized over the corpus: near zero mean/unit variance.
    both = np.concatenate([np.load(str(d / f"p{s}_001.lc.npy"))
                           for s in (1, 2)])
    np.testing.assert_allclose(both.mean(axis=0), 0.0, atol=1e-4)
    np.testing.assert_allclose(both.std(axis=0), 1.0, atol=1e-3)

    # The reader consumes the sidecars in lockstep with the audio.
    reader = AudioReader(str(d), sr, gc_enabled=False,
                         receptive_field=32, sample_size=500,
                         silence_threshold=None, queue_size=4,
                         lc_enabled=True, lc_channels=n_mels, lc_hop=hop)
    with reader:
        audio = reader.dequeue(2)
        lc = reader.dequeue_lc(2)
    assert audio.shape == (2, 32 + 500)
    assert lc.shape == (2, 32 + 500, n_mels)


def test_cli_main(tmp_path):
    from scipy.io import wavfile
    d = tmp_path / "c"
    d.mkdir()
    sr = 2000
    t = np.arange(sr) / sr
    wavfile.write(str(d / "p1_000.wav"), sr,
                  (0.4 * np.sin(2 * np.pi * 300 * t) * 32767)
                  .astype(np.int16))
    rc = features_main([str(d), "--sample_rate", str(sr), "--n_mels", "8",
                        "--hop", "50", "--n_fft", "256"])
    assert rc == 0
    assert os.path.exists(str(d / "p1_000.lc.npy"))


def test_write_sidecars_with_external_stats(tmp_path):
    """A held-out split normalized with --stats reuses the TRAINING
    corpus's mean/std (per-split stats would shift the conditioning
    scale the model was trained on)."""
    from scipy.io import wavfile

    sr, hop, n_mels = 2000, 50, 8
    train, held = tmp_path / "train", tmp_path / "held"
    train.mkdir(); held.mkdir()
    t = np.arange(sr) / sr
    for d, amp in ((train, 0.5), (held, 0.05)):  # held-out is quieter
        wavfile.write(str(d / "p1_001.wav"), sr,
                      (amp * np.sin(2 * np.pi * 300 * t) * 32767
                       ).astype(np.int16))
    write_sidecars(str(train), sr, n_mels, hop, n_fft=256,
                   log=lambda *a: None)
    stats = str(train / "lc_stats.npz")
    write_sidecars(str(held), sr, n_mels, hop, n_fft=256,
                   stats_path=stats, log=lambda *a: None)
    # No per-split stats file; features are on the train scale, so the
    # quieter split standardizes BELOW the train mean, not to zero.
    assert not os.path.exists(str(held / "lc_stats.npz"))
    side = np.load(str(held / "p1_001.lc.npy"))
    assert side.mean() < -0.5

    # Mismatched extraction params are rejected.
    with pytest.raises(ValueError, match="was computed for"):
        write_sidecars(str(held), sr, n_mels, hop * 2, n_fft=256,
                       stats_path=stats, log=lambda *a: None)
