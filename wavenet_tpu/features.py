"""Acoustic feature extraction for local conditioning: log-mel sidecars.

The WaveNet paper's local conditioning (§2.5) feeds a slower time series
h — in the TTS setting, linguistic features or mel frames. This module
makes that practical without librosa (not installed here): an STFT
log-mel-spectrogram extractor in plain NumPy/SciPy and a CLI that walks
a corpus and writes the ``<stem>.lc.npy`` sidecar files the data reader
consumes (wavenet_tpu/lc.py's convention, one frame per ``hop`` output
samples).

New capability — the reference (jyegerlehner/tensorflow-wavenet) ships
global conditioning only; there is no reference file to cite.

Typical use, 16 kHz corpus, 80 mels at 12.5 ms hop::

    python -m wavenet_tpu.features corpus/ --n_mels 80 --hop 200
    python train.py --data_dir corpus/ --lc_channels 80 --lc_hop 200 ...
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import numpy as np


def hz_to_mel(f):
    """HTK mel scale: m = 2595 log10(1 + f/700)."""
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(sample_rate: int, n_fft: int, n_mels: int,
                   fmin: float = 0.0,
                   fmax: Optional[float] = None) -> np.ndarray:
    """Triangular mel filterbank [n_mels, n_fft // 2 + 1] (HTK scale).

    Filters are unit-height triangles over mel-spaced edges — the same
    construction as ``librosa.filters.mel(htk=True, norm=None)``.
    """
    if fmax is None:
        fmax = sample_rate / 2.0
    if not 0 <= fmin < fmax <= sample_rate / 2.0:
        raise ValueError(f"need 0 <= fmin < fmax <= nyquist, got "
                         f"[{fmin}, {fmax}] at sr={sample_rate}")
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_bins)
    mel_edges = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz_edges = mel_to_hz(mel_edges)                      # [n_mels + 2]

    fb = np.zeros((n_mels, n_bins), np.float64)
    for m in range(n_mels):
        lo, center, hi = hz_edges[m], hz_edges[m + 1], hz_edges[m + 2]
        up = (fft_freqs - lo) / max(center - lo, 1e-10)
        down = (hi - fft_freqs) / max(hi - center, 1e-10)
        fb[m] = np.maximum(0.0, np.minimum(up, down))
    return fb.astype(np.float32)


def stft_magnitude(audio: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    """|STFT| [frames, n_fft // 2 + 1], centered (reflect-padded) frames.

    Frame f covers samples around f*hop (librosa ``center=True``
    semantics), so frame f of the output aligns with output sample
    f*hop — matching lc.upsample_lc's frame->sample mapping.
    """
    audio = np.asarray(audio, dtype=np.float32).reshape(-1)
    pad = n_fft // 2
    # Reflect needs len > 1; degenerate clips fall back to zero-padding.
    if len(audio) > 1:
        x = np.pad(audio, pad, mode="reflect")
    else:
        x = np.pad(audio, pad, mode="constant")
    n_frames = 1 + len(audio) // hop
    window = np.hanning(n_fft).astype(np.float32)
    frames = np.lib.stride_tricks.sliding_window_view(x, n_fft)[::hop]
    frames = frames[:n_frames]
    if len(frames) < n_frames:                 # tail guard (short clips)
        short = np.zeros((n_frames - len(frames), n_fft), np.float32)
        frames = np.concatenate([frames, short], axis=0)
    spec = np.fft.rfft(frames * window, axis=1)
    return np.abs(spec).astype(np.float32)


def log_mel_spectrogram(audio: np.ndarray, sample_rate: int,
                        n_mels: int = 80, hop: int = 200,
                        n_fft: int = 1024, fmin: float = 0.0,
                        fmax: Optional[float] = None,
                        floor: float = 1e-5) -> np.ndarray:
    """Log-mel frames [ceil(T / hop), n_mels] for a [-1, 1] waveform.

    ``hop`` is in samples at ``sample_rate`` — pass the same value as
    the reader/CLI ``--lc_hop`` so the upsampled stream rides the audio
    timeline one-to-one. Log is natural log of the mel energy clamped
    at ``floor``.
    """
    mag = stft_magnitude(audio, n_fft, hop)                  # [F, bins]
    fb = mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax)
    mel = mag @ fb.T                                         # [F, n_mels]
    out = np.log(np.maximum(mel, floor)).astype(np.float32)
    # One frame per hop of the ORIGINAL length (stft pads a trailing
    # frame for the remainder; keep exactly ceil(T / hop)).
    n_keep = -(-len(np.atleast_1d(audio).reshape(-1)) // hop)
    return out[:n_keep]


def write_sidecars(audio_dir: str, sample_rate: int, n_mels: int,
                   hop: int, n_fft: int = 1024,
                   fmin: float = 0.0, fmax: Optional[float] = None,
                   normalize: bool = True,
                   stats_path: Optional[str] = None,
                   log=print) -> int:
    """Walk ``audio_dir``; write ``<stem>.lc.npy`` log-mel sidecars.

    Audio is decoded/resampled with the same pipeline as training
    (data.reader semantics: scipy decode + polyphase resample to
    ``sample_rate``), so frame timing matches what the reader sees.
    ``normalize`` standardizes each feature dim over the corpus
    (zero mean, unit variance) — the usual conditioning-scale hygiene;
    statistics are saved to ``lc_stats.npz`` in the corpus root for
    generation-time reuse.

    ``stats_path``: apply the mean/std from an EXISTING lc_stats.npz
    instead of computing this directory's own — required for held-out /
    eval splits, whose conditioning must live on the training corpus's
    scale (per-split statistics would shift every feature dim).
    """
    from wavenet_tpu.data.reader import find_files
    from wavenet_tpu.audio import read_wav

    files = find_files(audio_dir)
    if not files:
        raise FileNotFoundError(f"no wav files under '{audio_dir}'")
    ext_stats = None
    if stats_path is not None:
        with np.load(stats_path) as z:
            if int(z["n_mels"]) != n_mels or int(z["hop"]) != hop or \
                    int(z["sample_rate"]) != sample_rate:
                raise ValueError(
                    f"{stats_path} was computed for n_mels="
                    f"{int(z['n_mels'])}, hop={int(z['hop'])}, sr="
                    f"{int(z['sample_rate'])}; requested "
                    f"({n_mels}, {hop}, {sample_rate})")
            ext_stats = (z["mean"], z["std"])
    feats = []
    for path in files:
        audio, _ = read_wav(path, sample_rate)
        feats.append(log_mel_spectrogram(audio, sample_rate, n_mels, hop,
                                         n_fft, fmin, fmax))
    if ext_stats is not None:
        mean, std = ext_stats
        feats = [(f - mean) / std for f in feats]
    elif normalize:
        allf = np.concatenate(feats, axis=0)
        mean = allf.mean(axis=0)
        std = np.maximum(allf.std(axis=0), 1e-6)
        feats = [(f - mean) / std for f in feats]
        np.savez(os.path.join(audio_dir, "lc_stats.npz"),
                 mean=mean, std=std, n_mels=n_mels, hop=hop,
                 n_fft=n_fft, sample_rate=sample_rate)
    for path, f in zip(files, feats):
        stem, _ = os.path.splitext(path)
        np.save(stem + ".lc.npy", f.astype(np.float32))
        log(f"{stem}.lc.npy: {f.shape[0]} frames x {f.shape[1]} mels")
    return len(files)


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Write <stem>.lc.npy log-mel sidecars for "
                    "--lc_channels training.")
    p.add_argument("audio_dir", help="Corpus directory (walked for .wav).")
    p.add_argument("--sample_rate", type=int, default=16000)
    p.add_argument("--n_mels", type=int, default=80,
                   help="Feature dim; train with --lc_channels N_MELS.")
    p.add_argument("--hop", type=int, default=200,
                   help="Samples per frame at --sample_rate; train with "
                        "--lc_hop HOP.")
    p.add_argument("--n_fft", type=int, default=1024)
    p.add_argument("--fmin", type=float, default=0.0)
    p.add_argument("--fmax", type=float, default=None)
    p.add_argument("--no_normalize", action="store_true",
                   help="Skip per-dim corpus standardization.")
    p.add_argument("--stats", type=str, default=None,
                   help="Apply mean/std from an existing lc_stats.npz "
                        "(use the TRAINING corpus's stats for held-out "
                        "or eval splits).")
    args = p.parse_args(argv)
    n = write_sidecars(args.audio_dir, args.sample_rate, args.n_mels,
                       args.hop, args.n_fft, args.fmin, args.fmax,
                       normalize=not args.no_normalize,
                       stats_path=args.stats)
    print(f"Wrote {n} sidecars. Train with: --lc_channels {args.n_mels} "
          f"--lc_hop {args.hop}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
