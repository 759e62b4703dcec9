"""Audio numerics and I/O: mu-law codec, wav read/write, resampling, silence trim.

TPU-native reimplementation of the reference's audio-facing numerics
(reference: wavenet/ops.py ≈:75-110 ``mu_law_encode``/``mu_law_decode``;
wavenet/audio_reader.py ≈:42-66 ``load_generic_audio``/``trim_silence``).

The codec functions are pure jnp so they can live inside jit'd programs
(training loss encodes on-device; the sampler decodes on-device). Host-side
I/O uses scipy (librosa is deliberately not a dependency): wav decode via
``scipy.io.wavfile``, resampling via polyphase filtering
(``scipy.signal.resample_poly``), and silence trimming via an RMS frame
energy gate that mirrors librosa's ``feature.rms`` frame semantics
(frame_length=2048, centered frames) used by the reference.
"""

from __future__ import annotations

import fractions
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# mu-law companding (jnp; device-side)
# ---------------------------------------------------------------------------

def mu_law_encode(audio: jnp.ndarray, quantization_channels: int = 256) -> jnp.ndarray:
    """Quantize float waveform in [-1, 1] to integers in [0, Q-1].

    Exact formula parity with the reference (wavenet/ops.py ≈:75-90),
    including the ``min(|x|, 1.0)`` clamp and the ``+ 0.5`` round-half-up:

        mu        = Q - 1
        safe      = min(|x|, 1.0)
        magnitude = log1p(mu * safe) / log1p(mu)
        signal    = sign(x) * magnitude
        out       = int32((signal + 1) / 2 * mu + 0.5)

    Note amplitude 0.0 encodes to 128 when Q=256 — the zero left-padding
    added by the data pipeline therefore becomes one-hot(128) network input,
    not a zero vector.
    """
    mu = jnp.asarray(quantization_channels - 1, dtype=jnp.float32)
    audio = jnp.asarray(audio, dtype=jnp.float32)
    safe_audio_abs = jnp.minimum(jnp.abs(audio), 1.0)
    magnitude = jnp.log1p(mu * safe_audio_abs) / jnp.log1p(mu)
    signal = jnp.sign(audio) * magnitude
    return ((signal + 1.0) / 2.0 * mu + 0.5).astype(jnp.int32)


def mu_law_decode(output: jnp.ndarray, quantization_channels: int = 256) -> jnp.ndarray:
    """Invert mu-law quantization: ints in [0, Q-1] -> float in [-1, 1].

    Formula parity with the reference (wavenet/ops.py ≈:95-110):

        mu        = Q - 1
        signal    = 2 * (y / mu) - 1
        magnitude = (1 / mu) * ((1 + mu) ** |signal| - 1)
        out       = sign(signal) * magnitude
    """
    mu = quantization_channels - 1
    signal = 2.0 * (jnp.asarray(output, dtype=jnp.float32) / mu) - 1.0
    magnitude = (1.0 / mu) * ((1.0 + mu) ** jnp.abs(signal) - 1.0)
    return jnp.sign(signal) * magnitude


# NumPy twins, for the host-side data path and parity oracles.

def mu_law_encode_np(audio: np.ndarray, quantization_channels: int = 256) -> np.ndarray:
    mu = np.float32(quantization_channels - 1)
    audio = np.asarray(audio, dtype=np.float32)
    safe = np.minimum(np.abs(audio), 1.0)
    magnitude = np.log1p(mu * safe) / np.log1p(mu)
    signal = np.sign(audio) * magnitude
    return ((signal + 1.0) / 2.0 * mu + 0.5).astype(np.int32)


def mu_law_decode_np(output: np.ndarray, quantization_channels: int = 256) -> np.ndarray:
    mu = quantization_channels - 1
    signal = 2.0 * (np.asarray(output, dtype=np.float32) / mu) - 1.0
    magnitude = (1.0 / mu) * ((1.0 + mu) ** np.abs(signal) - 1.0)
    return np.sign(signal) * magnitude


# ---------------------------------------------------------------------------
# wav I/O (host-side, scipy)
# ---------------------------------------------------------------------------

def read_wav(path: str, sample_rate: Optional[int] = None) -> Tuple[np.ndarray, int]:
    """Read a wav file -> (float32 mono waveform in [-1, 1], sample_rate).

    Replaces the reference's ``librosa.load(..., sr=sample_rate, mono=True)``
    (audio_reader.py ≈:50): integer PCM is scaled by its dtype range, stereo
    is averaged to mono, and the waveform is polyphase-resampled when a target
    ``sample_rate`` differs from the file's native rate.
    """
    from scipy.io import wavfile

    native_sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        audio = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        audio = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        audio = (data.astype(np.float32) - 128.0) / 128.0
    else:  # float32 / float64 wavs are already in [-1, 1]
        audio = data.astype(np.float32)
    if audio.ndim > 1:
        audio = audio.mean(axis=1)
    if sample_rate is not None and sample_rate != native_sr:
        audio = resample(audio, native_sr, sample_rate)
        native_sr = sample_rate
    return np.ascontiguousarray(audio, dtype=np.float32), native_sr


def write_wav(path: str, audio: np.ndarray, sample_rate: int) -> None:
    """Write float waveform in [-1, 1] as 16-bit PCM (reference generate.py ≈:95)."""
    from scipy.io import wavfile

    audio = np.asarray(audio, dtype=np.float32)
    clipped = np.clip(audio, -1.0, 1.0)
    wavfile.write(path, sample_rate, (clipped * 32767.0).astype(np.int16))


def resample(audio: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resampling (high-quality, no librosa dependency)."""
    from scipy.signal import resample_poly

    if orig_sr == target_sr:
        return audio
    ratio = fractions.Fraction(target_sr, orig_sr)
    return resample_poly(audio, ratio.numerator, ratio.denominator).astype(np.float32)


# ---------------------------------------------------------------------------
# silence trimming (host-side)
# ---------------------------------------------------------------------------

def _frame_rms(audio: np.ndarray, frame_length: int, hop_length: int) -> np.ndarray:
    """Per-frame RMS energy with centered frames (librosa ``feature.rms`` semantics).

    The signal is reflection-padded by frame_length//2 on each side so frame i
    is centered on sample ``i * hop_length``, matching what the reference's
    ``trim_silence`` (audio_reader.py ≈:58) computed via librosa.
    """
    pad = frame_length // 2
    padded = np.pad(audio, pad, mode="constant")
    n_frames = 1 + (len(padded) - frame_length) // hop_length
    if n_frames <= 0:
        return np.zeros((0,), dtype=np.float32)
    # Strided frame view -> mean square per frame.
    strides = (padded.strides[0] * hop_length, padded.strides[0])
    frames = np.lib.stride_tricks.as_strided(
        padded, shape=(n_frames, frame_length), strides=strides)
    return np.sqrt(np.mean(frames.astype(np.float64) ** 2, axis=1)).astype(np.float32)


def trim_silence_indices(audio: np.ndarray, threshold: float,
                         frame_length: int = 2048) -> "tuple[int, int]":
    """(start, end) sample indices of the non-silent region.

    The index form lets callers slice SIDE STREAMS (e.g. an upsampled
    local-conditioning stream) in lockstep with the audio. (0, 0) means
    the whole clip is silent.
    """
    if len(audio) < frame_length:
        frame_length = max(len(audio), 1)
    hop_length = frame_length // 4 if frame_length >= 4 else 1
    energy = _frame_rms(audio, frame_length, hop_length)
    loud = np.nonzero(energy > threshold)[0]
    if len(loud) == 0:
        return 0, 0
    start = loud[0] * hop_length
    end = min(len(audio), (loud[-1] + 1) * hop_length)
    return start, end


def trim_silence(audio: np.ndarray, threshold: float,
                 frame_length: int = 2048) -> np.ndarray:
    """Remove leading/trailing silence below an RMS threshold.

    Parity with the reference's ``trim_silence`` (audio_reader.py ≈:58):
    frames whose RMS exceeds ``threshold`` define the kept region
    [first_loud_frame_start_sample, last_loud_frame_end_sample); a fully
    silent clip returns an empty array (the caller warns and skips it).
    """
    start, end = trim_silence_indices(audio, threshold, frame_length)
    return audio[start:end]
