"""Local-conditioning utilities: frame-rate features -> sample-rate streams.

Local conditioning (WaveNet paper arXiv:1609.03499 §2.5) feeds a second,
slower time series h — linguistic features, mel frames, F0 — into every
layer's filter/gate pre-activations. The paper maps h to sample rate
either with a learned transposed conv or by repeating values; this module
provides the non-learned mappings (``repeat`` and ``linear``) as plain
NumPy/JAX-friendly functions. The network itself (models/wavenet.py)
consumes the UPSAMPLED stream ``[B, T, lc_channels]`` so its graph stays
static and the upsampling choice is a data-pipeline decision.

This is new capability: the reference (jyegerlehner/tensorflow-wavenet)
ships global conditioning only — there is no reference file to cite.

Alignment convention (shared by forward/loss/samplers — see
``models.wavenet.forward``): the upsampled stream rides the audio
timeline; ``lc[t]`` conditions the prediction OF sample t.
"""

from __future__ import annotations

import numpy as np


def upsample_lc(features: np.ndarray, hop: int,
                mode: str = "repeat") -> np.ndarray:
    """Upsample frame-rate features [F, C] to sample rate [F*hop, C].

    ``hop``: output samples per feature frame. Modes:

    * ``repeat`` — nearest/hold: every frame value repeats hop times
      (the paper's non-learned option).
    * ``linear`` — piecewise-linear between frame CENTERS (frame f maps
      to sample f*hop + hop//2); edges hold the first/last frame value.
      Smoother conditioning transitions, same length.
    """
    features = np.asarray(features, dtype=np.float32)
    if features.ndim == 1:
        features = features[:, None]
    if features.ndim != 2:
        raise ValueError(f"features must be [F, C], got {features.shape}")
    if hop < 1:
        raise ValueError(f"hop must be >= 1, got {hop}")
    F = features.shape[0]
    if mode == "repeat":
        return np.repeat(features, hop, axis=0)
    if mode == "linear":
        T = F * hop
        centers = np.arange(F, dtype=np.float64) * hop + hop // 2
        t = np.arange(T, dtype=np.float64)
        out = np.empty((T, features.shape[1]), np.float32)
        for ch in range(features.shape[1]):
            out[:, ch] = np.interp(t, centers, features[:, ch])
        return out
    raise ValueError(f"unknown upsample mode '{mode}' "
                     "(choose 'repeat' or 'linear')")


def fit_lc_to_length(lc: np.ndarray, n: int,
                     pad_mode: str = "edge") -> np.ndarray:
    """Crop or pad an upsampled stream [T, C] to exactly n samples.

    Decoded audio lengths rarely divide the feature hop exactly; the tail
    mismatch is < one hop. Padding repeats the edge value (``edge``) or
    zero-fills (``zero``).
    """
    lc = np.asarray(lc, dtype=np.float32)
    if lc.shape[0] >= n:
        return lc[:n]
    if pad_mode == "edge":
        pad = np.repeat(lc[-1:], n - lc.shape[0], axis=0) if lc.shape[0] \
            else np.zeros((n, lc.shape[1]), np.float32)
    elif pad_mode == "zero":
        pad = np.zeros((n - lc.shape[0], lc.shape[1]), np.float32)
    else:
        raise ValueError(f"unknown pad_mode '{pad_mode}'")
    return np.concatenate([lc, pad], axis=0)


def load_lc_sidecar(wav_path: str) -> "np.ndarray | None":
    """Load the ``<stem>.lc.npy`` feature file next to a wav, if present.

    Convention used by the data reader: for ``p1_001.wav`` the local
    conditioning lives in ``p1_001.lc.npy`` as a float array [F, C] at a
    fixed hop (``--lc_hop`` output samples per frame).
    """
    import os
    stem, _ = os.path.splitext(wav_path)
    path = stem + ".lc.npy"
    if not os.path.exists(path):
        return None
    arr = np.load(path)
    if arr.ndim == 1:
        arr = arr[:, None]
    return np.ascontiguousarray(arr, dtype=np.float32)


# ---------------------------------------------------------------------------
# Device-side upsampling (TPU-native transfer format)
# ---------------------------------------------------------------------------
#
# Shipping the UPSAMPLED stream host->device costs hop x C x 4 bytes per
# audio sample — ~49 MB per b8/16k training batch at 80 mels / hop 200,
# which measured ~1 s/step through the device tunnel (2026-08-19) against
# a 20 ms compute step. The TPU-native format ships FRAMES (~0.3% of the
# bytes) plus integer alignment metadata, and the jit'd step reconstructs
# the exact host stream on device (gather for `repeat`, gather+lerp for
# `linear`).

from typing import NamedTuple


class LCFrameChunk(NamedTuple):
    """Per-chunk frame window + alignment, batched [B, ...].

    Reconstruction contract (must equal the host pipeline bit-for-bit in
    `repeat` mode, to f32 lerp round-off in `linear`): chunk position t
    lives at ``orig_start + t`` on the UNtrimmed utterance's sample
    timeline. Frame row 0 of ``frames`` is utterance frame ``f0``;
    ``f_valid`` is the utterance's total frame count (edge-hold clips
    against it). Positions with orig < ``zero_before`` (the
    receptive-field zero pad: pad position p < rf maps to orig =
    trim_start + p - rf < trim_start) or t >= ``n_valid`` (the final
    short chunk's zero tail) are ZERO.
    """
    frames: "np.ndarray"       # [B, Fw, C] f32
    orig_start: "np.ndarray"   # [B] int32
    f0: "np.ndarray"           # [B] int32
    f_valid: "np.ndarray"      # [B] int32 (>= 1)
    n_valid: "np.ndarray"      # [B] int32
    zero_before: "np.ndarray"  # [B] int32 (= trim_start)


def frame_window_size(width: int, hop: int) -> int:
    """Static frame-window rows needed for a ``width``-sample chunk."""
    return width // hop + 3


def upsample_chunk_jax(chunk: LCFrameChunk, hop: int, mode: str,
                       width: int):
    """LCFrameChunk -> upsampled stream [B, width, C] on device.

    jit-friendly (static hop/mode/width); matches
    ``upsample_lc``+``fit_lc_to_length``+the reader's pad/slice chain.
    """
    import jax.numpy as jnp

    frames = jnp.asarray(chunk.frames, jnp.float32)
    t = jnp.arange(width, dtype=jnp.int32)[None, :]          # [1, W]
    orig = chunk.orig_start[:, None] + t                      # [B, W]
    last = (chunk.f_valid - 1)[:, None]                       # [B, 1]
    if mode == "repeat":
        f = jnp.clip(jnp.floor_divide(orig, hop), 0, last) - chunk.f0[:, None]
        f = jnp.clip(f, 0, frames.shape[1] - 1)
        out = jnp.take_along_axis(frames, f[:, :, None], axis=1)
    elif mode == "linear":
        # Piecewise-linear between frame CENTERS f*hop + hop//2, edges
        # held (np.interp semantics in upsample_lc).
        x = (orig - hop // 2) / hop                           # [B, W] f32
        xf = jnp.floor(x)
        w = (x - xf).astype(jnp.float32)[:, :, None]
        i0 = jnp.clip(xf.astype(jnp.int32), 0, last) - chunk.f0[:, None]
        i1 = jnp.clip(xf.astype(jnp.int32) + 1, 0, last) - chunk.f0[:, None]
        i0 = jnp.clip(i0, 0, frames.shape[1] - 1)
        i1 = jnp.clip(i1, 0, frames.shape[1] - 1)
        v0 = jnp.take_along_axis(frames, i0[:, :, None], axis=1)
        v1 = jnp.take_along_axis(frames, i1[:, :, None], axis=1)
        # Edge-hold: where the clipped endpoints coincide the lerp is a
        # no-op regardless of w, exactly like np.interp outside range.
        out = v0 + (v1 - v0) * w
    else:
        raise ValueError(f"unknown upsample mode '{mode}'")
    mask = ((orig >= chunk.zero_before[:, None])
            & (t < chunk.n_valid[:, None]))[:, :, None]
    return jnp.where(mask, out, 0.0)
