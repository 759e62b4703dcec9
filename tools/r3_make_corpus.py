#!/usr/bin/env python
"""Synthesize the round-3 convergence corpus: multi-speaker, 16 kHz.

The richest corpus this sandbox can produce (no network, no VCTK): eight
synthetic "speakers", each with a stable voice identity the model must
learn to separate via global conditioning —

  * a per-speaker fundamental range (pitch register),
  * a per-speaker harmonic timbre (spectral tilt + two fixed
    formant-like resonance peaks),
  * per-speaker vibrato rate/depth,

and per-utterance structure local conditioning must explain —

  * a random walk over a pentatonic scale in the speaker's register,
  * note-level ADSR amplitude envelopes with silences between phrases,
  * slow loudness drift.

Filenames follow the VCTK pattern the reader's GC plumbing parses
(p<speaker>_<utt>.wav, reference audio_reader.py ≈:10). A held-out
split lands in the SIBLING directory <out>_heldout (the reader walks
recursively, so it must not nest inside the training dir) for
before/after bits-per-sample scoring.

Usage:
    python tools/r3_make_corpus.py --out /tmp/conv_corpus \
        [--speakers 8] [--train-utts 24] [--heldout-utts 4] [--secs 4.0]

Then write log-mel LC sidecars for both splits:
    python -m wavenet_tpu.features /tmp/conv_corpus --n_mels 80 --hop 200
    python -m wavenet_tpu.features /tmp/conv_corpus_heldout --n_mels 80 --hop 200
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 16000
# Pentatonic scale ratios within one octave.
SCALE = np.array([1.0, 9 / 8, 5 / 4, 3 / 2, 5 / 3, 2.0])


def speaker_profile(spk: int, rng: np.random.RandomState) -> dict:
    """Stable per-speaker voice identity (seeded by speaker id only)."""
    r = np.random.RandomState(1000 + spk)
    return {
        # Registers spread from ~#110 Hz to ~#320 Hz, distinct per speaker.
        "f0": 110.0 * (1.16 ** spk),
        # Harmonic rolloff exponent: bright (1.0) to dark (2.2) voices.
        "tilt": 1.0 + 1.2 * r.uniform(),
        # Two formant-like resonance peaks (Hz) boosting nearby harmonics.
        "formants": (r.uniform(400, 900), r.uniform(1200, 2600)),
        "vibrato_hz": r.uniform(4.5, 6.5),
        "vibrato_depth": r.uniform(0.004, 0.012),
        "breathiness": r.uniform(0.002, 0.008),
    }


def synth_utterance(prof: dict, secs: float,
                    rng: np.random.RandomState) -> np.ndarray:
    n = int(secs * SR)
    audio = np.zeros(n, np.float64)
    t_cursor = 0
    # Random walk over the speaker's scale.
    degree = rng.randint(len(SCALE))
    octave = 0
    while t_cursor < n:
        if rng.uniform() < 0.12:
            # Phrase gap (near-silence) — the envelope structure LC sees.
            t_cursor += int(rng.uniform(0.05, 0.18) * SR)
            continue
        step = rng.randint(-2, 3)
        degree += step
        while degree < 0:
            degree += len(SCALE)
            octave -= 1
        while degree >= len(SCALE):
            degree -= len(SCALE)
            octave += 1
        octave = int(np.clip(octave, -1, 1))
        f0 = prof["f0"] * SCALE[degree] * 2.0 ** octave
        dur = int(rng.uniform(0.18, 0.45) * SR)
        dur = min(dur, n - t_cursor)
        if dur < int(0.05 * SR):
            break
        tt = np.arange(dur) / SR
        # Vibrato on the fundamental.
        vib = prof["vibrato_depth"] * np.sin(
            2 * np.pi * prof["vibrato_hz"] * tt + rng.uniform(0, 6))
        phase = 2 * np.pi * f0 * (tt + np.cumsum(vib) / SR)
        note = np.zeros(dur, np.float64)
        for h in range(1, 13):
            fh = f0 * h
            if fh > SR / 2 - 200:
                break
            amp = h ** (-prof["tilt"])
            for fc in prof["formants"]:
                # Resonance boost for harmonics near a formant.
                amp *= 1.0 + 1.5 * np.exp(-((fh - fc) / 250.0) ** 2)
            note += amp * np.sin(h * phase + rng.uniform(0, 6))
        # ADSR envelope.
        a = max(3, int(0.015 * SR))
        d = max(3, int(0.04 * SR))
        r_ = max(3, min(int(0.06 * SR), dur // 4))
        env = np.ones(dur)
        env[:a] = np.linspace(0, 1, a)
        env[a:a + d] *= np.linspace(1, 0.8, min(d, max(0, dur - a)))[
            :max(0, min(d, dur - a))]
        env[-r_:] *= np.linspace(1, 0, r_)
        note *= env * rng.uniform(0.5, 1.0)
        audio[t_cursor:t_cursor + dur] += note
        t_cursor += dur + int(rng.uniform(0.0, 0.04) * SR)
    # Slow loudness drift + per-speaker breath noise.
    drift = 1.0 + 0.25 * np.sin(
        2 * np.pi * rng.uniform(0.1, 0.3) * np.arange(n) / SR
        + rng.uniform(0, 6))
    audio *= drift
    audio += prof["breathiness"] * rng.randn(n)
    peak = np.abs(audio).max()
    if peak > 0:
        audio *= 0.71 / peak
    return audio.astype(np.float32)


def main():
    from scipy.io import wavfile

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--speakers", type=int, default=8)
    ap.add_argument("--train-utts", type=int, default=24)
    ap.add_argument("--heldout-utts", type=int, default=4)
    ap.add_argument("--secs", type=float, default=4.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    # SIBLING of the training dir: the reader walks recursively, so a
    # held-out subdirectory would leak into training.
    heldout = args.out.rstrip("/") + "_heldout"
    os.makedirs(heldout, exist_ok=True)
    total_s = 0.0
    for spk in range(1, args.speakers + 1):
        prof = speaker_profile(spk, None)
        for utt in range(args.train_utts + args.heldout_utts):
            rng = np.random.RandomState(
                args.seed + 7919 * spk + 104729 * utt)
            x = synth_utterance(prof, args.secs, rng)
            split = args.out if utt < args.train_utts else heldout
            path = os.path.join(split, f"p{spk}_{utt:03d}.wav")
            wavfile.write(path, SR, (x * 32767).astype(np.int16))
            total_s += len(x) / SR
        print(f"speaker {spk}: f0={prof['f0']:.1f} Hz "
              f"tilt={prof['tilt']:.2f} "
              f"formants=({prof['formants'][0]:.0f},"
              f"{prof['formants'][1]:.0f})")
    print(f"wrote {args.speakers * (args.train_utts + args.heldout_utts)} "
          f"utterances, {total_s / 60:.1f} min of audio, to {args.out}")


if __name__ == "__main__":
    main()
