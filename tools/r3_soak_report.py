#!/usr/bin/env python
"""Build the convergence_r3 artifacts from a finished soak.

Subcommands:
  summarize  — metrics.jsonl(s) -> loss_summary.json (per-1k-step stats)
  fft        — seeded generation per speaker from the converged
               checkpoint, LC stream taken from a held-out utterance of
               that speaker; writes gen_fft_evidence.json with (a) the
               generated-vs-source log-mel frame correlation against a
               mismatched-LC control and (b) dominant-frequency match,
               plus the wavs. (TPU)
  gcswap     — score held-out files under the correct vs every wrong
               speaker id; the correct id must win on bits/sample. (TPU)

Used by baselines/convergence_r3/README.md's recipe; see there.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def summarize(paths, out):
    rows = []
    for p in paths:
        with open(p) as f:
            for line in f:
                try:
                    d = json.loads(line)
                except ValueError:
                    continue
                if d.get("tag") == "loss":
                    rows.append((int(d["step"]), float(d["value"])))
    rows.sort()
    if not rows:
        raise SystemExit("no loss rows found")
    buckets = {}
    for step, v in rows:
        buckets.setdefault(step // 1000, []).append(v)
    summary = {
        "n_steps": rows[-1][0],
        "first_loss": rows[0][1],
        "final_loss_mean_last_1k": float(np.mean(
            [v for s, v in rows if s > rows[-1][0] - 1000])),
        "min_loss": min(v for _, v in rows),
        "per_1k": [{"k": k, "mean": float(np.mean(v)),
                    "min": float(np.min(v)), "n": len(v)}
                   for k, v in sorted(buckets.items())],
    }
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: summary[k] for k in
                      ("n_steps", "first_loss", "final_loss_mean_last_1k",
                       "min_loss")}))


def _logmel(x, sr, n_mels=80, hop=200):
    from wavenet_tpu.features import log_mel_spectrogram
    return log_mel_spectrogram(x.astype(np.float32), sr, n_mels=n_mels,
                               hop=hop)


def fft_evidence(ckpt, params_json, heldout_dir, out_dir, n_speakers,
                 seconds=2.0):
    import jax
    import jax.numpy as jnp

    from wavenet_tpu.audio import mu_law_decode_np, read_wav, write_wav
    from wavenet_tpu.data.reader import find_files, parse_speaker_id
    from wavenet_tpu.lc import fit_lc_to_length, load_lc_sidecar, upsample_lc
    from wavenet_tpu.models.config import WaveNetConfig
    from wavenet_tpu.models.wavenet import init_params
    from wavenet_tpu.sampler_select import generate_with_fallback
    from wavenet_tpu.train_lib import restore_params_only

    with open(params_json) as f:
        raw = json.load(f)
    sr = raw["sample_rate"]
    config = WaveNetConfig.from_json(raw, gc_channels=32,
                                     gc_cardinality=n_speakers + 1,
                                     lc_channels=80)
    params = restore_params_only(
        ckpt, init_params(jax.random.PRNGKey(0), config))
    if params is None:
        raise SystemExit(f"no checkpoint under {ckpt}")

    by_spk = {}
    for p in find_files(heldout_dir):
        by_spk.setdefault(parse_speaker_id(os.path.basename(p)), []).append(p)
    os.makedirs(out_dir, exist_ok=True)
    n = int(seconds * sr)
    report = []
    # Round 4: all speakers (the r3 plan sampled 4; the committed
    # artifact promises one generated wav per speaker).
    for spk in sorted(by_spk):
        src = sorted(by_spk[spk])[0]
        audio, _ = read_wav(src, sr)
        feats = load_lc_sidecar(src)
        lc = fit_lc_to_length(upsample_lc(feats, 200, "linear"),
                              audio.shape[0])[:n]
        # Mismatched control: another speaker's LC stream.
        other = sorted(by_spk[max(by_spk) if spk != max(by_spk)
                              else min(by_spk)])[0]
        feats_o = load_lc_sidecar(other)
        audio_o, _ = read_wav(other, sr)
        lc_o = fit_lc_to_length(upsample_lc(feats_o, 200, "linear"),
                                audio_o.shape[0])[:n]

        codes, name, _ = generate_with_fallback(
            params, config, n, seed=spk, batch_size=1,
            gc_ids=jnp.asarray([spk]), temperature=0.8,
            lc=jnp.asarray(lc)[None])
        wave = mu_law_decode_np(np.asarray(codes)[0],
                                config.quantization_channels)
        write_wav(os.path.join(out_dir, f"gen_spk{spk}.wav"), wave, sr)

        src_mel = _logmel(audio[:n], sr)
        gen_mel = _logmel(wave, sr)
        ctrl_mel = _logmel(audio_o[:n], sr) if len(audio_o) >= n else None
        k = min(len(src_mel), len(gen_mel))

        def frame_corr(a, b, k):
            a = a[:k] - a[:k].mean()
            b = b[:k] - b[:k].mean()
            den = np.linalg.norm(a) * np.linalg.norm(b)
            return float((a * b).sum() / den) if den else 0.0

        corr_match = frame_corr(gen_mel, src_mel, k)
        corr_ctrl = (frame_corr(gen_mel, ctrl_mel,
                                min(k, len(ctrl_mel)))
                     if ctrl_mel is not None else None)

        def domfreq(x):
            s = np.abs(np.fft.rfft(x * np.hanning(len(x))))
            fr = np.fft.rfftfreq(len(x), 1 / sr)
            m = fr > 60
            return float(fr[m][np.argmax(s[m])])

        report.append({
            "speaker": spk, "lc_source": os.path.basename(src),
            "sampler": name,
            "logmel_corr_matched_lc": round(corr_match, 4),
            "logmel_corr_mismatched_control": (
                round(corr_ctrl, 4) if corr_ctrl is not None else None),
            "domfreq_source_hz": round(domfreq(audio[:n]), 1),
            "domfreq_generated_hz": round(domfreq(wave), 1),
        })
        print(json.dumps(report[-1]))
    with open(os.path.join(out_dir, "gen_fft_evidence.json"), "w") as f:
        json.dump(report, f, indent=1)


def gc_swap(ckpt, params_json, heldout_dir, out_path, n_speakers,
            max_files=8):
    import jax
    import jax.numpy as jnp

    from wavenet_tpu.audio import read_wav
    from wavenet_tpu.data.reader import find_files, parse_speaker_id
    from wavenet_tpu.lc import fit_lc_to_length, load_lc_sidecar, upsample_lc
    from wavenet_tpu.models.config import WaveNetConfig
    from wavenet_tpu.models.wavenet import init_params
    from wavenet_tpu.score import log_likelihood
    from wavenet_tpu.train_lib import restore_params_only

    with open(params_json) as f:
        raw = json.load(f)
    sr = raw["sample_rate"]
    config = WaveNetConfig.from_json(raw, gc_channels=32,
                                     gc_cardinality=n_speakers + 1,
                                     lc_channels=80)
    params = restore_params_only(
        ckpt, init_params(jax.random.PRNGKey(0), config))
    # Round-robin one file per speaker before taking seconds etc., so
    # max_files=8 tests EVERY speaker once rather than the first two
    # speakers four times (the sorted()[:8] slice did the latter).
    by_spk = {}
    for p in sorted(find_files(heldout_dir)):
        by_spk.setdefault(parse_speaker_id(os.path.basename(p)), []).append(p)
    rounds = zip(*(by_spk[k] for k in sorted(by_spk)))
    files = [p for rnd in rounds for p in rnd][:max_files]
    rows, wins = [], 0
    for p in files:
        spk = parse_speaker_id(os.path.basename(p))
        audio, _ = read_wav(p, sr)
        audio = audio[:sr * 2]
        feats = load_lc_sidecar(p)
        lc = jnp.asarray(fit_lc_to_length(
            upsample_lc(feats, 200, "linear"), audio.shape[0]))[None]
        bits = {}
        for cand in range(1, n_speakers + 1):
            out = log_likelihood(params, config,
                                 jnp.asarray(audio)[None],
                                 jnp.asarray([cand]), lc=lc)
            bits[cand] = float(jax.device_get(out["bits_per_sample"])[0])
        best = min(bits, key=bits.get)
        wins += best == spk
        rows.append({"file": os.path.basename(p), "true": spk,
                     "best": best,
                     "bits_true": round(bits[spk], 4),
                     "bits_best_wrong": round(
                         min(v for k, v in bits.items() if k != spk), 4)})
        print(json.dumps(rows[-1]))
    result = {"files": rows, "correct_id_wins": wins, "total": len(files)}
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({"correct_id_wins": wins, "total": len(files)}))


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    s = sub.add_parser("summarize")
    s.add_argument("jsonl", nargs="+")
    s.add_argument("--out", required=True)
    f = sub.add_parser("fft")
    f.add_argument("--ckpt", required=True)
    f.add_argument("--params", required=True)
    f.add_argument("--heldout", required=True)
    f.add_argument("--out_dir", required=True)
    f.add_argument("--speakers", type=int, default=8)
    g = sub.add_parser("gcswap")
    g.add_argument("--ckpt", required=True)
    g.add_argument("--params", required=True)
    g.add_argument("--heldout", required=True)
    g.add_argument("--out", required=True)
    g.add_argument("--speakers", type=int, default=8)
    args = ap.parse_args()
    if args.cmd == "summarize":
        summarize(args.jsonl, args.out)
    elif args.cmd == "fft":
        fft_evidence(args.ckpt, args.params, args.heldout, args.out_dir,
                     args.speakers)
    elif args.cmd == "gcswap":
        gc_swap(args.ckpt, args.params, args.heldout, args.out,
                args.speakers)


if __name__ == "__main__":
    main()
