"""Round-5 overfit curve: held-out quality vs training step.

The convergence_r4 decomposition (score_train.json) attributed the
held-out quality hole on p4/p8 to OVERFIT — the final 160k-step
checkpoint scores 1.8-2.2 bits/sample in-sample for every speaker
while p4/p8 go worse-than-uniform held-out. The classic signature of
that attribution is the early-stopping curve: held-out bits/sample
should fall, bottom out, and climb again while training likelihood
keeps improving. This tool produces that curve empirically.

Takes a train logdir whose run kept intermediate checkpoints
(ckpt-8000, ckpt-16000, ... — e.g. a 48k-step rerun of the soak config
with --checkpoint_every=8000), scores ALL held-out utterances plus
2 training utterances per speaker under EACH checkpoint (same score-CLI
flags as convergence_r4/score_after.jsonl), and writes one JSON with
per-checkpoint means (overall, per-speaker, and the p4/p8 focus set).

Scoring a specific step: score.py restores the LATEST step in a
directory, so each step is staged into its own temp dir via symlink.

Usage (TPU): python tools/r5_overfit_curve.py <logdir> [out.json]
"""

import glob
import json
import os
import re
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PARAMS = os.path.join(HERE, "baselines/convergence_r4/params.json")
HELDOUT = "/tmp/conv_corpus_heldout"
TRAIN = "/tmp/conv_corpus"


def score(ckpt, wavs):
    cmd = [sys.executable, "-m", "wavenet_tpu.score", ckpt,
           "--wavenet_params", PARAMS,
           "--gc_channels", "32", "--gc_cardinality", "9",
           "--gc_from_filename",
           "--lc_channels", "80", "--lc_hop", "200",
           "--lc_upsample", "linear"] + wavs
    out = subprocess.run(cmd, cwd=HERE, capture_output=True, text=True,
                         timeout=3000)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(f"score failed rc={out.returncode}")
    return [json.loads(ln) for ln in out.stdout.splitlines()
            if ln.strip().startswith("{")]


def spk(path):
    return re.match(r"p(\d+)_", os.path.basename(path)).group(1)


def mean(xs):
    return round(sum(xs) / len(xs), 4) if xs else None


def main():
    logdir = sys.argv[1]
    out_path = sys.argv[2] if len(sys.argv) > 2 else \
        os.path.join(HERE, "baselines/convergence_r4/overfit_curve.json")
    steps = sorted(int(os.path.basename(d).split("-")[1])
                   for d in glob.glob(os.path.join(logdir, "ckpt-*")))
    heldout = sorted(glob.glob(os.path.join(HELDOUT, "*.wav")))
    train = sorted(w for w in glob.glob(os.path.join(TRAIN, "*.wav"))
                   if re.search(r"_00[01]\.wav$", w))
    assert steps and heldout and train, (steps, len(heldout), len(train))
    print(f"steps={steps} heldout={len(heldout)} train={len(train)}",
          flush=True)

    curve = []
    for step in steps:
        with tempfile.TemporaryDirectory() as staged:
            os.symlink(os.path.abspath(os.path.join(logdir,
                                                    f"ckpt-{step}")),
                       os.path.join(staged, f"ckpt-{step}"))
            h_rows = score(staged, heldout)
            t_rows = score(staged, train)
        by_spk = {}
        for r in h_rows:
            by_spk.setdefault(spk(r["file"]), []).append(
                r["bits_per_sample"])
        row = {
            "step": step,
            "heldout_bits_mean": mean([r["bits_per_sample"]
                                       for r in h_rows]),
            "heldout_bits_by_speaker": {k: mean(v) for k, v in
                                        sorted(by_spk.items(),
                                               key=lambda kv: int(kv[0]))},
            "heldout_bits_p4_p8": mean(by_spk.get("4", [])
                                       + by_spk.get("8", [])),
            "train_bits_mean": mean([r["bits_per_sample"]
                                     for r in t_rows]),
        }
        curve.append(row)
        print(json.dumps(row), flush=True)

    payload = {
        "what": ("held-out vs in-sample bits/sample per checkpoint of a "
                 "48k-step rerun of the convergence_r4 soak config "
                 "(same corpus recipe/seed, same score flags) — the "
                 "early-stopping curve behind the overfit attribution"),
        "logdir_flags": ("--gc_channels=32 --lc_channels=80 --lc_hop=200 "
                         "--lc_upsample=linear --batch_size=8 "
                         "--sample_size=16000 --compute_dtype=bfloat16 "
                         "--learning_rate=1e-3 --silence_threshold=0 "
                         "--seed=1 --num_steps=48000 "
                         "--checkpoint_every=8000"),
        "reference_160k_final": {"heldout_bits_mean": 6.219,
                                 "train_bits_mean_approx": 2.0},
        "curve": curve,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
