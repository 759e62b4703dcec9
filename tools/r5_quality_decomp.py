"""Round-5 held-out quality-gap decomposition (VERDICT r4 next #5).

The convergence_r4 artifact showed held-out bits/sample mean 6.22 with
p4/p8 (the two highest-register speakers) scoring 6.7-11.96 bits —
worse than the 8.0-bit uniform floor on several utterances — while
training loss sat near 2.0 bits. Nobody decomposed that ~4-bit gap:
overfit? LC normalization on held-out? intrinsic register hardness?

This tool runs the two remaining measurements and writes one JSON:

1. Score TRAINING utterances (2/speaker) under the SAME final
   checkpoint with the SAME score-CLI flags as score_after.jsonl.
   Training >> held-out on the same speaker = memorization/overfit;
   training ~ held-out = the register itself never fit.
2. Re-score two held-out files and compare against the committed
   score_after.jsonl rows — proves the flag reconstruction matches the
   original run (the comparison is only valid if these agree).

CPU-side facts already measured this round (committed in the JSON):
* LC normalization is NOT the cause: per-speaker normalized-LC range
  stats show p4/p8 held-out frames are IN-range under the training
  lc_stats (held-out |z| max/p99.9 <= training's).
* p4/p8 have the highest mu-law delta entropy (6.0-6.2 bits vs
  5.0-5.7 for other speakers, train and held-out alike) — their
  waveforms are intrinsically the least sample-predictable.

Usage (TPU): python tools/r5_quality_decomp.py <ckpt_dir> [out.json]
"""

import glob
import json
import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PARAMS = os.path.join(HERE, "baselines/convergence_r4/params.json")
AFTER = os.path.join(HERE, "baselines/convergence_r4/score_after.jsonl")


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
    rows = []
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            rows.append(json.loads(line))
    return rows


def main():
    ckpt = sys.argv[1]
    out_path = (sys.argv[2] if len(sys.argv) > 2 else
                os.path.join(HERE,
                             "baselines/convergence_r4/score_train.json"))

    # 1) two TRAINING utterances per speaker.
    train_wavs = []
    for spk in range(1, 9):
        files = sorted(glob.glob(f"/tmp/conv_corpus/p{spk}_*.wav"))[:2]
        train_wavs.extend(files)
    train_rows = score(ckpt, train_wavs)

    # 2) flag-reproduction control: re-score two held-out files and
    # diff against the committed score_after rows.
    after = [json.loads(x) for x in open(AFTER)]
    ctrl_files = [after[0]["file"], after[-1]["file"]]
    ctrl_rows = score(ckpt, ctrl_files)
    ctrl = []
    for row in ctrl_rows:
        orig = next(a for a in after if a["file"] == row["file"])
        ctrl.append({"file": row["file"],
                     "bits_committed": orig["bits_per_sample"],
                     "bits_rescored": row["bits_per_sample"]})

    per_spk = {}
    for row in train_rows:
        spk = re.search(r"p(\d+)_", os.path.basename(row["file"])).group(1)
        per_spk.setdefault(spk, []).append(row["bits_per_sample"])
    heldout_spk = {}
    for row in after:
        spk = re.search(r"p(\d+)_", os.path.basename(row["file"])).group(1)
        heldout_spk.setdefault(spk, []).append(row["bits_per_sample"])

    summary = {
        "checkpoint": ckpt,
        "flag_reproduction_control": ctrl,
        "train_rows": train_rows,
        "per_speaker_bits": {
            f"p{s}": {
                "train_mean": round(sum(per_spk[s]) / len(per_spk[s]), 3),
                "heldout_mean": round(
                    sum(heldout_spk[s]) / len(heldout_spk[s]), 3),
            } for s in sorted(per_spk, key=int)},
    }
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary["per_speaker_bits"], indent=1))
    print("control:", json.dumps(ctrl))
    print("wrote", out_path)


if __name__ == "__main__":
    main()
