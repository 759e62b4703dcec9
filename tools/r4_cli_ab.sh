#!/bin/bash
# Round-4 same-session A/B: train CLI throughput vs prefetch/steps_per_dispatch.
# One TPU process at a time; each leg runs the REAL CLI on the same corpus.
set -u
CORPUS=${CORPUS:-/tmp/ovh_corpus}
STEPS=${STEPS:-60}
OUT=${OUT:-/tmp/r4_cli_ab}
mkdir -p "$OUT"
for leg in "pf0_k1 --prefetch_depth 0 --steps_per_dispatch 1" \
           "pf2_k1 --prefetch_depth 2 --steps_per_dispatch 1" \
           "pf2_k4 --prefetch_depth 2 --steps_per_dispatch 4" \
           "pf2_k8 --prefetch_depth 2 --steps_per_dispatch 8"; do
  name=$(echo $leg | cut -d' ' -f1)
  flags=$(echo $leg | cut -d' ' -f2-)
  echo "=== $name ==="
  rm -rf "$OUT/$name"
  timeout 1800 python -u train.py --data_dir "$CORPUS" \
    --logdir "$OUT/$name" --batch_size 8 --sample_size 16000 \
    --num_steps "$STEPS" --checkpoint_every 100000 \
    --silence_threshold 0 --compute_dtype bfloat16 --seed 1 \
    $flags > "$OUT/$name.log" 2>&1
  echo "exit=$? tail:"
  grep "step " "$OUT/$name.log" | tail -3
done
