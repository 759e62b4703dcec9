"""Speculative-decoding speedup on a trained model pair (TPU).

Trains a target (16 layers) on the synthetic sine corpus, then
DISTILLS a draft (6 layers) on the target's own free-running samples —
alignment with the target's generative distribution is what drives
acceptance. Caveat from CPU calibration: with overfit near-
deterministic toy models acceptance is chaotic (2%-96% across draft
configs, depending on whether free-running attractors coincide), so
treat the acceptance number here as a property of THIS pair, not of
the method. Measures b=1 samples/s: plain scan sampler vs speculative
at several k, with acceptance stats.

Run alone — one TPU process at a time. ~6 min including training.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wavenet_tpu.models.config import WaveNetConfig
from wavenet_tpu.sample import generate
from wavenet_tpu.speculative import generate_speculative
from wavenet_tpu.train_lib import (
    create_train_state, make_optimizer, make_train_step)

SR = 2000


def make_sines(n, t_len, rng):
    freqs = [155.56, 196.0, 233.08]
    t = np.arange(t_len) / SR
    waves = []
    for i in range(n):
        f = freqs[i % 3]
        waves.append(0.6 * np.sin(2 * np.pi * f * t + rng.uniform(0, 6)))
    return np.stack(waves).astype(np.float32)


def train_on(cfg, audio, steps, tag):
    opt = make_optimizer("adam", 2e-3)
    state = create_train_state(jax.random.PRNGKey(1), cfg, opt)
    step_fn = make_train_step(cfg, opt, None)
    for i in range(steps):
        state, metrics = step_fn(state, audio)
    loss = float(jax.device_get(metrics["loss"]))
    print(f"{tag}: trained {steps} steps, loss {loss:.3f}")
    return state.params


def train(cfg, steps, rng, tag):
    audio = jnp.asarray(make_sines(4, cfg.receptive_field + 4000, rng))
    return train_on(cfg, audio, steps, tag)


def timed(fn, reps=3):
    np.asarray(jax.device_get(fn()))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        _ = np.asarray(jax.device_get(out)).sum()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    rng = np.random.RandomState(0)
    tcfg = WaveNetConfig(
        dilations=(1, 2, 4, 8, 16, 32, 64, 128) * 2, residual_channels=32,
        dilation_channels=32, skip_channels=128,
        quantization_channels=256, use_biases=True, sample_rate=SR,
        compute_dtype="bfloat16")
    dcfg = WaveNetConfig(
        dilations=(1, 2, 4, 8, 16, 32), residual_channels=16,
        dilation_channels=16, skip_channels=32,
        quantization_channels=256, use_biases=True, sample_rate=SR,
        compute_dtype="bfloat16")

    tparams = train(tcfg, 300, rng, "target(16L)")

    n = 4000
    seed_wave = make_sines(1, tcfg.receptive_field, rng)
    from wavenet_tpu.audio import mu_law_encode_np
    seed = jnp.asarray(
        mu_law_encode_np(seed_wave[0], 256))[None, :]

    # Distill the draft on the TARGET's free-running samples (alignment
    # is what acceptance measures) — the shared utility, not an inline
    # re-implementation.
    from wavenet_tpu.distill import distill_draft
    dparams, dloss = distill_draft(tparams, tcfg, dcfg,
                                   jax.random.PRNGKey(5), n_clips=4,
                                   clip_samples=4000, steps=300,
                                   seed_codes=seed, log=print)
    print(f"draft(6L): distilled, loss {dloss:.3f}")

    dt = timed(lambda: generate(tparams, tcfg, n, jax.random.PRNGKey(2),
                                batch_size=1, seed_codes=seed))
    print(f"scan b1:          {n/dt:9.0f} samples/s")

    for k in (4, 8, 16):
        codes, (n_seg, n_acc, n_out) = generate_speculative(
            tparams, tcfg, dparams, dcfg, n, jax.random.PRNGKey(2), k=k,
            seed_codes=seed, return_stats=True)
        dt = timed(lambda k=k: generate_speculative(
            tparams, tcfg, dparams, dcfg, n, jax.random.PRNGKey(2), k=k,
            seed_codes=seed))
        acc = 100 * n_acc / max(1, n_seg * k)
        spp = n_out / max(1, n_seg)
        print(f"speculative k={k:2d}: {n/dt:9.0f} samples/s  "
              f"(accept {acc:5.1f}%, {spp:4.2f} samples/target-pass)")


if __name__ == "__main__":
    main()
