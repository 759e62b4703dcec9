"""Draft distillation for speculative decoding.

Speculative decoding's speedup is the draft's acceptance rate, and
acceptance measures alignment with the TARGET'S FREE-RUNNING
distribution — not with the training data. A draft trained
independently on the same corpus can agree teacher-forced yet diverge
free-running; in overfit toy regimes acceptance is outright chaotic
(measured ~2% to ~96% across draft configs on the sine corpus, because
near-deterministic models either share an attractor or don't).

Sequence-level distillation is the standard alignment tool:
``distill_draft`` generates a corpus FROM the target and fits the draft
config to it, directly optimizing the on-policy agreement that
acceptance measures. (At toy scale the chaos can still dominate; at
realistic model entropy distillation is what makes drafts pay.)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from wavenet_tpu.models.config import WaveNetConfig
from wavenet_tpu.models.wavenet import Params


def distill_draft(params: Params, config: WaveNetConfig,
                  draft_config: WaveNetConfig, key: jax.Array,
                  *, n_clips: int = 4, clip_samples: int = 4000,
                  steps: int = 500, learning_rate: float = 2e-3,
                  temperature: float = 1.0,
                  seed_codes: Optional[jnp.ndarray] = None,
                  log=None) -> Tuple[Params, float]:
    """Train ``draft_config`` on the target's own samples.

    Returns (draft_params, final_loss). ``seed_codes`` [1, T] optionally
    primes the generation (e.g. real audio, so the sampled corpus starts
    on-manifold); each clip gets an independent sampling key. Mu-law
    targets only (same restriction as speculative decoding).
    """
    from wavenet_tpu.audio import mu_law_decode
    from wavenet_tpu.sample import generate
    from wavenet_tpu.train_lib import (
        create_train_state, make_optimizer, make_train_step)

    c = config
    if c.scalar_input or draft_config.scalar_input:
        raise NotImplementedError("distillation is mu-law-only, like "
                                  "speculative decoding")
    if steps <= 0:
        raise ValueError(f"steps must be positive, got {steps}")
    key_gen, key_init = jax.random.split(key)

    # On-policy corpus: free-running target samples. Keep the draft's
    # receptive field of left context per clip so its training chunks
    # are fully conditioned.
    T = draft_config.receptive_field + clip_samples
    seeds = (jnp.tile(seed_codes, (n_clips, 1))
             if seed_codes is not None else None)
    codes = generate(params, c, T, key_gen, batch_size=n_clips,
                     temperature=temperature, seed_codes=seeds)
    corpus = mu_law_decode(codes, c.quantization_channels)   # [n, T] f32

    opt = make_optimizer("adam", learning_rate)
    state = create_train_state(key_init, draft_config, opt)
    step_fn = make_train_step(draft_config, opt, None)
    loss = float("nan")
    for i in range(steps):
        state, metrics = step_fn(state, corpus)
        if log is not None and (i + 1) % max(1, steps // 10) == 0:
            log(f"distill step {i + 1}/{steps} "
                f"loss {float(jax.device_get(metrics['loss'])):.3f}")
    loss = float(jax.device_get(metrics["loss"]))
    return state.params, loss
