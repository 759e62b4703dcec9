"""Teacher-forced scoring: per-sample log-likelihood of given audio.

The reference exposes next-sample probabilities (``predict_proba``) but no
batch scoring utility; this is the deployment-shaped counterpart — one
jit'd forward over the whole waveform scores every position at once
(~5 orders of magnitude faster than an autoregressive probe loop).

Uses the gather-based integer-code forward, so scoring runs at training
forward speed (hundreds of audio-seconds per second per chip).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from wavenet_tpu.audio import mu_law_encode
from wavenet_tpu.models.config import WaveNetConfig
from wavenet_tpu.models.wavenet import Params, embed_gc, forward, forward_codes


@partial(jax.jit, static_argnames=("config",))
def log_likelihood(params: Params, config: WaveNetConfig,
                   audio: jnp.ndarray,
                   gc_ids: Optional[jnp.ndarray] = None,
                   lc: Optional[jnp.ndarray] = None):
    """Log-likelihoods of a waveform under the model.

    audio: float waveform [B, T] in [-1, 1] (NOT pre-padded; positions
    before the receptive field are scored with the available context,
    causal-zero padded like training). ``lc``: [B, T, C_lc] conditioning
    on the audio timeline (lc[:, t] conditions the prediction OF sample
    t — same convention as loss_fn).

    Returns a dict:
      logp_per_sample [B, T-1] — log p(x_{t+1} | x_{<=t}) for t=0..T-2
      total_logp      [B]      — sum over scored positions
      bits_per_sample [B]      — -total_logp / ((T-1) * ln 2)
    """
    c = config
    codes = mu_law_encode(audio, c.quantization_channels)       # [B, T]
    gc_emb = embed_gc(params, c, gc_ids) if gc_ids is not None else None
    from wavenet_tpu.models.wavenet import maybe_refine_lc
    lc_in = (maybe_refine_lc(params, c, lc)[:, 1:]
             if lc is not None else None)
    if c.scalar_input:
        net_in = audio[:, :-1, None].astype(jnp.float32)
        logits = forward(params, c, net_in, gc_emb, lc=lc_in)
    else:
        logits = forward_codes(params, c, codes[:, :-1], gc_emb, lc=lc_in)
    logp = jax.nn.log_softmax(logits, axis=-1)                  # [B, T-1, Q]
    target = codes[:, 1:]
    # One-hot contraction, not take_along_axis: the gather lowers to a
    # ~2 ms/step op on TPU while the select-and-reduce fuses to nothing
    # (same finding as loss_fn; see docs/performance.md round 2).
    oh = jax.nn.one_hot(target, c.quantization_channels, dtype=logp.dtype)
    per = jnp.sum(logp * oh, axis=-1)
    total = jnp.sum(per, axis=-1)
    bits = -total / (per.shape[-1] * jnp.log(2.0))
    return {"logp_per_sample": per, "total_logp": total,
            "bits_per_sample": bits}


@partial(jax.jit, static_argnames=("config",), donate_argnames=("state",))
def _score_chunk(params, config, state, window, targets, valid, gc_emb,
                 lc=None):
    """One streaming-scorer window (module-level jit: compiles once per
    config/shape, not per log_likelihood_streaming call)."""
    from wavenet_tpu.sample import extend_state

    logits, state = extend_state(params, config, state, window, gc_emb,
                                 lc=lc)
    logp = jax.nn.log_softmax(logits, axis=-1)
    oh = jax.nn.one_hot(targets, config.quantization_channels,
                        dtype=logp.dtype)
    per = jnp.sum(logp * oh, axis=-1) * valid
    return state, jnp.sum(per, axis=-1)


def log_likelihood_streaming(params: Params, config: WaveNetConfig,
                             audio: jnp.ndarray,
                             gc_ids: Optional[jnp.ndarray] = None,
                             chunk: int = 65536,
                             lc: Optional[jnp.ndarray] = None):
    """``log_likelihood`` with O(chunk) device memory for ANY length.

    The one-shot scorer materializes [B, T, Q] logits — ~1 GB per
    minute of 16 kHz audio at Q=256 — so hour-long streams do not fit.
    Here the waveform advances through ``sample.extend_state`` windows
    (ring-buffer state carried between chunks, exactly like decode), so
    device memory is bounded by the chunk while the math stays the
    parallel teacher-forced forward. Matches ``log_likelihood`` to f32
    round-off (tested).

    Returns the same dict minus ``logp_per_sample`` (whose O(T) host
    transfer is the point of avoiding): total_logp [B],
    bits_per_sample [B].
    """
    import numpy as np

    from wavenet_tpu.models.wavenet import embed_gc
    from wavenet_tpu.sample import init_sampler_state

    c = config
    if c.scalar_input:
        raise NotImplementedError(
            "streaming scoring is mu-law-only (extend_state consumes "
            "codes); use log_likelihood for scalar-input models")
    B, T = audio.shape
    codes = mu_law_encode(audio, c.quantization_channels)
    gc_emb = embed_gc(params, c, gc_ids) if gc_ids is not None else None
    if lc is not None:
        # Refine ONCE over the full stream (so chunk boundaries see
        # full context), then slice: window position j of a chunk at
        # ``pos`` predicts target pos+1+j, conditioned by lc[pos+1+j].
        from wavenet_tpu.models.wavenet import maybe_refine_lc
        lc = maybe_refine_lc(params, c, lc)

    state = init_sampler_state(c, B)
    total = jnp.zeros((B,), jnp.float32)
    # Window t scores target t+1: inputs are codes[:, :-1].
    n_in = T - 1
    pos = 0
    while pos < n_in:
        k = min(chunk, n_in - pos)
        window = codes[:, pos:pos + k]
        targets = codes[:, pos + 1:pos + 1 + k]
        lc_k = lc[:, pos + 1:pos + 1 + k] if lc is not None else None
        if k < chunk and n_in > chunk:
            # Pad the tail chunk to the compiled size; mask the pad.
            pad = chunk - k
            window = jnp.pad(window, ((0, 0), (0, pad)))
            targets = jnp.pad(targets, ((0, 0), (0, pad)))
            if lc_k is not None:
                lc_k = jnp.pad(lc_k, ((0, 0), (0, pad), (0, 0)))
            valid = (jnp.arange(chunk) < k).astype(jnp.float32)[None, :]
        else:
            valid = jnp.ones((1, k), jnp.float32)
        state, part = _score_chunk(params, c, state, window, targets,
                                   valid, gc_emb, lc_k)
        total = total + part
        pos += k
    bits = -total / (n_in * np.log(2.0))
    return {"total_logp": total, "bits_per_sample": bits}


def main(argv=None):
    """Evaluation CLI: score wav files under a checkpoint.

        python -m wavenet_tpu.score <ckpt_dir> file1.wav [file2.wav ...] \
            --wavenet_params wavenet_params.json [--gc_id N] \
            [--gc_channels C --gc_cardinality K]

    Prints one JSON line per file: {"file", "samples", "total_logp",
    "bits_per_sample", "nll_nats_per_sample"} — held-out likelihood is
    the reference's loss metric, computed here at full forward speed.
    """
    import argparse
    import json

    ap = argparse.ArgumentParser(
        description="Score wav files under a WaveNet checkpoint")
    ap.add_argument("checkpoint")
    ap.add_argument("wavs", nargs="+")
    ap.add_argument("--wavenet_params", default="./wavenet_params.json")
    ap.add_argument("--gc_channels", type=int, default=None)
    ap.add_argument("--gc_cardinality", type=int, default=None)
    ap.add_argument("--gc_id", type=int, default=None)
    ap.add_argument("--gc_from_filename", action="store_true",
                    help="Derive each file's speaker id from the VCTK "
                         "p<id>_ filename pattern (the training-corpus "
                         "convention), instead of one global --gc_id.")
    ap.add_argument("--lc_channels", type=int, default=None,
                    help="Score under local conditioning: loads each "
                         "file's <stem>.lc.npy sidecar (the training "
                         "convention) and conditions the likelihood "
                         "on it.")
    ap.add_argument("--lc_hop", type=int, default=None)
    ap.add_argument("--lc_upsample", type=str, default="repeat",
                    choices=["repeat", "linear"])
    ap.add_argument("--lc_refine_width", type=int, default=0)
    ap.add_argument("--streaming_chunk", type=int, default=65536,
                    help="Files longer than this score through bounded-"
                         "memory extend_state windows (mu-law models); "
                         "0 forces the one-shot scorer.")
    args = ap.parse_args(argv)

    from wavenet_tpu.audio import read_wav
    from wavenet_tpu.models.wavenet import init_params
    from wavenet_tpu.train_lib import restore_params_only

    if args.lc_channels is not None and args.lc_hop is None:
        raise ValueError("--lc_channels requires --lc_hop (samples per "
                         "conditioning frame), like the train CLI.")
    with open(args.wavenet_params) as f:
        raw = json.load(f)
    config = WaveNetConfig.from_json(raw, gc_channels=args.gc_channels,
                                     gc_cardinality=args.gc_cardinality,
                                     lc_channels=args.lc_channels,
                                     lc_refine_width=args.lc_refine_width)
    template = init_params(jax.random.PRNGKey(0), config)
    params = restore_params_only(args.checkpoint, template)
    if params is None:
        raise FileNotFoundError(f"no checkpoint in {args.checkpoint}")
    if args.gc_id is not None and args.gc_channels is None:
        raise ValueError("--gc_id needs --gc_channels (and "
                         "--gc_cardinality), like the generate CLI.")
    gc_ids = (jnp.asarray([args.gc_id], jnp.int32)
              if args.gc_id is not None else None)

    for path in args.wavs:
        audio, _ = read_wav(path, raw["sample_rate"])
        if args.gc_from_filename:
            import os

            from wavenet_tpu.data.reader import parse_speaker_id
            spk = parse_speaker_id(os.path.basename(path))
            if spk is None:
                raise ValueError(f"--gc_from_filename: '{path}' does not "
                                 "match the p<id>_ pattern")
            gc_ids = jnp.asarray([spk], jnp.int32)
        lc = None
        if args.lc_channels is not None:
            from wavenet_tpu.lc import (fit_lc_to_length, load_lc_sidecar,
                                        upsample_lc)
            feats = load_lc_sidecar(path)
            if feats is None:
                raise FileNotFoundError(f"no <stem>.lc.npy next to {path}")
            up = upsample_lc(feats, args.lc_hop, args.lc_upsample)
            lc = jnp.asarray(fit_lc_to_length(up, audio.shape[0]))[None]
        stream = (args.streaming_chunk
                  and audio.shape[0] > args.streaming_chunk
                  and not config.scalar_input)
        scorer = (log_likelihood_streaming if stream else log_likelihood)
        kw = {"chunk": args.streaming_chunk} if stream else {}
        out = scorer(params, config, jnp.asarray(audio)[None, :],
                     gc_ids, lc=lc, **kw)
        total = float(jax.device_get(out["total_logp"])[0])
        bits = float(jax.device_get(out["bits_per_sample"])[0])
        n = int(audio.shape[0])
        print(json.dumps({
            "file": path, "samples": n,
            "total_logp": round(total, 3),
            "bits_per_sample": round(bits, 5),
            "nll_nats_per_sample": round(-total / max(1, n - 1), 5),
        }))
    return 0


if __name__ == "__main__":
    main()
