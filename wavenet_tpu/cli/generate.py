"""Generation CLI — flag surface mirrors the reference's generate.py.

Reference: generate.py ≈:25-90 (flags: checkpoint positional, --samples,
--temperature, --wav_out_path, --save_every, --fast_generation, --wav_seed,
--gc_channels, --gc_cardinality, --gc_id), ≈:120-240 (main). The fast path
here is a single jit'd lax.scan (wavenet_tpu/sample.py) instead of one
sess.run per sample; the slow path re-runs the full conv net per sample for
cross-checking, like the reference's --fast_generation=false.
"""

from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

SAMPLES = 16000
TEMPERATURE = 1.0
LOGDIR = "./logdir"
WAVENET_PARAMS = "./wavenet_params.json"
SAVE_EVERY = None
SILENCE_THRESHOLD = 0.1


def get_arguments(argv=None):
    def _str_to_bool(s):
        if s.lower() not in ("true", "false"):
            raise ValueError("Argument needs to be a boolean, got {}".format(s))
        return s.lower() == "true"

    parser = argparse.ArgumentParser(description="WaveNet generation (TPU-native)")
    parser.add_argument("checkpoint", type=str,
                        help="Directory with orbax ckpt-<step> checkpoints "
                             "(or a specific ckpt-<step> path).")
    parser.add_argument("--samples", type=int, default=SAMPLES)
    parser.add_argument("--temperature", type=float, default=TEMPERATURE)
    parser.add_argument("--logdir", type=str, default=LOGDIR)
    parser.add_argument("--wavenet_params", type=str, default=WAVENET_PARAMS)
    parser.add_argument("--wav_out_path", type=str, default=None)
    parser.add_argument("--save_every", type=int, default=SAVE_EVERY,
                        help="Write the partial wav every n samples.")
    parser.add_argument("--fast_generation", type=_str_to_bool, default=True)
    parser.add_argument("--sampler_precision", type=str, default="float32",
                        choices=("float32", "bfloat16"),
                        help="float32: exact-f32 kernel matmuls (parity "
                        "mode). bfloat16: bf16 weights+state, one MXU "
                        "pass — ~1.4x faster at large batch, ~5e-3 "
                        "logit drift.")
    parser.add_argument("--sampler", type=str, default="auto",
                        choices=["auto", "pallas", "scan"],
                        help="Fast-path implementation: the fused Pallas "
                             "VMEM kernel, the lax.scan sampler, or auto "
                             "(pallas when the working set fits VMEM).")
    parser.add_argument("--draft_checkpoint", type=str, default=None,
                        help="Checkpoint dir of a DRAFT model: enables "
                             "speculative decoding (draft proposes "
                             "--speculative_k samples, the target model "
                             "verifies them in one parallel pass; output "
                             "distribution is exactly the target's). "
                             "Mu-law models only; batches run as "
                             "vmapped independent streams. NOTE: at "
                             "paper-WaveNet scale this is only ~+10% "
                             "over the plain fused sampler (measured "
                             "36.4K vs 33.0K samples/s at k=16 on "
                             "v5-lite) — it pays off for DEEP/WIDE "
                             "targets where a verify pass amortizes "
                             "more work, not for the default config.")
    parser.add_argument("--draft_wavenet_params", type=str, default=None,
                        help="Model params JSON for --draft_checkpoint "
                             "(defaults to --wavenet_params).")
    parser.add_argument("--speculative_k", type=int, default=8,
                        help="Draft proposals per verify pass.")
    parser.add_argument("--wav_seed", type=str, default=None)
    parser.add_argument("--batch_size", type=int, default=1,
                        help="Generate this many waveforms at once "
                             "(TPU-native extension; wav_out_path gets a "
                             "-<i> suffix per batch element).")
    parser.add_argument("--gc_channels", type=int, default=None)
    parser.add_argument("--gc_cardinality", type=int, default=None)
    parser.add_argument("--gc_id", type=int, default=None,
                        help="ID of category to generate, int value.")
    parser.add_argument("--lc_channels", type=int, default=None,
                        help="Local condition channels of the trained "
                             "model (extension; enables per-timestep "
                             "conditioning).")
    parser.add_argument("--lc_file", type=str, default=None,
                        help="npy file [frames, lc_channels] of "
                             "conditioning features for the generated "
                             "audio; upsampled by --lc_hop. Required "
                             "when --lc_channels is set.")
    parser.add_argument("--lc_hop", type=int, default=None,
                        help="Output samples per LC frame.")
    parser.add_argument("--lc_upsample", type=str, default="repeat",
                        choices=["repeat", "linear"])
    parser.add_argument("--lc_refine_width", type=int, default=0,
                        help="Learned LC upsampling refinement width of "
                             "the trained model (must match training).")
    parser.add_argument("--seed", type=int, default=None,
                        help="PRNG seed for sampling.")
    parser.add_argument("--compilation_cache", type=str,
                        default="~/.cache/wavenet_tpu_xla",
                        help="Persistent XLA compilation cache dir "
                             "('' disables).")
    return parser.parse_args(argv)


def create_seed(filename, sample_rate, quantization_channels, window_size,
                silence_threshold=SILENCE_THRESHOLD, scalar_input=False):
    """Load + trim a seed wav -> sampler seed (generate.py ≈:105).

    Mu-law models are seeded with integer class codes; scalar-input
    models consume raw amplitudes in [-1, 1], so the trimmed float
    waveform is returned un-encoded (feeding class codes as amplitudes
    would silently corrupt priming)."""
    from wavenet_tpu.audio import mu_law_encode_np, read_wav, trim_silence

    audio, _ = read_wav(filename, sample_rate)
    audio = trim_silence(audio, silence_threshold)
    cut = audio[:window_size] if window_size else audio
    if scalar_input:
        return cut.astype(np.float32)
    return mu_law_encode_np(cut, quantization_channels)


def main(argv=None):
    args = get_arguments(argv)
    if (args.draft_checkpoint and args.save_every
            and args.batch_size != 1):
        raise ValueError("--save_every with --draft_checkpoint runs at "
                         "batch size 1 (acceptance makes emitted counts "
                         "ragged across lanes)")

    from wavenet_tpu.cli.train import enable_compilation_cache
    enable_compilation_cache(args.compilation_cache)

    from wavenet_tpu.audio import mu_law_decode, write_wav
    from wavenet_tpu.models.config import WaveNetConfig
    from wavenet_tpu.models.wavenet import (
        embed_gc, init_params, predict_proba)
    from wavenet_tpu.sample import generate
    from wavenet_tpu.train_lib import restore_params_only

    with open(args.wavenet_params, "r") as f:
        wavenet_params = json.load(f)

    if args.gc_channels is not None and args.gc_cardinality is None:
        raise ValueError("Global conditioning needs --gc_cardinality "
                         "(training derived it from the data; generation "
                         "requires the flag, like the reference).")

    if args.lc_channels is not None:
        if args.lc_file is None or args.lc_hop is None:
            raise ValueError("--lc_channels needs --lc_file and --lc_hop "
                             "(per-timestep conditioning for the generated "
                             "audio).")
        if args.draft_checkpoint:
            raise ValueError("--draft_checkpoint (speculative decoding) "
                             "does not support local conditioning yet.")

    config = WaveNetConfig.from_json(
        wavenet_params,
        gc_channels=args.gc_channels,
        gc_cardinality=args.gc_cardinality,
        lc_channels=args.lc_channels,
        lc_refine_width=args.lc_refine_width)

    template = init_params(jax.random.PRNGKey(0), config)
    import os
    ckpt_dir = args.checkpoint
    step = None
    base = os.path.basename(os.path.normpath(ckpt_dir))
    if base.startswith("ckpt-"):
        step = int(base.split("-")[1])
        ckpt_dir = os.path.dirname(os.path.normpath(ckpt_dir))
    params = restore_params_only(ckpt_dir, template, step)
    if params is None:
        raise FileNotFoundError(f"No checkpoint found in {args.checkpoint}")
    print(f"Restoring model from {args.checkpoint}")

    gc_ids = None
    if args.gc_id is not None:
        if args.gc_channels is None:
            raise ValueError("Globally conditioning is enabled, but global "
                             "condition was not specified. Use --gc_channels.")
        gc_ids = jnp.full((args.batch_size,), args.gc_id, jnp.int32)

    seed_codes = None
    if args.wav_seed:
        codes = create_seed(args.wav_seed, wavenet_params["sample_rate"],
                            config.quantization_channels,
                            config.receptive_field,
                            scalar_input=config.scalar_input)
        seed_codes = jnp.tile(jnp.asarray(codes)[None, :],
                              (args.batch_size, 1))

    lc = None
    if args.lc_channels is not None:
        from wavenet_tpu.lc import fit_lc_to_length, upsample_lc
        feats = np.load(args.lc_file)
        if feats.ndim == 1:
            feats = feats[:, None]
        if feats.shape[1] != args.lc_channels:
            raise ValueError(f"--lc_file has {feats.shape[1]} channels, "
                             f"expected --lc_channels={args.lc_channels}")
        stream = fit_lc_to_length(
            upsample_lc(feats, args.lc_hop, args.lc_upsample), args.samples)
        lc = jnp.tile(jnp.asarray(stream)[None], (args.batch_size, 1, 1))

    key = jax.random.PRNGKey(args.seed if args.seed is not None else 0)

    if args.draft_checkpoint:
        codes = _generate_speculative(params, config, args, key, gc_ids,
                                      seed_codes)
    elif args.fast_generation and args.save_every:
        codes = _generate_fast_chunked(params, config, args, key, gc_ids,
                                       seed_codes, wavenet_params, lc)
    elif args.fast_generation:
        codes = _generate_fast(params, config, args, key, gc_ids, seed_codes,
                               lc)
    else:
        # Slow path: full conv forward on the trailing receptive-field
        # window per sample (reference predict_proba loop, ≈:217).
        codes = _generate_slow(params, config, args, key, gc_ids, seed_codes,
                               lc)

    codes = np.asarray(jax.device_get(codes))
    waveform = np.asarray(
        jax.device_get(mu_law_decode(codes, config.quantization_channels)))

    if seed_codes is None and np.max(np.abs(waveform)) < 0.02:
        # Classic WaveNet cold-start attractor (present in the reference
        # too): a converged model conditioned on pure silence keeps
        # predicting silence. Warn instead of silently writing a flat wav.
        print("WARNING: generated audio is near-silent. Converged models "
              "often get stuck on the silence attractor when unseeded — "
              "pass --wav_seed <some.wav> to prime generation with real "
              "audio, or raise --temperature.")

    if args.wav_out_path:
        sr = wavenet_params["sample_rate"]
        if args.batch_size == 1:
            write_wav(args.wav_out_path, waveform[0], sr)
            print(f"Updated wav file at {args.wav_out_path}")
        else:
            root, ext = os.path.splitext(args.wav_out_path)
            for i in range(args.batch_size):
                path = f"{root}-{i}{ext}"
                write_wav(path, waveform[i], sr)
                print(f"Updated wav file at {path}")
    print("Finished generating.")
    return 0


def _load_draft(args):
    import json as _json

    from wavenet_tpu.models.config import WaveNetConfig
    from wavenet_tpu.models.wavenet import init_params
    from wavenet_tpu.train_lib import restore_params_only

    dp_path = args.draft_wavenet_params or args.wavenet_params
    with open(dp_path) as f:
        draft_json = _json.load(f)
    draft_config = WaveNetConfig.from_json(
        draft_json, gc_channels=args.gc_channels,
        gc_cardinality=args.gc_cardinality)
    template = init_params(jax.random.PRNGKey(0), draft_config)
    draft_params = restore_params_only(args.draft_checkpoint, template)
    if draft_params is None:
        raise FileNotFoundError(
            f"No draft checkpoint in {args.draft_checkpoint}")
    print(f"Restoring draft model from {args.draft_checkpoint}")
    return draft_params, draft_config


def _generate_speculative(params, config, args, key, gc_ids, seed_codes):
    """Speculative decoding: a draft checkpoint proposes, the target
    verifies (wavenet_tpu/speculative.py). Target-exact distribution.
    With --save_every, generates in resumable segments and dumps the
    partial wav after each (reference generate.py ≈:225 semantics)."""
    from wavenet_tpu.speculative import generate_speculative

    draft_params, draft_config = _load_draft(args)
    common = dict(k=args.speculative_k, temperature=args.temperature,
                  gc_ids=gc_ids, draft_gc_ids=gc_ids)

    if not args.save_every:
        codes, (n_seg, n_acc, n_out) = generate_speculative(
            params, config, draft_params, draft_config, args.samples, key,
            seed_codes=seed_codes, batch_size=args.batch_size,
            return_stats=True, **common)
        rate = n_acc / max(1, n_seg * args.speculative_k)
        print(f"Speculative decode: {n_seg} segments, draft acceptance "
              f"{100 * rate:.1f}%, "
              f"{n_out / max(1, n_seg):.2f} samples/pass.")
        return codes

    from wavenet_tpu.audio import mu_law_decode_np, write_wav

    carry = None
    chunks = []
    done = 0
    seg = args.save_every     # fixed segment size -> one compiled shape
    while done < args.samples:
        key, sub = jax.random.split(key)
        part, carry = generate_speculative(
            params, config, draft_params, draft_config, seg, sub,
            seed_codes=None if carry is not None else seed_codes,
            carry=carry, return_carry=True, **common)
        chunks.append(np.asarray(part))
        done += part.shape[1]
        if args.wav_out_path:
            partial = np.concatenate(chunks, axis=1)[0, :args.samples]
            write_wav(args.wav_out_path,
                      mu_law_decode_np(partial,
                                       config.quantization_channels),
                      config.sample_rate)
            print(f"Sample {min(done, args.samples)}/{args.samples} — "
                  f"partial wav updated", flush=True)
    return jnp.asarray(
        np.concatenate(chunks, axis=1)[:, :args.samples])


def _generate_fast(params, config, args, key, gc_ids, seed_codes, lc=None):
    """Run the fastest sampler that actually compiles (ordered fallback,
    shared with the server — wavenet_tpu/sampler_select.py)."""
    from wavenet_tpu.sampler_select import generate_with_fallback

    codes, _, _ = generate_with_fallback(
        params, config, args.samples,
        seed=args.seed if args.seed is not None else 0,
        batch_size=args.batch_size, gc_ids=gc_ids,
        temperature=args.temperature, seed_codes=seed_codes,
        sampler=args.sampler, precision=args.sampler_precision, lc=lc)
    return codes


def _generate_fast_chunked(params, config, args, key, gc_ids, seed_codes,
                           wavenet_params, lc=None):
    """--save_every: generate in chunks, dumping the partial wav after
    each (reference generate.py ≈:225). Tries the resumable streamed
    Pallas kernel first (state carries across segments in the HBM ring;
    local conditioning streams per segment); falls back to the resumable
    scan sampler on compile failure."""
    from wavenet_tpu.sampler_select import is_compile_failure

    if args.sampler in ("auto", "pallas") \
            and config.filter_width == 2 \
            and jax.devices()[0].platform != "cpu":
        try:
            return _generate_chunked_pallas(params, config, args, gc_ids,
                                            seed_codes, wavenet_params, lc)
        except Exception as e:
            if not is_compile_failure(e):
                raise
            print(f"Pallas resumable sampler unavailable "
                  f"({str(e).splitlines()[0][:90]}); using scan.")
    return _generate_chunked_scan(params, config, args, key, gc_ids,
                                  seed_codes, wavenet_params, lc)


def _generate_chunked_pallas(params, config, args, gc_ids, seed_codes,
                             wavenet_params, lc=None):
    """Pallas --save_every: resumable streamed-kernel segments."""
    from wavenet_tpu.audio import mu_law_decode_np, write_wav
    from wavenet_tpu.kernels.sampler import generate_pallas_resumable

    if lc is not None and config.lc_refine_width:
        # Refine the FULL stream once (models.wavenet.refine_lc) so the
        # per-segment slices see full neighborhood context; the
        # resumable primitive takes already-refined features.
        from wavenet_tpu.models.wavenet import refine_lc
        lc = refine_lc(params, config, lc)
    chunks = []
    carry = None
    done = 0
    base_seed = args.seed if args.seed is not None else 0
    segment = 0
    while done < args.samples:
        n = min(args.save_every, args.samples - done)
        codes, carry = generate_pallas_resumable(
            params, config, n, seed=base_seed + segment,
            batch_size=args.batch_size, gc_ids=gc_ids,
            temperature=args.temperature,
            seed_codes=seed_codes if carry is None else None,
            carry=carry,
            weight_dtype=(jnp.bfloat16
                          if args.sampler_precision == "bfloat16"
                          else jnp.float32),
            lc=lc[:, done:done + n] if lc is not None else None)
        if segment == 0:
            print("Using fused Pallas (HBM ring, streamed, resumable) "
                  "sampler.")
        chunks.append(np.asarray(codes))
        done += n
        segment += 1
        if args.wav_out_path:
            partial = np.concatenate(chunks, axis=1)
            wave = mu_law_decode_np(partial[0],
                                    config.quantization_channels)
            write_wav(args.wav_out_path, wave,
                      wavenet_params["sample_rate"])
            print(f"Sample {done}/{args.samples} — partial wav updated")
    return jnp.asarray(np.concatenate(chunks, axis=1))


def _generate_chunked_scan(params, config, args, key, gc_ids, seed_codes,
                           wavenet_params, lc=None):
    """Scan-sampler --save_every (CPU, LC, and fallback path)."""
    from wavenet_tpu.audio import mu_law_decode_np, write_wav
    from wavenet_tpu.models.wavenet import embed_gc
    from wavenet_tpu.sample import (
        _featurize, _lc_for_prime, generate_codes_resumable, prefill_state)

    c = config
    B = args.batch_size
    gc_emb = embed_gc(params, c, gc_ids) if gc_ids is not None else None
    if lc is not None and c.lc_refine_width:
        # Full-stream refinement before slicing (see _generate_chunked_pallas).
        from wavenet_tpu.models.wavenet import refine_lc
        lc = refine_lc(params, c, lc)
    key_first, key = jax.random.split(key)
    if seed_codes is None:
        if c.scalar_input:
            # Scalar mode primes with raw silence amplitudes and starts
            # from 0.0 (sample.generate's unseeded scalar recipe).
            silence = jnp.zeros((B, c.receptive_field - 1), jnp.float32)
            first = jnp.zeros((B,), jnp.float32)
        else:
            silence = jnp.full((B, c.receptive_field - 1),
                               c.quantization_channels // 2, jnp.int32)
            first = jax.random.randint(key_first, (B,), 0,
                                       c.quantization_channels)
        lc_p = _lc_for_prime(lc, None, c.receptive_field - 1)
        state = prefill_state(params, c, silence, gc_emb, lc_p)
    else:
        # seed_codes: int classes, or raw amplitudes in scalar mode
        # (create_seed already branches) — prefill_state handles both
        # (one parallel forward instead of a receptive-field scan).
        lc_p = _lc_for_prime(lc, None, seed_codes.shape[1] - 1)
        state = prefill_state(params, c, seed_codes[:, :-1], gc_emb, lc_p)
        first = seed_codes[:, -1]

    x = _featurize(first, c)
    chunks = []
    done = 0
    while done < args.samples:
        n = min(args.save_every, args.samples - done)
        key, sub = jax.random.split(key)
        codes, state, x = generate_codes_resumable(
            params, c, state, x, n, sub, args.temperature, gc_emb,
            lc[:, done:done + n] if lc is not None else None)
        chunks.append(np.asarray(codes))
        done += n
        if args.wav_out_path:
            partial = np.concatenate(chunks, axis=1)
            wave = mu_law_decode_np(partial[0], c.quantization_channels)
            write_wav(args.wav_out_path, wave,
                      wavenet_params["sample_rate"])
            print(f"Sample {done}/{args.samples} — partial wav updated")
    return jnp.asarray(np.concatenate(chunks, axis=1))


def _generate_slow(params, config, args, key, gc_ids, seed_codes, lc=None):
    """O(receptive_field) per sample — parity/debug path.

    The rolling window holds the network's raw inputs: int mu-law classes,
    or float amplitudes in scalar mode (sampled classes are decoded back
    to amplitudes before re-entering the window). With local conditioning
    a feature window rolls alongside: row t conditions the prediction of
    window position t+1, so its last row is the conditioning of the
    sample being drawn (see models.wavenet.forward's convention)."""
    from wavenet_tpu.audio import mu_law_decode_np
    from wavenet_tpu.models.wavenet import predict_proba

    rf = config.receptive_field
    scalar = config.scalar_input
    win_dtype = np.float32 if scalar else np.int32
    silence = 0.0 if scalar else config.quantization_channels // 2

    @jax.jit
    def one_step(window, sub, lc_win=None):
        probs = predict_proba(params, config, window, gc_ids, lc=lc_win)
        logits = jnp.log(jnp.maximum(probs, 1e-30))
        return jax.random.categorical(sub, logits / args.temperature,
                                      axis=-1)

    if seed_codes is not None:
        window = np.asarray(seed_codes).astype(win_dtype)
    else:
        window = np.full((args.batch_size, 1), silence, win_dtype)
    lc_np = np.asarray(lc) if lc is not None else None
    lc_hist = None
    if lc_np is not None:
        # Conditioning for the pre-generation timeline (seed/silence):
        # hold the first generated sample's features backward (same
        # default as sample._lc_for_prime).
        lc_hist = np.repeat(lc_np[:, :1], window.shape[1], axis=1)
    out = []
    for i in range(args.samples):
        key, sub = jax.random.split(key)
        # Fixed-size window (left-pad with silence) -> one compiled step.
        win = window[:, -rf:]
        if win.shape[1] < rf:
            win = np.pad(win, ((0, 0), (rf - win.shape[1], 0)),
                         constant_values=silence)
        if lc_np is None:
            code = np.asarray(one_step(jnp.asarray(win), sub))
        else:
            # Rows shifted +1 vs the code window: the row for window
            # position t is the conditioning of position t+1's
            # prediction; the appended lc_np[:, i] conditions THIS draw.
            hist = np.concatenate([lc_hist, lc_np[:, i:i + 1]], axis=1)
            lc_win = hist[:, -rf:]
            if lc_win.shape[1] < rf:
                lc_win = np.concatenate(
                    [np.repeat(lc_win[:, :1], rf - lc_win.shape[1], axis=1),
                     lc_win], axis=1)
            code = np.asarray(one_step(jnp.asarray(win), sub,
                                       jnp.asarray(lc_win)))
            lc_hist = hist
        nxt = (mu_law_decode_np(code, config.quantization_channels)
               .astype(np.float32) if scalar else code)
        window = np.concatenate([window, nxt[:, None]], axis=1)
        out.append(code)
        if i % 100 == 0:
            print(f"Sample {i}/{args.samples}")
    return np.stack(out, axis=1)


if __name__ == "__main__":
    sys.exit(main())
