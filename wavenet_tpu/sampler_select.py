"""Compiler-verified sampler selection, shared by the CLI and the server.

Preference order: prefill + streamed decode (parallel conv priming,
run-length-independent VMEM), all-VMEM Pallas (f32 state), VMEM bf16
ring state, HBM ring, batch-chunked bf16, lax.scan. The VMEM byte estimates deliberately
over-count (worst-case Mosaic lane padding) and only prune hopeless
attempts; the ground truth is the Mosaic compiler — an attempt whose
compile fails on resources falls through to the next path. Failed
compiles cost seconds once; the persistent compilation cache makes
retries free.

Only *resource/compiler* failures fall through. Anything else (a shape
bug, bad packing, a TypeError in tracing) re-raises so regressions in
the Pallas path can't hide behind the scan fallback.

Known compiler limitation (diagnosed 2026-08-18): FRESH Mosaic compiles
of the streamed-IO kernel hard-crash the compile helper for tiny
configs (e.g. R=D=4, S=8, Q=32, 4-5 layers — the unit-test scale),
independent of local conditioning; the paper-scale configs compile
fine. Small configs ride the compilation cache when warm and otherwise
fall through to the all-VMEM kernel, which compiles at every scale —
exactly what this module's ordered fallback is for.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# Attempts whose estimated VMEM exceeds this are skipped without trying
# the compiler (v5e has ~64 MB VMEM/core but scoped allocs cap lower;
# estimates over-count, so the bar is generous).
GENEROUS_VMEM = 40 * 1024 * 1024

# Status-code prefixes as XLA emits them ("RESOURCE_EXHAUSTED: ...").
# Matched at the START of the message only — a user-level error whose
# text merely mentions one of these words must propagate (round-2
# verdict: bare "XLA"/"INTERNAL"/"exceeds" substrings masked real bugs).
_STATUS_PREFIXES = ("RESOURCE_EXHAUSTED", "UNIMPLEMENTED")


def is_compile_failure(e: BaseException) -> bool:
    """True for compiler/resource failures that justify falling back.

    Mosaic VMEM OOMs and lowering limits surface as JaxRuntimeError (the
    XlaRuntimeError alias) or as NotImplementedError from the Pallas
    lowering; Python-side tracing bugs (ValueError/TypeError from bad
    shapes or packing) are genuine defects and must propagate. For
    exceptions of other types, only an XLA status-code PREFIX or
    Mosaic's scoped-allocation overflow message qualifies.
    """
    if isinstance(e, (jax.errors.JaxRuntimeError, NotImplementedError)):
        return True
    msg = str(e)
    if msg.startswith(_STATUS_PREFIXES):
        return True
    # Mosaic scoped-vmem overflow / backend compile crashes, as re-wrapped
    # by some compile helpers without the status prefix. Requires the
    # "Mosaic" attribution AND a compile/resource phrase — "Mosaic" alone
    # in a user-level message is not enough.
    return "Mosaic" in msg and any(
        s in msg for s in ("scoped", "vmem limit", "failed to compile"))


def sampler_attempts(config, batch_size: int, n_total: int,
                     sampler: str = "auto", precision: str = "float32"):
    """Ordered (name, generate_pallas kwargs) candidates; scan is the
    implicit final fallback. ``n_total`` = forced prefix + samples (the
    unseeded recipe primes receptive_field codes).

    ``precision``: "float32" keeps exact-f32 weights in the kernels (the
    parity-faithful default; multi-pass MXU matmuls since the round-2
    mxu_dot fix). "bfloat16" casts weights and ring state to bf16 — one
    MXU pass per matmul, ~5e-3 logit drift, ~1.4x faster at large batch
    (throughput mode).
    """
    from wavenet_tpu.kernels.sampler import (
        hbm_sampler_vmem_bytes, sampler_vmem_bytes,
        stream_hbm_sampler_vmem_bytes)

    eligible = (sampler in ("auto", "pallas")
                and config.filter_width == 2
                and jax.devices()[0].platform != "cpu")
    if not eligible:
        return []
    bf16w = (dict(weight_dtype=jnp.bfloat16, state_dtype=jnp.bfloat16)
             if precision == "bfloat16" else {})
    wtag = " bf16w" if bf16w else ""
    attempts = []
    if (batch_size <= 512
            and stream_hbm_sampler_vmem_bytes(config, batch_size)
            < GENEROUS_VMEM):
        # Preferred: parallel prefill (one conv forward replaces the
        # receptive-field priming steps) + streamed-IO decode. Measured
        # (tools/r3_gen_latency.py, v5-lite): >= the sequential VMEM
        # kernel at b1-b8 and 1.3-1.6x it at b64-b128. The streamed
        # decode packs the batch into multi-tile lane records (b256 =
        # two 128-lane tiles per row); past 512 the VMEM row slots blow
        # the budget, hence the cap. state_dtype is a no-op there (f32
        # HBM ring), so only the weight dtype is forwarded.
        kw = ({"weight_dtype": jnp.bfloat16} if bf16w else {})
        attempts.append((f"Pallas (prefill + streamed decode{wtag})",
                         dict(kw, prefill=True)))
    elif (batch_size > 512
          and stream_hbm_sampler_vmem_bytes(config, 512) < GENEROUS_VMEM):
        # Past the per-launch cap: sequential <=512-lane chunked runs
        # (chunk i seeds seed+i). The b512 chunk sustains ~4.6M
        # samples/s vs ~0.55M for the scan fallback this replaces.
        kw = ({"weight_dtype": jnp.bfloat16} if bf16w else {})
        attempts.append(
            (f"Pallas (prefill + streamed decode, chunks of 512{wtag})",
             dict(kw, prefill=True, batch_chunk=512)))
    if sampler_vmem_bytes(config, batch_size, n_total) < GENEROUS_VMEM:
        attempts.append((f"Pallas (f32 state{wtag})", dict(bf16w)))
    if sampler_vmem_bytes(config, batch_size, n_total,
                          state_bytes=2) < GENEROUS_VMEM:
        attempts.append((f"Pallas (bf16 ring state{wtag})",
                         dict(bf16w, state_dtype=jnp.bfloat16)))
    if hbm_sampler_vmem_bytes(config, batch_size, n_total) < GENEROUS_VMEM:
        attempts.append((f"Pallas (HBM ring{wtag})",
                         dict(bf16w, ring_in_hbm=True)))
    if stream_hbm_sampler_vmem_bytes(config, batch_size) < GENEROUS_VMEM:
        # Run-length-independent VMEM: the big-batch / long-run workhorse.
        attempts.append((f"Pallas (HBM ring, streamed IO{wtag})",
                         dict(bf16w, ring_in_hbm=True, stream_io=True)))
    for bc in (16, 8, 4, 2, 1):
        if (batch_size % bc == 0 and bc < batch_size
                and sampler_vmem_bytes(config, bc, n_total,
                                       state_bytes=2) < GENEROUS_VMEM):
            attempts.append((f"Pallas (bf16 ring, chunks of {bc}{wtag})",
                             dict(bf16w, state_dtype=jnp.bfloat16,
                                  batch_chunk=bc)))
    return attempts


def generate_with_fallback(params, config, n_samples: int, *,
                           seed: int = 0,
                           batch_size: int = 1,
                           gc_ids=None,
                           temperature: float = 1.0,
                           seed_codes=None,
                           sampler: str = "auto",
                           precision: str = "float32",
                           lc=None,
                           log=print):
    """Generate with the fastest sampler that actually compiles.

    Returns (codes [B, n_samples], chosen_name, chosen_kwargs) where
    chosen_kwargs is None when the scan sampler ran — callers (the
    server) can cache the winning variant and skip the probe next time.
    ``lc`` [B, n_samples, C_lc] (local conditioning) streams through
    the Pallas kernels as a per-step feature row; the one variant
    without LC support (legacy single-pass HBM ring) raises
    NotImplementedError and falls through like any compile failure.
    """
    from wavenet_tpu.kernels.sampler import generate_pallas
    from wavenet_tpu.sample import generate

    n_forced = (int(seed_codes.shape[1]) if seed_codes is not None
                else config.receptive_field)
    attempts = sampler_attempts(config, batch_size, n_samples + n_forced,
                                sampler, precision)
    for name, kw in attempts:
        try:
            codes = generate_pallas(
                params, config, n_samples, seed=seed,
                batch_size=batch_size, gc_ids=gc_ids,
                temperature=temperature, seed_codes=seed_codes, lc=lc,
                **kw)
            log(f"Using fused {name} sampler.")
            return codes, name, kw
        except Exception as e:
            if not is_compile_failure(e):
                raise
            log(f"{name} sampler unavailable "
                f"({str(e).splitlines()[0][:90]}); trying next.")

    log("Using lax.scan sampler.")
    codes = generate(params, config, n_samples, jax.random.PRNGKey(seed),
                     batch_size=batch_size, gc_ids=gc_ids,
                     temperature=temperature, seed_codes=seed_codes, lc=lc)
    return codes, "scan", None
