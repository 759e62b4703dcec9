"""Speculative sampling for WaveNet (draft-propose / target-verify).

Autoregressive decode at batch 1 is latency-bound: the target network's
dependency chain admits ~1 sample per full sequential pass. Speculative
sampling (Leviathan et al. 2022 / Chen et al. 2023, applied here to
dilated-conv audio models) breaks that bound without changing the
output distribution:

1. a small DRAFT WaveNet proposes k samples with its (cheap) sequential
   loop;
2. the TARGET verifies all k proposals — plus the bonus position — in
   ONE MXU-parallel ring-context window pass (`sample._extend_forward`,
   the same math as prompt prefill);
3. modified rejection sampling accepts a prefix of m proposals and
   draws one corrected/bonus sample from the residual distribution
   max(p_target − p_draft, 0) (or from p_target when all k are
   accepted), so every emitted sample is EXACTLY target-distributed;
4. both models commit their ring state for the accepted length with the
   rollback-free dynamic-length commit (`sample._extend_commit`) — no
   state is ever rolled back, and no position is ever recomputed.

Per segment the target runs ONE parallel pass for m+1 emitted samples
(1 <= m+1 <= k+1); with a well-matched draft the target's sequential
bottleneck amortizes by the mean accepted length. The whole loop —
draft scan, verify, acceptance, commits — is a single jitted
`lax.while_loop`: zero host round-trips per segment.

No reference counterpart (the reference's fast path is one sess.run
per sample); distribution-exactness is tested in
tests/test_speculative.py, including draft==target full acceptance and
state equality against teacher-forcing the emitted stream.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from typing import NamedTuple

from wavenet_tpu.models.config import WaveNetConfig
from wavenet_tpu.models.wavenet import Params, embed_gc
from wavenet_tpu.sample import (
    SamplerState, _extend_commit, _extend_forward, _featurize,
    _ordered_ring, prefill_state, sampler_step)


class SpeculativeCarry(NamedTuple):
    """State between resumable speculative segments (batch 1)."""
    t_state: SamplerState     # target ring/causal/t
    d_state: SamplerState     # draft ring/causal/t
    last: jnp.ndarray         # [1] int32 — next decode input


@partial(jax.jit,
         static_argnames=("config", "draft_config", "n_samples", "k"))
def _speculative_loop(params: Params, config: WaveNetConfig,
                      draft_params: Params, draft_config: WaveNetConfig,
                      t_state: SamplerState, d_state: SamplerState,
                      last: jnp.ndarray, key: jax.Array,
                      n_samples: int, k: int, temperature,
                      gc_emb_t, gc_emb_d):
    """The whole speculative decode as one program. ``last`` [1] int32.

    ``temperature`` is TRACED (it only scales logits): per-request
    temperatures — e.g. through the HTTP server — must not recompile
    the two-model while_loop.
    """
    c, dc = config, draft_config
    Q = c.quantization_channels
    inv_t = 1.0 / jnp.float32(temperature)
    n_cap = n_samples + k + 1

    def segment(carry):
        out, n_out, t_st, d_st, last, key, n_seg, n_acc = carry
        key, k_draft, k_u, k_res = jax.random.split(key, 4)

        # 1. Draft proposes sequentially: k+1 steps consuming exactly
        #    [last, c_0 .. c_{k-1}] (the final proposal is discarded),
        #    collecting each step's per-layer inputs so the draft's
        #    partial-acceptance commit needs NO second stack pass —
        #    those inputs ARE the window columns _extend_commit gathers.
        def dbody(c2, key_j):
            dst, xf = c2
            dst, logits, xs = sampler_step(draft_params, dc, dst, xf,
                                           gc_emb_d,
                                           collect_layer_inputs=True)
            probs = jax.nn.softmax(logits * inv_t, axis=-1)     # [1, Q]
            code = jax.random.categorical(key_j, logits * inv_t,
                                          axis=-1)              # [1]
            return (dst, _featurize(code, dc)), (code, probs, xs)

        (_, _), (cs_all, pds_all, xs_all) = lax.scan(
            dbody, (d_st, _featurize(last, dc)),
            jax.random.split(k_draft, k + 1))
        cs = jnp.transpose(cs_all[:k])                          # [1, k]
        pds = pds_all[:k, 0]                                    # [k, Q]

        # 2. Target verifies proposals + the bonus position in ONE pass.
        inputs = jnp.concatenate([last[:, None], cs], axis=1)   # [1, k+1]
        logits_t, parts_t = _extend_forward(params, c, t_st, inputs,
                                            gc_emb_t)
        pt = jax.nn.softmax(logits_t[0] * inv_t, axis=-1)       # [k+1, Q]

        # 3. Modified rejection sampling. accept_j: u <= pt(c_j)/pd(c_j).
        cs0 = cs[0]
        j_ids = jnp.arange(k)
        pt_at = pt[j_ids, cs0]
        pd_at = pds[j_ids, cs0]
        u = jax.random.uniform(k_u, (k,))
        accept = u * pd_at <= pt_at
        m = jnp.sum(jnp.cumprod(accept.astype(jnp.int32)))      # 0..k

        # Residual distribution at the first rejected position; row k of
        # the zero-padded draft probs makes the all-accepted bonus draw
        # (residual == p_target) the same code path.
        pd_pad = jnp.concatenate([pds, jnp.zeros((1, Q))], axis=0)
        res = jnp.maximum(pt[m] - pd_pad[m], 0.0)
        res_sum = jnp.sum(res)
        res = jnp.where(res_sum > 1e-20, res / res_sum, pt[m])
        c_prime = jax.random.categorical(k_res,
                                         jnp.log(res + 1e-30))  # []
        c_prime = c_prime.astype(jnp.int32)[None]               # [1]

        # 4. Commit both models for the accepted length (m+1 inputs:
        #    last + the m accepted proposals). Draft commit parts come
        #    from the scan: window column j of layer l = xs_all[j, l].
        v = m + 1
        t_st = _extend_commit(c, t_st, parts_t, v)
        full_in_d = jnp.concatenate(
            [d_st.causal_buf, _featurize(inputs, dc)], axis=1)
        arrs_d = []
        for l, d in enumerate(dc.dilations):
            ordered = _ordered_ring(d_st.layer_bufs, l, d, d_st.t)
            win = jnp.moveaxis(xs_all[:, l], 0, 1)      # [1, k+1, R]
            arrs_d.append(jnp.concatenate(
                [jnp.moveaxis(ordered, 0, 1), win], axis=1))
        d_st = _extend_commit(dc, d_st, (full_in_d, arrs_d), v)

        # 5. Emit m accepted + 1 corrected/bonus sample.
        padded = jnp.concatenate([cs0, c_prime])                # [k+1]
        emitted = jnp.where(jnp.arange(k + 1) < m, padded, c_prime[0])
        out = lax.dynamic_update_slice(out, emitted, (n_out,))
        return (out, n_out + v, t_st, d_st, c_prime, key,
                n_seg + 1, n_acc + m)

    def cond(carry):
        return carry[1] < n_samples

    out0 = jnp.zeros((n_cap,), jnp.int32)
    carry = (out0, jnp.int32(0), t_state, d_state, last, key,
             jnp.int32(0), jnp.int32(0))
    out, n_out, t_st, d_st, last, _, n_seg, n_acc = lax.while_loop(
        cond, segment, carry)
    stats = (n_seg, n_acc, n_out)
    # Full buffer (n_out valid entries, may overshoot n_samples by up to
    # k); generate_speculative slices the requested count.
    return out[None, :], t_st, d_st, last, stats


def generate_speculative(params: Params, config: WaveNetConfig,
                         draft_params: Params, draft_config: WaveNetConfig,
                         n_samples: int, key: jax.Array, k: int = 8,
                         temperature: float = 1.0,
                         gc_ids: Optional[jnp.ndarray] = None,
                         draft_gc_ids: Optional[jnp.ndarray] = None,
                         seed_codes: Optional[jnp.ndarray] = None,
                         batch_size: int = 1,
                         carry: Optional[SpeculativeCarry] = None,
                         return_carry: bool = False,
                         return_stats: bool = False):
    """Generate ``n_samples`` mu-law codes [1, n] with speculative
    sampling — the output distribution is exactly the TARGET model's.

    Local conditioning is not supported here (the draft/verify loops
    carry no per-step feature stream); lc-enabled configs must use
    ``sample.generate``.

    The draft can be any (smaller/cheaper) WaveNet with the same
    quantization_channels — but the SPEEDUP is its acceptance rate,
    which measures agreement with the target's free-running
    distribution, not training-data fit. Correctness never depends on
    the draft (output stays target-exact). Measured caveat from toy
    experiments: with near-deterministic (overfit) models, acceptance
    is chaotic — it hinges on whether the two models' free-running
    attractors coincide, and flips between ~2% and ~96% across draft
    configs/seeds. A lightly perturbed copy of the target is reliably
    high-acceptance (tested); for production drafts use distillation on
    target samples (wavenet_tpu/distill.py) at realistic entropy. Both
    models are primed on the same seed (or the reference's unseeded
    recipe) with the parallel prefill. ``return_stats`` adds
    (n_segments, n_draft_accepted, n_emitted): mean accepted length
    = n_draft_accepted / n_segments (+1 emitted per segment).

    The per-segment math runs per stream; ``batch_size > 1`` (implied by
    seed_codes' leading dim) vectorizes INDEPENDENT per-stream loops
    with ``jax.vmap`` — lanes accept/reject on their own schedules and
    each emits exactly what its solo run would (tested). Stats are
    summed over lanes.

    Resumable segments (batch 1 — acceptance makes emitted counts
    ragged across lanes): ``return_carry=True`` returns ALL emitted
    codes (which may overshoot n_samples by up to k — the state has
    consumed them) plus a ``SpeculativeCarry``; pass it back as
    ``carry`` to continue the stream (PRNG reseeds per segment call,
    same convention as the Pallas resumable sampler). This is what
    --save_every uses with --draft_checkpoint.
    """
    c, dc = config, draft_config
    if c.scalar_input or dc.scalar_input:
        raise NotImplementedError(
            "speculative decoding is mu-law-only (the autoregressive "
            "inputs are the emitted class codes)")
    if c.lc_enabled or dc.lc_enabled:
        raise NotImplementedError(
            "speculative decoding does not take a local-conditioning "
            "stream; use sample.generate for lc models")
    if dc.quantization_channels != c.quantization_channels:
        raise ValueError("draft and target must share "
                         "quantization_channels")

    key_first, key_gen = jax.random.split(key)
    if seed_codes is None:
        silence = jnp.full((batch_size, c.receptive_field - 1),
                           c.quantization_channels // 2, jnp.int32)
        first = jax.random.randint(key_first, (batch_size,), 0,
                                   c.quantization_channels)
        seed_codes = jnp.concatenate([silence, first[:, None]], axis=1)
    B = seed_codes.shape[0]

    gc_emb_t = embed_gc(params, c, gc_ids) if gc_ids is not None else None
    gc_emb_d = (embed_gc(draft_params, dc, draft_gc_ids)
                if draft_gc_ids is not None else None)

    def one(seed_row, key_row, gce_t, gce_d):
        t_state = prefill_state(params, c, seed_row[:, :-1], gce_t)
        d_state = prefill_state(draft_params, dc, seed_row[:, :-1], gce_d)
        last = seed_row[:, -1].astype(jnp.int32)
        return _speculative_loop(
            params, c, draft_params, dc, t_state, d_state, last, key_row,
            n_samples, k, temperature, gce_t, gce_d)

    if carry is not None or return_carry:
        if B != 1 or batch_size != 1:
            raise ValueError("resumable speculative decoding runs at "
                             "batch size 1 (acceptance makes emitted "
                             "counts ragged across lanes)")
    if carry is not None:
        codes, t_st, d_st, last, stats = _speculative_loop(
            params, c, draft_params, dc, carry.t_state, carry.d_state,
            carry.last, key_gen, n_samples, k, temperature,
            gc_emb_t, gc_emb_d)
    elif B == 1:
        codes, t_st, d_st, last, stats = one(seed_codes, key_gen,
                                             gc_emb_t, gc_emb_d)
    else:
        keys = jax.random.split(key_gen, B)
        lanes = seed_codes[:, None, :]                 # [B, 1, T]
        in_axes = (0, 0,
                   0 if gc_emb_t is not None else None,
                   0 if gc_emb_d is not None else None)
        gce_t = gc_emb_t[:, None] if gc_emb_t is not None else None
        gce_d = gc_emb_d[:, None] if gc_emb_d is not None else None
        codes, _, _, _, stats = jax.vmap(one, in_axes=in_axes)(
            lanes, keys, gce_t, gce_d)
        codes = codes[:, 0, :n_samples]                # [B, n]
        stats = tuple(jnp.sum(s) for s in stats)
        t_st = d_st = last = None

    if return_carry:
        n_out = int(jax.device_get(stats[2]))
        out = (codes[:, :n_out],
               SpeculativeCarry(t_state=t_st, d_state=d_st, last=last))
    else:
        out = codes[:, :n_samples]
    if return_stats:
        stats_t = tuple(int(s) for s in jax.device_get(stats))
        return (*out, stats_t) if return_carry else (out, stats_t)
    return out
