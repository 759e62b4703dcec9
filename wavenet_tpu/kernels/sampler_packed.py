"""Packed-ring streamed decode: G timesteps per 128-lane ring row.

Round-5 ablation (tools/r5_decode_latency.py, docs/performance.md round
5) attributed 40% of the streamed decode's per-step latency at b512 to
ring-row DMA — and showed it is DMA *count*, not bytes (a bf16 ring
moved nothing). The v1 kernel (sampler.py ``_sampler_kernel_hbm_stream``)
issues 2L row DMAs per step because each [B, 128-lane] row carries only
R (= 32 for the paper config) useful lanes. This variant removes most of
them:

* **Resident layers** (dilation <= 8): the whole d-row window lives in
  VMEM scratch for the entire launch — zero steady-state DMA. Loaded
  from / drained to the HBM ring only at the launch boundaries (resume
  semantics preserved).
* **Packed layers** (dilation >= 4G, divisible by G): the layer's ring
  rows are PERMUTED so that G consecutive timesteps form one contiguous
  [G, B, 128] row block. The time loop runs in quads of G steps; each
  quad issues ONE block read and ONE block write per packed layer
  instead of G row reads + G row writes — a G-fold cut in DMA count
  (the round-5 ablation showed count, not bytes, is what costs).
  Reads are double-buffered a full quad ahead; blocks flush once per
  quad (full quads write every row, so no merging is needed; a final
  partial quad flushes only its written rows at drain, leaving the
  rest of the block untouched in HBM for resume). An earlier revision
  packed the G steps into LANE groups of one row — 4x fewer bytes —
  but every sub-lane-offset write lowered to a relayout/merge that
  cost more than the DMAs saved (measured 2.8M vs 6.2M samples/s at
  b128); row blocks keep v1's byte volume and v1's cheap
  [B, 0:R]-lane access pattern.
* Other layers ("step" fallback, e.g. a dilation not divisible by G):
  the v1 per-step row protocol.

Layer math, sampling (in-kernel Gumbel-argmax over logits/T), the
forced/codes HBM IO streams, and the logits window are IDENTICAL to the
v1 kernel — same values in the same order per batch row, so the parity
oracles (conv forward) and determinism checks apply unchanged.

Layout bridging: packed layer l's v2 row ``G*k + g`` holds standard
position ``(G*k + g + t0%G) % d`` — the ``t0%G`` rebase makes the
in-block row index equal ``t % G`` (static per unrolled sub-step) for
any resume offset; the kernel's block index is ``(t0//G + q) % (d//G)``
(one block per quad). ``pack_ring_rows`` converts a standard
[sum_d, B, 128] ring (e.g. from ``prefill_carry``) into this layout
(identical when t0 % G == 0); resident/step layers keep their rows.

Unsupported here (callers fall back to v1): local conditioning, the
b=1 VPU chain, and configs whose R > 64 (G would be 1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wavenet_tpu.kernels.mxu import mxu_dot
from wavenet_tpu.models.config import WaveNetConfig

_VMEM_LIMIT = 100 * 1024 * 1024
_RESIDENT_MAX_D = 8


def pack_factor(config: WaveNetConfig) -> int:
    """G: timesteps per ring-row block (1 = packing not applicable).

    Row blocks are [G, B, 128] DMAs; G=4 keeps the block at 4x a v1
    row — small enough that block DMA time stays negligible next to a
    quad's compute at any supported batch.
    """
    return 4


def _plan(config: WaveNetConfig, G: int):
    """Static per-layer plan for the v2 ring layout.

    kinds[l] in {"r" (VMEM-resident), "p" (quad-packed), "s" (v1
    per-step)}; v2_off[l] = the layer's first row in the v2 HBM ring
    (d//G rows for packed layers, d rows otherwise); res_off maps
    resident layers into the VMEM window scratch; p_idx/s_idx number
    the packed/step layers' buffer slots.
    """
    kinds, v2_off, res_off, p_idx, s_idx = [], [], [], [], []
    rows = res = n_p = n_s = 0
    for d in config.dilations:
        v2_off.append(rows)
        if d <= _RESIDENT_MAX_D:
            kinds.append("r")
            res_off.append(res)
            res += d
            rows += d
            p_idx.append(-1)
            s_idx.append(-1)
        elif d % G == 0 and d >= 4 * G:
            kinds.append("p")
            res_off.append(-1)
            rows += d
            p_idx.append(n_p)
            n_p += 1
            s_idx.append(-1)
        else:
            kinds.append("s")
            res_off.append(-1)
            rows += d
            p_idx.append(-1)
            s_idx.append(n_s)
            n_s += 1
    return (tuple(kinds), tuple(v2_off), rows, tuple(res_off), res,
            tuple(p_idx), tuple(s_idx), n_p, n_s)


def pack_ring_rows(ring_std: jnp.ndarray, config: WaveNetConfig,
                   t0: int, state_dtype=jnp.float32) -> jnp.ndarray:
    """Standard [sum_d, B, 128] ring -> the v2 packed layout.

    Packed layer l's v2 row ``G*k + g`` holds standard position
    ``(G*k + g + t0 % G) % d`` (a pure row permutation — identity when
    t0 % G == 0). Resident/step layers copy through.
    """
    G = pack_factor(config)
    kinds, _, rows_total, *_ = _plan(config, G)
    r = t0 % G
    parts = []
    off = 0
    for l, d in enumerate(config.dilations):
        rows = ring_std[off:off + d]
        off += d
        if kinds[l] != "p" or r == 0:
            parts.append(rows.astype(state_dtype))
            continue
        perm = (np.arange(d) + r) % d
        parts.append(rows[perm].astype(state_dtype))
    packed = jnp.concatenate(parts, axis=0)
    assert packed.shape[0] == rows_total
    return packed


def _decode_kernel_packed(
    # scalar prefetch: [seed, t0, t0 // G]
    seed_ref,
    # inputs (same protocol as the v1 streamed kernel)
    causal_w_ref, layer_w_ref, layer_add_ref,
    dense_w_ref, dense_add_ref, skip_w_ref, skip_b_ref,
    post1_w_ref, post1_b_ref, post2_w_ref, post2_b_ref,
    forced_hbm,          # [T_pad, lanes(B)] — ANY (HBM)
    ring_in_ref,         # [rows_v2, B, 128] — ANY (HBM), aliased to out
    causal_in_ref,       # [B, (kw-1)*C_in] f32
    # outputs
    codes_hbm,           # [T_pad, lanes(B)] int32 — ANY (HBM)
    logits_ref,          # [1, n_log, B, Q] VMEM
    ring_ref,            # [rows_v2, B, 128] — ANY (HBM)
    causal_out_ref,      # [B, (kw-1)*C_in] f32
    # scratch
    causal_buf_ref,
    res_ref,             # [res_rows, B, 128] — resident windows
    rbuf_ref,            # [n_p*2*G, B, 128] — packed read blocks
    wbuf_ref,            # [n_p*2*G, B, 128] — packed write blocks
    sbuf_r_ref, sbuf_w_ref,   # [n_s, B, 128] — step-layer slots
    zbuf_ref, fbuf_ref, cbuf_ref,
    rsem, wsem, ssem_r, ssem_w, resem, zsem, fsem, csem,
    *,
    config: WaveNetConfig, G: int, n_total: int, n_forced: int,
    batch_size: int, inv_temperature: float, io_chunk: int, resume: bool,
    interleave: int = 1,
):
    c = config
    L, R, D, S, Q = (c.num_layers, c.residual_channels, c.dilation_channels,
                     c.skip_channels, c.quantization_channels)
    B = batch_size
    C_in = c.input_channels
    C = io_chunk
    n_chunks = -(-n_total // C)
    (kinds, v2_off, rows_total, res_off, res_rows, p_idx, s_idx,
     n_p, n_s) = _plan(c, G)
    full_quads = n_total // G
    tail = n_total % G
    n_quads = full_quads + (1 if tail else 0)

    pltpu.prng_seed(seed_ref[0])
    t0 = seed_ref[1]
    t0_div_G = seed_ref[2]

    wbuf_ref[...] = jnp.zeros_like(wbuf_ref)
    if n_s:
        sbuf_w_ref[...] = jnp.zeros_like(sbuf_w_ref)
    cbuf_ref[...] = jnp.zeros_like(cbuf_ref)

    if resume:
        causal_buf_ref[...] = causal_in_ref[...]
        # Resident windows: one DMA per resident layer from the ring.
        for l in range(L):
            if kinds[l] == "r":
                d = c.dilations[l]
                cp = pltpu.make_async_copy(
                    ring_in_ref.at[v2_off[l]:v2_off[l] + d],
                    res_ref.at[res_off[l]:res_off[l] + d], resem)
                cp.start()
                cp.wait()
    else:
        causal_buf_ref[...] = jnp.zeros_like(causal_buf_ref)
        res_ref[...] = jnp.zeros_like(res_ref)
        # Zero the HBM ring in chunks (reads of never-written rows must
        # see the causal zero padding).
        zbuf_ref[...] = jnp.zeros_like(zbuf_ref)
        ZC = zbuf_ref.shape[0]
        n_full = rows_total // ZC
        for ci in range(n_full):
            cp = pltpu.make_async_copy(
                zbuf_ref, ring_ref.at[ci * ZC:(ci + 1) * ZC], zsem)
            cp.start()
            cp.wait()
        rem_rows = rows_total - n_full * ZC
        if rem_rows:
            cp = pltpu.make_async_copy(
                zbuf_ref.at[0:rem_rows],
                ring_ref.at[n_full * ZC:rows_total], zsem)
            cp.start()
            cp.wait()

    # ---- IO-stream DMA helpers (identical to the v1 kernel) ----
    def f_dma(ci):
        return pltpu.make_async_copy(
            forced_hbm.at[pl.ds(ci * C, C)], fbuf_ref.at[lax.rem(ci, 2)],
            fsem.at[lax.rem(ci, 2)])

    def c_dma(ci):
        return pltpu.make_async_copy(
            cbuf_ref.at[lax.rem(ci, 2)], codes_hbm.at[pl.ds(ci * C, C)],
            csem.at[lax.rem(ci, 2)])

    # ---- ring DMA helpers ----
    def p_row(l, q):
        """First HBM row of packed layer l's quad-q block."""
        d = c.dilations[l]
        return v2_off[l] + G * lax.rem(t0_div_G + q, d // G)

    def p_slot(l, q):
        # rbuf/wbuf are [(n_p*2)*G, B, 128]: flat (layer, quad-parity)
        # BLOCKS of G rows, so every access is a single (possibly
        # traced) leading index or a pl.ds over it.
        return (p_idx[l] * 2 + lax.rem(q, 2)) * G

    def p_read(l, q):
        return pltpu.make_async_copy(
            ring_ref.at[pl.ds(p_row(l, q), G)],
            rbuf_ref.at[pl.ds(p_slot(l, q), G)], rsem.at[p_idx[l]])

    def p_flush(l, q):
        return pltpu.make_async_copy(
            wbuf_ref.at[pl.ds(p_slot(l, q), G)],
            ring_ref.at[pl.ds(p_row(l, q), G)], wsem.at[p_idx[l]])

    def p_flush_row(l, q, j):
        """Single-row flush for the final partial quad's written rows."""
        return pltpu.make_async_copy(
            wbuf_ref.at[p_slot(l, q) + j], ring_ref.at[p_row(l, q) + j],
            wsem.at[p_idx[l]])

    def s_pos(l, t):
        return v2_off[l] + lax.rem(t0 + t, c.dilations[l])

    def s_read(l, t):
        return pltpu.make_async_copy(
            ring_ref.at[s_pos(l, t)], sbuf_r_ref.at[s_idx[l]],
            ssem_r.at[s_idx[l]])

    def s_write(l, t):
        return pltpu.make_async_copy(
            sbuf_w_ref.at[s_idx[l]], ring_ref.at[s_pos(l, t)],
            ssem_w.at[s_idx[l]])

    def featurize(x_col):
        if c.scalar_input:
            return x_col
        iota = lax.broadcasted_iota(jnp.int32, (B, C_in), 1)
        return (iota.astype(jnp.float32) == x_col).astype(jnp.float32)

    mu = float(Q - 1)

    def decode_amp(code_f):
        sgn = 2.0 * (code_f / mu) - 1.0
        mag = (1.0 / mu) * (jnp.exp(jnp.abs(sgn) * float(np.log1p(mu)))
                            - 1.0)
        return jnp.sign(sgn) * mag

    def mu_law_encode_f(amp):
        safe = jnp.minimum(jnp.abs(amp), 1.0)
        magnitude = jnp.log1p(mu * safe) * float(1.0 / np.log1p(mu))
        signal = jnp.sign(amp) * magnitude
        return ((signal + 1.0) / 2.0 * mu + 0.5).astype(jnp.int32)

    def sample_from(logits):
        bits = pltpu.prng_random_bits((B, Q))
        u = pltpu.bitcast(
            (pltpu.bitcast(bits, jnp.uint32) >> 9) | 0x3F800000,
            jnp.float32) - 1.0
        u = jnp.maximum(u, 1e-20)
        gumbel = -jnp.log(-jnp.log(u))
        scores = logits * inv_temperature + gumbel
        return jnp.argmax(scores, axis=-1, keepdims=True).astype(jnp.int32)

    def get_forced(tt):
        row = fbuf_ref[lax.rem(tt // C, 2), pl.ds(lax.rem(tt, C), 1), 0:B]
        return jnp.transpose(row)

    def step(t, q, g, x_col):
        """One decode step; g = (t0 + t) % G is STATIC (quad-unrolled,
        alignment baked into the ring layout by pack_ring_rows)."""
        # Step-fallback layers: balance writes, prefetch reads (v1).
        if n_s:
            @pl.when(t > 0)
            def _():
                for l in range(L):
                    if kinds[l] == "s":
                        s_write(l, t - 1).wait()
                        s_read(l, t).start()

        x = featurize(x_col)
        prev = causal_buf_ref[...]
        window = jnp.concatenate([prev, x], axis=-1)
        current = mxu_dot(window.astype(causal_w_ref.dtype),
                          causal_w_ref[...])
        causal_buf_ref[...] = window[:, C_in:]

        # Sub-batch interleave (round 5): split the batch into IL
        # independent row chains and alternate their instruction issue
        # inside the layer loop, so one chain's VPU gating can overlap
        # another's MXU matmuls in Mosaic's in-order stream. Matmul rows
        # are independent and the split is at a 128-row boundary, so the
        # emitted values are bitwise identical to IL=1.
        IL = interleave
        H = B // IL
        halves = [slice(h * H, (h + 1) * H) for h in range(IL)]
        cur = [current[hs] for hs in halves] if IL > 1 else [current]
        skip_sum = [jnp.zeros((H, S), jnp.float32) for _ in range(IL)]
        for i in range(L):
            kind = kinds[i]
            past = [None] * IL
            if kind == "r":
                pos = res_off[i] + lax.rem(t0 + t, c.dilations[i])
                for h, hs in enumerate(halves):
                    past[h] = res_ref[pos, hs, 0:R].astype(jnp.float32)
                for h, hs in enumerate(halves):
                    res_ref[pos, hs, 0:R] = cur[h].astype(res_ref.dtype)
            elif kind == "p":
                idx = p_slot(i, q) + g
                for h, hs in enumerate(halves):
                    past[h] = rbuf_ref[idx, hs, 0:R].astype(jnp.float32)
                for h, hs in enumerate(halves):
                    wbuf_ref[idx, hs, 0:R] = cur[h].astype(wbuf_ref.dtype)
            else:
                s_read(i, t).wait()
                for h, hs in enumerate(halves):
                    past[h] = sbuf_r_ref[s_idx[i], hs, 0:R].astype(
                        jnp.float32)
                for h, hs in enumerate(halves):
                    sbuf_w_ref[s_idx[i], hs, 0:R] = cur[h].astype(
                        sbuf_w_ref.dtype)
                s_write(i, t).start()
            fg = [None] * IL
            for h, hs in enumerate(halves):
                x_cat = jnp.concatenate([past[h], cur[h]], axis=-1)
                fg[h] = (mxu_dot(x_cat.astype(layer_w_ref.dtype),
                                 layer_w_ref[i])
                         + (layer_add_ref[0, i, hs] if IL > 1
                            else layer_add_ref[0, i]))
            out = [None] * IL
            for h in range(IL):
                tg = jnp.tanh(fg[h])  # gate half pre-scaled 0.5 at pack
                out[h] = tg[:, :D] * (0.5 + 0.5 * tg[:, D:])
            for h, hs in enumerate(halves):
                dproj = mxu_dot(out[h].astype(dense_w_ref.dtype),
                                dense_w_ref[i])
                cur[h] = cur[h] + dproj + dense_add_ref[i]  # [1,R] bcast
                skip_sum[h] = skip_sum[h] + mxu_dot(
                    out[h].astype(skip_w_ref.dtype), skip_w_ref[i])
        skip_all = (jnp.concatenate(skip_sum, axis=0) if IL > 1
                    else skip_sum[0])

        h = jnp.maximum(skip_all + skip_b_ref[...], 0.0)
        h = mxu_dot(h.astype(post1_w_ref.dtype),
                    post1_w_ref[...]) + post1_b_ref[...]
        h = jnp.maximum(h, 0.0)
        h = mxu_dot(h.astype(post2_w_ref.dtype),
                    post2_w_ref[...]) + post2_b_ref[...]
        return h

    def body_step(t, q, g, x_col):
        """Per-step logic incl. the IO streams and sampling (v1 body)."""
        ct = t // C

        @pl.when(jnp.logical_and(lax.rem(t, C) == C - 1,
                                 ct + 1 < n_chunks))
        def _():
            f_dma(ct + 1).wait()

            @pl.when(ct + 2 < n_chunks)
            def _():
                f_dma(ct + 2).start()

        @pl.when(jnp.logical_and(lax.rem(t, C) == 0, ct >= 2))
        def _():
            c_dma(ct - 2).wait()

        logits = step(t, q, g, x_col)
        logits_ref[0, lax.rem(t, logits_ref.shape[1])] = logits
        sampled = sample_from(logits)
        nxt = jnp.minimum(t + 1, n_total - 1)
        forced_next = get_forced(nxt)
        take_forced = t + 1 < n_forced
        emitted = jnp.where(
            t < n_forced - 1,
            (mu_law_encode_f(forced_next) if c.scalar_input
             else forced_next.astype(jnp.int32)),
            sampled)
        cbuf_ref[lax.rem(ct, 2), pl.ds(lax.rem(t, C), 1), 0:B] = (
            jnp.transpose(emitted))

        @pl.when(jnp.logical_or(lax.rem(t, C) == C - 1, t == n_total - 1))
        def _():
            c_dma(ct).start()

        if c.scalar_input:
            return jnp.where(take_forced, forced_next,
                             decode_amp(sampled.astype(jnp.float32)))
        return jnp.where(take_forced, forced_next,
                         sampled.astype(jnp.float32))

    def run_quad(q, x_col, steps):
        """One quad: ring-row prologue, ``steps`` unrolled sub-steps,
        flush epilogue (full quads only). ``steps`` is static."""
        for l in range(L):
            if kinds[l] != "p":
                continue

            # The wbuf slot's previous flush went out 2 quads ago; the
            # read for THIS quad was issued one quad ago (pre-loop for
            # q=0). Waiting both here keeps every DMA >= G steps ahead
            # of its wait. Issuing quad q+1's read now is safe: by
            # count, the only possibly-in-flight flush is last quad's,
            # which targets a different row (d >= 4G apart).
            @pl.when(q >= 2)
            def _(l=l):
                p_flush(l, q - 2).wait()
            p_read(l, q).wait()
            p_read(l, q + 1).start()

        for g in range(steps):
            x_col = body_step(q * G + g, q, g, x_col)

        if steps == G:
            for l in range(L):
                if kinds[l] == "p":
                    p_flush(l, q).start()
        return x_col

    # Prime the streams and the quad-0 / step-layer reads.
    f_dma(0).start()
    f_dma(0).wait()
    if n_chunks > 1:
        f_dma(1).start()
    for l in range(L):
        if kinds[l] == "p":
            p_read(l, 0).start()
        elif kinds[l] == "s":
            s_read(l, 0).start()

    first = get_forced(0).astype(jnp.float32)
    x_col = lax.fori_loop(0, full_quads,
                          lambda q, x: run_quad(q, x, G), first,
                          unroll=False)
    if tail:
        run_quad(jnp.asarray(full_quads, jnp.int32), x_col, tail)
    causal_out_ref[...] = causal_buf_ref[...]

    # ---- drain ----
    # Per packed layer: one read outstanding (quad n_quads, never
    # consumed); flushes outstanding = full_quads - in-loop waits
    # (which ran at quads 2..n_quads-1); plus the final partial row.
    out_flushes = full_quads - max(0, n_quads - 2)
    for l in range(L):
        if kinds[l] != "p":
            continue
        p_read(l, jnp.asarray(n_quads, jnp.int32)).wait()
        for _ in range(out_flushes):
            p_flush(l, 0).wait()   # semaphore wait; block sizes match
        if tail:
            # Flush only the rows the partial quad wrote; the rest of
            # the block keeps its HBM values (resume-safe, no merge).
            qq = jnp.asarray(full_quads, jnp.int32)
            for j in range(tail):
                p_flush_row(l, qq, j).start()
            for j in range(tail):
                p_flush_row(l, qq, j).wait()
    # Resident windows back to the ring (resume semantics).
    for l in range(L):
        if kinds[l] == "r":
            d = c.dilations[l]
            cp = pltpu.make_async_copy(
                res_ref.at[res_off[l]:res_off[l] + d],
                ring_ref.at[v2_off[l]:v2_off[l] + d], resem)
            cp.start()
            cp.wait()
    if n_s:
        for l in range(L):
            if kinds[l] == "s":
                s_write(l, n_total - 1).wait()
    if n_chunks >= 2:
        c_dma(n_chunks - 2).wait()
    c_dma(n_chunks - 1).wait()


@functools.partial(
    jax.jit,
    static_argnames=("config", "n_total", "n_forced", "batch_size",
                     "temperature", "collect_logits", "resume",
                     "interleave"),
    donate_argnames=("ring_in",))
def run_packed_decode(packed, forced_lanes: jnp.ndarray,
                      seed: jnp.ndarray, ring_in: jnp.ndarray,
                      causal_in: jnp.ndarray, config: WaveNetConfig,
                      n_total: int, n_forced: int, batch_size: int,
                      temperature: float, collect_logits,
                      resume: bool = False, interleave: int = 1):
    """Launch the packed-ring decode.

    ``ring_in`` must be in the v2 layout (``pack_ring_rows``) and is
    donated/aliased onto the ring output; ``seed`` is
    [prng_seed, t0, t0 // G] int32 — t0 % G is baked into the layout by
    ``pack_ring_rows``, so lane groups align with t % G in-kernel.

    ``interleave`` splits the batch into that many independent row
    chains alternated inside the layer loop. Bitwise-identical values at
    ANY row split (row tiling never changes a matmul row's K-reduction
    order); sublane alignment (8 rows per chain) keeps the slices cheap,
    and the perf intent is full lane tiles per chain (B >= 128 * IL).
    """
    if interleave > 1 and batch_size % (8 * interleave):
        raise ValueError("interleave needs B % (8*interleave) == 0, "
                         f"got B={batch_size}, interleave={interleave}")
    from wavenet_tpu.kernels.sampler import _io_chunk_for, _lanes

    c = config
    B, Q = batch_size, c.quantization_channels
    G = pack_factor(c)
    if G < 2:
        raise NotImplementedError("packed ring needs residual_channels "
                                  "<= 64")
    kw_in = (c.initial_filter_width if c.scalar_input else c.filter_width)
    BP = _lanes(B)
    C = _io_chunk_for(B)
    T_pad = forced_lanes.shape[0]
    assert T_pad % C == 0 and T_pad >= n_total
    fdtype = forced_lanes.dtype
    ring_dtype = ring_in.dtype
    (kinds, v2_off, rows_total, res_off, res_rows, p_idx, s_idx,
     n_p, n_s) = _plan(c, G)
    assert ring_in.shape[0] == rows_total, (ring_in.shape, rows_total)

    kernel = functools.partial(
        _decode_kernel_packed, config=c, G=G, n_total=n_total,
        n_forced=n_forced, batch_size=B,
        inv_temperature=1.0 / temperature, io_chunk=C, resume=resume,
        interleave=interleave)
    n_log = (n_total if collect_logits is True
             else int(collect_logits) if collect_logits else 1)
    zc = min(64, rows_total, max(8, (1 << 21) // (max(B, 1) * 128 * 4)))

    in_specs = ([pl.BlockSpec(memory_space=pltpu.VMEM)] * 11
                + [pl.BlockSpec(memory_space=pl.ANY),       # forced
                   pl.BlockSpec(memory_space=pl.ANY),       # ring_in
                   pl.BlockSpec(memory_space=pltpu.VMEM)])  # causal_in
    operands = [seed, packed.causal_w, packed.layer_w,
                packed.layer_add[None],
                packed.dense_w, packed.dense_add, packed.skip_w,
                packed.skip_b, packed.post1_w, packed.post1_b,
                packed.post2_w, packed.post2_b, forced_lanes, ring_in,
                causal_in]
    scratch = [
        pltpu.VMEM((B, (kw_in - 1) * c.input_channels), jnp.float32),
        pltpu.VMEM((max(res_rows, 1), B, 128), ring_dtype),   # res
        pltpu.VMEM((max(n_p, 1) * 2 * G, B, 128), ring_dtype),  # rbuf
        pltpu.VMEM((max(n_p, 1) * 2 * G, B, 128), ring_dtype),  # wbuf
        pltpu.VMEM((max(n_s, 1), B, 128), ring_dtype),        # sbuf_r
        pltpu.VMEM((max(n_s, 1), B, 128), ring_dtype),        # sbuf_w
        pltpu.VMEM((zc, B, 128), ring_dtype),                 # zbuf
        pltpu.VMEM((2, C, BP), fdtype),                       # forced
        pltpu.VMEM((2, C, BP), jnp.int32),                    # codes
    ]
    sems = [
        pltpu.SemaphoreType.DMA((max(n_p, 1),)),   # rsem
        pltpu.SemaphoreType.DMA((max(n_p, 1),)),   # wsem
        pltpu.SemaphoreType.DMA((max(n_s, 1),)),   # ssem_r
        pltpu.SemaphoreType.DMA((max(n_s, 1),)),   # ssem_w
        pltpu.SemaphoreType.DMA(()),               # resem
        pltpu.SemaphoreType.DMA(()),               # zsem
        pltpu.SemaphoreType.DMA((2,)),             # fsem
        pltpu.SemaphoreType.DMA((2,)),             # csem
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),         # codes (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),     # logits window
            pl.BlockSpec(memory_space=pl.ANY),         # ring (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),     # causal_out
        ),
        scratch_shapes=scratch + sems,
    )
    codes, logits, ring, causal_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((T_pad, BP), jnp.int32),
            jax.ShapeDtypeStruct((1, n_log, B, Q), jnp.float32),
            jax.ShapeDtypeStruct((rows_total, B, 128), ring_dtype),
            jax.ShapeDtypeStruct((B, (kw_in - 1) * c.input_channels),
                                 jnp.float32),
        ),
        input_output_aliases={13: 2},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT),
    )(*operands)
    return (jnp.transpose(codes[:n_total, 0:B]), logits[0], ring,
            causal_out)
