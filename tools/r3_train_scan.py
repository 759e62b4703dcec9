"""Round-3 training experiment: lax.scan over layers vs unrolled stack.

The round-2 step profile attributed ~3.7 ms of the 14.9 ms train step to
op-gap/issue overhead (~1200 ops x ~3 us). Scanning over the stacked
layer params collapses the stack to one rolled body (~30x fewer ops) at
the cost of whatever cross-layer pipelining XLA finds in the unrolled
program. Dilations differ per layer and must stay runtime values under
scan, so the causal shift is a dynamic_slice of a max_dilation-left-
padded input instead of a static pad+slice.

Forward parity is asserted against the production forward before
timing. Run alone — one TPU process at a time.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from wavenet_tpu.models.config import paper_config
from wavenet_tpu.models.wavenet import forward_codes, init_params

B, SAMPLE = 8, 16000


def scan_stack_logits(params, config, codes):
    """forward_codes with the dilated stack rolled into one lax.scan."""
    c = config
    L, D, S = c.num_layers, c.dilation_channels, c.skip_channels
    compute_dtype = (jnp.bfloat16 if c.compute_dtype == "bfloat16"
                     else jnp.float32)
    precision = (lax.Precision.DEFAULT if c.compute_dtype == "bfloat16"
                 else lax.Precision.HIGHEST)
    max_d = max(c.dilations)

    # Initial causal layer: same row-gather as forward_codes.
    w = params["causal_filter"]
    fw = w.shape[0]
    T = codes.shape[1]
    current = jnp.take(w[fw - 1], codes, axis=0)
    for k in range(fw - 1):
        shift = fw - 1 - k
        tap = jnp.take(w[k], codes[:, :T - shift], axis=0)
        current = current.at[:, shift:, :].add(tap)
    current = current.astype(compute_dtype)

    dil = jnp.asarray(c.dilations, jnp.int32)
    xs = {
        "filter": params["filter"].astype(compute_dtype),
        "gate": params["gate"].astype(compute_dtype),
        "dense": params["dense"].astype(compute_dtype),
        "filter_bias": params["filter_bias"].astype(compute_dtype),
        "gate_bias": params["gate_bias"].astype(compute_dtype),
        "dense_bias": params["dense_bias"].astype(compute_dtype),
        "d": dil,
    }

    def body(cur, lp):
        d = lp["d"]
        padded = jnp.pad(cur, ((0, 0), (max_d, 0), (0, 0)))
        past = lax.dynamic_slice(
            padded, (0, max_d - d, 0), cur.shape)
        conv_f = (jnp.einsum("btr,rd->btd", past, lp["filter"][0],
                             precision=precision)
                  + jnp.einsum("btr,rd->btd", cur, lp["filter"][1],
                               precision=precision) + lp["filter_bias"])
        conv_g = (jnp.einsum("btr,rd->btd", past, lp["gate"][0],
                             precision=precision)
                  + jnp.einsum("btr,rd->btd", cur, lp["gate"][1],
                               precision=precision) + lp["gate_bias"])
        out = jnp.tanh(conv_f) * jax.nn.sigmoid(conv_g)
        cur = cur + jnp.einsum("btd,dr->btr", out, lp["dense"],
                               precision=precision) + lp["dense_bias"]
        return cur, out

    _, outs = lax.scan(body, current, xs)          # outs [L, B, T, D]
    all_outs = jnp.moveaxis(outs, 0, 2).reshape(   # [B, T, L*D]
        codes.shape[0], T, L * D)
    rf = c.receptive_field
    all_outs = all_outs[:, rf - 1:]
    w_skip = params["skip"].reshape(L * D, S).astype(compute_dtype)
    h = jnp.einsum("btc,co->bto", all_outs, w_skip, precision=precision)
    h = h + jnp.sum(params["skip_bias"], axis=0).astype(compute_dtype)
    h = jax.nn.relu(h)
    h = jnp.einsum("bts,so->bto", h,
                   params["postprocess1"].astype(compute_dtype),
                   precision=precision)
    h = h + params["postprocess1_bias"].astype(compute_dtype)
    h = jax.nn.relu(h)
    h = jnp.einsum("bts,so->bto", h,
                   params["postprocess2"].astype(compute_dtype),
                   precision=precision)
    h = h + params["postprocess2_bias"].astype(compute_dtype)
    return h.astype(jnp.float32)


def timed(fn, reps=3, calls=5):
    np.asarray(jax.device_get(fn()))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(calls):
            out = fn()
        _ = np.asarray(jax.device_get(out)).sum()
        ts.append((time.perf_counter() - t0) / calls)
    return float(np.median(ts))


def main():
    import optax

    config = paper_config(compute_dtype="bfloat16")
    params = init_params(jax.random.PRNGKey(0), config)
    rngc = np.random.RandomState(0)
    T = config.receptive_field + SAMPLE
    codes = jnp.asarray(rngc.randint(0, 256, (B, T)), jnp.int32)

    # Parity check on a small config (jitted; the transform is
    # config-size-independent).
    import dataclasses
    pcfg = dataclasses.replace(paper_config(compute_dtype="bfloat16"),
                               dilations=(1, 2, 4, 8, 1, 2, 4, 8))
    pparams = init_params(jax.random.PRNGKey(1), pcfg)
    small = jnp.asarray(rngc.randint(0, 256, (2, pcfg.receptive_field + 64)),
                        jnp.int32)
    ref = jax.jit(lambda p, x: forward_codes(
        p, pcfg, x, head_from=pcfg.receptive_field - 1))(pparams, small)
    got = jax.jit(lambda p, x: scan_stack_logits(p, pcfg, x))(pparams, small)
    err = float(jnp.max(jnp.abs(ref - got)))
    print("parity max|err| (bf16):", err)
    assert err < 0.15, err
    if "--parity-only" in sys.argv:
        return

    rf1 = config.receptive_field

    def loss_unrolled(p):
        logits = forward_codes(p, config, codes, head_from=rf1 - 1)
        tgt = codes[:, rf1:]
        lp = jax.nn.log_softmax(logits[:, :-1])
        oh = jax.nn.one_hot(tgt, 256, dtype=lp.dtype)
        return -jnp.mean(jnp.sum(lp * oh, -1))

    def loss_scan(p):
        logits = scan_stack_logits(p, config, codes)
        tgt = codes[:, rf1:]
        lp = jax.nn.log_softmax(logits[:, :-1])
        oh = jax.nn.one_hot(tgt, 256, dtype=lp.dtype)
        return -jnp.mean(jnp.sum(lp * oh, -1))

    opt = optax.adam(1e-3, eps=1e-4)
    st = opt.init(params)

    for tag, lf in [("unrolled", loss_unrolled), ("scan", loss_scan)]:
        @jax.jit
        def step(p, s, lf=lf):
            l, g = jax.value_and_grad(lf)(p)
            up, s = opt.update(g, s)
            return optax.apply_updates(p, up), s, l

        def run(p=dict(params), s=st, step=step):
            out = step(p, s)
            return out[2]

        # fresh copies per call to avoid donation issues (none donated)
        dt = timed(run)
        print(f"{tag:9s} {dt*1e3:7.2f} ms/step  "
              f"{B*SAMPLE/16000/dt:7.1f} audio-s/s")


if __name__ == "__main__":
    main()
