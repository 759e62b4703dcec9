"""Round-5 sub-batch interleave A/B on the packed-ring decode.

After the packed-ring kernel removed ~40% of the b512 step (ring DMA
count), the residual ~28 us/step is mostly the per-layer serial chain
(the no-DMA ablation floor was 23.3 us — docs/performance.md round 5).
The hypothesized next lever: split the batch into IL independent row
chains and ALTERNATE their instruction issue inside the layer loop, so
chain A's VPU gating (tanh/mul) can run under chain B's MXU matmuls in
Mosaic's in-order stream. Values are bitwise identical (matmul rows are
independent; the split is at a 128-row boundary).

This tool launches ``run_packed_decode`` directly (free-running,
n_forced=1 — the true autoregressive chain) with interleave in
{1, 2, 4}, asserts bitwise-equal codes, and prints per-step latency.

Usage: python tools/r5_interleave_ab.py [B ...]   (default 512)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wavenet_tpu.models.config import paper_config
from wavenet_tpu.models.wavenet import init_params
from wavenet_tpu.kernels.sampler import (
    _io_chunk_for, _lanes, _stream_zero_state, pack_sampler_weights)
from wavenet_tpu.kernels.sampler_packed import (
    pack_factor, pack_ring_rows, run_packed_decode)


def launch(packed, cfg, n_total, B, interleave, seed=0):
    ring_std, causal = _stream_zero_state(cfg, B)
    ring_v2 = pack_ring_rows(ring_std, cfg, 0)
    C = _io_chunk_for(B)
    T_pad = -(-n_total // C) * C
    forced = jnp.zeros((T_pad, _lanes(B)), jnp.int32)
    seed3 = jnp.asarray([seed, 0, 0], jnp.int32)
    t0 = time.perf_counter()
    codes, _, _, _ = run_packed_decode(
        packed, forced, seed3, ring_v2, causal, cfg, n_total, 1, B,
        1.0, False, resume=False, interleave=interleave)
    tail = np.asarray(jax.device_get(codes[:, -1]))  # device-rate sync
    return time.perf_counter() - t0, codes, tail


def main():
    batches = [int(x) for x in sys.argv[1:]] or [512]
    cfg = paper_config()
    params = init_params(jax.random.PRNGKey(0), cfg)
    G = pack_factor(cfg)
    assert G >= 2
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)

    n_total = 8192
    for B in batches:
        packed = pack_sampler_weights(params, cfg, B,
                                      weight_dtype=jnp.bfloat16)
        base_codes = None
        for il in (1, 2, 4):
            if B % (128 * il):
                continue
            us = []
            codes = None
            for trial in range(14):
                try:
                    dt, codes, _ = launch(packed, cfg, n_total, B, il)
                except Exception as e:  # noqa: BLE001 — report and keep
                    print(json.dumps({"B": B, "interleave": il,
                                      "error": repr(e)[:300]}), flush=True)
                    codes = None
                    break
                if trial:
                    us.append(1e6 * dt / n_total)
            if codes is None:
                continue
            full = np.asarray(jax.device_get(codes))
            if il == 1:
                base_codes = full
                bitwise = None
            else:
                bitwise = bool((full == base_codes).all())
            print(json.dumps({
                "B": B, "interleave": il,
                "us_per_step": [round(u, 1) for u in us],
                "samples_per_s_med": round(
                    B / (np.median(us) * 1e-6)) if us else None,
                "bitwise_vs_il1": bitwise}), flush=True)


if __name__ == "__main__":
    main()
