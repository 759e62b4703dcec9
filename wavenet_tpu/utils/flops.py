"""Analytic FLOPs / MFU accounting for the benchmark scoreboard.

The BASELINE north star asks for "speed-of-light roofline per chip";
round 2 argued MFU numbers in prose only. This module makes the claim
auditable: a deterministic FLOPs model of the network (counting the
math the production path actually executes — embedding GATHERS count as
zero, folded GC additives count as zero), peak constants for the chips
we run on, and helpers bench.py uses to emit ``mfu_*`` fields next to
every throughput number.

Conventions (standard MFU accounting):
  * 1 MAC = 2 FLOPs.
  * backward pass = 2x forward FLOPs (dL/dx + dL/dw), so a train step
    is 3x the forward cost.
  * MFU is reported against the chip's bf16 matmul peak regardless of
    the run's compute dtype — fp32 runs pay multi-pass MXU cost and
    their lower MFU is real, not an accounting artifact.

The model is cross-checked against XLA's own compiled cost analysis in
tests/test_flops.py (CPU): the analytic count must sit within a modest
band of the compiler's count for the real train step.
"""

from __future__ import annotations

from typing import Optional

from wavenet_tpu.models.config import WaveNetConfig

# Published bf16 matmul peak per chip and HBM bandwidth. v5-lite (v5e):
# 197 TFLOP/s bf16, 819 GB/s HBM. Keys are matched as prefixes of
# jax.Device.device_kind.
PEAK_BF16_FLOPS = {
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}
HBM_BYTES_PER_S = {
    "TPU v5 lite": 819e9,
    "TPU v5e": 819e9,
    "TPU v4": 1228e9,
    "TPU v6 lite": 1640e9,
    "TPU v6e": 1640e9,
}


def stack_macs_per_position(config: WaveNetConfig) -> int:
    """MACs per (batch element, time position) of causal layer + dilated
    stack: the part computed at EVERY position of the padded window."""
    c = config
    L, R, D, S = (c.num_layers, c.residual_channels, c.dilation_channels,
                  c.skip_channels)
    if c.scalar_input:
        causal = c.initial_filter_width * 1 * R
    else:
        # Production path embeds integer codes by gather (+ tap add):
        # ~zero MACs. Count the adds' R lanes once per tap.
        causal = c.filter_width * R
    layer = (c.filter_width * R * (2 * D)  # fused filter+gate convs
             + D * R                        # 1x1 dense
             + D * S)                       # 1x1 skip
    if c.lc_enabled:
        layer += c.lc_channels * (2 * D)    # per-timestep LC projection
    return causal + L * layer


def head_macs_per_position(config: WaveNetConfig) -> int:
    """MACs per position of the post-stack head (relu-1x1-relu-1x1).

    Training computes the head only for loss-kept positions
    (``head_from`` trims the first receptive_field-1)."""
    c = config
    return c.skip_channels * c.skip_channels + \
        c.skip_channels * c.quantization_channels


def forward_flops_per_position(config: WaveNetConfig) -> float:
    return 2.0 * (stack_macs_per_position(config)
                  + head_macs_per_position(config))


def train_step_flops(config: WaveNetConfig, batch_size: int,
                     sample_size: int) -> float:
    """Model FLOPs of one train step (fwd + 2x bwd) at the CLI's shapes:
    stack over the full rf+sample_size window, head over loss positions."""
    c = config
    T = c.receptive_field + sample_size
    stack = 2.0 * stack_macs_per_position(c) * batch_size * T
    head = 2.0 * head_macs_per_position(c) * batch_size * sample_size
    return 3.0 * (stack + head)


def gen_flops_per_sample(config: WaveNetConfig) -> float:
    """Model FLOPs to emit one sample for one stream (decode step)."""
    return forward_flops_per_position(config)


def weight_bytes(config: WaveNetConfig, bytes_per_el: int = 4) -> int:
    """Bytes of matmul weights the sampler kernel reads EVERY decode
    step (the b=1 bandwidth roofline: step latency >= this / VMEM BW)."""
    c = config
    L, R, D, S, Q = (c.num_layers, c.residual_channels, c.dilation_channels,
                     c.skip_channels, c.quantization_channels)
    n = (c.filter_width * c.input_channels * R
         + L * (c.filter_width * R * 2 * D + D * R + D * S)
         + S * S + S * Q)
    if c.lc_enabled:
        n += L * c.lc_channels * 2 * D
    return n * bytes_per_el


def stream_decode_hbm_bytes_per_step(config: WaveNetConfig,
                                     batch_size: int,
                                     ring_pack: bool = False) -> int:
    """HBM bytes the streamed-IO decode kernel moves per emitted sample
    row (the big-batch roofline axis, VERDICT r3 item 3).

    Per step each of the L layers DMA-reads one ring row and writes one
    back; rows are [B, 128] f32 — the lane dim is explicitly padded to
    the 128 tile (kernels/sampler.py ``ring_ref`` layout), so traffic is
    128 lanes regardless of R=32. The forced/codes streams move one
    128-lane int32 row each per step (amortized through the double-
    buffered chunks), and an LC stream adds one [B, 128] f32 row.
    Weights live in VMEM for the whole run — zero per-step HBM traffic.

    ``ring_pack`` (round 5, kernels/sampler_packed.py): layers with
    dilation <= 8 are VMEM-resident (zero steady-state DMA); the rest
    move G-row blocks once per G steps — same bytes/step per packed
    layer, but the resident layers' traffic drops out. (The packed
    win is DMA *count*, which this bytes model cannot express.)
    """
    c = config
    B = batch_size
    lanes = 128  # ring rows are lane-padded to the 128 tile
    rec = -(-B // 128) * 128  # forced/codes record width (multi-tile b>128)
    n_layers = c.num_layers
    if ring_pack:
        n_layers = sum(1 for d in c.dilations if d > 8)
    ring = 2 * n_layers * B * lanes * 4
    io = 2 * rec * 4
    lc = B * lanes * 4 if c.lc_enabled else 0
    return ring + io + lc


def device_peak_flops(device_kind: str) -> Optional[float]:
    for prefix, peak in PEAK_BF16_FLOPS.items():
        if device_kind.startswith(prefix):
            return peak
    return None


def device_hbm_bytes_per_s(device_kind: str) -> Optional[float]:
    for prefix, bw in HBM_BYTES_PER_S.items():
        if device_kind.startswith(prefix):
            return bw
    return None


def mfu(flops_per_s: Optional[float],
        device_kind: str) -> Optional[float]:
    """Model-FLOPs utilization in [0, 1] against the chip's bf16 peak;
    None when the chip's peak is unknown or the measurement failed."""
    peak = device_peak_flops(device_kind)
    if peak is None or flops_per_s is None:
        return None
    return flops_per_s / peak
