"""FLOPs model checks: hand numbers + XLA's own compiled cost analysis."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavenet_tpu.models.config import WaveNetConfig, paper_config
from wavenet_tpu.utils import flops as F


def test_paper_config_macs_by_hand():
    c = paper_config()
    # 30 layers: fused filter+gate 2*32*64, dense 32*32, skip 32*512.
    layer = 2 * 32 * 64 + 32 * 32 + 32 * 512
    assert layer == 21504
    assert F.stack_macs_per_position(c) == 30 * layer + 2 * 32
    assert F.head_macs_per_position(c) == 512 * 512 + 512 * 256
    # Weight working set of the decode kernel, f32: ~4.3 MB.
    wb = F.weight_bytes(c)
    assert 4.0e6 < wb < 4.6e6


def test_train_step_flops_scales():
    c = paper_config()
    one = F.train_step_flops(c, 1, 16000)
    assert F.train_step_flops(c, 8, 16000) == pytest.approx(8 * one)
    # fwd+bwd = 3x forward.
    T = c.receptive_field + 16000
    fwd = 2 * (F.stack_macs_per_position(c) * T
               + F.head_macs_per_position(c) * 16000)
    assert one == pytest.approx(3 * fwd)


def test_device_constants():
    assert F.device_peak_flops("TPU v5 lite0") == 197e12
    assert F.device_peak_flops("Tesla V100") is None
    assert F.mfu(55e12, "TPU v5 lite") == pytest.approx(0.279, abs=0.01)
    assert F.mfu(None, "TPU v5 lite") is None


def test_analytic_flops_match_xla_cost_analysis():
    """The analytic model must sit near XLA's own count for the real
    train step (XLA additionally counts mu-law, softmax-CE, optimizer,
    and elementwise traffic — so analytic/XLA lands below 1 but must
    not be wildly off)."""
    from wavenet_tpu.train_lib import (
        create_train_state, make_optimizer, make_train_step)

    cfg = WaveNetConfig(dilations=(1, 2, 4, 8, 16, 32, 64, 128) * 2,
                        residual_channels=16, dilation_channels=16,
                        skip_channels=64, quantization_channels=64,
                        use_biases=True)
    B, sample_size = 2, 2000
    optimizer = make_optimizer("adam", 1e-3)
    state = create_train_state(jax.random.PRNGKey(0), cfg, optimizer)
    step = make_train_step(cfg, optimizer, None)
    audio = jnp.zeros((B, cfg.receptive_field + sample_size), jnp.float32)

    lowered = jax.jit(step).lower(state, audio)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    xla_flops = float(cost.get("flops", 0.0))
    if xla_flops <= 0:
        pytest.skip("backend reports no flops in cost analysis")
    analytic = F.train_step_flops(cfg, B, sample_size)
    ratio = analytic / xla_flops
    assert 0.5 < ratio < 1.5, (analytic, xla_flops)
