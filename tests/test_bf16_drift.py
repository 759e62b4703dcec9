"""bf16-vs-fp32 training drift: loss-curve overlay over many steps.

Round 1 justified bf16 training with a single-forward 0.1-tolerance
check. This bounds the thing that matters: how far a bf16 LOSS CURVE
drifts from the fp32 curve over a real optimization trajectory (same
data, same init, same optimizer). bf16 here means the framework's
training mode — bf16 matmul operands with fp32 params, accumulation,
and optimizer state — so drift comes only from matmul-input rounding.

The bound asserted is behavioral, not bitwise: after N steps the bf16
curve must (a) track the fp32 curve within a small absolute band at
every step, and (b) reach the same converged loss within a tight final
tolerance. A systematic bf16 degradation (e.g. accumulating in bf16, or
casting the optimizer state) blows both immediately.
"""

import jax
import numpy as np
import pytest

from test_end_to_end import make_sine_waves, small_cfg

from wavenet_tpu.train_lib import (
    create_train_state, make_optimizer, make_train_step)
import jax.numpy as jnp


def loss_curve(cfg, audio, n_steps, lr=2e-3):
    optimizer = make_optimizer("adam", lr)
    state = create_train_state(jax.random.PRNGKey(0), cfg, optimizer)
    step_fn = make_train_step(cfg, optimizer, None)
    audio = jnp.asarray(audio)
    losses = []
    for _ in range(n_steps):
        state, metrics = step_fn(state, audio)
        losses.append(float(jax.device_get(metrics["loss"])))
    return np.asarray(losses)


@pytest.mark.slow
def test_bf16_loss_curve_tracks_fp32():
    audio, _ = make_sine_waves(gc_enabled=False, n_seconds=0.5)
    n_steps = 200
    cfg32 = small_cfg(compute_dtype="float32")
    cfg16 = small_cfg(compute_dtype="bfloat16")

    c32 = loss_curve(cfg32, audio, n_steps)
    c16 = loss_curve(cfg16, audio, n_steps)

    # Same starting point (init is fp32 in both modes).
    np.testing.assert_allclose(c16[0], c32[0], atol=0.05)

    # Training must actually work in both modes.
    assert c32[-1] < c32[0] - 1.0, (c32[0], c32[-1])
    assert c16[-1] < c16[0] - 1.0, (c16[0], c16[-1])

    # Per-step drift band: bf16 rounding perturbs the trajectory, but
    # the curves must stay interleaved — compare smoothed curves to
    # ignore step-to-step noise.
    def smooth(x, k=10):
        return np.convolve(x, np.ones(k) / k, mode="valid")

    s32, s16 = smooth(c32), smooth(c16)
    band = np.max(np.abs(s16 - s32))
    assert band < 0.35, f"smoothed loss curves drift {band:.3f} apart"

    # Converged endpoints agree tightly (mean of last 20 steps).
    end32, end16 = np.mean(c32[-20:]), np.mean(c16[-20:])
    assert abs(end16 - end32) < 0.15, (end32, end16)
