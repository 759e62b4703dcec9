"""Causal conv parity tests (reference: test/test_causal_conv.py semantics)."""

import jax.numpy as jnp
import numpy as np

from wavenet_tpu.ops.conv import (
    batch_to_time, causal_conv, causal_conv_padded, causal_conv_reference,
    time_to_batch)


def test_identity_plus_shift():
    # The reference's canonical test: filter [1, 1] at dilation 4 on
    # arange -> out[t] = x[t] + x[t+4] over the valid range.
    x = np.tile(np.arange(1, 21, dtype=np.float32), (2, 1))[:, :, None]
    filt = jnp.asarray([1.0, 1.0]).reshape(2, 1, 1)
    out = np.asarray(causal_conv(jnp.asarray(x), filt, dilation=4))
    expected = x[:, :-4, 0] + x[:, 4:, 0]
    assert out.shape == (2, 16, 1)
    np.testing.assert_allclose(out[:, :, 0], expected)


def test_matches_reference_transpose_trick(rng):
    # Our direct rhs_dilation conv == the reference's time_to_batch trick.
    for dilation in (1, 2, 4, 8, 16):
        for fw in (2, 3):
            x = jnp.asarray(rng.randn(3, 100, 5).astype(np.float32))
            w = jnp.asarray(rng.randn(fw, 5, 7).astype(np.float32))
            ours = causal_conv(x, w, dilation)
            oracle = causal_conv_reference(x, w, dilation)
            assert ours.shape == oracle.shape
            np.testing.assert_allclose(np.asarray(ours), np.asarray(oracle),
                                       rtol=1e-5, atol=1e-5)


def test_padded_equals_valid_on_suffix(rng):
    # causal_conv_padded keeps full length; its outputs at positions
    # >= (fw-1)*d equal the VALID conv outputs — the keystone that lets the
    # model keep static full-length shapes.
    x = jnp.asarray(rng.randn(2, 64, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(2, 4, 6).astype(np.float32))
    for d in (1, 4, 8):
        full = causal_conv_padded(x, w, d)
        valid = causal_conv(x, w, d)
        assert full.shape[1] == 64
        np.testing.assert_allclose(
            np.asarray(full[:, d * 1:, :]), np.asarray(valid),
            rtol=1e-5, atol=1e-6)


def test_time_to_batch_roundtrip(rng):
    x = jnp.asarray(rng.randn(2, 37, 3).astype(np.float32))
    for d in (2, 4, 8):
        t2b = time_to_batch(x, d)
        assert t2b.shape[0] == 2 * d
        back = batch_to_time(t2b, d)
        np.testing.assert_allclose(np.asarray(back[:, :37, :]),
                                   np.asarray(x), rtol=1e-6)


def test_causality():
    # Changing a future input must not change past outputs.
    x = np.zeros((1, 32, 1), dtype=np.float32)
    w = jnp.asarray(np.ones((2, 1, 1), dtype=np.float32))
    base = np.asarray(causal_conv_padded(jnp.asarray(x), w, 4))
    x2 = x.copy()
    x2[0, 20, 0] = 100.0
    out2 = np.asarray(causal_conv_padded(jnp.asarray(x2), w, 4))
    np.testing.assert_array_equal(base[0, :20, 0], out2[0, :20, 0])
    assert out2[0, 20, 0] != base[0, 20, 0]
