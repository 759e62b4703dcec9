"""mu-law codec parity tests (reference: test/test_mulaw.py semantics)."""

import jax.numpy as jnp
import numpy as np

from wavenet_tpu.audio import (
    mu_law_decode, mu_law_decode_np, mu_law_encode, mu_law_encode_np)


def test_roundtrip_bounded_error():
    # Dense sweep of [-1, 1]: decode(encode(x)) within one quantization step.
    x = np.linspace(-1.0, 1.0, 5000).astype(np.float32)
    enc = mu_law_encode(jnp.asarray(x), 256)
    dec = np.asarray(mu_law_decode(enc, 256))
    # mu-law is logarithmic: absolute error is small near 0 and bounded by
    # the local step size everywhere; a global bound of ~2/255 on |x|<=1
    # holds at the loud end, and proportionally tighter near zero.
    assert np.max(np.abs(dec - x)) < 0.03
    quiet = np.abs(x) < 0.1
    assert np.max(np.abs(dec[quiet] - x[quiet])) < 3e-3
    very_quiet = np.abs(x) < 0.01
    assert np.max(np.abs(dec[very_quiet] - x[very_quiet])) < 4e-4


def test_encode_range_and_clipping():
    x = jnp.asarray([-2.0, -1.0, 0.0, 1.0, 2.0])
    enc = np.asarray(mu_law_encode(x, 256))
    assert enc.min() >= 0 and enc.max() <= 255
    # Out-of-range amplitudes clip to the extremes.
    assert enc[0] == enc[1] == 0
    assert enc[3] == enc[4] == 255
    # Zero amplitude encodes to 128 (the pad value the network sees).
    assert enc[2] == 128


def test_decode_is_signed_inverse():
    codes = jnp.arange(256)
    dec = np.asarray(mu_law_decode(codes, 256))
    assert dec[0] == -1.0
    assert abs(dec[255] - 1.0) < 1e-6
    assert np.all(np.diff(dec) > 0)  # strictly monotone


def test_np_and_jnp_twins_agree():
    x = np.random.RandomState(0).uniform(-1.5, 1.5, 1000).astype(np.float32)
    assert np.array_equal(np.asarray(mu_law_encode(jnp.asarray(x))),
                          mu_law_encode_np(x))
    codes = np.random.RandomState(1).randint(0, 256, 500)
    np.testing.assert_allclose(
        np.asarray(mu_law_decode(jnp.asarray(codes))),
        mu_law_decode_np(codes), rtol=1e-6)


def test_other_quantization_channels():
    for q in (64, 128, 512):
        x = np.linspace(-1, 1, 257).astype(np.float32)
        enc = np.asarray(mu_law_encode(jnp.asarray(x), q))
        assert enc.min() == 0 and enc.max() == q - 1
        dec = np.asarray(mu_law_decode(jnp.asarray(enc), q))
        assert np.max(np.abs(dec - x)) < 8.0 / q
