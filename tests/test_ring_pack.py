"""Packed-ring decode (kernels/sampler_packed.py) parity tests.

The packed kernel must be BITWISE identical to the v1 streamed decode
(same math, same order, same PRNG stream) across alignment offsets,
tail lengths, scalar mode, and GC conditioning — interpret mode here;
DMA timing is covered by the hardware stress suite
(baselines/sampler_stress_r6.txt)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavenet_tpu.kernels.sampler import generate_pallas
from wavenet_tpu.kernels.sampler_packed import _plan, pack_factor
from wavenet_tpu.models.config import WaveNetConfig
from wavenet_tpu.models.wavenet import init_params


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def small_config(**kw):
    d = dict(dilations=(1, 2, 4, 8, 16, 32, 1, 2, 4, 8, 16, 32),
             residual_channels=8, dilation_channels=8, skip_channels=16,
             quantization_channels=64)
    d.update(kw)
    return WaveNetConfig(**d)


def test_plan_partitions_layers():
    cfg = small_config()
    G = pack_factor(cfg)
    kinds, v2_off, rows, res_off, res_rows, p_idx, s_idx, n_p, n_s = \
        _plan(cfg, G)
    assert G == 4
    # d <= 8 resident, d in {16, 32} packed, none fall to step.
    assert kinds == ("r", "r", "r", "r", "p", "p") * 2
    assert n_p == 4 and n_s == 0
    assert rows == sum(cfg.dilations)      # row blocks keep d rows
    assert res_rows == 2 * (1 + 2 + 4 + 8)


def test_packed_bitwise_matches_v1(rng):
    cfg = small_config()
    params = init_params(jax.random.PRNGKey(0), cfg)
    B = 64
    codes = jnp.asarray(rng.randint(0, 64, (B, cfg.receptive_field + 7)))
    o1, l1 = generate_pallas(params, cfg, 11, seed=3, batch_size=B,
                             seed_codes=codes, prefill=True,
                             ring_pack=False, collect_logits=True,
                             interpret=True)
    o2, l2 = generate_pallas(params, cfg, 11, seed=3, batch_size=B,
                             seed_codes=codes, prefill=True,
                             ring_pack=True, collect_logits=True,
                             interpret=True)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


@pytest.mark.parametrize("extra", [0, 1, 2, 3])
def test_packed_alignment_and_tail(rng, extra):
    """Every t_abs % G phase, with a G-misaligned sample count."""
    cfg = small_config()
    params = init_params(jax.random.PRNGKey(0), cfg)
    B = 8
    codes = jnp.asarray(
        rng.randint(0, 64, (B, cfg.receptive_field + extra)))
    a = np.asarray(generate_pallas(params, cfg, 15, seed=3, batch_size=B,
                                   seed_codes=codes, prefill=True,
                                   ring_pack=False, interpret=True))
    b = np.asarray(generate_pallas(params, cfg, 15, seed=3, batch_size=B,
                                   seed_codes=codes, prefill=True,
                                   ring_pack=True, interpret=True))
    np.testing.assert_array_equal(a, b)


def test_packed_scalar_mode(rng):
    cfg = small_config(scalar_input=True, initial_filter_width=8)
    params = init_params(jax.random.PRNGKey(1), cfg)
    B = 4
    amps = jnp.asarray(rng.uniform(-1, 1, (B, cfg.receptive_field + 2))
                       .astype(np.float32))
    a = np.asarray(generate_pallas(params, cfg, 9, seed=5, batch_size=B,
                                   seed_codes=amps, prefill=True,
                                   ring_pack=False, interpret=True))
    b = np.asarray(generate_pallas(params, cfg, 9, seed=5, batch_size=B,
                                   seed_codes=amps, prefill=True,
                                   ring_pack=True, interpret=True))
    np.testing.assert_array_equal(a, b)


def test_packed_gc(rng):
    cfg = small_config(gc_channels=4, gc_cardinality=4)
    params = init_params(jax.random.PRNGKey(2), cfg)
    B = 4
    gc_ids = jnp.asarray([0, 1, 2, 3])
    a = np.asarray(generate_pallas(params, cfg, 9, seed=7, batch_size=B,
                                   gc_ids=gc_ids, prefill=True,
                                   ring_pack=False, interpret=True))
    b = np.asarray(generate_pallas(params, cfg, 9, seed=7, batch_size=B,
                                   gc_ids=gc_ids, prefill=True,
                                   ring_pack=True, interpret=True))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("il,B", [(2, 16), (4, 32)])
def test_packed_interleave_bitwise(rng, il, B):
    """Sub-batch interleave (round-5 experiment, kept as an opt-in
    knob): IL independent row chains must emit bitwise-identical codes
    and logits — matmul rows are independent, so a sublane-aligned row
    split never changes a row's K-reduction order. Hardware-verified at
    b512 (tools/r5_interleave_ab.py); this pins the interpret twin."""
    cfg = small_config()
    params = init_params(jax.random.PRNGKey(0), cfg)
    codes = jnp.asarray(rng.randint(0, 64, (B, cfg.receptive_field + 2)))
    a, la = generate_pallas(params, cfg, 11, seed=3, batch_size=B,
                            seed_codes=codes, prefill=True,
                            ring_pack=True, collect_logits=True,
                            interpret=True)
    b, lb = generate_pallas(params, cfg, 11, seed=3, batch_size=B,
                            seed_codes=codes, prefill=True,
                            ring_pack=True, collect_logits=True,
                            ring_interleave=il, interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_packed_interleave_rejects_misaligned():
    cfg = small_config()
    params = init_params(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError, match="interleave"):
        generate_pallas(params, cfg, 8, seed=1, batch_size=4,
                        prefill=True, ring_pack=True, ring_interleave=2,
                        interpret=True)


def test_packed_rejects_lc(rng):
    cfg = small_config(lc_channels=3)
    params = init_params(jax.random.PRNGKey(3), cfg)
    lc = jnp.zeros((2, 8, 3))
    with pytest.raises(NotImplementedError, match="ring_pack"):
        generate_pallas(params, cfg, 8, seed=1, batch_size=2, lc=lc,
                        prefill=True, ring_pack=True, interpret=True)


def test_packed_step_fallback_layers(rng):
    """A dilation not divisible by G (and > resident max) must ride the
    v1 per-step protocol inside the packed kernel — same outputs."""
    cfg = small_config(dilations=(1, 2, 4, 8, 16, 18))
    params = init_params(jax.random.PRNGKey(4), cfg)
    kinds = _plan(cfg, pack_factor(cfg))[0]
    assert kinds[-1] == "s"
    B = 4
    codes = jnp.asarray(rng.randint(0, 64, (B, cfg.receptive_field + 1)))
    a = np.asarray(generate_pallas(params, cfg, 13, seed=9, batch_size=B,
                                   seed_codes=codes, prefill=True,
                                   ring_pack=False, interpret=True))
    b = np.asarray(generate_pallas(params, cfg, 13, seed=9, batch_size=B,
                                   seed_codes=codes, prefill=True,
                                   ring_pack=True, interpret=True))
    np.testing.assert_array_equal(a, b)
