"""b=1 VPU matvec chain parity (kernels/sampler.py, round 4).

At batch 1 the streamed-decode kernel replaces its dependent MXU matmuls
with VPU broadcast-multiply-reduce matvecs in alternating row/column
layouts (PackedSampler.layer_wT et al.) — measured ~25% faster on the
headline b1 metric (docs/performance.md "Round 4"). These tests pin:

* the VPU chain's teacher-forced logits against the conv forward
  (the SURVEY §3.5 fast≡slow keystone, same bar as every other kernel
  path) across plain / GC / LC / scalar-input configs;
* the VPU and MXU (vpu_b1=False) chains against EACH OTHER;
* that the transposed weight fields exist exactly when batch_size == 1.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavenet_tpu.models.config import WaveNetConfig
from wavenet_tpu.models.wavenet import forward, init_params, one_hot
from wavenet_tpu.kernels.sampler import (
    generate_pallas, pack_sampler_weights)


def small_config(**kw):
    d = dict(dilations=(1, 2, 4, 8), residual_channels=4,
             dilation_channels=4, skip_channels=8,
             quantization_channels=32, use_biases=True)
    d.update(kw)
    return WaveNetConfig(**d)


def _variant_cfg(variant):
    if variant == "gc":
        return small_config(gc_channels=4, gc_cardinality=4)
    if variant == "lc":
        return small_config(lc_channels=3)
    if variant == "scalar":
        return small_config(scalar_input=True, initial_filter_width=4)
    return small_config()


@pytest.mark.parametrize("variant", ["plain", "gc", "lc", "scalar"])
def test_vpu_chain_forced_logits_match_forward(variant, rng):
    cfg = _variant_cfg(variant)
    params = init_params(jax.random.PRNGKey(0), cfg)
    B, T = 1, cfg.receptive_field + 6
    if cfg.scalar_input:
        codes = jnp.asarray(
            rng.uniform(-1, 1, (B, T)).astype(np.float32))
        x_in = codes[..., None]
    else:
        codes = jnp.asarray(rng.randint(0, cfg.quantization_channels,
                                        (B, T)))
        x_in = one_hot(codes, cfg.quantization_channels)
    gc_ids = jnp.asarray([1]) if variant == "gc" else None
    lc_kw = {}
    lc_full = None
    if variant == "lc":
        stream = jnp.asarray(rng.standard_normal((B, T, 3))
                             .astype(np.float32))
        lc_full = stream
        lc_kw = dict(lc=stream[:, T - 1:], lc_prime=stream[:, :T - 1])

    # Teacher-force the whole window through the prefill + streamed
    # decode path (prefill => stream kernel => vpu_chain at B == 1) and
    # check the decode logit against the parallel forward.
    gc_emb_ids = gc_ids
    _, logits = generate_pallas(
        params, cfg, n_samples=1, seed=0, batch_size=B, seed_codes=codes,
        gc_ids=gc_emb_ids, prefill=True, collect_logits=True,
        interpret=True, **lc_kw)

    from wavenet_tpu.models.wavenet import embed_gc
    gc_emb = embed_gc(params, cfg, gc_ids) if gc_ids is not None else None
    full = forward(params, cfg, x_in, gc_emb, lc=lc_full)
    np.testing.assert_allclose(np.asarray(logits[:, -1]),
                               np.asarray(full[:, -1]),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("path", ["prefill", "stream_io", "vmem_seq"])
def test_vpu_and_mxu_chains_agree(path, rng):
    """All three kernel paths that can carry the b=1 VPU chain: the
    prefill entry (routes to the VMEM decode at this scale), the
    streamed-IO kernel, and the sequential all-VMEM kernel."""
    cfg = small_config()
    params = init_params(jax.random.PRNGKey(0), cfg)
    B, T = 1, cfg.receptive_field + 9
    codes = jnp.asarray(rng.randint(0, cfg.quantization_channels, (B, T)))
    kw = {"prefill": dict(prefill=True),
          "stream_io": dict(ring_in_hbm=True, stream_io=True),
          "vmem_seq": {}}[path]

    _, lg_vpu = generate_pallas(
        params, cfg, n_samples=1, seed=0, batch_size=B, seed_codes=codes,
        collect_logits=True, interpret=True, **kw)
    _, lg_mxu = generate_pallas(
        params, cfg, n_samples=1, seed=0, batch_size=B, seed_codes=codes,
        collect_logits=True, interpret=True, vpu_b1=False, **kw)
    np.testing.assert_allclose(np.asarray(lg_vpu), np.asarray(lg_mxu),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("variant", ["plain", "lc"])
def test_vmem_kernel_vpu_chain_matches_forward(variant, rng):
    """The all-VMEM sequential kernel's b=1 VPU branch (no prefill)."""
    cfg = _variant_cfg(variant)
    params = init_params(jax.random.PRNGKey(0), cfg)
    B, T = 1, cfg.receptive_field + 6
    codes = jnp.asarray(rng.randint(0, cfg.quantization_channels, (B, T)))
    lc_kw = {}
    lc_full = None
    if variant == "lc":
        stream = jnp.asarray(rng.standard_normal((B, T, 3))
                             .astype(np.float32))
        lc_full = stream
        lc_kw = dict(lc=stream[:, T - 1:], lc_prime=stream[:, :T - 1])

    _, logits = generate_pallas(
        params, cfg, n_samples=1, seed=0, batch_size=B, seed_codes=codes,
        collect_logits=True, interpret=True, **lc_kw)
    full = forward(params, cfg, one_hot(codes, cfg.quantization_channels),
                   None, lc=lc_full)
    np.testing.assert_allclose(np.asarray(logits[:, :T]), np.asarray(full),
                               rtol=1e-4, atol=1e-5)


def test_prefill_vmem_decode_batch2_matches_forward(rng):
    """The prefilled VMEM decode at B > 1 (MXU chain + resume state)."""
    cfg = small_config()
    params = init_params(jax.random.PRNGKey(0), cfg)
    B, T = 2, cfg.receptive_field + 5
    codes = jnp.asarray(rng.randint(0, cfg.quantization_channels, (B, T)))
    _, logits = generate_pallas(
        params, cfg, n_samples=1, seed=0, batch_size=B, seed_codes=codes,
        prefill=True, collect_logits=True, interpret=True)
    full = forward(params, cfg, one_hot(codes, cfg.quantization_channels),
                   None)
    np.testing.assert_allclose(np.asarray(logits[:, -1]),
                               np.asarray(full[:, -1]),
                               rtol=1e-4, atol=1e-5)


def test_transposed_fields_only_at_b1():
    cfg = small_config(lc_channels=3)
    params = init_params(jax.random.PRNGKey(0), cfg)
    L, D, R = cfg.num_layers, cfg.dilation_channels, cfg.residual_channels

    p1 = pack_sampler_weights(params, cfg, 1)
    assert p1.layer_wT.shape == (L, 2 * D, 2 * R)
    assert p1.layer_addT.shape == (L, 2 * D, 1)
    assert p1.lc_wT.shape == (L, 2 * D, cfg.lc_channels)
    np.testing.assert_allclose(np.asarray(p1.layer_wT),
                               np.asarray(jnp.transpose(p1.layer_w,
                                                        (0, 2, 1))))

    p2 = pack_sampler_weights(params, cfg, 2)
    assert p2.layer_wT is None
    assert p2.layer_addT is None
    assert p2.lc_wT is None
