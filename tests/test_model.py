"""Model forward/loss tests, including parity with a reference-semantics
oracle (VALID shrinking convs with the reference's slice alignment,
reference: wavenet/model.py ≈:280-500)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavenet_tpu.models.config import WaveNetConfig, tiny_config
from wavenet_tpu.models.wavenet import (
    embed_gc, forward, init_params, loss_fn, one_hot, predict_proba)
from wavenet_tpu.ops.conv import causal_conv, conv1x1


def small_config(**kw):
    d = dict(dilations=(1, 2, 4, 8), residual_channels=4,
             dilation_channels=4, skip_channels=8,
             quantization_channels=32, use_biases=True)
    d.update(kw)
    return WaveNetConfig(**d)


def reference_forward(params, config, network_input, gc_embedding=None):
    """The reference's VALID-conv network verbatim: shrinking time axis,
    per-layer slicing of skip/residual (model.py ≈:280-500)."""
    c = config
    x = network_input
    current = causal_conv(x, params["causal_filter"], 1)
    output_width = network_input.shape[1] - c.receptive_field + 1

    skips = []
    for i, dilation in enumerate(c.dilations):
        conv_f = causal_conv(current, params["filter"][i], dilation)
        conv_g = causal_conv(current, params["gate"][i], dilation)
        if gc_embedding is not None:
            conv_f = conv_f + (gc_embedding @ params["gc_filter"][i])[:, None, :]
            conv_g = conv_g + (gc_embedding @ params["gc_gate"][i])[:, None, :]
        if c.use_biases:
            conv_f = conv_f + params["filter_bias"][i]
            conv_g = conv_g + params["gate_bias"][i]
        out = jnp.tanh(conv_f) * jax.nn.sigmoid(conv_g)
        transformed = conv1x1(out, params["dense"][i])
        if c.use_biases:
            transformed = transformed + params["dense_bias"][i]
        skip_cut = out.shape[1] - output_width
        out_skip = out[:, skip_cut:, :]
        skip_c = conv1x1(out_skip, params["skip"][i])
        if c.use_biases:
            skip_c = skip_c + params["skip_bias"][i]
        skips.append(skip_c)
        input_cut = current.shape[1] - transformed.shape[1]
        current = current[:, input_cut:, :] + transformed

    total = sum(skips)
    h = jax.nn.relu(total)
    h = conv1x1(h, params["postprocess1"])
    if c.use_biases:
        h = h + params["postprocess1_bias"]
    h = jax.nn.relu(h)
    h = conv1x1(h, params["postprocess2"])
    if c.use_biases:
        h = h + params["postprocess2_bias"]
    return h


@pytest.mark.parametrize("use_biases,gc", [(False, False), (True, False),
                                           (True, True)])
def test_forward_matches_reference_semantics(use_biases, gc, rng):
    cfg = small_config(use_biases=use_biases,
                       gc_channels=5 if gc else None,
                       gc_cardinality=3 if gc else None)
    params = init_params(jax.random.PRNGKey(0), cfg)
    T = cfg.receptive_field + 12
    x = jnp.asarray(
        rng.randint(0, cfg.quantization_channels, (2, T)).astype(np.int32))
    net_in = one_hot(x, cfg.quantization_channels)
    gc_emb = (embed_gc(params, cfg, jnp.asarray([0, 2])) if gc else None)

    ours = forward(params, cfg, net_in, gc_emb)
    oracle = reference_forward(params, cfg, net_in, gc_emb)
    assert ours.shape == (2, T, cfg.quantization_channels)
    np.testing.assert_allclose(
        np.asarray(ours[:, cfg.receptive_field - 1:, :]),
        np.asarray(oracle), rtol=2e-5, atol=2e-5)


def test_scalar_input_forward(rng):
    cfg = small_config(scalar_input=True, initial_filter_width=8)
    params = init_params(jax.random.PRNGKey(1), cfg)
    assert params["causal_filter"].shape == (8, 1, cfg.residual_channels)
    T = cfg.receptive_field + 6
    audio = jnp.asarray(rng.uniform(-1, 1, (1, T)).astype(np.float32))
    oracle = reference_forward(params, cfg, audio[..., None])
    ours = forward(params, cfg, audio[..., None])
    np.testing.assert_allclose(
        np.asarray(ours[:, cfg.receptive_field - 1:, :]), np.asarray(oracle),
        rtol=2e-5, atol=2e-5)


def test_receptive_field_values():
    # Reference formula: (fw-1)*sum(d) + fw  (non-scalar)
    assert small_config().receptive_field == (1 * 15) + 2
    assert tiny_config().receptive_field == 1023 + 2
    cfg = small_config(scalar_input=True, initial_filter_width=8)
    assert cfg.receptive_field == 15 + 1 + 7


def test_identity_gc_embedding():
    cfg = small_config(gc_channels=3, gc_cardinality=3)
    params = init_params(jax.random.PRNGKey(0), cfg)
    np.testing.assert_array_equal(np.asarray(params["gc_embedding"]),
                                  np.eye(3, dtype=np.float32))


def test_loss_finite_and_grads_flow(rng):
    cfg = small_config()
    params = init_params(jax.random.PRNGKey(0), cfg)
    T = cfg.receptive_field + 32
    audio = jnp.asarray(rng.uniform(-1, 1, (2, T)).astype(np.float32))

    (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, cfg, audio, None, 0.01)
    assert np.isfinite(float(total))
    assert "l2_loss" in aux
    # Every parameter receives gradient signal.
    flat = jax.tree_util.tree_leaves_with_path(grads)
    for path, g in flat:
        assert np.all(np.isfinite(np.asarray(g))), path
    nonzero = [float(jnp.max(jnp.abs(g))) for _, g in flat]
    assert all(nz > 0 for nz in nonzero), nonzero


def test_model_causality(rng):
    # Output at position t must not depend on inputs > t.
    cfg = small_config()
    params = init_params(jax.random.PRNGKey(0), cfg)
    T = cfg.receptive_field + 8
    x = rng.randint(0, cfg.quantization_channels, (1, T)).astype(np.int32)
    base = np.asarray(forward(params, cfg, one_hot(jnp.asarray(x), cfg.quantization_channels)))
    x2 = x.copy()
    t_mod = T - 3
    x2[0, t_mod] = (x2[0, t_mod] + 7) % cfg.quantization_channels
    out2 = np.asarray(forward(params, cfg, one_hot(jnp.asarray(x2), cfg.quantization_channels)))
    np.testing.assert_array_equal(base[0, :t_mod, :], out2[0, :t_mod, :])
    assert not np.allclose(base[0, t_mod, :], out2[0, t_mod, :])


def test_predict_proba_shape(rng):
    cfg = small_config()
    params = init_params(jax.random.PRNGKey(0), cfg)
    window = jnp.asarray(
        rng.randint(0, cfg.quantization_channels,
                    (1, cfg.receptive_field)).astype(np.int32))
    p = np.asarray(predict_proba(params, cfg, window))
    assert p.shape == (1, cfg.quantization_channels)
    np.testing.assert_allclose(p.sum(axis=-1), 1.0, rtol=1e-5)


def test_bfloat16_compute_close_to_fp32(rng):
    cfg = small_config(compute_dtype="bfloat16")
    cfg32 = small_config()
    params = init_params(jax.random.PRNGKey(0), cfg32)
    T = cfg.receptive_field + 8
    x = jnp.asarray(rng.randint(0, cfg.quantization_channels, (1, T)))
    net_in = one_hot(x, cfg.quantization_channels)
    out16 = np.asarray(forward(params, cfg, net_in))
    out32 = np.asarray(forward(params, cfg32, net_in))
    assert out16.dtype == np.float32  # logits returned in fp32
    np.testing.assert_allclose(out16, out32, rtol=0.1, atol=0.1)


def test_forward_codes_matches_one_hot_forward(rng):
    # The gather-based integer-code path must equal the one-hot conv path.
    from wavenet_tpu.models.wavenet import forward_codes
    cfg = small_config(gc_channels=5, gc_cardinality=3)
    params = init_params(jax.random.PRNGKey(2), cfg)
    T = cfg.receptive_field + 9
    codes = jnp.asarray(rng.randint(0, cfg.quantization_channels, (3, T)))
    gc_emb = embed_gc(params, cfg, jnp.asarray([0, 1, 2]))
    via_onehot = forward(params, cfg, one_hot(codes, cfg.quantization_channels),
                         gc_emb)
    via_codes = forward_codes(params, cfg, codes, gc_emb)
    np.testing.assert_allclose(np.asarray(via_codes), np.asarray(via_onehot),
                               rtol=1e-5, atol=1e-6)


def test_remat_same_loss_and_grads(rng):
    cfg = small_config()
    cfg_r = small_config(remat=True)
    params = init_params(jax.random.PRNGKey(0), cfg)
    T = cfg.receptive_field + 16
    audio = jnp.asarray(rng.uniform(-1, 1, (2, T)).astype(np.float32))

    (l1, _), g1 = jax.value_and_grad(loss_fn, has_aux=True)(
        params, cfg, audio)
    (l2, _), g2 = jax.value_and_grad(loss_fn, has_aux=True)(
        params, cfg_r, audio)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for k in g1:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g2[k]),
                                   rtol=1e-5, atol=1e-7, err_msg=k)


@pytest.mark.parametrize("gc", [False, True])
def test_merged_filter_gate_same_loss_and_grads(rng, gc):
    # merged_filter_gate batches the filter+gate convs into one conv with
    # concatenated output columns — the dot products are identical, so
    # loss and grads must match the unmerged path to float tolerance.
    kw = dict(gc_channels=4, gc_cardinality=3) if gc else {}
    cfg = small_config(**kw)
    cfg_m = small_config(merged_filter_gate=True, **kw)
    params = init_params(jax.random.PRNGKey(0), cfg)
    T = cfg.receptive_field + 16
    audio = jnp.asarray(rng.uniform(-1, 1, (2, T)).astype(np.float32))
    gc_ids = jnp.asarray([0, 2], jnp.int32) if gc else None

    (l1, _), g1 = jax.value_and_grad(loss_fn, has_aux=True)(
        params, cfg, audio, gc_ids)
    (l2, _), g2 = jax.value_and_grad(loss_fn, has_aux=True)(
        params, cfg_m, audio, gc_ids)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for k in g1:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g2[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def test_log_likelihood_scoring(rng):
    from wavenet_tpu.score import log_likelihood
    cfg = small_config()
    params = init_params(jax.random.PRNGKey(0), cfg)
    audio = jnp.asarray(rng.uniform(-1, 1, (2, 64)).astype(np.float32))
    out = log_likelihood(params, cfg, audio)
    assert out["logp_per_sample"].shape == (2, 63)
    assert np.all(np.asarray(out["logp_per_sample"]) <= 0)
    np.testing.assert_allclose(
        np.asarray(out["total_logp"]),
        np.asarray(out["logp_per_sample"]).sum(-1), rtol=1e-5)
    assert np.all(np.asarray(out["bits_per_sample"]) > 0)
    # Scoring must agree with predict_proba at the last position.
    codes = np.asarray(
        jnp.asarray(out["logp_per_sample"]))  # just exercise
    from wavenet_tpu.audio import mu_law_encode
    enc = mu_law_encode(audio, cfg.quantization_channels)
    p = predict_proba(params, cfg, enc[:, :-1])
    last_lp = np.asarray(out["logp_per_sample"])[:, -1]
    want = np.log(np.asarray(p)[np.arange(2), np.asarray(enc)[:, -1]])
    np.testing.assert_allclose(last_lp, want, rtol=1e-4, atol=1e-5)
