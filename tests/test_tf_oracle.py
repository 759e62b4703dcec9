"""Independent-oracle parity: jnp model vs TF-kernel re-execution.

Round-1 parity tests checked the jnp model against a jnp
``reference_forward`` written by the same author — circular. These tests
break the circularity: ``wavenet_tpu.compat.tf_oracle`` rebuilds the
reconstructed reference computation (wavenet/ops.py ≈:28-110,
wavenet/model.py ≈:265-500 and ≈:675-740) on TensorFlow's OWN kernels
(`tf.nn.conv1d` + the transpose trick, `tf.nn.softmax_cross_entropy_with_
logits`, `tf.nn.l2_loss`, `tf.nn.embedding_lookup`) and runs it in a
`tf.compat.v1.Session`. If the jnp formulas diverged from what TF1
actually computes — conv semantics, slice alignment, mu-law rounding,
l2 scale — these tests fail where the self-referential oracle could not.

TF is imported lazily inside tf_oracle; if TensorFlow is not importable
in some environment the whole module is skipped, never silently passed.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wavenet_tpu.models.config import WaveNetConfig
from wavenet_tpu.models import wavenet

tf_oracle = pytest.importorskip("wavenet_tpu.compat.tf_oracle")
pytest.importorskip("tensorflow")


def make_cfg(**kw):
    d = dict(dilations=(1, 2, 4, 8, 1, 2), residual_channels=6,
             dilation_channels=5, skip_channels=9, quantization_channels=32,
             use_biases=False, sample_rate=2000)
    d.update(kw)
    return WaveNetConfig(**d)


def make_params(cfg, seed=1, randomize_biases=True):
    """Init params; biases are randomized so they are load-bearing."""
    params = wavenet.init_params(jax.random.PRNGKey(seed), cfg)
    if randomize_biases and cfg.use_biases:
        rng = np.random.RandomState(seed)
        params = {k: (jnp.asarray(rng.normal(0, 0.1, v.shape), jnp.float32)
                      if k.endswith("_bias") else v)
                  for k, v in params.items()}
    return params


# ---------------------------------------------------------------------------
# ops parity: mu-law codec and the dilated VALID conv
# ---------------------------------------------------------------------------

def test_mu_law_encode_matches_tf_kernels():
    import tensorflow as tf
    # Dense sweep including the exact class boundaries and out-of-range clamps.
    audio = np.concatenate([np.linspace(-1.5, 1.5, 4001),
                            np.array([0.0, -1.0, 1.0])]).astype(np.float32)
    for q in (256, 32):
        ours = np.asarray(
            __import__("wavenet_tpu.audio", fromlist=["x"]).mu_law_encode(
                jnp.asarray(audio), q))
        with tf.Graph().as_default():
            enc = tf_oracle.mu_law_encode(tf.constant(audio), q)
            with tf.compat.v1.Session() as sess:
                theirs = sess.run(enc)
        np.testing.assert_array_equal(ours, theirs)


def test_mu_law_decode_matches_tf_kernels():
    import tensorflow as tf
    from wavenet_tpu.audio import mu_law_decode
    for q in (256, 32):
        codes = np.arange(q, dtype=np.int32)
        ours = np.asarray(mu_law_decode(jnp.asarray(codes), q))
        with tf.Graph().as_default():
            dec = tf_oracle.mu_law_decode(tf.constant(codes), q)
            with tf.compat.v1.Session() as sess:
                theirs = sess.run(dec)
        np.testing.assert_allclose(ours, theirs, atol=1e-6)


@pytest.mark.parametrize("dilation", [1, 2, 4, 16])
@pytest.mark.parametrize("filter_width", [2, 3])
def test_causal_conv_matches_tf_transpose_trick(rng, dilation, filter_width):
    """jnp causal_conv (lax dilated conv) vs TF conv1d + time_to_batch."""
    import tensorflow as tf
    from wavenet_tpu.ops.conv import causal_conv
    T = 64
    value = rng.normal(0, 1, (2, T, 3)).astype(np.float32)
    filt = rng.normal(0, 1, (filter_width, 3, 5)).astype(np.float32)
    ours = np.asarray(causal_conv(jnp.asarray(value), jnp.asarray(filt),
                                  dilation))
    with tf.Graph().as_default():
        out = tf_oracle.causal_conv(tf.constant(value), tf.constant(filt),
                                    dilation)
        with tf.compat.v1.Session() as sess:
            theirs = sess.run(out)
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


# ---------------------------------------------------------------------------
# forward parity: full network logits on TF kernels
# ---------------------------------------------------------------------------

def _forward_case(cfg, seed=1, batch=2):
    rng = np.random.RandomState(seed)
    params = make_params(cfg, seed)
    rf = cfg.receptive_field
    T = rf + 21
    gc_ids = (rng.randint(0, cfg.gc_cardinality, (batch,))
              if cfg.gc_enabled else None)
    gc_emb = (wavenet.embed_gc(params, cfg, jnp.asarray(gc_ids))
              if gc_ids is not None else None)
    if cfg.scalar_input:
        wave = rng.uniform(-1, 1, (batch, T)).astype(np.float32)
        ours = np.asarray(wavenet.forward(
            params, cfg, jnp.asarray(wave)[..., None], gc_emb))[:, rf - 1:, :]
        theirs = tf_oracle.forward_logits(params, cfg, wave, gc_ids)
    else:
        codes = rng.randint(0, cfg.quantization_channels, (batch, T))
        ours = np.asarray(wavenet.forward_codes(
            params, cfg, jnp.asarray(codes), gc_emb))[:, rf - 1:, :]
        theirs = tf_oracle.forward_logits(params, cfg, codes, gc_ids)
    return ours, theirs


@pytest.mark.parametrize("cfg_kw", [
    dict(),                                           # plain
    dict(use_biases=True),                            # biases
    dict(use_biases=True, gc_channels=4, gc_cardinality=7),   # GC, xavier emb
    dict(gc_channels=5, gc_cardinality=5),            # GC, identity emb
    dict(scalar_input=True, initial_filter_width=8, use_biases=True),
], ids=["plain", "biases", "gc", "gc_identity", "scalar"])
def test_forward_logits_match_tf_oracle(cfg_kw):
    cfg = make_cfg(**cfg_kw)
    ours, theirs = _forward_case(cfg)
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


# ---------------------------------------------------------------------------
# loss parity: slice alignment, CE reduction, l2 scale
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("l2", [None, 0.01])
@pytest.mark.parametrize("cfg_kw", [
    dict(use_biases=True),
    dict(use_biases=True, gc_channels=4, gc_cardinality=7),
    dict(scalar_input=True, initial_filter_width=8),
], ids=["biases", "gc", "scalar"])
def test_loss_matches_tf_oracle(cfg_kw, l2):
    cfg = make_cfg(**cfg_kw)
    rng = np.random.RandomState(3)
    params = make_params(cfg, 3)
    T = cfg.receptive_field + 33
    audio = rng.uniform(-1, 1, (2, T)).astype(np.float32)
    gc_ids = (np.array([0, 3]) if cfg.gc_enabled else None)
    total, aux = wavenet.loss_fn(
        params, cfg, jnp.asarray(audio),
        jnp.asarray(gc_ids) if gc_ids is not None else None, l2)
    tf_total, tf_ce, tf_l2 = tf_oracle.loss(params, cfg, audio, gc_ids, l2)
    np.testing.assert_allclose(float(aux["ce_loss"]), tf_ce, rtol=2e-5)
    np.testing.assert_allclose(float(total), tf_total, rtol=2e-5)
    if l2:
        np.testing.assert_allclose(float(aux["l2_loss"]), tf_l2, rtol=2e-5)


# ---------------------------------------------------------------------------
# incremental parity: the scan sampler's per-step logits vs TF windows
# ---------------------------------------------------------------------------

def test_incremental_logits_match_tf_oracle():
    """Teacher-forced sampler_step logits == TF full-conv window probs.

    This is the §3.5 fast≡slow keystone checked against TF kernels: the
    queue-free incremental path must predict exactly what the reference's
    conv graph predicts at every position.
    """
    from wavenet_tpu import sample
    cfg = make_cfg(use_biases=True, dilations=(1, 2, 4, 1, 2))
    params = make_params(cfg, 5)
    rng = np.random.RandomState(5)
    rf = cfg.receptive_field
    T = rf + 6
    codes = rng.randint(0, cfg.quantization_channels, (1, T))

    state = sample.init_sampler_state(cfg, batch_size=1)
    inc_logits = []
    for t in range(T):
        x = jax.nn.one_hot(jnp.asarray(codes[:, t]),
                           cfg.quantization_channels, dtype=jnp.float32)
        state, logits = sample.sampler_step(params, cfg, state, x)
        inc_logits.append(np.asarray(logits))

    # TF oracle probability of the next sample given each trailing window.
    for t in range(rf - 1, T):
        window = codes[:, :t + 1][:, -rf:]
        probs_tf = tf_oracle.predict_proba(params, cfg, window)
        probs_inc = np.asarray(jax.nn.softmax(jnp.asarray(inc_logits[t])))
        np.testing.assert_allclose(probs_inc, probs_tf, atol=1e-5)


def test_incremental_logits_match_tf1_queue_graph():
    """Scan-sampler steps == the reference's FIFOQueue fast-gen graph.

    tf1_baseline rebuilds the reference's ``_create_generator`` machinery
    (per-layer tf.queue.FIFOQueue state, matmul convs, one session.run
    per sample) — a second independent oracle, this time for the queue
    protocol itself rather than the conv formulas.
    """
    from wavenet_tpu import sample
    from wavenet_tpu.compat.tf1_baseline import TF1FastGenerator
    cfg = make_cfg(use_biases=True, dilations=(1, 2, 4, 1, 2),
                   gc_channels=4, gc_cardinality=7)
    params = make_params(cfg, 9)
    rng = np.random.RandomState(9)
    codes = rng.randint(0, cfg.quantization_channels, 3 * cfg.receptive_field)

    gen = TF1FastGenerator(params, cfg, batch_size=1, gc_id=2)
    gc_emb = wavenet.embed_gc(params, cfg, jnp.asarray([2]))
    state = sample.init_sampler_state(cfg, 1)
    try:
        for t in range(len(codes)):
            probs_tf = gen.step(np.array([codes[t]], np.int32))
            x = jax.nn.one_hot(jnp.asarray([codes[t]]),
                               cfg.quantization_channels, dtype=jnp.float32)
            state, logits = sample.sampler_step(params, cfg, state, x, gc_emb)
            probs_j = np.asarray(jax.nn.softmax(logits))
            np.testing.assert_allclose(probs_j, probs_tf, atol=1e-6)
    finally:
        gen.close()


def test_tf1_measurement_smoke():
    """measure_fast_generation runs the real loop and reports a rate."""
    from wavenet_tpu.compat.tf1_baseline import measure_fast_generation
    cfg = make_cfg(dilations=(1, 2, 4), use_biases=True)
    params = make_params(cfg, 11)
    res = measure_fast_generation(cfg, params, n_samples=64, warmup=8)
    assert res["samples_per_s"] > 0
    assert "one run per sample" in res["execution_model"]


def test_predict_proba_matches_tf_oracle():
    cfg = make_cfg(use_biases=True)
    params = make_params(cfg, 7)
    rng = np.random.RandomState(7)
    window = rng.randint(0, cfg.quantization_channels,
                         (2, cfg.receptive_field))
    ours = np.asarray(wavenet.predict_proba(params, cfg, jnp.asarray(window)))
    theirs = tf_oracle.predict_proba(params, cfg, window)
    np.testing.assert_allclose(ours, theirs, atol=1e-5)
