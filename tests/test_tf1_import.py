"""TF1 checkpoint import: synthesize a reference-named TF1 checkpoint and
verify the imported pytree reproduces the same forward outputs."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax
import jax.numpy as jnp

from wavenet_tpu.compat.tf1_import import TF1ImportError, import_tf1_checkpoint
from wavenet_tpu.models.config import WaveNetConfig
from wavenet_tpu.models.wavenet import embed_gc, forward, init_params, one_hot


def small_cfg():
    return WaveNetConfig(dilations=(1, 2, 4), residual_channels=4,
                         dilation_channels=4, skip_channels=8,
                         quantization_channels=16, use_biases=True,
                         gc_channels=3, gc_cardinality=5)


def write_tf1_checkpoint(path, cfg, rng):
    """Emit a checkpoint with the reference's variable scoping
    (wavenet/model.py ``_create_variables`` ≈:130-260)."""
    v1 = tf.compat.v1
    fw, R, D, S, Q = (cfg.filter_width, cfg.residual_channels,
                      cfg.dilation_channels, cfg.skip_channels,
                      cfg.quantization_channels)
    graph = tf.Graph()
    values = {}

    def mk(scope_name, shape):
        arr = rng.randn(*shape).astype(np.float32) * 0.3
        values[scope_name] = arr
        return v1.get_variable(scope_name.split("/")[-1],
                               initializer=tf.constant(arr))

    with graph.as_default():
        with v1.variable_scope("wavenet"):
            with v1.variable_scope("embeddings"):
                mk("wavenet/embeddings/gc_embedding",
                   (cfg.gc_cardinality, cfg.gc_channels))
            with v1.variable_scope("causal_layer"):
                mk("wavenet/causal_layer/filter", (fw, Q, R))
            with v1.variable_scope("dilated_stack"):
                for i in range(cfg.num_layers):
                    with v1.variable_scope(f"layer{i}"):
                        p = f"wavenet/dilated_stack/layer{i}"
                        mk(f"{p}/filter", (fw, R, D))
                        mk(f"{p}/gate", (fw, R, D))
                        mk(f"{p}/dense", (1, D, R))
                        mk(f"{p}/skip", (1, D, S))
                        mk(f"{p}/gc_filtweights", (1, cfg.gc_channels, D))
                        mk(f"{p}/gc_gateweights", (1, cfg.gc_channels, D))
                        mk(f"{p}/filter_bias", (D,))
                        mk(f"{p}/gate_bias", (D,))
                        mk(f"{p}/dense_bias", (R,))
                        mk(f"{p}/skip_bias", (S,))
            with v1.variable_scope("postprocessing"):
                mk("wavenet/postprocessing/postprocess1", (1, S, S))
                mk("wavenet/postprocessing/postprocess2", (1, S, Q))
                mk("wavenet/postprocessing/postprocess1_bias", (S,))
                mk("wavenet/postprocessing/postprocess2_bias", (Q,))
        saver = v1.train.Saver()
        with v1.Session(graph=graph) as sess:
            sess.run(v1.global_variables_initializer())
            saver.save(sess, path)
    return values


def test_import_reproduces_forward(tmp_path, rng):
    cfg = small_cfg()
    ckpt = str(tmp_path / "model.ckpt-123")
    values = write_tf1_checkpoint(ckpt, cfg, rng)

    params = import_tf1_checkpoint(ckpt, cfg)

    # Spot-check the stacking matches the per-layer TF variables.
    np.testing.assert_array_equal(
        params["filter"][1],
        values["wavenet/dilated_stack/layer1/filter"])
    np.testing.assert_array_equal(
        params["dense"][2],
        values["wavenet/dilated_stack/layer2/dense"][0])
    np.testing.assert_array_equal(
        params["gc_embedding"],
        values["wavenet/embeddings/gc_embedding"])

    # The imported pytree must drive the model (shapes validated inside).
    pj = {k: jnp.asarray(v) for k, v in params.items()}
    codes = jnp.asarray(rng.randint(0, cfg.quantization_channels, (2, 20)))
    gc_emb = embed_gc(pj, cfg, jnp.asarray([0, 4]))
    out = forward(pj, cfg, one_hot(codes, cfg.quantization_channels), gc_emb)
    assert out.shape == (2, 20, cfg.quantization_channels)
    assert np.isfinite(np.asarray(out)).all()


def test_import_rejects_wrong_config(tmp_path, rng):
    cfg = small_cfg()
    ckpt = str(tmp_path / "model.ckpt-1")
    write_tf1_checkpoint(ckpt, cfg, rng)
    import dataclasses
    wrong = dataclasses.replace(cfg, residual_channels=8)
    with pytest.raises(TF1ImportError, match="shape mismatch|missing"):
        import_tf1_checkpoint(ckpt, wrong)
