"""The reference's FAST-GENERATION path, rebuilt to be measured.

The reference generates audio by building an incremental graph once —
per-layer ``tf.FIFOQueue``s hold past residual activations; every conv
collapses to two matmuls — and then running ONE ``session.run`` PER
SAMPLE from Python (reference: wavenet/model.py ``_create_generator``
≈:505-575, generate.py sampling loop ≈:190-235). That per-sample
Python→runtime round trip is the bottleneck BASELINE's ">=10x" target is
defined against, and round 1 only *estimated* it at 100 samples/s.

This module rebuilds that exact execution model with ``tf.compat.v1``
graph mode + ``tf.queue.FIFOQueue`` so the baseline can be MEASURED on
this machine, and so the queue-machinery logits can be parity-checked
against wavenet_tpu's scan sampler (a second, TF-kernel oracle for the
incremental path — independent of both the jnp code and tf_oracle's
full-conv graphs).

Only filter_width=2, non-scalar input is supported — the same
restriction the reference's ``predict_proba_incremental`` enforces
(model.py ≈:652).
"""

from __future__ import annotations

import time

import numpy as np


def _tf():
    import tensorflow as tf
    return tf


def _np_params(params):
    return {k: np.asarray(v, np.float32) for k, v in params.items()}


class TF1FastGenerator:
    """Queue-based incremental generation graph, one sess.run per sample.

    Graph shape parity with reference ``_create_generator`` (≈:505-575):

    * causal queue: ``FIFOQueue(1, [batch, Q])`` — init enqueues zeros,
      each step dequeues the previous input and pushes the current one;
    * per layer ℓ: ``FIFOQueue(dilation_ℓ, [batch, R])`` — init enqueues
      ``dilation_ℓ`` zero rows; each step dequeues the activation from
      ``dilation_ℓ`` steps ago and pushes the current one;
    * every conv is matmuls: ``state @ W[0] + input @ W[1]``.
    """

    def __init__(self, params, config, batch_size: int = 1, gc_id=None):
        if config.filter_width != 2 or config.scalar_input:
            raise NotImplementedError(
                "TF1 fast path requires filter_width=2, non-scalar input "
                "(reference model.py ≈:652)")
        tf = _tf()
        self.config = config
        self.batch_size = batch_size
        p = _np_params(params)
        c = config
        B, Q, R = batch_size, c.quantization_channels, c.residual_channels

        self.graph = tf.Graph()
        with self.graph.as_default():
            self.sample_ph = tf.compat.v1.placeholder(tf.int32, [B],
                                                      name="samples")
            current_input = tf.one_hot(self.sample_ph, Q, dtype=tf.float32)

            init_ops = []
            push_ops = []

            # Causal layer queue (≈:515).
            q = tf.queue.FIFOQueue(1, dtypes=tf.float32, shapes=[(B, Q)])
            init_ops.append(q.enqueue(tf.zeros((B, Q))))
            state = q.dequeue()
            push_ops.append(q.enqueue(current_input))
            w = p["causal_filter"]  # [2, Q, R]
            current = tf.matmul(state, w[0]) + tf.matmul(current_input, w[1])

            gc_embedding = None
            if gc_id is not None:
                emb = p["gc_embedding"][np.asarray(gc_id, np.int32)]
                gc_embedding = tf.constant(
                    np.broadcast_to(emb, (B, c.gc_channels)).copy())

            skip_sum = None
            for i, dilation in enumerate(c.dilations):
                q = tf.queue.FIFOQueue(dilation, dtypes=tf.float32,
                                       shapes=[(B, R)])
                init_ops.append(q.enqueue_many(tf.zeros((dilation, B, R))))
                state = q.dequeue()
                push_ops.append(q.enqueue(current))

                w_f, w_g = p["filter"][i], p["gate"][i]  # [2, R, D]
                out_f = tf.matmul(state, w_f[0]) + tf.matmul(current, w_f[1])
                out_g = tf.matmul(state, w_g[0]) + tf.matmul(current, w_g[1])
                if gc_embedding is not None:
                    out_f += tf.matmul(gc_embedding, p["gc_filter"][i])
                    out_g += tf.matmul(gc_embedding, p["gc_gate"][i])
                if c.use_biases:
                    out_f += p["filter_bias"][i]
                    out_g += p["gate_bias"][i]
                out = tf.tanh(out_f) * tf.sigmoid(out_g)

                transformed = tf.matmul(out, p["dense"][i])
                skip_c = tf.matmul(out, p["skip"][i])
                if c.use_biases:
                    transformed += p["dense_bias"][i]
                    skip_c += p["skip_bias"][i]
                skip_sum = skip_c if skip_sum is None else skip_sum + skip_c
                current = current + transformed

            h = tf.nn.relu(skip_sum)
            h = tf.matmul(h, p["postprocess1"])
            if c.use_biases:
                h += p["postprocess1_bias"]
            h = tf.nn.relu(h)
            h = tf.matmul(h, p["postprocess2"])
            if c.use_biases:
                h += p["postprocess2_bias"]
            self.logits = h
            self.probs = tf.nn.softmax(h)
            self.init_ops = init_ops
            self.push_ops = push_ops

        self.sess = tf.compat.v1.Session(graph=self.graph)
        self.sess.run(self.init_ops)

    def step(self, sample: np.ndarray) -> np.ndarray:
        """One incremental evaluation: probs for the next sample.

        Exactly the reference's hot loop body (generate.py ≈:190-210):
        a single session.run fetching prediction + all push ops.
        """
        outputs = self.sess.run([self.probs] + self.push_ops,
                                {self.sample_ph: np.atleast_1d(sample)})
        return outputs[0]

    def close(self):
        self.sess.close()


def measure_fast_generation(config, params, n_samples: int = 500,
                            warmup: int = 32, seed: int = 0) -> dict:
    """Measure the reference execution model's samples/s on this machine.

    Replicates generate.py's loop: sess.run per sample, temperature-1
    ``np.random.choice`` on the host, append to the waveform. Returns a
    dict with the measured rate and the run parameters.
    """
    gen = TF1FastGenerator(params, config, batch_size=1)
    rng = np.random.RandomState(seed)
    Q = config.quantization_channels
    sample = np.array([Q // 2], np.int32)
    try:
        for _ in range(warmup):
            probs = gen.step(sample)
            sample = np.array(
                [rng.choice(Q, p=probs[0] / probs[0].sum())], np.int32)
        t0 = time.perf_counter()
        for _ in range(n_samples):
            probs = gen.step(sample)
            sample = np.array(
                [rng.choice(Q, p=probs[0] / probs[0].sum())], np.int32)
        dt = time.perf_counter() - t0
    finally:
        gen.close()
    return {
        "samples_per_s": n_samples / dt,
        "n_samples": n_samples,
        "seconds": dt,
        "config": "paper" if len(config.dilations) == 30 else
                  f"{len(config.dilations)}L",
        "execution_model": "tf.compat.v1 Session, one run per sample, "
                           "FIFOQueue state (reference fast path)",
    }


BASELINE_FILE = "baselines/tf1_fastgen.json"


def measure_and_record(path: str = BASELINE_FILE, reps: int = 3,
                       n_samples: int = 1000) -> dict:
    """Median-of-reps measurement on the paper config; writes ``path``.

    The recorded number is what bench.py divides by for ``vs_baseline`` —
    a measurement of the reference's execution model on THIS machine, not
    the round-1 documented estimate.
    """
    import json
    import os
    import platform

    import jax

    from wavenet_tpu.models.config import paper_config
    from wavenet_tpu.models.wavenet import init_params

    config = paper_config()
    params = init_params(jax.random.PRNGKey(0), config)
    runs = [measure_fast_generation(config, params, n_samples=n_samples)
            for _ in range(reps)]
    rates = sorted(r["samples_per_s"] for r in runs)
    result = {
        "samples_per_s": rates[len(rates) // 2],
        "all_reps": [round(r, 1) for r in rates],
        "n_samples_per_rep": n_samples,
        "config": "paper (30 layers, 32 res / 512 skip, Q=256)",
        "execution_model": runs[0]["execution_model"],
        "machine": platform.node(),
        "platform": platform.platform(),
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    return result


if __name__ == "__main__":
    import json as _json
    import sys

    path = sys.argv[1] if len(sys.argv) > 1 else BASELINE_FILE
    print(_json.dumps(measure_and_record(path)))
