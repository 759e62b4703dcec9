"""Import TF1 reference checkpoints into this framework's param pytree.

A user of the reference has trained models saved by ``tf.train.Saver`` as
``model.ckpt-STEP`` files with variables scoped (reference
wavenet/model.py ``_create_variables`` ≈:130-260, all under
``tf.variable_scope('wavenet')``):

    wavenet/causal_layer/filter
    wavenet/dilated_stack/layer{i}/{filter,gate,dense,skip}
    wavenet/dilated_stack/layer{i}/{gc_gateweights,gc_filtweights}
    wavenet/dilated_stack/layer{i}/{filter,gate,dense,skip}_bias
    wavenet/postprocessing/postprocess{1,2}[_bias]
    wavenet/embeddings/gc_embedding

This module reads such a checkpoint with TensorFlow's checkpoint reader
(TF is an optional dependency here — only this import path needs it),
stacks the per-layer variables onto the leading layer axis of our pytree,
and returns params ready for generation/fine-tuning. Matching is
performed on the variable-name TAILS (scope prefixes and optimizer slot
variables like ``.../Adam`` are ignored), so renamed outer scopes and
checkpoints from either the fork or upstream load identically.

CLI:  python -m wavenet_tpu.compat.tf1_import \
          --tf1_checkpoint model.ckpt-9999 --wavenet_params params.json \
          --out_dir ./converted [--gc_channels 32 --gc_cardinality 109]
"""

from __future__ import annotations

import re
from typing import Dict, Optional

import numpy as np

from wavenet_tpu.models.config import WaveNetConfig


class TF1ImportError(RuntimeError):
    pass


def _read_tf1_variables(path: str) -> Dict[str, np.ndarray]:
    try:
        from tensorflow.python.training import py_checkpoint_reader
        reader = py_checkpoint_reader.NewCheckpointReader(path)
    except Exception as e:  # pragma: no cover - TF missing
        raise TF1ImportError(
            f"Could not open TF checkpoint '{path}' (TensorFlow required "
            f"for TF1 import): {e}")
    out = {}
    for name in reader.get_variable_to_shape_map():
        # Skip optimizer slots (Adam/Momentum/RMSProp accumulators).
        if re.search(r"/(Adam|Adam_1|Momentum|RMSProp|RMSProp_1)$", name):
            continue
        out[name] = reader.get_tensor(name)
    return out


def _find(variables: Dict[str, np.ndarray], tail: str,
          required: bool = True) -> Optional[np.ndarray]:
    """Match a variable by name tail, ignoring outer scope prefixes."""
    matches = [v for k, v in variables.items()
               if k == tail or k.endswith("/" + tail)]
    if len(matches) > 1:
        raise TF1ImportError(f"ambiguous checkpoint variable tail '{tail}'")
    if not matches:
        if required:
            available = "\n  ".join(sorted(variables)[:40])
            raise TF1ImportError(
                f"missing checkpoint variable '{tail}'. Available:\n  "
                f"{available}")
        return None
    return matches[0]


def import_tf1_checkpoint(path: str, config: WaveNetConfig) -> dict:
    """TF1 reference checkpoint -> this framework's param pytree."""
    c = config
    v = _read_tf1_variables(path)
    L = c.num_layers
    params = {}

    params["causal_filter"] = _find(v, "causal_layer/filter")

    def stack(tail_fmt, required=True):
        rows = []
        for i in range(L):
            rows.append(_find(v, tail_fmt.format(i), required))
        if rows[0] is None:
            return None
        return np.stack(rows)

    params["filter"] = stack("dilated_stack/layer{}/filter")
    params["gate"] = stack("dilated_stack/layer{}/gate")
    # 1x1 convs are stored [1, in, out] by the reference; ours are [in, out].
    params["dense"] = stack("dilated_stack/layer{}/dense")[:, 0]
    params["skip"] = stack("dilated_stack/layer{}/skip")[:, 0]
    params["postprocess1"] = _find(v, "postprocessing/postprocess1")[0]
    params["postprocess2"] = _find(v, "postprocessing/postprocess2")[0]

    if c.use_biases:
        params["filter_bias"] = stack("dilated_stack/layer{}/filter_bias")
        params["gate_bias"] = stack("dilated_stack/layer{}/gate_bias")
        params["dense_bias"] = stack("dilated_stack/layer{}/dense_bias")
        params["skip_bias"] = stack("dilated_stack/layer{}/skip_bias")
        params["postprocess1_bias"] = _find(
            v, "postprocessing/postprocess1_bias")
        params["postprocess2_bias"] = _find(
            v, "postprocessing/postprocess2_bias")

    if c.gc_enabled:
        params["gc_embedding"] = _find(v, "embeddings/gc_embedding")
        params["gc_filter"] = stack(
            "dilated_stack/layer{}/gc_filtweights")[:, 0]
        params["gc_gate"] = stack(
            "dilated_stack/layer{}/gc_gateweights")[:, 0]

    # Shape validation against a freshly initialized pytree.
    import jax
    from wavenet_tpu.models.wavenet import init_params
    template = init_params(jax.random.PRNGKey(0), c)
    for k, t in template.items():
        got = np.asarray(params[k])
        if tuple(got.shape) != tuple(t.shape):
            raise TF1ImportError(
                f"shape mismatch for '{k}': checkpoint {got.shape} vs "
                f"config {tuple(t.shape)} — wrong wavenet_params.json?")
        params[k] = np.asarray(got, dtype=np.float32)
    return params


def main(argv=None):
    import argparse
    import json

    ap = argparse.ArgumentParser(
        description="Convert a TF1 reference checkpoint to this framework")
    ap.add_argument("--tf1_checkpoint", required=True,
                    help="Path prefix of the TF1 ckpt (model.ckpt-STEP)")
    ap.add_argument("--wavenet_params", required=True)
    ap.add_argument("--out_dir", required=True,
                    help="Destination directory (orbax ckpt-0 inside)")
    ap.add_argument("--gc_channels", type=int, default=None)
    ap.add_argument("--gc_cardinality", type=int, default=None)
    args = ap.parse_args(argv)

    with open(args.wavenet_params) as f:
        raw = json.load(f)
    config = WaveNetConfig.from_json(raw, gc_channels=args.gc_channels,
                                     gc_cardinality=args.gc_cardinality)
    params = import_tf1_checkpoint(args.tf1_checkpoint, config)

    import jax.numpy as jnp
    import optax
    from wavenet_tpu.train_lib import TrainState, save_checkpoint

    # Fresh optimizer state: converted checkpoints restart optimization.
    opt = optax.adam(1e-3, eps=1e-4)
    pj = {k: jnp.asarray(v) for k, v in params.items()}
    state = TrainState(step=jnp.zeros((), jnp.int32), params=pj,
                       opt_state=opt.init(pj))
    save_checkpoint(args.out_dir, state)
    n = sum(int(np.prod(p.shape)) for p in params.values())
    print(f"Imported {len(params)} tensors ({n/1e6:.2f}M params) -> "
          f"{args.out_dir}/ckpt-0")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
