"""CLI plumbing tests: flag parsing, logdir rules, checkpoint roundtrip."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavenet_tpu.cli.train import get_arguments, validate_directories
from wavenet_tpu.models.config import WaveNetConfig
from wavenet_tpu.train_lib import (
    create_train_state, latest_checkpoint_step, make_optimizer,
    make_train_step, restore_checkpoint, restore_params_only,
    save_checkpoint)


def test_default_flags_match_reference():
    args = get_arguments([])
    assert args.batch_size == 1
    assert args.checkpoint_every == 50
    assert args.num_steps == int(1e5)
    assert args.learning_rate == 1e-3
    assert args.sample_size == 100000
    assert args.optimizer == "adam"
    assert args.momentum == 0.9
    assert args.max_checkpoints == 5


def test_logdir_mutual_exclusion_rules():
    # --logdir with --logdir_root is an error (reference ≈:180).
    args = get_arguments(["--logdir", "a", "--logdir_root", "b"])
    with pytest.raises(ValueError, match="cannot be specified"):
        validate_directories(args)
    # --logdir with --restore_from is an error.
    args = get_arguments(["--logdir", "a", "--restore_from", "c"])
    with pytest.raises(ValueError, match="cannot be specified"):
        validate_directories(args)
    # --logdir alone: restore defaults to logdir (continue training).
    args = get_arguments(["--logdir", "a"])
    d = validate_directories(args)
    assert d["logdir"] == "a" and d["restore_from"] == "a"
    # --logdir_root alone: dated default logdir beneath it.
    args = get_arguments(["--logdir_root", "root"])
    d = validate_directories(args)
    assert d["logdir"].startswith(os.path.join("root", "train"))


def test_config_from_json_roundtrip(tmp_path):
    cfg = WaveNetConfig(dilations=(1, 2, 4), residual_channels=8,
                        skip_channels=16)
    path = tmp_path / "params.json"
    path.write_text(json.dumps(cfg.to_json_dict()))
    loaded = WaveNetConfig.from_json(str(path))
    assert loaded == cfg
    # Overrides (how the CLI injects gc flags).
    with_gc = WaveNetConfig.from_json(str(path), gc_channels=4,
                                      gc_cardinality=7)
    assert with_gc.gc_channels == 4 and with_gc.gc_cardinality == 7
    # Unknown keys ignored.
    path.write_text(json.dumps({**cfg.to_json_dict(), "mystery": 1}))
    assert WaveNetConfig.from_json(str(path)) == cfg


def test_checkpoint_save_restore_roundtrip(tmp_path, rng):
    cfg = WaveNetConfig(dilations=(1, 2), residual_channels=4,
                        dilation_channels=4, skip_channels=8,
                        quantization_channels=16)
    opt = make_optimizer("adam", 1e-3)
    state = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    step_fn = make_train_step(cfg, opt, None)
    audio = jnp.asarray(rng.uniform(-1, 1, (1, cfg.receptive_field + 20))
                        .astype(np.float32))
    for _ in range(3):
        state, _ = step_fn(state, audio)

    d = str(tmp_path / "ckpts")
    save_checkpoint(d, state)
    assert latest_checkpoint_step(d) == 3

    fresh = create_train_state(jax.random.PRNGKey(1), cfg, opt)
    restored = restore_checkpoint(d, fresh)
    assert int(jax.device_get(restored.step)) == 3
    for k in state.params:
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(restored.params[k])),
            np.asarray(jax.device_get(state.params[k])), err_msg=k)

    # Continuing training from the restored state works and advances step.
    restored2, _ = step_fn(restored, audio)
    assert int(jax.device_get(restored2.step)) == 4

    # Params-only restore (generation path).
    params = restore_params_only(d, fresh.params)
    np.testing.assert_array_equal(
        np.asarray(params["postprocess2"]),
        np.asarray(jax.device_get(state.params["postprocess2"])))


def test_restore_missing_returns_none(tmp_path):
    cfg = WaveNetConfig(dilations=(1,), residual_channels=2,
                        dilation_channels=2, skip_channels=2,
                        quantization_channels=8)
    opt = make_optimizer("adam", 1e-3)
    state = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    assert restore_checkpoint(str(tmp_path / "none"), state) is None
    assert restore_params_only(str(tmp_path / "none"), state.params) is None
