"""Round-4 regression tests: device input prefetch + multi-step dispatch.

The round-3 verdict's item 2: the real CLI ran at ~1/3 of the jit-step
rate because every step paid host-side work (dequeue -> device_put ->
dispatch -> readback) serially through the tunnel. Round 4 overlaps the
transfer (DevicePrefetcher) and amortizes the dispatch round-trip
(make_train_multistep: K steps per compiled program via lax.scan).
These tests pin the semantics: multistep == K single steps bitwise,
stacked sharding layout, CLI step accounting/checkpoints/NaN guard.
"""

import json
import queue
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavenet_tpu.models.config import WaveNetConfig


def small_cfg(**kw):
    base = dict(dilations=(1, 2, 4), residual_channels=4,
                dilation_channels=4, skip_channels=8,
                quantization_channels=32, sample_rate=2000)
    base.update(kw)
    return WaveNetConfig(**base)


# -- DevicePrefetcher --------------------------------------------------------

def test_prefetcher_order_and_shutdown():
    from wavenet_tpu.data.prefetch import DevicePrefetcher

    counter = iter(range(100))
    pf = DevicePrefetcher(lambda: next(counter), depth=2)
    got = [pf.get(timeout=5) for _ in range(10)]
    assert got == list(range(10))
    pf.stop()
    # Worker is gone: no new items get produced after stop.
    time.sleep(0.2)
    assert not pf._thread.is_alive()


def test_prefetcher_propagates_fill_errors():
    from wavenet_tpu.data.prefetch import DevicePrefetcher

    state = {"n": 0}

    def fill():
        state["n"] += 1
        if state["n"] >= 3:
            raise RuntimeError("reader died")
        return state["n"]

    pf = DevicePrefetcher(fill, depth=1)
    assert pf.get(timeout=5) == 1
    assert pf.get(timeout=5) == 2
    with pytest.raises(RuntimeError, match="reader died"):
        pf.get(timeout=5)
    pf.stop()


def test_prefetcher_rejects_bad_depth():
    from wavenet_tpu.data.prefetch import DevicePrefetcher
    with pytest.raises(ValueError):
        DevicePrefetcher(lambda: 1, depth=0)


# -- make_train_multistep == K single steps ----------------------------------

def _batches(cfg, k, b=4, t=None, seed=0):
    rng = np.random.default_rng(seed)
    t = t or (cfg.receptive_field + 64)
    return rng.standard_normal((k, b, t)).astype(np.float32) * 0.1


@pytest.mark.parametrize("with_gc", [False, True])
def test_multistep_matches_k_single_steps(with_gc):
    from wavenet_tpu.train_lib import (create_train_state, make_optimizer,
                                       make_train_multistep, make_train_step)

    cfg = small_cfg(gc_channels=4 if with_gc else None,
                    gc_cardinality=3 if with_gc else None)
    opt = make_optimizer("adam", 1e-3)
    k, b = 3, 4
    audio = _batches(cfg, k, b)
    gc = (np.arange(k * b, dtype=np.int32).reshape(k, b) % 3
          if with_gc else None)

    s1 = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    step1 = make_train_step(cfg, opt)
    losses1 = []
    for i in range(k):
        s1, m = step1(s1, audio[i], gc[i] if with_gc else None)
        losses1.append(float(m["loss"]))

    s2 = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    multi = make_train_multistep(cfg, opt, steps_per_dispatch=k)
    s2, m2 = multi(s2, audio, gc)

    np.testing.assert_allclose(np.asarray(m2["loss"]), losses1, rtol=1e-6)
    assert int(jax.device_get(s2.step)) == int(jax.device_get(s1.step)) == k
    jax.tree.map(
        lambda a_, b_: np.testing.assert_allclose(
            np.asarray(a_), np.asarray(b_), rtol=1e-5, atol=1e-6),
        s1.params, s2.params)


def test_multistep_l2_metrics_stacked():
    from wavenet_tpu.train_lib import (create_train_state, make_optimizer,
                                       make_train_multistep)

    cfg = small_cfg()
    opt = make_optimizer("adam", 1e-3)
    s = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    multi = make_train_multistep(cfg, opt, l2_regularization_strength=1e-3,
                                 steps_per_dispatch=2)
    s, m = multi(s, _batches(cfg, 2))
    assert m["loss"].shape == (2,)
    assert m["l2_loss"].shape == (2,)
    assert m["grad_norm"].shape == (2,)


# -- stacked shard_batch layout ----------------------------------------------

def test_shard_batch_stacked_shards_axis1():
    from wavenet_tpu.parallel.sharding import make_mesh, shard_batch

    mesh = make_mesh()  # conftest: 8 virtual CPU devices -> (8, 1)
    k, b, t = 3, 16, 64
    audio = np.zeros((k, b, t), np.float32)
    gc = np.zeros((k, b), np.int32)
    lc = np.zeros((k, b, t, 5), np.float32)
    a, g, l = shard_batch(audio, mesh, gc, lc, stacked=True)
    ndev = mesh.devices.size
    assert a.sharding.shard_shape(a.shape) == (k, b // ndev, t)
    assert g.sharding.shard_shape(g.shape) == (k, b // ndev)
    assert l.sharding.shard_shape(l.shape) == (k, b // ndev, t, 5)


# -- CLI end to end with steps_per_dispatch + prefetch ------------------------

def _make_corpus(tmp_path, cfg, seconds=2.0, n=2):
    from wavenet_tpu.audio import write_wav
    data = tmp_path / "corpus"
    data.mkdir(exist_ok=True)
    sr = cfg.sample_rate
    t = np.arange(int(seconds * sr)) / sr
    for i in range(n):
        write_wav(str(data / f"u{i}.wav"),
                  (0.5 * np.sin(2 * np.pi * (100 + 40 * i) * t))
                  .astype(np.float32), sr)
    return data


def test_train_cli_multistep_with_remainder(tmp_path, capsys):
    """--steps_per_dispatch 2, --num_steps 5: per-step loss lines 1..5,
    checkpoints land on dispatch boundaries, final checkpoint == step 5
    (the remainder step runs the single-step program)."""
    from wavenet_tpu.cli.train import main as train_main
    from wavenet_tpu.train_lib import latest_checkpoint_step

    cfg = small_cfg()
    pfile = tmp_path / "params.json"
    pfile.write_text(json.dumps(cfg.to_json_dict()))
    data = _make_corpus(tmp_path, cfg)
    logdir = str(tmp_path / "logdir")

    rc = train_main([
        "--data_dir", str(data), "--logdir", logdir,
        "--wavenet_params", str(pfile),
        "--batch_size", "8", "--num_steps", "5",
        "--checkpoint_every", "2", "--sample_size", "256",
        "--silence_threshold", "0", "--steps_per_dispatch", "2",
        "--prefetch_depth", "2", "--compilation_cache", ""])
    assert rc == 0
    out = capsys.readouterr().out
    for s in range(1, 6):
        assert f"step {s} - loss = " in out, out
    assert latest_checkpoint_step(logdir) == 5


def test_train_cli_multistep_nan_guard(tmp_path, monkeypatch):
    """A NaN inside a K-step dispatch stops WITHOUT saving poisoned state."""
    import wavenet_tpu.train_lib as tl
    from wavenet_tpu.cli.train import main as train_main
    from wavenet_tpu.train_lib import latest_checkpoint_step

    cfg = small_cfg()
    pfile = tmp_path / "params.json"
    pfile.write_text(json.dumps(cfg.to_json_dict()))
    data = _make_corpus(tmp_path, cfg)

    real = tl.make_train_multistep

    def poison_second_dispatch(config, optimizer, l2, **kw):
        step_fn = real(config, optimizer, l2, **kw)

        def wrapped(state, audio, gc_ids=None, lc=None):
            new_state, metrics = step_fn(state, audio, gc_ids, lc)
            if int(jax.device_get(new_state.step)) >= 4:
                metrics = dict(metrics)
                loss = np.asarray(metrics["loss"]).copy()
                loss[-1] = np.nan  # poisoned substep inside the dispatch
                metrics["loss"] = jnp.asarray(loss)
            return new_state, metrics
        return wrapped

    monkeypatch.setattr(tl, "make_train_multistep", poison_second_dispatch)

    logdir = str(tmp_path / "logdir")
    rc = train_main([
        "--data_dir", str(data), "--logdir", logdir,
        "--wavenet_params", str(pfile),
        "--batch_size", "8", "--num_steps", "10",
        "--checkpoint_every", "100", "--sample_size", "256",
        "--silence_threshold", "0", "--steps_per_dispatch", "2",
        "--compilation_cache", ""])
    assert rc == 0
    assert latest_checkpoint_step(logdir) is None


def test_train_cli_prefetch_matches_inline(tmp_path):
    """Same seed, same steps: prefetch on vs off reaches identical params
    (the prefetcher reorders WORK, not data)."""
    from wavenet_tpu.cli.train import main as train_main
    from wavenet_tpu.models.wavenet import init_params
    from wavenet_tpu.train_lib import (create_train_state, make_optimizer,
                                       restore_params_only)

    cfg = small_cfg()
    pfile = tmp_path / "params.json"
    pfile.write_text(json.dumps(cfg.to_json_dict()))
    data = _make_corpus(tmp_path, cfg)

    outs = []
    for tag, depth in [("off", "0"), ("on", "2")]:
        logdir = str(tmp_path / f"logdir_{tag}")
        rc = train_main([
            "--data_dir", str(data), "--logdir", logdir,
            "--wavenet_params", str(pfile), "--seed", "11",
            "--batch_size", "8", "--num_steps", "3",
            "--checkpoint_every", "100", "--sample_size", "256",
            "--silence_threshold", "0", "--prefetch_depth", depth,
            "--compilation_cache", ""])
        assert rc == 0
        template = init_params(jax.random.PRNGKey(11), cfg)
        outs.append(restore_params_only(logdir, template))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), outs[0], outs[1])


# -- async checkpointing -------------------------------------------------------

def test_async_save_roundtrip_and_prune(tmp_path):
    from wavenet_tpu.train_lib import (create_train_state, latest_checkpoint_step,
                                       make_optimizer, restore_checkpoint,
                                       save_checkpoint, wait_for_checkpoints)

    cfg = small_cfg()
    opt = make_optimizer("adam", 1e-3)
    state = create_train_state(jax.random.PRNGKey(3), cfg, opt)
    root = str(tmp_path / "ckpts")
    for s in (1, 2, 3, 4):
        state = state.__class__(step=jnp.asarray(s, jnp.int32),
                                params=state.params,
                                opt_state=state.opt_state)
        save_checkpoint(root, state, max_to_keep=2, use_async=True)
    wait_for_checkpoints()
    # Prune runs before the in-flight save finalizes, so up to
    # max_to_keep+1 finalized checkpoints may exist; the newest is 4.
    assert latest_checkpoint_step(root) == 4
    import os
    kept = sorted(d for d in os.listdir(root) if d.startswith("ckpt-"))
    assert len(kept) <= 3 and "ckpt-1" not in kept
    restored = restore_checkpoint(root, state)
    assert int(jax.device_get(restored.step)) == 4
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), restored.params, state.params)


def test_partial_async_tmp_dir_never_corrupts_latest(tmp_path):
    """A kill mid-async-save leaves an orbax tmp dir; it must be invisible
    to latest_checkpoint_step/restore and to pruning."""
    import os

    from wavenet_tpu.train_lib import (create_train_state, latest_checkpoint_step,
                                       make_optimizer, restore_checkpoint,
                                       save_checkpoint, wait_for_checkpoints)

    cfg = small_cfg()
    opt = make_optimizer("adam", 1e-3)
    state = create_train_state(jax.random.PRNGKey(3), cfg, opt)
    root = tmp_path / "ckpts"
    state = state.__class__(step=jnp.asarray(7, jnp.int32),
                            params=state.params, opt_state=state.opt_state)
    save_checkpoint(str(root), state, use_async=True)
    wait_for_checkpoints()
    # Simulate a kill mid-save of step 8: orbax tmp dir, never finalized.
    fake = root / "ckpt-8.orbax-checkpoint-tmp-1234"
    fake.mkdir()
    (fake / "garbage").write_text("partial write")
    assert latest_checkpoint_step(str(root)) == 7
    restored = restore_checkpoint(str(root), state)
    assert int(jax.device_get(restored.step)) == 7
    # Pruning with max_to_keep=1 keeps ckpt-7 (tmp dir doesn't count).
    save_checkpoint(str(root), restored, max_to_keep=1, use_async=True)
    wait_for_checkpoints()
    assert latest_checkpoint_step(str(root)) == 7


def test_prefetcher_max_items_never_overconsumes():
    """The worker produces EXACTLY max_items batches: a worker mid-fill
    at stop() time must not steal reader batches that belong to the
    inline remainder steps (the prefetch-on/off bitwise parity above
    was a scheduler race without this bound)."""
    import threading
    import time
    from wavenet_tpu.data.prefetch import DevicePrefetcher

    calls = []
    lock = threading.Lock()

    def fill():
        with lock:
            calls.append(len(calls))
        return calls[-1]

    pf = DevicePrefetcher(fill, depth=2, max_items=3)
    got = [pf.get(timeout=5) for _ in range(3)]
    assert got == [0, 1, 2]
    # Give a buggy worker every chance to run one more fill().
    time.sleep(0.3)
    assert len(calls) == 3
    pf.stop()
    assert len(calls) == 3
