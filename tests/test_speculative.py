"""Speculative decoding correctness (wavenet_tpu/speculative.py).

The load-bearing claims: (1) emitted samples are EXACTLY
target-distributed (modified rejection sampling), (2) the committed
ring states equal teacher-forcing the emitted stream, (3) draft==target
accepts everything.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavenet_tpu.models.config import WaveNetConfig
from wavenet_tpu.models.wavenet import forward_codes, init_params
from wavenet_tpu.sample import generate, prime_state, init_sampler_state
from wavenet_tpu.speculative import _speculative_loop, generate_speculative


def target_config(**kw):
    d = dict(dilations=(1, 2, 4, 8), residual_channels=4,
             dilation_channels=4, skip_channels=8,
             quantization_channels=16, use_biases=True)
    d.update(kw)
    return WaveNetConfig(**d)


def draft_config():
    return target_config(dilations=(1, 2), residual_channels=4,
                         dilation_channels=4, skip_channels=8)


def seed_for(cfg, rng):
    return jnp.asarray(rng.randint(0, cfg.quantization_channels,
                                   (1, cfg.receptive_field)))


def test_draft_equals_target_accepts_everything(rng):
    cfg = target_config()
    params = init_params(jax.random.PRNGKey(0), cfg)
    seed = seed_for(cfg, rng)
    codes, (n_seg, n_acc, n_out) = generate_speculative(
        params, cfg, params, cfg, n_samples=40, key=jax.random.PRNGKey(3),
        k=5, seed_codes=seed, return_stats=True)
    codes = np.asarray(codes)
    assert codes.shape == (1, 40)
    assert codes.min() >= 0 and codes.max() < cfg.quantization_channels
    # p_t == p_d => acceptance probability 1 for every proposal.
    assert n_acc == n_seg * 5
    assert n_out >= 40
    # Deterministic per key.
    codes2 = np.asarray(generate_speculative(
        params, cfg, params, cfg, n_samples=40, key=jax.random.PRNGKey(3),
        k=5, seed_codes=seed))
    np.testing.assert_array_equal(codes, codes2)


def test_committed_state_equals_teacher_forcing(rng):
    """After a speculative run, the target's ring state must equal
    teacher-forcing [seed, emitted] through the sequential oracle."""
    from wavenet_tpu.models.wavenet import embed_gc
    from wavenet_tpu.sample import prefill_state

    cfg = target_config()
    dcfg = draft_config()
    params = init_params(jax.random.PRNGKey(0), cfg)
    dparams = init_params(jax.random.PRNGKey(5), dcfg)
    seed = seed_for(cfg, rng)
    n = 23

    t0 = prefill_state(params, cfg, seed[:, :-1])
    d0 = prefill_state(dparams, dcfg, seed[:, :-1])
    codes, t_st, d_st, _, stats = _speculative_loop(
        params, cfg, dparams, dcfg, t0, d0,
        seed[:, -1].astype(jnp.int32), jax.random.PRNGKey(7),
        n, 4, 1.0, None, None)
    emitted = np.asarray(codes)[0]
    n_out = int(stats[2])

    # The loop consumed seed + the emitted stream UP TO (not including)
    # the last overall sample (which becomes the next segment's input).
    full = np.concatenate([np.asarray(seed)[0], emitted[:n_out]])
    consumed = int(t_st.t)
    assert consumed == seed.shape[1] - 1 + n_out
    stream = jnp.asarray(full[:consumed])[None, :]
    ref = prime_state(params, cfg, init_sampler_state(cfg, 1), stream)
    np.testing.assert_allclose(np.asarray(t_st.layer_bufs),
                               np.asarray(ref.layer_bufs),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(t_st.causal_buf),
                               np.asarray(ref.causal_buf),
                               rtol=1e-5, atol=1e-6)
    ref_d = prime_state(dparams, dcfg, init_sampler_state(dcfg, 1), stream)
    np.testing.assert_allclose(np.asarray(d_st.layer_bufs),
                               np.asarray(ref_d.layer_bufs),
                               rtol=1e-4, atol=1e-6)


def test_first_sample_distribution_is_target(rng):
    """Chi-level check of the speculative theorem: the marginal of the
    first emitted sample equals the target's softmax — independent of
    the (different) draft."""
    cfg = target_config()
    dcfg = draft_config()
    params = init_params(jax.random.PRNGKey(1), cfg)
    dparams = init_params(jax.random.PRNGKey(6), dcfg)
    seed = seed_for(cfg, rng)
    Q = cfg.quantization_channels

    logits = forward_codes(params, cfg, seed)
    p_t = np.asarray(jax.nn.softmax(logits[0, -1]))

    N = 1200
    counts = np.zeros(Q)
    for i in range(N):
        c = generate_speculative(params, cfg, dparams, dcfg, n_samples=1,
                                 key=jax.random.PRNGKey(100 + i), k=3,
                                 seed_codes=seed)
        counts[int(np.asarray(c)[0, 0])] += 1
    emp = counts / N
    tv = 0.5 * np.abs(emp - p_t).sum()
    # TV of a 16-cell multinomial at N=1200 concentrates well under 0.1;
    # a wrong acceptance/residual formula shifts whole modes (TV >> 0.1).
    assert tv < 0.1, (tv, emp, p_t)


def test_temperature_and_gc(rng):
    cfg = target_config(gc_channels=4, gc_cardinality=4)
    dcfg = target_config(dilations=(1, 2), gc_channels=4, gc_cardinality=4)
    params = init_params(jax.random.PRNGKey(2), cfg)
    dparams = init_params(jax.random.PRNGKey(8), dcfg)
    seed = seed_for(cfg, rng)
    codes = generate_speculative(
        params, cfg, dparams, dcfg, n_samples=30,
        key=jax.random.PRNGKey(4), k=4, temperature=0.8,
        gc_ids=jnp.asarray([2]), draft_gc_ids=jnp.asarray([2]),
        seed_codes=seed)
    codes = np.asarray(codes)
    assert codes.shape == (1, 30)
    assert codes.min() >= 0 and codes.max() < cfg.quantization_channels


def test_batched_lanes_equal_solo_runs(rng):
    """batch_size > 1 = vmapped independent per-stream loops: each lane
    must emit exactly what its solo run emits."""
    cfg = target_config()
    dcfg = draft_config()
    params = init_params(jax.random.PRNGKey(0), cfg)
    dparams = init_params(jax.random.PRNGKey(5), dcfg)
    B, n = 3, 15
    seeds = jnp.asarray(rng.randint(0, cfg.quantization_channels,
                                    (B, cfg.receptive_field)))
    key = jax.random.PRNGKey(21)
    batched = np.asarray(generate_speculative(
        params, cfg, dparams, dcfg, n, key, k=4, seed_codes=seeds))
    assert batched.shape == (B, n)
    _, key_gen = jax.random.split(key)
    lane_keys = jax.random.split(key_gen, B)
    for i in range(B):
        # Reproduce lane i's exact stream: single-row seed with the
        # lane's key injected through the same split structure.
        t0 = None
        from wavenet_tpu.sample import prefill_state
        from wavenet_tpu.speculative import _speculative_loop
        st = prefill_state(params, cfg, seeds[i:i + 1, :-1])
        dst = prefill_state(dparams, dcfg, seeds[i:i + 1, :-1])
        solo, _, _, _, _ = _speculative_loop(
            params, cfg, dparams, dcfg, st, dst,
            seeds[i:i + 1, -1].astype(jnp.int32), lane_keys[i],
            n, 4, 1.0, None, None)
        np.testing.assert_array_equal(batched[i],
                                      np.asarray(solo)[0, :n])


def test_cli_save_every_batch_conflict(tmp_path):
    from wavenet_tpu.cli.generate import main as gen_main
    with pytest.raises(ValueError, match="batch size 1"):
        gen_main(["/nonexistent", "--draft_checkpoint=/nonexistent",
                  "--save_every=10", "--samples=20", "--batch_size=2",
                  f"--wavenet_params={_tiny_params_json(tmp_path)}"])


def test_resumable_segments_prefix_equals_one_run(rng):
    """Segmented speculative generation is a prefix of the single run
    (same per-segment PRNG fold), and the carry chains states."""
    cfg = target_config()
    params = init_params(jax.random.PRNGKey(0), cfg)
    seed = seed_for(cfg, rng)
    key = jax.random.PRNGKey(13)

    one = np.asarray(generate_speculative(
        params, cfg, params, cfg, 30, key, k=4, seed_codes=seed))
    a_full, carry = generate_speculative(
        params, cfg, params, cfg, 10, key, k=4, seed_codes=seed,
        return_carry=True)
    a_full = np.asarray(a_full)
    assert a_full.shape[1] >= 10
    n_cmp = min(a_full.shape[1], 30)
    np.testing.assert_array_equal(a_full[0, :n_cmp], one[0, :n_cmp])

    b_full, carry2 = generate_speculative(
        params, cfg, params, cfg, 8, jax.random.PRNGKey(14), k=4,
        carry=carry, return_carry=True)
    assert np.asarray(b_full).shape[1] >= 8
    assert int(carry2.t_state.t) == int(carry.t_state.t) + \
        np.asarray(b_full).shape[1]


def _tiny_params_json(tmp_path):
    import json
    pj = dict(filter_width=2, sample_rate=2000, dilations=[1, 2],
              residual_channels=4, dilation_channels=4, skip_channels=8,
              quantization_channels=16, use_biases=True,
              scalar_input=False, initial_filter_width=2)
    p = tmp_path / "p.json"
    p.write_text(json.dumps(pj))
    return p


def test_distill_draft_mechanics(rng):
    """distill_draft trains a working draft on target samples: loss
    drops well below uniform and the result drives speculative decoding
    end to end. (No acceptance-rate assertion — with overfit toy models
    acceptance is chaotic; see the module docstrings.)"""
    from wavenet_tpu.distill import distill_draft

    cfg = target_config()
    dcfg = draft_config()
    params = init_params(jax.random.PRNGKey(0), cfg)
    seed = seed_for(cfg, rng)
    dparams, loss = distill_draft(params, cfg, dcfg,
                                  jax.random.PRNGKey(4), n_clips=2,
                                  clip_samples=120, steps=40,
                                  seed_codes=seed)
    assert np.isfinite(loss)
    assert loss < np.log(cfg.quantization_channels)  # below uniform
    codes = generate_speculative(params, cfg, dparams, dcfg,
                                 n_samples=12, key=jax.random.PRNGKey(5),
                                 k=3, seed_codes=seed)
    assert np.asarray(codes).shape == (1, 12)


def test_scalar_input_rejected():
    cfg = target_config(scalar_input=True, initial_filter_width=2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    with pytest.raises(NotImplementedError):
        generate_speculative(params, cfg, params, cfg, n_samples=4,
                             key=jax.random.PRNGKey(0))


def test_cli_speculative_flag(tmp_path):
    """generate.py --draft_checkpoint runs the speculative path and
    writes a wav (draft == target here)."""
    import json

    from wavenet_tpu.cli.generate import main as gen_main
    from wavenet_tpu.train_lib import (
        create_train_state, make_optimizer, save_checkpoint)

    pj = dict(filter_width=2, sample_rate=2000,
              dilations=[1, 2, 4], residual_channels=4,
              dilation_channels=4, skip_channels=8,
              quantization_channels=16, use_biases=True,
              scalar_input=False, initial_filter_width=2)
    pfile = tmp_path / "params.json"
    pfile.write_text(json.dumps(pj))

    cfg = WaveNetConfig.from_json(pj)
    state = create_train_state(jax.random.PRNGKey(0), cfg,
                               make_optimizer("adam", 1e-3))
    ckpt = str(tmp_path / "ckpts")
    save_checkpoint(ckpt, state)

    out = tmp_path / "out.wav"
    rc = gen_main([ckpt, f"--wavenet_params={pfile}", "--samples=12",
                   f"--wav_out_path={out}", "--seed=1",
                   f"--draft_checkpoint={ckpt}", "--speculative_k=3"])
    assert rc == 0
    assert out.exists() and out.stat().st_size == 44 + 2 * 12

    # --save_every: resumable segments, same artifact contract.
    out2 = tmp_path / "out2.wav"
    rc = gen_main([ckpt, f"--wavenet_params={pfile}", "--samples=14",
                   f"--wav_out_path={out2}", "--seed=1", "--save_every=6",
                   f"--draft_checkpoint={ckpt}", "--speculative_k=3"])
    assert rc == 0
    assert out2.exists() and out2.stat().st_size == 44 + 2 * 14
