"""Device-side LC upsampling parity (the TPU-native transfer format).

The reader may enqueue LCFrameChunk frame windows instead of upsampled
streams (~0.3% of the host->device bytes); upsample_chunk_jax must then
reconstruct the EXACT stream the host pipeline would have shipped —
including silence-trim offsets, the receptive-field zero pad, chunk
overlap, the final short chunk's zero tail, and frame-edge holds.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.io import wavfile

from wavenet_tpu.data.reader import AudioReader
from wavenet_tpu.lc import (LCFrameChunk, fit_lc_to_length,
                            frame_window_size, upsample_chunk_jax,
                            upsample_lc)


@pytest.mark.parametrize("mode", ["repeat", "linear"])
def test_upsample_chunk_matches_host_chain(mode, rng):
    """Every chunk of a padded/trimmed utterance reconstructs exactly."""
    hop, C, rf, sample_size = 8, 3, 13, 40
    F = 23
    feats = rng.randn(F, C).astype(np.float32)
    n_audio = 171                      # not a hop multiple: tail edge-hold
    trim_start = 5

    # Host chain: upsample -> fit to the untrimmed length -> trim slice
    # -> rf zero pad -> overlapping chunks (+ zero tail on the last).
    host = fit_lc_to_length(upsample_lc(feats, hop, mode), n_audio)
    host = host[trim_start:]
    host = np.pad(host, [[rf, 0], [0, 0]])
    width = rf + sample_size
    Fw = frame_window_size(width, hop)
    k = 0
    while len(host) > rf:
        piece = host[:width]
        n_valid = len(piece)
        if len(piece) < width:
            piece = np.pad(piece, [[0, width - len(piece)], [0, 0]])
        orig_start = trim_start + k * sample_size - rf
        f0 = max(0, orig_start // hop - 1)
        win = feats[f0:f0 + Fw]
        win = np.pad(win, [[0, Fw - win.shape[0]], [0, 0]])
        chunk = LCFrameChunk(
            frames=jnp.asarray(win)[None],
            orig_start=jnp.asarray([orig_start], jnp.int32),
            f0=jnp.asarray([f0], jnp.int32),
            f_valid=jnp.asarray([F], jnp.int32),
            n_valid=jnp.asarray([n_valid], jnp.int32),
            zero_before=jnp.asarray([trim_start], jnp.int32))
        dev = np.asarray(upsample_chunk_jax(chunk, hop, mode, width))[0]
        if mode == "repeat":
            np.testing.assert_array_equal(dev, piece, err_msg=f"chunk {k}")
        else:
            np.testing.assert_allclose(dev, piece, atol=1e-5,
                                       err_msg=f"chunk {k}")
        host = host[sample_size:]
        k += 1
    assert k >= 3


@pytest.mark.parametrize("mode", ["repeat", "linear"])
def test_reader_device_mode_matches_host_mode(mode, tmp_path, rng):
    """Two same-seeded readers — host upsampling vs frame windows — must
    yield identical conditioning streams after device reconstruction."""
    sr, hop, C = 2000, 50, 4
    for spk in (1, 2):
        n = 900 + 137 * spk
        x = 0.5 * np.sin(2 * np.pi * (150 + 80 * spk)
                         * np.arange(n) / sr)
        wavfile.write(str(tmp_path / f"p{spk}_001.wav"), sr,
                      (x * 32767).astype(np.int16))
        np.save(str(tmp_path / f"p{spk}_001.lc.npy"),
                rng.randn(-(-n // hop), C).astype(np.float32))

    def make(device):
        return AudioReader(str(tmp_path), sr, gc_enabled=False,
                           receptive_field=33, sample_size=256,
                           silence_threshold=0.01, seed=7,
                           lc_enabled=True, lc_channels=C, lc_hop=hop,
                           lc_upsample=mode, lc_device_upsample=device)

    host_r, dev_r = make(False), make(True)
    with host_r, dev_r:
        for _ in range(6):
            a_h = host_r.dequeue(2)
            lc_h = host_r.dequeue_lc(2)
            a_d = dev_r.dequeue(2)
            chunk = dev_r.dequeue_lc(2)
            np.testing.assert_array_equal(a_h, a_d)
            assert isinstance(chunk, LCFrameChunk)
            rec = np.asarray(upsample_chunk_jax(
                jax.tree.map(jnp.asarray, chunk), hop, mode,
                a_h.shape[1]))
            if mode == "repeat":
                np.testing.assert_array_equal(rec, lc_h)
            else:
                np.testing.assert_allclose(rec, lc_h, atol=1e-5)


def test_train_step_accepts_frame_chunks(rng):
    """Loss under an LCFrameChunk equals the loss under the equivalent
    host-upsampled stream (the step upsamples on device)."""
    from wavenet_tpu.models.config import WaveNetConfig
    from wavenet_tpu.train_lib import (
        create_train_state, make_optimizer, make_train_step)

    hop, C = 16, 3
    cfg = WaveNetConfig(dilations=(1, 2, 4), residual_channels=4,
                        dilation_channels=4, skip_channels=8,
                        quantization_channels=32, lc_channels=C)
    B, T = 2, cfg.receptive_field + 64
    audio = jnp.asarray(rng.uniform(-1, 1, (B, T)).astype(np.float32))
    F = T // hop + 2
    feats = rng.randn(B, F, C).astype(np.float32)

    # Stream equivalent: orig_start=0, full frames, everything valid.
    Fw = frame_window_size(T, hop)
    win = np.pad(feats, [[0, 0], [0, max(0, Fw - F)], [0, 0]])[:, :Fw]
    chunk = LCFrameChunk(
        frames=jnp.asarray(win),
        orig_start=jnp.zeros((B,), jnp.int32),
        f0=jnp.zeros((B,), jnp.int32),
        f_valid=jnp.full((B,), F, jnp.int32),
        n_valid=jnp.full((B,), T, jnp.int32),
        zero_before=jnp.zeros((B,), jnp.int32))
    stream = jnp.stack([
        jnp.asarray(fit_lc_to_length(upsample_lc(feats[b], hop, "repeat"),
                                     T)) for b in range(B)])

    opt = make_optimizer("adam", 1e-3)
    losses = {}
    for tag, lc_in, kw in (("stream", stream, {}),
                           ("chunk", chunk,
                            dict(lc_hop=hop, lc_upsample="repeat"))):
        state = create_train_state(jax.random.PRNGKey(0), cfg, opt)
        step = make_train_step(cfg, opt, None, **kw)
        _, metrics = step(state, audio, None, lc_in)
        losses[tag] = float(jax.device_get(metrics["loss"]))
    assert losses["stream"] == pytest.approx(losses["chunk"], abs=1e-6)
