"""Data pipeline tests (reference: audio_reader.py semantics, SURVEY §3.4)."""

import os

import numpy as np
import pytest
from scipy.io import wavfile

from wavenet_tpu.audio import read_wav, trim_silence, write_wav
from wavenet_tpu.data.reader import (
    AudioReader, find_files, get_category_cardinality, not_all_have_id,
    parse_speaker_id, randomize_files)


@pytest.fixture
def corpus(tmp_path):
    sr = 4000
    rng = np.random.RandomState(0)
    for spk in (3, 7):
        for utt in range(2):
            t = np.arange(sr) / sr  # 1 second
            x = 0.5 * np.sin(2 * np.pi * (100 + 50 * spk) * t)
            wavfile.write(str(tmp_path / f"p{spk}_{utt:03d}.wav"), sr,
                          (x * 32767).astype(np.int16))
    return str(tmp_path)


def test_find_files_and_ids(corpus):
    files = find_files(corpus)
    assert len(files) == 4
    assert parse_speaker_id(os.path.basename(files[0])) == 3
    min_id, max_id = get_category_cardinality(files)
    assert (min_id, max_id) == (3, 7)
    assert not not_all_have_id(files)


def test_randomize_with_replacement(corpus):
    import random
    files = find_files(corpus)
    it = randomize_files(files, random.Random(0))
    draws = [next(it) for _ in range(50)]
    # With replacement: 50 draws from 4 files must repeat.
    assert len(set(draws)) <= 4


def test_reader_chunk_shapes_and_overlap(corpus):
    rf, ss = 32, 100
    reader = AudioReader(corpus, sample_rate=4000, receptive_field=rf,
                         sample_size=ss, seed=0)
    with reader:
        batch = reader.dequeue(4)
    assert batch.shape == (4, rf + ss)
    assert batch.dtype == np.float32


def test_reader_gc_lockstep(corpus):
    reader = AudioReader(corpus, sample_rate=4000, gc_enabled=True,
                         receptive_field=32, sample_size=100, seed=0)
    assert reader.gc_category_cardinality == 8  # max speaker id 7 + 1
    with reader:
        batch = reader.dequeue(6)
        ids = reader.dequeue_gc(6)
    assert ids.shape == (6,)
    assert set(ids) <= {3, 7}


def test_reader_left_pad_is_silence(corpus):
    # First chunk of any utterance starts with receptive_field zeros.
    rf = 50
    reader = AudioReader(corpus, sample_rate=4000, receptive_field=rf,
                         sample_size=200, num_threads=1, seed=0)
    with reader:
        batch = reader.dequeue(1)
    assert np.all(batch[0, :rf] == 0.0)
    assert np.any(batch[0, rf:] != 0.0)


def test_gc_requires_ids(tmp_path):
    sr = 4000
    wavfile.write(str(tmp_path / "noid.wav"), sr,
                  np.zeros(100, np.int16))
    with pytest.raises(ValueError, match="speaker id"):
        AudioReader(str(tmp_path), sample_rate=4000, gc_enabled=True,
                    receptive_field=8, sample_size=16)


def test_trim_silence_keeps_loud_region():
    sr = 4000
    silence = np.zeros(sr)
    loud = 0.5 * np.sin(2 * np.pi * 200 * np.arange(sr) / sr)
    audio = np.concatenate([silence, loud, silence]).astype(np.float32)
    trimmed = trim_silence(audio, threshold=0.05)
    assert len(trimmed) < len(audio)
    assert len(trimmed) >= len(loud) * 0.8
    assert np.max(np.abs(trimmed)) >= 0.4


def test_trim_silence_all_quiet_returns_empty():
    audio = (1e-4 * np.random.RandomState(0).randn(5000)).astype(np.float32)
    assert trim_silence(audio, threshold=0.05).size == 0


def test_wav_roundtrip(tmp_path):
    sr = 8000
    x = (0.3 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(
        np.float32)
    path = str(tmp_path / "t.wav")
    write_wav(path, x, sr)
    back, got_sr = read_wav(path)
    assert got_sr == sr
    np.testing.assert_allclose(back, x, atol=1e-3)


def test_read_wav_resamples(tmp_path):
    sr_in, sr_out = 8000, 4000
    x = (0.3 * np.sin(2 * np.pi * 200 * np.arange(sr_in) / sr_in)).astype(
        np.float32)
    path = str(tmp_path / "r.wav")
    write_wav(path, x, sr_in)
    back, got_sr = read_wav(path, sample_rate=sr_out)
    assert got_sr == sr_out
    assert abs(len(back) - sr_out) <= 1


def test_bucket_ladder_bounds_unique_shapes(tmp_path):
    """Whole-utterance mode on a diverse-length corpus emits at most
    log2(longest/bucket_size)+1 distinct lengths (the geometric ladder),
    so jit compile count is bounded (round-2 verdict item 8)."""
    sr = 4000
    rng = np.random.RandomState(1)
    # 12 utterances with lengths spread over [0.3s, 8s] — a plain
    # multiple-of-bucket rule would produce ~12 distinct multiples.
    lengths = rng.randint(int(0.3 * sr), 8 * sr, size=12)
    for i, n in enumerate(lengths):
        x = 0.5 * np.sin(2 * np.pi * 220 * np.arange(n) / sr)
        wavfile.write(str(tmp_path / f"p1_{i:03d}.wav"), sr,
                      (x * 32767).astype(np.int16))
    reader = AudioReader(str(tmp_path), sample_rate=sr, receptive_field=64,
                         sample_size=None, silence_threshold=None,
                         bucket_size=2048, seed=0)
    seen = set()
    with reader:
        for _ in range(24):
            seen.add(reader.dequeue(1).shape[1])
    max_rungs = int(np.ceil(np.log2(8 * sr / 2048))) + 1
    assert len(seen) <= max_rungs
    # Every emitted length is a ladder rung: bucket_size * 2^k.
    for n in seen:
        assert n % 2048 == 0 and (n // 2048) & (n // 2048 - 1) == 0


def test_whole_utterance_batch_pads_to_longest_rung(tmp_path):
    """dequeue(n>1) in whole-utterance mode pads the batch to its longest
    element (reference PaddingFIFOQueue dequeue_many semantics)."""
    sr = 4000
    for i, n in enumerate([1000, 5000, 3000, 9000]):
        x = 0.5 * np.sin(2 * np.pi * 220 * np.arange(n) / sr)
        wavfile.write(str(tmp_path / f"p1_{i:03d}.wav"), sr,
                      (x * 32767).astype(np.int16))
    reader = AudioReader(str(tmp_path), sample_rate=sr, receptive_field=64,
                         sample_size=None, silence_threshold=None,
                         bucket_size=2048, seed=3)
    with reader:
        for _ in range(6):
            batch = reader.dequeue(4)
            assert batch.ndim == 2 and batch.shape[0] == 4
            n = batch.shape[1]
            assert n % 2048 == 0 and (n // 2048) & (n // 2048 - 1) == 0


# -- multi-thread reader (round-4: --num_threads > 1 was untested) -----------

@pytest.fixture
def mt_corpus(tmp_path):
    """Speaker-identifiable corpus: speaker N's audio is a constant
    amplitude N/20 and its LC sidecar rows are the constant N, so any
    dequeued element can be traced back to its source file — the
    GC/LC lockstep check under thread interleaving."""
    sr = 4000
    d = tmp_path / "mt"
    d.mkdir()
    for spk in (1, 2, 3, 4):
        for utt in range(2):
            x = np.full(sr, spk / 20.0, np.float32)
            write_wav(str(d / f"p{spk}_{utt:03d}.wav"), x, sr)
            frames = np.full((sr // 50, 6), float(spk), np.float32)
            np.save(str(d / f"p{spk}_{utt:03d}.lc.npy"), frames)
    return str(d)


def test_reader_multithread_lockstep_integrity(mt_corpus):
    """4 worker threads interleaving into one queue: every element's
    gc id and LC stream must still match its audio (the reference's
    thread_main lockstep-enqueue contract, audio_reader.py ~:160)."""
    rf, ss = 16, 200
    reader = AudioReader(mt_corpus, sample_rate=4000, gc_enabled=True,
                         receptive_field=rf, sample_size=ss,
                         num_threads=4, seed=5, lc_enabled=True,
                         lc_channels=6, lc_hop=50)
    with reader:
        for _ in range(6):
            audio = reader.dequeue(8)
            ids = reader.dequeue_gc(8)
            lc = reader.dequeue_lc(8)
            for i in range(8):
                body = audio[i][audio[i] != 0.0]
                assert body.size, "chunk must contain real samples"
                spk = int(round(body[0] * 20.0))
                assert np.allclose(body, spk / 20.0, atol=1e-4), \
                    "audio mixed between files"
                assert ids[i] == spk, "gc id not lockstep with audio"
                lc_body = lc[i][np.any(lc[i] != 0.0, axis=-1)]
                assert lc_body.size and np.allclose(lc_body, float(spk)), \
                    "lc stream not lockstep with audio"


def test_reader_multithread_deterministic_per_thread_streams(mt_corpus):
    """Seed contract for N>1: thread i draws from an independent
    with-replacement stream seeded seed+i (reader.py _thread_main).
    Queue interleaving AND each thread's contribution count in any
    finite prefix are scheduler-dependent, so the consumed items are
    not run-to-run reproducible as a multiset; the deterministic
    contract is that they form a MERGE OF PREFIXES of the two per-
    thread streams — which a single-thread reader reproduces exactly
    (seed+0 / seed+1). N>1 therefore changes batch composition vs N=1
    but not the data distribution."""
    n_items = 32

    def stream(seed, n):
        reader = AudioReader(mt_corpus, sample_rate=4000, gc_enabled=True,
                             receptive_field=16, sample_size=200,
                             num_threads=1, seed=seed)
        with reader:
            out = []
            while len(out) < n:
                a = reader.dequeue(4)
                out.extend(round(float(x), 6) for x in a.sum(axis=1))
            return out[:n]

    s0, s1 = stream(9, n_items), stream(10, n_items)

    reader = AudioReader(mt_corpus, sample_rate=4000, gc_enabled=True,
                         receptive_field=16, sample_size=200,
                         num_threads=2, seed=9)
    with reader:
        got = []
        for _ in range(n_items // 4):
            a = reader.dequeue(4)
            got.extend(round(float(x), 6) for x in a.sum(axis=1))

    matches = [a0 for a0 in range(n_items + 1)
               if sorted(got) == sorted(s0[:a0] + s1[:n_items - a0])]
    assert matches, ("consumed items are not a prefix-merge of the "
                     "seed+0 / seed+1 single-thread streams")


def test_reader_multithread_clean_shutdown(mt_corpus):
    reader = AudioReader(mt_corpus, sample_rate=4000, receptive_field=16,
                         sample_size=200, num_threads=4, seed=0)
    reader.start_threads()
    threads = list(reader._threads)
    assert len(threads) == 4 and all(t.is_alive() for t in threads)
    reader.dequeue(4)
    reader.stop_threads()
    assert all(not t.is_alive() for t in threads)
    assert reader._threads == []


def test_reader_multithread_decodes_concurrently(mt_corpus, monkeypatch):
    """N workers must actually overlap their (GIL-releasing) decode work
    — the point of the worker pool (reference used N enqueue threads
    for the same reason, train.py ~:230). Asserted by instrumenting the
    loader for overlapping entries rather than by wall-clock speedup,
    which was machine-load flaky (observed 1.2x on a loaded box where
    an idle one gives >3x)."""
    import threading as _threading
    import time as _time

    import wavenet_tpu.data.reader as rmod

    real = rmod.load_generic_audio
    lock = _threading.Lock()
    state = {"now": 0, "max": 0}

    def tracking_loader(*args, **kw):
        with lock:
            state["now"] += 1
            state["max"] = max(state["max"], state["now"])
        _time.sleep(0.05)          # models a slow, GIL-releasing decode
        try:
            yield from real(*args, **kw)
        finally:
            with lock:
                state["now"] -= 1

    monkeypatch.setattr(rmod, "load_generic_audio", tracking_loader)

    def max_concurrency(num_threads):
        state["now"] = state["max"] = 0
        reader = AudioReader(mt_corpus, sample_rate=4000,
                             receptive_field=16, sample_size=200,
                             num_threads=num_threads, seed=0,
                             queue_size=8)
        with reader:
            for _ in range(4):
                reader.dequeue(8)
        return state["max"]

    assert max_concurrency(1) == 1
    assert max_concurrency(4) >= 2
