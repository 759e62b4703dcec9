"""Host-parallel audio data pipeline (TF-free).

Replaces the reference's ``AudioReader`` (reference:
wavenet/audio_reader.py ≈:10-180), which fed training through
``tf.PaddingFIFOQueue`` + a daemon enqueue thread. Same data semantics,
different machinery:

* corpus walk + VCTK speaker-id regex (``p<speaker>_<utt>.wav``),
* file order sampled WITH replacement (the reference's ``randomize_files``
  quirk, ≈:28 — random.randint per yield),
* scipy decode + polyphase resample (librosa-free), RMS silence trim,
* left zero-padding by receptive_field, then chunking into
  ``receptive_field + sample_size`` pieces that OVERLAP by receptive_field
  (≈:150-165) — so every target sample has a full-context window,
* background worker threads + a bounded ``queue.Queue`` instead of TF
  queue runners; batches come out as fixed-shape numpy arrays ready for
  ``jax.device_put`` (static shapes keep everything jit-stable).

Whole-utterance mode (sample_size=None) pads each utterance up to a
GEOMETRIC bucket ladder (bucket_size * 2^k) instead of the reference's
dynamic PaddingFIFOQueue shapes — XLA wants static shapes, and the
ladder bounds the number of distinct shapes (= jit compiles) to
log2(longest/bucket_size)+1 on any corpus. Batches pad to the longest
rung present (PaddingFIFOQueue dequeue_many semantics).
"""

from __future__ import annotations

import fnmatch
import os
import queue
import random
import re
import threading
import warnings
from typing import Iterator, List, Optional, Tuple

import numpy as np

from wavenet_tpu.audio import read_wav, trim_silence

# VCTK corpus filename convention (reference audio_reader.py ≈:10).
FILE_PATTERN = r"p([0-9]+)_([0-9]+)\.wav"


def get_category_cardinality(files: List[str]) -> Tuple[Optional[int], Optional[int]]:
    """(min_id, max_id) over speaker ids parsed from filenames (≈:13)."""
    id_reg_expression = re.compile(FILE_PATTERN)
    min_id, max_id = None, None
    for filename in files:
        matches = id_reg_expression.findall(filename)
        if not matches:
            continue
        pid = int(matches[0][0])
        if min_id is None or pid < min_id:
            min_id = pid
        if max_id is None or pid > max_id:
            max_id = pid
    return min_id, max_id


def find_files(directory: str, pattern: str = "*.wav") -> List[str]:
    """Recursively collect files matching the pattern (≈:34)."""
    files = []
    for root, _, filenames in os.walk(directory):
        for filename in fnmatch.filter(filenames, pattern):
            files.append(os.path.join(root, filename))
    return sorted(files)


def randomize_files(files: List[str],
                    rng: Optional[random.Random] = None) -> Iterator[str]:
    """Yield files sampled WITH replacement, forever (reference quirk ≈:28)."""
    rng = rng or random
    n = len(files)
    while True:
        yield files[rng.randint(0, n - 1)]


def parse_speaker_id(filename: str) -> Optional[int]:
    matches = re.compile(FILE_PATTERN).findall(filename)
    if not matches:
        return None
    return int(matches[0][0])


def not_all_have_id(files: List[str]) -> bool:
    """True if any file lacks a parsable speaker id (≈:68)."""
    return any(parse_speaker_id(os.path.basename(f)) is None for f in files)


def _read_wav_any(filename: str, sample_rate: int,
                  use_native: bool = True) -> np.ndarray:
    """Decode+resample via the native C++ library, scipy as fallback."""
    if use_native:
        from wavenet_tpu.data import native
        loaded = native.read_wav(filename, sample_rate)
        if loaded is not None:
            return loaded[0]
    audio, _ = read_wav(filename, sample_rate)
    return audio


def load_generic_audio(directory: str, sample_rate: int,
                       rng: Optional[random.Random] = None,
                       use_native: bool = True):
    """Generator of (audio [T, 1] float32, filename, speaker_id) (≈:42)."""
    files = find_files(directory)
    if not files:
        raise ValueError(f"No wav files found in '{directory}'.")
    for filename in randomize_files(files, rng):
        audio = _read_wav_any(filename, sample_rate, use_native)
        category_id = parse_speaker_id(os.path.basename(filename))
        yield audio.reshape(-1, 1), filename, category_id


class AudioReader:
    """Background-threaded chunk loader with the reference's data semantics.

    Produces batches via :meth:`dequeue` / :meth:`dequeue_gc` (names kept
    from the reference API, audio_reader.py ≈:122-128): float32 audio
    ``[batch, receptive_field + sample_size]`` and int32 speaker ids
    ``[batch]``.
    """

    def __init__(self,
                 audio_dir: str,
                 sample_rate: int,
                 gc_enabled: bool = False,
                 receptive_field: int = 1024,
                 sample_size: Optional[int] = None,
                 silence_threshold: Optional[float] = None,
                 queue_size: int = 32,
                 num_threads: int = 1,
                 seed: Optional[int] = None,
                 bucket_size: int = 16000,
                 use_native: bool = True,
                 lc_enabled: bool = False,
                 lc_channels: Optional[int] = None,
                 lc_hop: Optional[int] = None,
                 lc_upsample: str = "repeat",
                 lc_device_upsample: bool = False):
        """``lc_*``: local-conditioning sidecars (new capability; no
        reference counterpart). Each ``<stem>.wav`` must have a
        ``<stem>.lc.npy`` float array [frames, lc_channels]; ``lc_hop``
        is the number of OUTPUT samples (at ``sample_rate``, i.e. after
        resampling) each frame covers. The stream is upsampled
        (wavenet_tpu.lc.upsample_lc), trimmed/padded/chunked in lockstep
        with the audio, and dequeued via :meth:`dequeue_lc`.
        """
        self.audio_dir = audio_dir
        self.sample_rate = sample_rate
        self.gc_enabled = gc_enabled
        self.receptive_field = receptive_field
        self.sample_size = sample_size
        self.silence_threshold = silence_threshold
        self.bucket_size = bucket_size
        self.use_native = use_native
        self.lc_enabled = lc_enabled
        self.lc_channels = lc_channels
        self.lc_hop = lc_hop
        self.lc_upsample = lc_upsample
        # TPU-native transfer format: enqueue FRAME windows + alignment
        # (wavenet_tpu.lc.LCFrameChunk) instead of the upsampled stream —
        # ~0.3% of the host->device bytes; the jit'd train step
        # reconstructs the identical stream on device
        # (lc.upsample_chunk_jax). Measured 2026-08-19: the upsampled
        # stream cost ~49 MB -> ~1 s per b8/16k step through the device
        # tunnel against a 20 ms compute step.
        self.lc_device_upsample = lc_device_upsample
        if lc_enabled and (lc_channels is None or lc_hop is None):
            raise ValueError("lc_enabled requires lc_channels and lc_hop")
        self._seen_buckets: set = set()
        self._queue: "queue.Queue" = queue.Queue(maxsize=queue_size)
        self._threads: List[threading.Thread] = []
        self._stop = threading.Event()
        self._num_threads = num_threads
        self._seed = seed

        files = find_files(audio_dir)
        if not files:
            raise ValueError(f"No audio files found in '{audio_dir}'.")
        print(f"files length: {len(files)}")
        self.gc_category_cardinality = None
        if gc_enabled:
            if not_all_have_id(files):
                raise ValueError(
                    "Global conditioning is enabled, but not all files "
                    "conform to the pattern having a speaker id.")
            _, max_id = get_category_cardinality(files)
            # +1 so the embedding table covers ids 0..max (reference ≈:100;
            # ids need not be dense).
            self.gc_category_cardinality = max_id + 1
            print(f"Detected --gc_cardinality={self.gc_category_cardinality}")

    # -- worker ------------------------------------------------------------

    def _load_lc_frames(self, filename: str) -> np.ndarray:
        """Validated raw sidecar frames [F, C] for one decoded file."""
        from wavenet_tpu.lc import load_lc_sidecar
        feats = load_lc_sidecar(filename)
        if feats is None:
            raise ValueError(
                f"Local conditioning is enabled but '{filename}' has no "
                "<stem>.lc.npy sidecar.")
        if feats.shape[1] != self.lc_channels:
            raise ValueError(
                f"'{filename}' sidecar has {feats.shape[1]} channels, "
                f"expected lc_channels={self.lc_channels}")
        return feats

    def _load_lc(self, filename: str, n_samples: int) -> Optional[np.ndarray]:
        """Upsampled conditioning [n_samples, C] for one decoded file."""
        from wavenet_tpu.lc import fit_lc_to_length, upsample_lc
        feats = self._load_lc_frames(filename)
        lc = upsample_lc(feats, self.lc_hop, self.lc_upsample)
        return fit_lc_to_length(lc, n_samples)

    def _lc_window(self, feats: np.ndarray, orig_start: int, width: int,
                   n_valid: int, zero_before: int):
        """One chunk's device-upsample payload (lc.LCFrameChunk fields):
        (frames_window [Fw, C], orig_start, f0, f_valid, n_valid,
        zero_before)."""
        from wavenet_tpu.lc import frame_window_size
        Fw = frame_window_size(width, self.lc_hop)
        F = feats.shape[0]
        f0 = max(0, orig_start // self.lc_hop - 1)
        win = feats[f0:f0 + Fw]
        if win.shape[0] < Fw:
            win = np.pad(win, [[0, Fw - win.shape[0]], [0, 0]],
                         mode="constant")
        return (np.ascontiguousarray(win, np.float32),
                np.int32(orig_start), np.int32(f0), np.int32(F),
                np.int32(n_valid), np.int32(zero_before))

    def _thread_main(self, thread_index: int) -> None:
        """Reference ``thread_main`` (≈:130-170): trim, pad, chunk, enqueue.

        With local conditioning, the upsampled sidecar stream is sliced,
        padded and chunked in LOCKSTEP with the audio (trim indices,
        receptive-field left-pad, overlapping chunk windows all shared).
        """
        rng = random.Random(None if self._seed is None
                            else self._seed + thread_index)
        iterator = load_generic_audio(self.audio_dir, self.sample_rate, rng,
                                      self.use_native)
        for audio, filename, category_id in iterator:
            if self._stop.is_set():
                return
            lc_frames = None
            trim_start = 0
            if self.lc_enabled and self.lc_device_upsample:
                lc_frames, lc = self._load_lc_frames(filename), None
            else:
                lc = (self._load_lc(filename, len(audio))
                      if self.lc_enabled else None)
            if self.silence_threshold is not None:
                if lc is not None or lc_frames is not None:
                    start, end = self._trim_indices(audio[:, 0])
                    audio = audio[start:end]
                    trim_start = start
                    if lc is not None:
                        lc = lc[start:end]
                else:
                    audio = self._trim(audio[:, 0]).reshape(-1, 1)
                if audio.size == 0:
                    warnings.warn(
                        f"Warning: {filename} was ignored as it contains "
                        "only silence. Consider decreasing "
                        "trim_silence threshold, or adjust volume of the "
                        "audio.")
                    continue

            # Left-pad with receptive_field silence so the first real
            # sample has a full (zero) context (≈:150). The conditioning
            # stream gets matching zeros (silent context, null features).
            audio = np.pad(audio, [[self.receptive_field, 0], [0, 0]],
                           mode="constant")
            if lc is not None:
                lc = np.pad(lc, [[self.receptive_field, 0], [0, 0]],
                            mode="constant")

            if self.sample_size:
                # Overlapping chunks: advance by sample_size, keep the
                # trailing receptive_field as context for the next chunk.
                width = self.receptive_field + self.sample_size
                k = 0
                while len(audio) > self.receptive_field:
                    piece = audio[:width]
                    n_valid = len(piece)
                    lc_piece = lc[:width] if lc is not None else None
                    if lc_frames is not None:
                        # Chunk position t sits at original-timeline
                        # sample trim_start + k*sample_size + t - rf.
                        lc_piece = self._lc_window(
                            lc_frames,
                            trim_start + k * self.sample_size
                            - self.receptive_field,
                            width, n_valid, trim_start)
                    if len(piece) < width:
                        piece = np.pad(
                            piece, [[0, width - len(piece)], [0, 0]],
                            mode="constant")
                        if lc is not None:
                            lc_piece = np.pad(
                                lc_piece,
                                [[0, width - len(lc_piece)], [0, 0]],
                                mode="constant")
                    self._put((piece[:, 0].astype(np.float32), category_id,
                               lc_piece))
                    audio = audio[self.sample_size:]
                    k += 1
                    if lc is not None:
                        lc = lc[self.sample_size:]
            else:
                # Whole-utterance mode: pad up to a bucket-LADDER rung for
                # static jit shapes. The ladder is geometric (bucket_size,
                # 2x, 4x, ...), so the number of distinct shapes — and
                # therefore jit compiles — is bounded by
                # log2(longest/bucket_size)+1 on ANY corpus, where a plain
                # multiple-of-bucket_size rule compiles once per distinct
                # multiple (unbounded on diverse-length data).
                n = len(audio)
                bucketed = self._bucket_length(n)
                piece = np.pad(audio, [[0, bucketed - n], [0, 0]],
                               mode="constant")
                lc_piece = None
                if lc is not None:
                    lc_piece = np.pad(lc, [[0, bucketed - n], [0, 0]],
                                      mode="constant")
                elif lc_frames is not None:
                    lc_piece = self._lc_window(
                        lc_frames, trim_start - self.receptive_field,
                        bucketed, n, trim_start)
                self._put((piece[:, 0].astype(np.float32), category_id,
                           lc_piece))

    def _trim(self, audio: np.ndarray) -> np.ndarray:
        if self.use_native:
            from wavenet_tpu.data import native
            trimmed = native.trim_silence(audio, self.silence_threshold)
            if trimmed is not None:
                return trimmed
        return trim_silence(audio, self.silence_threshold)

    def _trim_indices(self, audio: np.ndarray) -> Tuple[int, int]:
        """(start, end) of the kept region — lets LC slice in lockstep.

        The native C++ trimmer returns only the trimmed signal, so LC
        mode uses the index-returning Python implementation (identical
        energies; the native path is a decode-speed optimization, not a
        numerics one).
        """
        from wavenet_tpu.audio import trim_silence_indices
        return trim_silence_indices(audio, self.silence_threshold)

    def _bucket_length(self, n: int) -> int:
        """Smallest bucket-ladder rung >= n (rungs: bucket_size * 2^k).

        Prints a one-line note the first time a rung is used — each
        distinct rung costs one jit compile downstream, and the note
        makes that visible (reference PaddingFIFOQueue semantics,
        audio_reader.py ≈:167, had dynamic shapes and no such cost).
        """
        rung = self.bucket_size
        while rung < n:
            rung *= 2
        if rung not in self._seen_buckets:
            self._seen_buckets.add(rung)
            print(f"whole-utterance bucket {rung} first used "
                  f"(each distinct bucket length compiles once; ladder "
                  f"is geometric so at most "
                  f"log2(longest/{self.bucket_size})+1 shapes)")
        return rung

    def _put(self, item) -> None:
        while not self._stop.is_set():
            try:
                self._queue.put(item, timeout=0.5)
                return
            except queue.Full:
                continue

    # -- public API --------------------------------------------------------

    def start_threads(self) -> None:
        for i in range(self._num_threads):
            t = threading.Thread(target=self._thread_main, args=(i,),
                                 daemon=True)
            t.start()
            self._threads.append(t)

    def stop_threads(self) -> None:
        self._stop.set()
        for t in self._threads:
            t.join(timeout=5.0)
        self._threads.clear()

    def dequeue(self, num_elements: int) -> np.ndarray:
        """Audio batch [num_elements, rf + sample_size] float32.

        Whole-utterance mode (sample_size=None) zero-pads every element
        to the longest rung in the batch — the reference's
        PaddingFIFOQueue dequeue_many semantics (audio_reader.py ≈:88),
        with lengths drawn from the bucket ladder so batch shapes stay
        bounded.
        """
        batch = [self._queue.get() for _ in range(num_elements)]
        self._last_ids = np.asarray(
            [0 if b[1] is None else b[1] for b in batch], dtype=np.int32)
        if self.sample_size is None and num_elements > 1:
            width = max(len(b[0]) for b in batch)

            def _fit_lc(l):
                if l is None:
                    return None
                if isinstance(l, tuple):
                    # Frame-window payload: grow the window to the
                    # batch-max width's row count (pad rows are never
                    # indexed — device clips to f_valid).
                    from wavenet_tpu.lc import frame_window_size
                    Fw = frame_window_size(width, self.lc_hop)
                    win = np.pad(l[0], [[0, Fw - l[0].shape[0]], [0, 0]],
                                 mode="constant")
                    return (win,) + l[1:]
                return np.pad(l, [(0, width - len(l)), (0, 0)])

            batch = [(np.pad(a, (0, width - len(a))), cid, _fit_lc(l))
                     for a, cid, l in batch]
        if not self.lc_enabled:
            self._last_lc = None
        elif self.lc_device_upsample:
            from wavenet_tpu.lc import LCFrameChunk
            self._last_lc = LCFrameChunk(*(
                np.stack([b[2][i] for b in batch]) for i in range(6)))
        else:
            self._last_lc = np.stack([b[2] for b in batch])
        return np.stack([b[0] for b in batch])

    def dequeue_gc(self, num_elements: int) -> np.ndarray:
        """Speaker ids for the batch returned by the LAST dequeue() call.

        The reference kept two TF queues in lockstep (≈:160); here ids ride
        along with their audio chunk, so this just returns the ids captured
        by the previous dequeue — lockstep by construction.
        """
        if not hasattr(self, "_last_ids"):
            raise RuntimeError("dequeue_gc() must follow dequeue().")
        assert len(self._last_ids) == num_elements
        return self._last_ids

    def dequeue_lc(self, num_elements: int) -> np.ndarray:
        """Conditioning [batch, rf + sample_size, lc_channels] for the
        batch returned by the LAST dequeue() call (lockstep, like gc)."""
        if not hasattr(self, "_last_lc") or self._last_lc is None:
            raise RuntimeError(
                "dequeue_lc() must follow dequeue() on an lc_enabled "
                "reader.")
        from wavenet_tpu.lc import LCFrameChunk
        n = (self._last_lc.frames.shape[0]
             if isinstance(self._last_lc, LCFrameChunk)
             else len(self._last_lc))
        assert n == num_elements
        return self._last_lc

    def __enter__(self):
        self.start_threads()
        return self

    def __exit__(self, *exc):
        self.stop_threads()
