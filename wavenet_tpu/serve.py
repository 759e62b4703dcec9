"""Minimal production serving for generation: HTTP around a warm sampler.

The reference has no serving story (generation = run a script). This is
the deployment-shaped counterpart: load a checkpoint once, pre-compile
the sampler, then serve generation requests over HTTP with the device
serialized behind a lock (one chip = one request at a time; batched
requests amortize).

    python -m wavenet_tpu.serve --checkpoint logdir/train/<run> \
        --wavenet_params wavenet_params.json [--port 8765] \
        [--gc_channels 32 --gc_cardinality 109]

API (stdlib-only server, JSON in / WAV or JSON out):
  GET  /healthz            -> {"status": "ok", "config": {...}}
  POST /generate           {"samples": 16000, "gc_id": 3,
                            "temperature": 0.9, "seed": 7,
                            "lc": [[...], ...], "lc_hop": 200,
                            "lc_upsample": "repeat" | "linear",
                            "format": "wav" | "codes"}
      -> audio/wav bytes (format=wav, default), or
         {"codes": [...]} JSON (format=codes)
  POST /generate_batch     {"samples": 16000, "batch": 64 |
                            "gc_ids": [3, 7, ...], "temperature": 0.9,
                            "seed": 7, "format": "codes" | "wav_b64"}
      -> {"codes": [[...], ...]} (default) or {"wavs_b64": [...]} —
         B streams from ONE batched sampler launch (the multi-tile
         streamed decode sustains hundreds of realtime 16 kHz streams
         per chip — see docs/performance.md for the current per-round
         number; one PRNG seed covers the launch, lanes decorrelate
         in-kernel). No lc / speculative on this endpoint. Bounds:
         batch <= --max_batch (default 1024), and "codes" responses
         are capped at CODES_RESPONSE_CAP total ints (use "wav_b64"
         past it).

Local conditioning (lc-trained checkpoints): ``lc`` is a [frames,
lc_channels] float array. With ``lc_hop`` the frames are upsampled to
sample rate first (wavenet_tpu.lc.upsample_lc); without it they must
already be at sample rate. The stream is edge-extended/cropped to the
requested length. Speculative serving (--draft_checkpoint) does not
support lc (wavenet_tpu/speculative.py carries no feature stream).
"""

from __future__ import annotations

import argparse
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class GenerationService:
    """Checkpoint + compiled sampler + device lock."""

    #: /generate_batch JSON "codes" responses are capped at this many
    #: total ints (batch * samples); larger results must use "wav_b64"
    #: (b512 x 16k codes would be an ~40 MB JSON body on the stdlib
    #: single-threaded writer).
    CODES_RESPONSE_CAP = 4 * 1024 * 1024

    def __init__(self, checkpoint: str, wavenet_params: str,
                 gc_channels: Optional[int] = None,
                 gc_cardinality: Optional[int] = None,
                 sampler: str = "auto", warm_samples: int = 256,
                 draft_checkpoint: Optional[str] = None,
                 draft_wavenet_params: Optional[str] = None,
                 speculative_k: int = 8, max_batch: int = 1024):
        from wavenet_tpu.models.config import WaveNetConfig
        from wavenet_tpu.models.wavenet import init_params
        from wavenet_tpu.train_lib import restore_params_only

        with open(wavenet_params) as f:
            raw = json.load(f)
        self.sample_rate = raw["sample_rate"]
        self.config = WaveNetConfig.from_json(
            raw, gc_channels=gc_channels, gc_cardinality=gc_cardinality)
        template = init_params(jax.random.PRNGKey(0), self.config)
        params = restore_params_only(checkpoint, template)
        if params is None:
            raise FileNotFoundError(f"no checkpoint in {checkpoint}")
        self.params = params
        self.max_batch = max_batch
        self._lock = threading.Lock()

        # Optional speculative decoding: a draft checkpoint turns every
        # /generate into draft-propose / target-verify (target-exact
        # distribution; see wavenet_tpu/speculative.py).
        self.draft_params = None
        self.draft_config = None
        self.speculative_k = speculative_k
        if draft_checkpoint:
            if self.config.lc_enabled:
                raise ValueError(
                    "speculative serving does not support lc-trained "
                    "models (wavenet_tpu/speculative.py carries no "
                    "feature stream); serve without --draft_checkpoint")
            with open(draft_wavenet_params or wavenet_params) as f:
                draw = json.load(f)
            self.draft_config = WaveNetConfig.from_json(
                draw, gc_channels=gc_channels,
                gc_cardinality=gc_cardinality)
            dtemplate = init_params(jax.random.PRNGKey(0),
                                    self.draft_config)
            self.draft_params = restore_params_only(draft_checkpoint,
                                                    dtemplate)
            if self.draft_params is None:
                raise FileNotFoundError(
                    f"no draft checkpoint in {draft_checkpoint}")

        # Warmup picks the fastest variant that actually compiles (the
        # CLI's ordered fallback, wavenet_tpu/sampler_select.py) and
        # caches it — a config whose Mosaic compile fails degrades to
        # scan ONCE here instead of erroring on every /generate.
        self._sampler_arg = sampler
        self._variant_kwargs = None  # None -> scan
        self.sampler_name = "lax.scan"
        if warm_samples:
            # Speculative serving carries no lc stream; warm it plain.
            warm_lc = (np.zeros((warm_samples, self.config.lc_channels),
                                np.float32)
                       if self.config.lc_enabled
                       and self.draft_params is None else None)
            self.generate(warm_samples, gc_id=0 if gc_channels else None,
                          lc=warm_lc, _select=True)

    @property
    def use_pallas(self) -> bool:
        return self._variant_kwargs is not None

    @staticmethod
    def bucket_samples(n: int) -> int:
        """Round the request up to the next power-of-two bucket (min 1024)
        so each distinct length doesn't recompile the sampler under the
        service lock; the surplus is trimmed after generation."""
        b = 1024
        while b < n:
            b *= 2
        return b

    def generate(self, n_samples: int, gc_id: Optional[int] = None,
                 temperature: float = 1.0, seed: int = 0,
                 lc: Optional[np.ndarray] = None,
                 _select: bool = False) -> np.ndarray:
        """-> float waveform [n_samples] in [-1, 1].

        ``lc``: sample-rate conditioning [n_samples, lc_channels]
        (already upsampled; the handler does hop upsampling). Padded to
        the compile bucket by edge extension, like the request itself.
        """
        from wavenet_tpu.audio import mu_law_decode_np
        from wavenet_tpu.kernels.sampler import generate_pallas
        from wavenet_tpu.lc import fit_lc_to_length
        from wavenet_tpu.sample import generate
        from wavenet_tpu.sampler_select import generate_with_fallback

        gc_ids = (jnp.asarray([gc_id], jnp.int32)
                  if gc_id is not None and self.config.gc_enabled else None)
        n_bucket = self.bucket_samples(n_samples)
        if lc is not None:
            if not self.config.lc_enabled:
                raise ValueError("this model was not trained with local "
                                 "conditioning (no lc_channels in config)")
            if self.draft_params is not None:
                raise ValueError("speculative serving does not support "
                                 "local conditioning")
            lc = np.asarray(lc, np.float32)
            if lc.ndim != 2 or lc.shape != (n_samples,
                                            self.config.lc_channels):
                raise ValueError(
                    f"lc must be [{n_samples}, "
                    f"{self.config.lc_channels}], got {lc.shape}")
            lc = jnp.asarray(fit_lc_to_length(lc, n_bucket))[None]
        with self._lock:
            if self.draft_params is not None:
                from wavenet_tpu.speculative import generate_speculative

                codes = generate_speculative(
                    self.params, self.config, self.draft_params,
                    self.draft_config, n_bucket, jax.random.PRNGKey(seed),
                    k=self.speculative_k, temperature=temperature,
                    gc_ids=gc_ids, draft_gc_ids=gc_ids)
                if _select:
                    self.sampler_name = (
                        f"speculative (k={self.speculative_k})")
            elif _select:
                codes, name, kw = generate_with_fallback(
                    self.params, self.config, n_bucket, seed=seed,
                    batch_size=1, gc_ids=gc_ids, temperature=temperature,
                    lc=lc, sampler=self._sampler_arg)
                self._variant_kwargs, self.sampler_name = kw, name
            elif self._variant_kwargs is not None:
                codes = generate_pallas(
                    self.params, self.config, n_bucket, seed=seed,
                    batch_size=1, gc_ids=gc_ids, temperature=temperature,
                    lc=lc, **self._variant_kwargs)
            else:
                codes = generate(
                    self.params, self.config, n_bucket,
                    jax.random.PRNGKey(seed), batch_size=1, gc_ids=gc_ids,
                    temperature=temperature, lc=lc)
            codes = np.asarray(jax.device_get(codes))[0][:n_samples]
        return mu_law_decode_np(codes, self.config.quantization_channels)

    def generate_batch(self, n_samples: int, batch: Optional[int] = None,
                       gc_ids: Optional[list] = None,
                       temperature: float = 1.0,
                       seed: int = 0) -> np.ndarray:
        """-> float waveforms [B, n_samples] in [-1, 1] from ONE batched
        sampler launch (the big-batch throughput path: the packed-ring
        streamed decode sustains ~990 realtime 16 kHz streams per chip
        at the b512 device rate, bounded in practice by the host link
        draining the codes; chunks-of-512 hold the rate at any B —
        docs/performance.md round 5).

        ``batch`` or ``len(gc_ids)`` sets B. One PRNG ``seed`` covers
        the launch (lanes decorrelate in-kernel; per-request seeds
        would need per-request launches). Speculative serving and local
        conditioning are single-stream features and are rejected here.
        """
        from wavenet_tpu.audio import mu_law_decode_np
        from wavenet_tpu.sampler_select import generate_with_fallback

        if self.draft_params is not None:
            raise ValueError("speculative serving does not support "
                             "batched generation")
        if batch is not None:
            batch = int(batch)
        if gc_ids is not None:
            if not self.config.gc_enabled:
                raise ValueError("this model was not trained with global "
                                 "conditioning (no gc_channels in config)")
            if batch is not None and batch != len(gc_ids):
                raise ValueError(f"batch {batch} != len(gc_ids) "
                                 f"{len(gc_ids)}")
            batch = len(gc_ids)
        if batch is None or batch < 1:
            raise ValueError("generate_batch needs batch >= 1 or gc_ids")
        if batch > self.max_batch:
            raise ValueError(f"batch {batch} exceeds the server's "
                             f"--max_batch {self.max_batch}")
        gc = (jnp.asarray(gc_ids, jnp.int32)
              if gc_ids is not None else None)
        n_bucket = self.bucket_samples(n_samples)
        with self._lock:
            codes, name, _ = generate_with_fallback(
                self.params, self.config, n_bucket, seed=seed,
                batch_size=batch, gc_ids=gc, temperature=temperature,
                sampler=self._sampler_arg)
            self.sampler_name = name
            codes = np.asarray(jax.device_get(codes))[:, :n_samples]
        return mu_law_decode_np(codes, self.config.quantization_channels)


def _wav_bytes(waveform: np.ndarray, sample_rate: int) -> bytes:
    from scipy.io import wavfile

    buf = io.BytesIO()
    wavfile.write(buf, sample_rate,
                  (np.clip(waveform, -1, 1) * 32767).astype(np.int16))
    return buf.getvalue()


def make_handler(service: GenerationService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def _json(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {
                    "status": "ok",
                    "sampler": service.sampler_name,
                    "sample_rate": service.sample_rate,
                    "config": service.config.to_json_dict(),
                })
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path == "/generate_batch":
                self._generate_batch()
                return
            if self.path != "/generate":
                self._json(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(length) or b"{}")
                n = int(req.get("samples", service.sample_rate))
                if not 1 <= n <= 10 * 60 * service.sample_rate:
                    raise ValueError(f"samples out of range: {n}")
                lc = None
                if req.get("lc") is not None:
                    from wavenet_tpu.lc import fit_lc_to_length, upsample_lc

                    lc = np.asarray(req["lc"], np.float32)
                    if lc.ndim == 1:
                        lc = lc[:, None]
                    if lc.ndim != 2:
                        raise ValueError(
                            f"lc must be [frames, channels], got shape "
                            f"{lc.shape}")
                    hop = req.get("lc_hop")
                    if hop is not None:
                        lc = upsample_lc(
                            lc, int(hop),
                            mode=req.get("lc_upsample", "repeat"))
                    lc = fit_lc_to_length(lc, n)
                wave = service.generate(
                    n, gc_id=req.get("gc_id"),
                    temperature=float(req.get("temperature", 1.0)),
                    seed=int(req.get("seed", 0)), lc=lc)
            except (ValueError, KeyError, json.JSONDecodeError) as e:
                self._json(400, {"error": str(e)})
                return
            if req.get("format", "wav") == "codes":
                from wavenet_tpu.audio import mu_law_encode_np
                self._json(200, {"codes": mu_law_encode_np(
                    wave, service.config.quantization_channels).tolist()})
                return
            body = _wav_bytes(wave, service.sample_rate)
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _generate_batch(self):
            """POST /generate_batch {"samples": N, "batch": B | "gc_ids":
            [...], "temperature", "seed", "format": "codes" (default) |
            "wav_b64"} -> {"codes": [[...], ...]} or
            {"wavs_b64": ["<base64 wav>", ...]} — B streams from one
            batched sampler launch."""
            try:
                length = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(length) or b"{}")
                n = int(req.get("samples", service.sample_rate))
                if not 1 <= n <= 10 * 60 * service.sample_rate:
                    raise ValueError(f"samples out of range: {n}")
                batch = req.get("batch")
                if batch is not None:
                    batch = int(batch)
                gc_ids = req.get("gc_ids")
                # Response-size sanity cap BEFORE generating: a "codes"
                # JSON body past the cap must ride "wav_b64" instead.
                b_eff = len(gc_ids) if gc_ids is not None else (batch or 1)
                if (req.get("format", "codes") == "codes"
                        and b_eff * n > service.CODES_RESPONSE_CAP):
                    raise ValueError(
                        f"codes response would carry {b_eff * n} ints "
                        f"(cap {service.CODES_RESPONSE_CAP}); use "
                        '"format": "wav_b64" or request fewer '
                        "samples/streams")
                waves = service.generate_batch(
                    n, batch=batch, gc_ids=gc_ids,
                    temperature=float(req.get("temperature", 1.0)),
                    seed=int(req.get("seed", 0)))
            except (ValueError, KeyError, TypeError,
                    json.JSONDecodeError) as e:
                self._json(400, {"error": str(e)})
                return
            if req.get("format", "codes") == "wav_b64":
                import base64
                self._json(200, {"wavs_b64": [
                    base64.b64encode(
                        _wav_bytes(w, service.sample_rate)).decode()
                    for w in waves]})
                return
            from wavenet_tpu.audio import mu_law_encode_np
            self._json(200, {"codes": mu_law_encode_np(
                waves, service.config.quantization_channels).tolist()})

    return Handler


def main(argv=None):
    ap = argparse.ArgumentParser(description="WaveNet generation server")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--wavenet_params", default="./wavenet_params.json")
    ap.add_argument("--port", type=int, default=8765)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--gc_channels", type=int, default=None)
    ap.add_argument("--gc_cardinality", type=int, default=None)
    ap.add_argument("--sampler", default="auto",
                    choices=["auto", "pallas", "scan"])
    ap.add_argument("--draft_checkpoint", default=None,
                    help="Draft model checkpoint: serve with speculative "
                         "decoding (target-exact distribution).")
    ap.add_argument("--draft_wavenet_params", default=None)
    ap.add_argument("--speculative_k", type=int, default=8)
    ap.add_argument("--max_batch", type=int, default=1024,
                    help="Largest /generate_batch batch accepted "
                         "(requests past it get a 400).")
    args = ap.parse_args(argv)

    print("Loading + warming model...")
    service = GenerationService(args.checkpoint, args.wavenet_params,
                                args.gc_channels, args.gc_cardinality,
                                args.sampler,
                                draft_checkpoint=args.draft_checkpoint,
                                draft_wavenet_params=args.draft_wavenet_params,
                                speculative_k=args.speculative_k,
                                max_batch=args.max_batch)
    server = ThreadingHTTPServer((args.host, args.port),
                                 make_handler(service))
    print(f"Serving on http://{args.host}:{args.port} "
          f"({service.sampler_name} sampler)")
    server.serve_forever()


if __name__ == "__main__":
    main()
