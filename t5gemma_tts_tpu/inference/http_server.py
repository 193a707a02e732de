"""HTTP front-end for the batching TTS server (stdlib-only).

POST /synthesize     JSON body -> 16-bit PCM wav bytes (audio/wav)
    {"target_text": "...", "target_duration": 5.0, "lang": "en",
     "audio_path": "/path/ref.wav", "prompt_transcript": "...",
     "repeat_prompt": 0, "concat": false}
POST /synthesize_streaming   same body -> chunked audio/wav: a streaming
    RIFF header (sizes 0xFFFFFFFF, the standard live-WAV convention)
    followed by PCM16 pieces as decode segments finalize — time-to-first
    audio is ~1 s of generation, not the whole utterance. Bypasses the
    batch collector (single-row decode via pipeline.synthesize_streaming).
GET  /healthz        JSON server stats (never authenticated — probes)
GET  /metrics        Prometheus text exposition (request/batch counters,
                     synthesized audio seconds, uptime)

Optional bearer auth: pass --auth_token (or set T5G_AUTH_TOKEN); when set,
/synthesize* and /metrics require ``Authorization: Bearer <token>``.

Requests from concurrent clients batch on the decode axis via
BatchingServer (cross-bucket packed); each HTTP connection is handled on
its own thread (ThreadingHTTPServer) and blocks on its future. The
reference has no network serving surface (Gradio only,
reference inference_gradio.py) — this is beyond-parity.
"""

from __future__ import annotations

import hmac
import io
import json
import logging
import threading
import time
import wave
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from .pipeline import Request
from .server import BatchingServer

log = logging.getLogger(__name__)


def wav_stream_header(sample_rate: int) -> bytes:
    """RIFF/WAVE header with unknown (0xFFFFFFFF) sizes for live streams."""
    import struct

    return (b"RIFF" + struct.pack("<I", 0xFFFFFFFF) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                                    sample_rate * 2, 2, 16)
            + b"data" + struct.pack("<I", 0xFFFFFFFF))


def pcm16(wav: np.ndarray) -> bytes:
    return (np.clip(np.asarray(wav, np.float32), -1, 1)
            * 32767).astype("<i2").tobytes()


def wav_bytes(wav: np.ndarray, sample_rate: int) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm16(wav))
    return buf.getvalue()


class _Handler(BaseHTTPRequestHandler):
    server_version = "t5gemma-tts-tpu/1.0"
    protocol_version = "HTTP/1.1"       # chunked transfer for /…_streaming
    backend: BatchingServer = None  # type: ignore[assignment]
    sample_rate: int = 44100
    request_timeout: float = 600.0
    auth_token: Optional[str] = None
    started_at: float = 0.0
    audio_seconds: "list" = None  # [total] mutable cell shared per server
    metrics_lock: "threading.Lock" = None  # guards the += (handler threads)

    def _add_audio_seconds(self, secs: float) -> None:
        with self.metrics_lock:
            self.audio_seconds[0] += secs

    def log_message(self, fmt, *args):  # route to logging, not stderr
        log.debug("http: " + fmt, *args)

    def _json(self, code: int, obj) -> None:
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _authorized(self) -> bool:
        """Bearer-token check (constant-time compare); /healthz is exempt
        so liveness probes never need credentials."""
        if not self.auth_token:
            return True
        got = self.headers.get("Authorization", "")
        return got.startswith("Bearer ") and hmac.compare_digest(
            got[len("Bearer "):], self.auth_token)

    def do_GET(self):
        if self.path == "/healthz":
            st = self.backend.stats
            return self._json(200, {
                "ok": True,
                "requests": st.requests,
                "batches": st.batches,
                "batch_sizes": st.batch_sizes[-16:],
                # "fast" while a --fast_start server still serves from the
                # zero-Pallas tier; "full" once the serving tier swapped in
                "tier": getattr(self.backend, "tier", "full"),
            })
        if self.path == "/metrics":
            if not self._authorized():
                return self._json(401, {"error": "unauthorized"})
            st = self.backend.stats
            sizes = st.batch_sizes
            lines = [
                "# TYPE tts_requests_total counter",
                f"tts_requests_total {st.requests}",
                "# TYPE tts_batches_total counter",
                f"tts_batches_total {st.batches}",
                "# TYPE tts_last_batch_size gauge",
                f"tts_last_batch_size {sizes[-1] if sizes else 0}",
                "# TYPE tts_audio_seconds_total counter",
                f"tts_audio_seconds_total {self.audio_seconds[0]:.3f}",
                "# TYPE tts_uptime_seconds gauge",
                f"tts_uptime_seconds {time.time() - self.started_at:.1f}",
            ]
            body = ("\n".join(lines) + "\n").encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/plain; version=0.0.4")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        return self._json(404, {"error": "not found"})

    def do_POST(self):
        # drain the request body FIRST: replying (404/401) without
        # consuming it desynchronizes the HTTP/1.1 keep-alive stream —
        # the unread JSON body parses as the next request line (400s)
        try:
            n = int(self.headers.get("Content-Length", 0))
        except ValueError:
            self.close_connection = True  # length unknown: cannot resync
            return self._json(400, {"error": "bad Content-Length"})
        raw = self.rfile.read(n) if n else b""
        if self.path not in ("/synthesize", "/synthesize_streaming"):
            return self._json(404, {"error": "not found"})
        if not self._authorized():
            return self._json(401, {"error": "unauthorized"})
        try:
            payload = json.loads(raw or b"{}")
            text = payload.get("target_text", "")
            if not text:
                return self._json(400, {"error": "target_text required"})
            req = Request(
                target_text=text,
                lang=payload.get("lang"),
                audio_path=payload.get("audio_path"),
                prompt_transcript=payload.get("prompt_transcript"),
                target_duration=payload.get("target_duration"),
                repeat_prompt=payload.get("repeat_prompt", 0),
                prompt_end_frame=payload.get("prompt_end_frame", -1),
            )
        except Exception as exc:
            return self._json(400, {"error": str(exc)})
        if self.path == "/synthesize_streaming":
            return self._stream(req)
        try:
            res = self.backend.synthesize(req, timeout=self.request_timeout)
        except Exception as exc:
            log.exception("synthesis failed")
            return self._json(500, {"error": str(exc)})
        wav = res.concat_wav if payload.get("concat") else res.wav
        if wav is None:  # decode_audio=False server: return tokens
            return self._json(200, {
                "frames": np.asarray(res.gen_frames).tolist(),
                "rtf": res.rtf,
            })
        self._add_audio_seconds(len(np.asarray(wav)) / self.sample_rate)
        body = wav_bytes(wav, self.sample_rate)
        self.send_response(200)
        self.send_header("Content-Type", "audio/wav")
        self.send_header("Content-Length", str(len(body)))
        self.send_header("X-RTF", f"{res.rtf:.3f}")
        self.end_headers()
        self.wfile.write(body)


    def _stream(self, req: Request) -> None:
        """Chunked-transfer streaming synthesis (single-row decode)."""
        try:
            gen = self.backend.pipeline.synthesize_streaming(req)
        except Exception as exc:
            log.exception("streaming setup failed")
            return self._json(500, {"error": str(exc)})

        self.send_response(200)
        self.send_header("Content-Type", "audio/wav")
        self.send_header("Transfer-Encoding", "chunked")
        self.end_headers()

        def chunk(b: bytes) -> None:
            self.wfile.write(f"{len(b):X}\r\n".encode() + b + b"\r\n")

        try:
            chunk(wav_stream_header(self.sample_rate))
            for piece in gen:
                body = pcm16(piece)
                if body:
                    self._add_audio_seconds(len(body) / 2 / self.sample_rate)
                    chunk(body)
            self.wfile.write(b"0\r\n\r\n")  # chunked terminator
        except Exception:
            # NO terminator on failure: aborting the connection is the only
            # way a chunked client can distinguish truncation from success
            log.exception("streaming synthesis failed mid-stream")
            self.close_connection = True


def serve(backend: BatchingServer, host: str = "0.0.0.0", port: int = 8000,
          sample_rate: int = 44100,
          block: bool = True,
          auth_token: Optional[str] = None) -> Optional[ThreadingHTTPServer]:
    """Start the HTTP server. With block=False returns the server (caller
    shuts it down with .shutdown()); the port actually bound is
    ``server.server_address[1]`` (pass port=0 for an ephemeral port)."""
    handler = type("Handler", (_Handler,), {
        "backend": backend, "sample_rate": sample_rate,
        "auth_token": auth_token, "started_at": time.time(),
        "audio_seconds": [0.0], "metrics_lock": threading.Lock(),
    })
    httpd = ThreadingHTTPServer((host, port), handler)
    if block:
        log.info("serving on %s:%d", *httpd.server_address)
        httpd.serve_forever()
        return None
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd


def main(argv=None):
    from ..utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    """CLI: python -m t5gemma_tts_tpu.inference.http_server --model_dir ..."""
    import argparse

    from .gradio_app import _load_resources

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model_dir", default=None)
    ap.add_argument("--random_model", default=None, metavar="PRESET",
                    help="serve a random-initialized backbone of this "
                         "preset instead of --model_dir weights (bench "
                         "cold-serve probe / testing only)")
    ap.add_argument("--codec_dir", default=None)
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--max_batch", type=int, default=32)
    ap.add_argument("--max_wait_ms", type=float, default=50.0)
    ap.add_argument("--continuous", action="store_true",
                    help="resident-batch continuous batching instead of "
                         "windowed collection (see inference/server.py)")
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--random_codec", action="store_true",
                    help="random codec weights (testing only)")
    ap.add_argument("--no_warmup", action="store_true")
    ap.add_argument("--quantize", default="none",
                    choices=["none", "int8", "int4"],
                    help="decode-weight quantization (int8 = the serving "
                         "config bench.py records; int4 = batch-1 latency)")
    ap.add_argument("--kv_cache", default="auto",
                    choices=["auto", "dense", "paged", "paged_f8",
                             "paged_i8"],
                    help="decode KV-cache strategy; the bench serving "
                         "config is paged_i8 (see DecodeConfig.kv_cache)")
    ap.add_argument("--auth_token", default=None,
                    help="require 'Authorization: Bearer <token>' on "
                         "/synthesize* and /metrics (default: "
                         "$T5G_AUTH_TOKEN if set; /healthz stays open)")
    ap.add_argument("--fast_start", action="store_true",
                    help="serve the first requests from a zero-Pallas "
                         "tier (bf16 weights, dense KV, unfused "
                         "attention — ~10 s to first audio) while the "
                         "full serving config compiles in the background, "
                         "then switch (inference/server.py TieredBackend)")
    args = ap.parse_args(argv)
    import os as _os

    if not args.model_dir and not args.random_model:
        ap.error("--model_dir or --random_model required")
    auth_token = args.auth_token or _os.environ.get("T5G_AUTH_TOKEN") or None

    from ..config import DecodeConfig

    def load_pipe(quantize: str):
        if args.random_model:
            return _random_model_pipeline(args.random_model,
                                          args.codec_dir, quantize)
        return _load_resources(args.model_dir, args.codec_dir,
                               args.random_codec, quantize)

    def build_backend(pipe, dcfg, warmup=True):
        if args.continuous:
            from .server import ContinuousServer

            return ContinuousServer(pipe, dcfg, slots=args.slots)
        return BatchingServer(pipe, dcfg, max_batch=args.max_batch,
                              max_wait_ms=args.max_wait_ms,
                              warmup=warmup and not args.no_warmup)

    dcfg = DecodeConfig(kv_cache=args.kv_cache)
    if args.fast_start:
        from .server import TieredBackend

        # fast tier: zero Pallas content — bf16 (unquantized) weights,
        # dense KV, unfused attention. T5G_FUSED_ATTN only scopes the
        # tier's warmup traces; later traces under the restored env still
        # run Pallas-free on the dense/bf16 config.
        prev = _os.environ.get("T5G_FUSED_ATTN")
        _os.environ["T5G_FUSED_ATTN"] = "0"
        try:
            fast_pipe = load_pipe("none")
            fast = BatchingServer(
                fast_pipe, DecodeConfig(kv_cache="dense"),
                max_batch=min(8, args.max_batch),
                max_wait_ms=args.max_wait_ms,
                warmup=not args.no_warmup,
                warmup_batch_sizes=(1,), warmup_frame_buckets=(256,))
        finally:
            if prev is None:
                _os.environ.pop("T5G_FUSED_ATTN", None)
            else:
                _os.environ["T5G_FUSED_ATTN"] = prev

        def full_factory():
            # reuse the fast tier's fused bf16 params (a second full load
            # would OOM a 16 GB chip at 2b-2b); quantize WITHOUT donation
            # so the fast tier keeps serving until the drain
            from .pipeline import TTSPipeline

            full_pipe = TTSPipeline(
                fast_pipe.params, fast_pipe.cfg, fast_pipe.encode_text,
                fast_pipe.audio_tokenizer, fuse_matmuls=False,
                int8=args.quantize == "int8", int4=args.quantize == "int4",
                donate_quant=False)
            return build_backend(full_pipe, dcfg)

        backend = TieredBackend(fast, full_factory)
        pipe = fast_pipe
    else:
        pipe = load_pipe(args.quantize)
        backend = build_backend(pipe, dcfg)
    sr = (pipe.audio_tokenizer.sample_rate
          if pipe.audio_tokenizer is not None else 44100)
    serve(backend, args.host, args.port, sample_rate=sr,
          auth_token=auth_token)


def _random_model_pipeline(preset: str, codec_dir, quantize: str):
    """Random-initialized pipeline for the bench cold-serve probe and
    tests: throughput/latency are weight-value independent (bench.py),
    and no released checkpoint can leave this zero-egress environment."""
    from argparse import Namespace

    import jax

    from ..config import VoiceConfig, backbone_preset
    from ..models import voice
    from .cli import _load_codec
    from .pipeline import TTSPipeline

    cfg = VoiceConfig(backbone=backbone_preset(preset))
    params = jax.jit(lambda k: voice.init_params(k, cfg))(
        jax.random.PRNGKey(0))
    codec_args = Namespace(codec_dir=codec_dir, random_codec=True,
                           xcodec2_model_name=None)
    audio_tok = _load_codec(codec_args, None)

    def text_tok(s: str):
        return [max(3, ord(c) % 255) for c in s]

    return TTSPipeline(params, cfg, text_tok, audio_tok,
                       int8=quantize == "int8", int4=quantize == "int4")


if __name__ == "__main__":
    main()
