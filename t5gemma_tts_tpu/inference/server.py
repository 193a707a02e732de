"""Batching TTS server: keeps the decode batch axis full under live traffic.

The decode engine's throughput scales with batch (RTF 24x at batch 16 ->
48x at batch 64 on one v5e chip), so a serving layer that groups concurrent
requests is the difference between per-request and per-chip economics. This
is a deliberately simple, dependency-free core (threading, no asyncio):

  submit(request) -> Future        # from any thread
  a collector thread batches up to ``max_batch`` requests, waiting at most
  ``max_wait_ms`` after the first arrival, then runs one compiled
  synthesize_batch and resolves the futures.

Requests in one collection window are PLANNED (duration estimate, prompt
tokenization) and then packed per frame bucket: each group decodes with its
own compiled program, so a 2 s utterance never pays a 20 s utterance's
generation-buffer trip count. Groups run shortest-bucket-first, which
resolves the cheap futures earliest. The reference has no serving layer
beyond single-request Gradio (reference inference_gradio.py), so this is
beyond-parity surface.
"""

from __future__ import annotations

import logging
import queue
import threading
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import List, Optional

from ..config import DecodeConfig
from .pipeline import Request, SynthesisResult, TTSPipeline

log = logging.getLogger(__name__)


@dataclass
class ServerStats:
    requests: int = 0
    batches: int = 0
    batch_sizes: List[int] = field(default_factory=list)


class BatchingServer:
    def __init__(
        self,
        pipeline: TTSPipeline,
        dcfg: Optional[DecodeConfig] = None,
        max_batch: int = 32,
        max_wait_ms: float = 50.0,
        decode_audio: bool = True,
        warmup: bool = False,
        group_by_bucket: bool = True,
    ):
        if warmup:
            # front-load decode-program compiles for the common buckets so
            # the first real request is not a cold compile (the persistent
            # cache makes this near-free on restarts)
            pipeline.warmup(batch_sizes=(1, max_batch),
                            text_buckets=(64,), prompt_buckets=(64,),
                            frame_buckets=(512,), dcfg=dcfg)
        self.pipeline = pipeline
        self.dcfg = dcfg or DecodeConfig()
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        self.decode_audio = decode_audio
        self.group_by_bucket = group_by_bucket
        self.stats = ServerStats()
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------------

    def submit(self, request: Request) -> "Future[SynthesisResult]":
        fut: "Future[SynthesisResult]" = Future()
        self._q.put((request, fut))
        return fut

    def synthesize(self, request: Request,
                   timeout: Optional[float] = None) -> SynthesisResult:
        return self.submit(request).result(timeout)

    def close(self) -> None:
        self._stop.set()
        self._thread.join(timeout=5)

    # ------------------------------------------------------------------

    def _collect(self):
        """Block for the first request, then fill the batch for max_wait."""
        try:
            first = self._q.get(timeout=0.1)
        except queue.Empty:
            return []
        batch = [first]
        import time

        deadline = time.time() + self.max_wait
        while len(batch) < self.max_batch:
            remaining = deadline - time.time()
            if remaining <= 0:
                break
            try:
                batch.append(self._q.get(timeout=remaining))
            except queue.Empty:
                break
        return batch

    def _loop(self):
        while not self._stop.is_set():
            batch = self._collect()
            if not batch:
                continue
            self.stats.requests += len(batch)

            # plan each request; a bad request fails only its own future
            groups: "dict[int, list]" = {}
            for req, fut in batch:
                try:
                    planned = self.pipeline.plan_request(req)
                except Exception as exc:
                    log.exception("request planning failed")
                    fut.set_exception(exc)
                    continue
                key = (self.pipeline.frame_bucket(planned)
                       if self.group_by_bucket else 0)
                groups.setdefault(key, []).append((planned, fut))

            # shortest bucket first: cheap futures resolve earliest
            for key in sorted(groups):
                items = groups[key]
                futures = [f for _, f in items]
                self.stats.batches += 1
                self.stats.batch_sizes.append(len(items))
                try:
                    results = self.pipeline.synthesize_planned(
                        [p for p, _ in items], self.dcfg, quiet=True,
                        decode_audio=self.decode_audio,
                    )
                    for fut, res in zip(futures, results):
                        fut.set_result(res)
                except Exception as exc:  # resolve the group with the error
                    log.exception("batch synthesis failed")
                    for fut in futures:
                        if not fut.done():
                            fut.set_exception(exc)
