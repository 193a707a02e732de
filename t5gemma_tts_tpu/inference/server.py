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
import time
from concurrent.futures import Future, ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import List, Optional

from ..config import DecodeConfig
from .pipeline import Request, SynthesisResult, TTSPipeline

log = logging.getLogger(__name__)


class ContinuousServer:
    """vLLM-style continuous batching over a resident decode batch.

    A fixed batch of ``slots`` decodes in bounded segments
    (decode/continuous.py); between segments, finished requests are
    harvested and queued requests prefill into the freed slots — no
    collection windows, the batch axis stays full under streaming load.
    Each request keeps its own PRNG clock, so its audio is bit-identical
    to what it would get alone (pinned by tests/test_continuous.py).

    Fixed shape contract: text/prompt/generation buckets are set at
    construction; a request that does not fit gets its future failed (route
    oversized traffic to a BatchingServer or a second instance).

    Validated up to 192 slots on one v5e chip (135.9x realtime aggregate
    at 192, 127.0x at 128, paged_i8 — docs/DESIGN.md): admission compiles
    as two chained programs — the shared batch-1 prefill, then a
    scatter-only install (decode/continuous.py install_row) — because the
    fused prefill+scatter program failed terminal compile at 128 slots."""

    def __init__(
        self,
        pipeline: TTSPipeline,
        dcfg: Optional[DecodeConfig] = None,
        slots: int = 8,
        text_bucket: int = 64,
        prompt_bucket: int = 64,
        segment_frames: int = 50,
        decode_audio: bool = True,
    ):
        import jax
        import jax.numpy as jnp

        from ..decode import continuous

        self.pipeline = pipeline
        self.dcfg = dcfg or DecodeConfig()
        self.slots = slots
        self.text_bucket = text_bucket
        self.prompt_bucket = prompt_bucket
        self.segment_frames = segment_frames
        self.decode_audio = decode_audio
        self.stats = ServerStats()
        self._jnp, self._jax = jnp, jax
        self._fns = continuous.make_fns(pipeline.cfg, self.dcfg)
        self._continuous = continuous
        self._state = continuous.init_slots(
            pipeline.cfg, self.dcfg, slots, text_bucket, prompt_bucket)
        self._slot_futures: list = [None] * slots
        self._base_rng = jax.random.PRNGKey(self.dcfg.seed)
        self._admitted = 0
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        # Vocoder decode of finished requests runs on this pool, NOT the
        # scheduler thread: one finished request must not stall token
        # generation for every resident slot for the full vocoder latency.
        self._finisher = ThreadPoolExecutor(
            max_workers=2, thread_name_prefix="ContinuousServer-finish")
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

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
        self._finisher.shutdown(wait=True)

    # ------------------------------------------------------------------

    def _try_admit(self, req: Request, fut) -> bool:
        import numpy as np

        jnp = self._jnp
        free = [i for i, f in enumerate(self._slot_futures) if f is None]
        if not free:
            return False
        try:
            planned = self.pipeline.plan_request(req)
            need = self.pipeline._need_frames(planned.target,
                                              len(planned.prompt))
            if (len(planned.text) > self.text_bucket
                    or len(planned.prompt) > self.prompt_bucket
                    or need > self.dcfg.max_frames):
                raise ValueError(
                    f"request exceeds resident buckets (text "
                    f"{len(planned.text)}/{self.text_bucket}, prompt "
                    f"{len(planned.prompt)}/{self.prompt_bucket}, frames "
                    f"{need}/{self.dcfg.max_frames})")
        except Exception as exc:
            fut.set_exception(exc)
            return True
        slot = free[0]
        s = self.pipeline.cfg.special
        x = np.zeros((self.text_bucket,), np.int32)
        x[: len(planned.text)] = planned.text
        p = np.full((self.prompt_bucket,), s.pad, np.int32)
        p[: len(planned.prompt)] = planned.prompt
        rng = self._jax.random.fold_in(self._base_rng, self._admitted)
        self._admitted += 1
        self._state = self._fns.admit(
            self.pipeline.params, self._state, jnp.int32(slot),
            jnp.asarray(x), jnp.int32(len(planned.text)),
            jnp.asarray(p), jnp.int32(len(planned.prompt)),
            jnp.int32(planned.target), rng)
        self._slot_futures[slot] = (fut, planned)
        self.stats.requests += 1
        return True

    def _finish(self, slot: int, gen_tokens) -> None:
        """Free the slot immediately; hand audio decoding to the finisher
        pool so the segment loop keeps generating tokens."""
        fut, planned = self._slot_futures[slot]
        self._slot_futures[slot] = None
        self._finisher.submit(self._finish_work, slot, gen_tokens, fut,
                              planned)

    def _finish_work(self, slot: int, gen_tokens, fut, planned) -> None:
        import numpy as np

        try:
            cfg = self.pipeline.cfg
            strip = {cfg.special.y_sep, cfg.eog_inference}
            gen = np.asarray(gen_tokens)
            gen = gen[~np.isin(gen, list(strip))]
            concat = np.concatenate([
                np.asarray([t for t in planned.prompt if t not in strip],
                           np.int64),
                gen,
            ])
            wav = concat_wav = None
            if (self.decode_audio
                    and self.pipeline.audio_tokenizer is not None
                    and len(gen)):
                wav = self.pipeline.audio_tokenizer.decode(
                    gen[None, None, :])[0, 0]
                if len(concat) > len(gen):
                    concat_wav = self.pipeline.audio_tokenizer.decode(
                        concat[None, None, :])[0, 0]
            fut.set_result(SynthesisResult(
                wav=wav,
                concat_wav=concat_wav if concat_wav is not None else wav,
                gen_frames=gen, concat_frames=concat,
                tokens_per_sec=0.0, rtf=0.0, inference_time=0.0,
            ))
        except Exception as exc:  # the future is already popped: resolve it
            log.exception("finishing slot %d failed", slot)
            if not fut.done():
                fut.set_exception(exc)

    def _loop(self) -> None:
        jnp = self._jnp
        pending: list = []   # loop-local overflow (FIFO ahead of the queue)
        while not self._stop.is_set():
            # drain new arrivals, then admit FIFO while slots are free
            try:
                while True:
                    pending.append(self._q.get_nowait())
            except queue.Empty:
                pass
            while pending and self._try_admit(*pending[0]):
                pending.pop(0)

            if not any(f is not None for f in self._slot_futures):
                try:
                    pending.append(self._q.get(timeout=0.1))
                except queue.Empty:
                    continue
                if self._try_admit(*pending[0]):
                    pending.pop(0)
                if not any(f is not None for f in self._slot_futures):
                    continue

            self._state = self._fns.segment(
                self.pipeline.params, self._state,
                jnp.int32(self.segment_frames))
            self._state, outs = self._continuous.harvest(self._state)
            if outs:
                self.stats.batches += 1
                self.stats.batch_sizes.append(len(outs))
            for slot, toks in outs:
                self._finish(slot, toks)


class TieredBackend:
    """Serve from a fast-start tier while the full serving tier compiles.

    The bench record's warm-start decomposition (docs/DESIGN.md "Warm
    start") shows the megakernel serving program pays a large terminal-side
    first-dispatch load, while a zero-Pallas tier (bf16 weights, dense KV,
    unfused attention) is servable in ~10 s. This backend makes that tier
    the ACTUAL first-request path (VERDICT r4 next #9): construct with the
    already-warm fast backend, and a factory that builds + warms the full
    serving backend on a background thread; requests route to whichever
    tier is current, and the swap is a single attribute store (atomic under
    the GIL). The fast tier is drained and closed ``drain_sec`` after the
    swap, releasing its bf16 params.
    """

    def __init__(self, fast, full_factory, drain_sec: float = 60.0,
                 build_delay_sec: float = 120.0):
        self._cur = fast
        self.tier = "fast"
        self._drain_sec = drain_sec
        self._build_delay = build_delay_sec
        self._first_served = threading.Event()
        self._builder = threading.Thread(
            target=self._build, args=(full_factory,), daemon=True,
            name="TieredBackend-build")
        self._builder.start()

    def _build(self, factory) -> None:
        # Single-chip ordering: the full tier's warmup EXECUTES megakernel
        # programs, each of which can pay the terminal's first-dispatch
        # load (minutes — docs/DESIGN.md "Warm start"). Device dispatches
        # are FIFO and non-preemptible, so starting that while the fast
        # tier is serving its first request would queue the request behind
        # the cliff — wait until the fast tier has actually answered once
        # (or build_delay_sec, if no traffic arrives).
        self._first_served.wait(self._build_delay)
        try:
            full = factory()
        except Exception:
            log.exception("full-tier build failed; staying on the fast tier")
            return
        old, self._cur = self._cur, full
        self.tier = "full"
        log.info("switched to the full serving tier")

        def drain() -> None:
            time.sleep(self._drain_sec)
            try:
                old.close()
            except Exception:
                log.exception("fast-tier close failed")

        threading.Thread(target=drain, daemon=True,
                         name="TieredBackend-drain").start()

    @property
    def stats(self):
        return self._cur.stats

    @property
    def pipeline(self):
        return self._cur.pipeline

    def submit(self, request: Request) -> "Future[SynthesisResult]":
        return self._cur.submit(request)

    def synthesize(self, request: Request,
                   timeout: Optional[float] = None) -> SynthesisResult:
        res = self._cur.synthesize(request, timeout)
        self._first_served.set()   # unblocks the deferred full-tier build
        return res

    def close(self) -> None:
        self._first_served.set()
        self._cur.close()


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
        warmup_batch_sizes: Optional[tuple] = None,
        warmup_text_buckets: tuple = (64,),
        warmup_prompt_buckets: tuple = (64,),
        warmup_frame_buckets: tuple = (256, 512),
        warmup_execute: bool = True,
    ):
        if warmup:
            # front-load decode programs for the CONFIGURED bucket grid —
            # EXECUTED, not just compiled: on the tunneled TPU terminal
            # every program additionally pays a first-dispatch load on
            # first execution (minutes, environmental — docs/DESIGN.md
            # "Warm start"), so AOT compiles alone still left the first
            # real request to time out. The vocoder's per-length-bucket
            # programs are executed too. Shapes outside the grid are
            # ROUTED onto a covering warm shape by synthesize_planned
            # (warm-shape routing) instead of compiling at request time.
            pipeline.warmup(
                batch_sizes=warmup_batch_sizes or (1, max_batch),
                text_buckets=warmup_text_buckets,
                prompt_buckets=warmup_prompt_buckets,
                frame_buckets=warmup_frame_buckets, dcfg=dcfg,
                execute=warmup_execute,
                vocoder=warmup_execute and decode_audio)
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
