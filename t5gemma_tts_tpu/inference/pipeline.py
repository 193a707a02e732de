"""End-to-end TTS inference pipeline (text [+ reference audio] -> waveform).

Functional equivalent of the reference ``inference_one_sample``
(reference: inference_tts_utils.py:141-378): reference-audio tokenization,
``repeat_prompt`` (int or "max"), y_sep/x_sep assembly, target-length
computation (prompt + codec_sr * target_secs), jitted decode, sep/eos
stripping, codec decode, and tokens-per-second / RTF reporting.

TPU-first differences:
- shapes are bucketed (text, prompt, generation buffer) so repeated calls
  reuse compiled programs;
- ``synthesize_batch`` decodes many utterances in one compiled program —
  the reference is restricted to batch 1.
"""

from __future__ import annotations

import bisect
import dataclasses
import logging
import time
from typing import Callable, List, Optional, Sequence, Tuple, Union

import jax
import numpy as np

from ..codec.audio_tokenizer import AudioTokenizer, tokenize_audio
from ..config import DecodeConfig, VoiceConfig
from ..decode import engine
from .textnorm import normalize_text_with_lang

log = logging.getLogger(__name__)

TEXT_BUCKETS = [32, 64, 128, 256, 512, 1024]
PROMPT_BUCKETS = [64, 128, 256, 512, 1024, 2048]
FRAME_BUCKETS = [256, 512, 1024, 2048, 4096, 8192]


def _bucket(n: int, buckets: Sequence[int]) -> int:
    i = bisect.bisect_left(buckets, max(n, 1))
    return buckets[min(i, len(buckets) - 1)] if n <= buckets[-1] else n


@dataclasses.dataclass
class SynthesisResult:
    wav: np.ndarray                 # generated waveform [S]
    concat_wav: Optional[np.ndarray]  # prompt+generated decode (cloning)
    gen_frames: np.ndarray          # stripped generated codec tokens
    concat_frames: np.ndarray
    tokens_per_sec: float
    rtf: float                      # audio-seconds per wall-second
    inference_time: float


@dataclasses.dataclass
class Request:
    target_text: str
    lang: Optional[str] = None
    audio_path: Optional[str] = None
    prompt_transcript: Optional[str] = None
    target_duration: Optional[float] = None  # seconds
    repeat_prompt: Union[int, str] = 0
    prompt_end_frame: int = -1


@dataclasses.dataclass
class PlannedRequest:
    """A request after host-side assembly: token ids + target length.

    Planning (duration estimation, prompt-audio tokenization, text
    normalization/tokenization) is separated from decoding so a serving
    layer can group planned requests by shape bucket before paying for a
    compiled decode program (see inference/server.py)."""

    text: List[int]
    prompt: List[int]
    target: int                    # tgt_y_len = prompt + sr * target_secs


class TTSPipeline:
    def __init__(
        self,
        params,
        cfg: VoiceConfig,
        text_tokenizer: Callable[[str], List[int]],
        audio_tokenizer: Optional[AudioTokenizer] = None,
        audio_max_length: float = 120.0,
        fuse_matmuls: bool = True,
        int8: bool = False,
        int4: bool = False,
        donate_quant: bool = True,
    ):
        import jax as _jax

        from ..utils.compile_cache import enable_persistent_cache

        enable_persistent_cache()
        if fuse_matmuls:
            from ..models.t5gemma import fuse_for_decode

            params = _jax.jit(fuse_for_decode, donate_argnums=0)(params)
        if int8 or int4:
            # int4 = the batch-1 LATENCY mode: the six megakernel matmuls
            # pack to lanes4 int4 (halves the per-step weight DMA, the
            # batch-1 bound), everything else int8. Documented
            # speed/quality tradeoff — ops/quant.py lanes4 header.
            # donate_quant=False keeps the input tree alive — required
            # when another pipeline still serves from it (TieredBackend's
            # fast tier shares its fused bf16 params with the full tier's
            # quantization; inference/http_server.py --fast_start).
            from ..ops.quant import quantize_params_for_decode

            wb = 4 if int4 else 8
            hd = cfg.backbone.decoder.head_dim
            params = _jax.jit(
                lambda p: quantize_params_for_decode(
                    p, weight_bits=wb, head_dim=hd),
                donate_argnums=(0,) if donate_quant else ())(params)
        self.params = params
        self.cfg = cfg
        self.encode_text = text_tokenizer
        self.audio_tokenizer = audio_tokenizer
        self.audio_max_length = audio_max_length
        # (batch, text, prompt, frames) shapes with a live compiled decode
        # program — populated by warmup() and by every synthesize_planned
        # compile; synthesize_planned prefers covering warm shapes over
        # compiling new programs (see the routing comment there)
        self._warm_shapes: set = set()

    # ------------------------------------------------------------------
    # assembly (reference inference_tts_utils.py:182-286)
    # ------------------------------------------------------------------

    def _prompt_tokens(self, req: Request, codec_sr: int,
                       target_secs: float) -> List[int]:
        s = self.cfg.special
        if not req.audio_path or str(req.audio_path).lower() in {"", "none", "null"}:
            return []
        assert self.audio_tokenizer is not None, "audio tokenizer required for cloning"
        frames = tokenize_audio(
            self.audio_tokenizer, req.audio_path,
            num_frames=req.prompt_end_frame if req.prompt_end_frame > 0 else -1,
        )  # [1, T, 1]
        base = frames[0, :, 0].tolist()
        tokens = list(base)
        if isinstance(req.repeat_prompt, int) and req.repeat_prompt > 0:
            tokens = tokens + base * req.repeat_prompt
        elif isinstance(req.repeat_prompt, str) and req.repeat_prompt.lower() == "max":
            while (len(tokens) + codec_sr * target_secs + len(base)
                   < self.audio_max_length * codec_sr):
                tokens += base
        if tokens:
            tokens.append(s.y_sep)
        return tokens

    def _text_tokens(self, req: Request) -> Tuple[List[int], str]:
        target_text, lang = normalize_text_with_lang(req.target_text, req.lang)
        prefix = req.prompt_transcript
        if prefix:
            prefix, _ = normalize_text_with_lang(prefix, lang)
        tokens = list(self.encode_text(target_text.strip()))
        if prefix:
            ptoks = list(self.encode_text(prefix.strip()))
            if self.cfg.x_sep_token is not None:
                tokens = ptoks + [self.cfg.x_sep_token] + tokens
            else:
                tokens = ptoks + tokens
        if self.cfg.add_eos_to_text:
            tokens.append(self.cfg.add_eos_to_text)
        if self.cfg.add_bos_to_text:
            tokens = [self.cfg.add_bos_to_text] + tokens
        return tokens, lang or "en"

    # ------------------------------------------------------------------
    # synthesis
    # ------------------------------------------------------------------

    def plan_request(self, req: Request) -> PlannedRequest:
        """Host-side assembly of one request (no device work)."""
        from .duration import estimate_duration

        sr = int(self.cfg.encodec_sr)
        target_secs = req.target_duration
        if target_secs is None:
            target_secs = estimate_duration(
                req.target_text, req.audio_path, req.prompt_transcript,
                req.lang,
            )
        prompt = self._prompt_tokens(req, sr, target_secs)
        text, _ = self._text_tokens(req)
        return PlannedRequest(text=text, prompt=prompt,
                              target=len(prompt) + int(sr * target_secs))

    def _need_frames(self, target: int, prompt_len: int) -> int:
        """Generation-buffer demand of one request (single source of truth
        for both per-request bucketing and the batch max_frames)."""
        sr = int(self.cfg.encodec_sr)
        return target - prompt_len + int(sr * self.cfg.extra_cutoff) + 8

    def frame_bucket(self, planned: PlannedRequest) -> int:
        """The generation-buffer bucket this request alone would use — the
        decode loop's trip count, hence its cost driver."""
        return _bucket(self._need_frames(planned.target, len(planned.prompt)),
                       FRAME_BUCKETS)

    def synthesize_batch(
        self,
        requests: Sequence[Request],
        dcfg: Optional[DecodeConfig] = None,
        seed: Optional[int] = None,
        quiet: bool = False,
        decode_audio: bool = True,
    ) -> List[SynthesisResult]:
        """Batched synthesis: all requests decode in ONE compiled program."""
        return self.synthesize_planned(
            [self.plan_request(r) for r in requests],
            dcfg, seed=seed, quiet=quiet, decode_audio=decode_audio,
        )

    def synthesize_planned(
        self,
        planned: Sequence[PlannedRequest],
        dcfg: Optional[DecodeConfig] = None,
        seed: Optional[int] = None,
        quiet: bool = False,
        decode_audio: bool = True,
    ) -> List[SynthesisResult]:
        dcfg = dcfg or DecodeConfig()
        cfg = self.cfg
        s = cfg.special
        sr = int(cfg.encodec_sr)
        texts = [p.text for p in planned]
        prompts = [p.prompt for p in planned]
        targets = [p.target for p in planned]

        b = len(planned)
        tx_need = max(len(t) for t in texts)
        pm_need = max((len(p) for p in prompts), default=1)
        tx = _bucket(tx_need, TEXT_BUCKETS)
        p_max = _bucket(pm_need, PROMPT_BUCKETS)
        need_frames = max(
            self._need_frames(tt, len(p)) for tt, p in zip(targets, prompts)
        )
        max_frames = _bucket(need_frames, FRAME_BUCKETS)

        # Warm-shape routing: compiling a decode program at request time
        # costs trace + compile PLUS this terminal's per-program
        # first-dispatch load (docs/DESIGN.md "Warm start" — measured
        # minutes on the tunneled backend). If an already-compiled shape
        # COVERS this batch (>= on every dim, no extra text/prompt
        # truncation), rounding up to it is strictly cheaper than a fresh
        # compile: padded text/prompt columns are masked out by the
        # lengths, padded rows decode a 1-frame target and are dropped,
        # and a larger frame buffer only lengthens the while_loop bound
        # (rows still exit on their own budgets).
        pad_rows = 0
        shape = (b, tx, p_max, max_frames)
        if shape not in self._warm_shapes:
            cand = [w for w in self._warm_shapes
                    if w[0] >= b and w[1] >= tx_need and w[2] >= pm_need
                    and w[3] >= need_frames]
            if cand:
                w = min(cand, key=lambda w: (w[3], w[0], w[1], w[2]))
                pad_rows = w[0] - b
                _, tx, p_max, max_frames = w
        b_run = b + pad_rows
        self._warm_shapes.add((b_run, tx, p_max, max_frames))

        x = np.zeros((b_run, tx), np.int32)
        x_lens = np.zeros((b_run,), np.int32)
        prm = np.full((b_run, p_max), s.pad, np.int32)
        prm_lens = np.zeros((b_run,), np.int32)
        for i, (t, p) in enumerate(zip(texts, prompts)):
            t = t[:tx]
            x[i, : len(t)] = t
            x_lens[i] = len(t)
            p = p[:p_max]
            prm[i, : len(p)] = p
            prm_lens[i] = len(p)
        run_targets = list(targets)
        for i in range(b, b_run):        # padding rows: 1-frame decode
            x[i, 0] = x[0, 0]
            x_lens[i] = 1
            run_targets.append(1)

        run = engine.jitted_decoder(
            cfg, dataclasses.replace(dcfg, max_frames=max_frames)
        )
        rng = jax.random.PRNGKey(dcfg.seed if seed is None else seed)

        stime = time.time()
        out = run(
            self.params,
            jax.numpy.asarray(x), jax.numpy.asarray(x_lens),
            jax.numpy.asarray(prm), jax.numpy.asarray(prm_lens),
            jax.numpy.asarray(np.asarray(run_targets, np.int32)),
            rng,
        )
        tokens = np.asarray(out.tokens)
        gen_lens = np.asarray(out.gen_lens)
        elapsed = time.time() - stime

        results: List[SynthesisResult] = []
        strip = {s.y_sep, cfg.eog_inference}
        total_tokens = int(gen_lens.sum())
        for i in range(b):
            gen = tokens[i, : gen_lens[i]]
            gen = gen[~np.isin(gen, list(strip))]
            concat = np.concatenate([
                np.asarray([t for t in prompts[i] if t not in strip], np.int64),
                gen,
            ])
            per_utt_time = elapsed / b
            audio_secs = len(gen) / sr
            wav = concat_wav = None
            if decode_audio and self.audio_tokenizer is not None and len(gen):
                wav = self.audio_tokenizer.decode(gen[None, None, :])[0, 0]
                if len(concat) > len(gen):
                    concat_wav = self.audio_tokenizer.decode(
                        concat[None, None, :]
                    )[0, 0]
            results.append(SynthesisResult(
                wav=wav,
                concat_wav=concat_wav if concat_wav is not None else wav,
                gen_frames=gen,
                concat_frames=concat,
                tokens_per_sec=len(gen) / per_utt_time if per_utt_time else 0.0,
                rtf=audio_secs / per_utt_time if per_utt_time else 0.0,
                inference_time=per_utt_time,
            ))
        if not quiet:
            agg_audio = total_tokens / sr
            print(
                f"[Speed] {total_tokens / elapsed:.2f} tokens/s | "
                f"RTF: {agg_audio / elapsed:.2f}x | Generated {total_tokens} "
                f"tokens in {elapsed:.2f}s (batch={b})"
            )
        return results

    def synthesize(self, req: Request, dcfg: Optional[DecodeConfig] = None,
                   **kw) -> SynthesisResult:
        return self.synthesize_batch([req], dcfg, **kw)[0]

    # ------------------------------------------------------------------
    # warmup
    # ------------------------------------------------------------------

    def warmup(
        self,
        batch_sizes: Sequence[int] = (1,),
        text_buckets: Sequence[int] = (64,),
        prompt_buckets: Sequence[int] = (64,),
        frame_buckets: Sequence[int] = (512,),
        dcfg: Optional[DecodeConfig] = None,
        execute: bool = False,
        vocoder: bool = False,
    ) -> int:
        """Precompile decode programs for the given bucket grid.

        ``execute=False``: AOT lowering only (no device step) — combined
        with the persistent compilation cache this front-loads compile
        cost, but NOT the per-program first-dispatch load the tunneled
        TPU terminal charges on first execution (docs/DESIGN.md "Warm
        start" — observed minutes, and the reason the cold-serve probe's
        first request timed out when it missed a bucket). ``execute=True``
        runs each program once with synthetic 1-frame-target inputs and
        forces a tiny fetch, so a subsequent request pays execution cost
        only. ``vocoder=True`` additionally executes the codec decoder at
        every token-length bucket <= max(frame_buckets) (the vocoder is
        length-bucketed per result row — audio_tokenizer.decode).
        Returns the number of programs compiled.
        """
        dcfg = dcfg or DecodeConfig()
        n = 0
        for mf in frame_buckets:
            run_jit = engine._compiled(
                self.cfg, dataclasses.replace(dcfg, max_frames=mf))
            for b in batch_sizes:
                for tx in text_buckets:
                    for pm in prompt_buckets:
                        if execute:
                            x = np.zeros((b, tx), np.int32)
                            x[:, 0] = 3
                            out = run_jit(
                                self.params,
                                x=jax.numpy.asarray(x),
                                x_lens=jax.numpy.asarray(
                                    np.ones((b,), np.int32)),
                                prompt=jax.numpy.asarray(np.full(
                                    (b, pm), self.cfg.special.pad, np.int32)),
                                prompt_lens=jax.numpy.asarray(
                                    np.zeros((b,), np.int32)),
                                target_totals=jax.numpy.asarray(
                                    np.ones((b,), np.int32)),
                                rng=jax.random.PRNGKey(0),
                            )
                            np.asarray(out.gen_lens)[:1]
                        else:
                            aval = lambda shape, dt: jax.ShapeDtypeStruct(
                                shape, dt)
                            run_jit.lower(
                                self.params,
                                x=aval((b, tx), np.int32),
                                x_lens=aval((b,), np.int32),
                                prompt=aval((b, pm), np.int32),
                                prompt_lens=aval((b,), np.int32),
                                target_totals=aval((b,), np.int32),
                                rng=aval((2,), np.uint32),
                            ).compile()
                        self._warm_shapes.add((b, tx, pm, mf))
                        n += 1
        if vocoder and self.audio_tokenizer is not None:
            from ..codec.audio_tokenizer import _BUCKETS as _VOC_BUCKETS

            top = max(frame_buckets)
            for vb in [v for v in _VOC_BUCKETS if v <= top] or _VOC_BUCKETS[:1]:
                self.audio_tokenizer.decode(
                    np.zeros((1, vb), np.int64),
                    lengths=np.full((1,), vb, np.int32))
                n += 1
        return n

    # ------------------------------------------------------------------
    # streaming synthesis: audio chunks while later tokens still generate
    # ------------------------------------------------------------------

    def synthesize_streaming(
        self,
        req: Request,
        dcfg: Optional[DecodeConfig] = None,
        seed: Optional[int] = None,
        segment_frames: int = 50,
        vocode_chunk: int = 50,
    ):
        """Generator of waveform pieces (np.float32 at the codec sample
        rate). The decode loop runs in bounded segments (engine.run_segment)
        and finalized tokens stream through the exact windowed vocoder
        (codec/streaming.py) — time-to-first-audio is ~1 s of generation
        instead of the whole utterance. Token stream is identical to
        ``synthesize`` with the same seed (tested)."""
        import dataclasses as _dc

        import jax as _jax
        import jax.numpy as _jnp

        from ..codec.streaming import StreamingVocoder
        from ..decode import engine as _engine
        from .duration import estimate_duration

        assert self.audio_tokenizer is not None, "streaming needs the codec"
        dcfg = dcfg or DecodeConfig()
        cfg = self.cfg
        s = cfg.special
        sr = int(cfg.encodec_sr)

        target_secs = req.target_duration
        if target_secs is None:
            target_secs = estimate_duration(
                req.target_text, req.audio_path, req.prompt_transcript,
                req.lang,
            )
        prompt_toks = self._prompt_tokens(req, sr, target_secs)
        text, _ = self._text_tokens(req)
        target_total = len(prompt_toks) + int(sr * target_secs)

        tx = _bucket(len(text), TEXT_BUCKETS)
        p_max = _bucket(max(len(prompt_toks), 1), PROMPT_BUCKETS)
        need = target_total - len(prompt_toks) + int(sr * cfg.extra_cutoff) + 8
        max_frames = _bucket(need, FRAME_BUCKETS)
        dcfg = _dc.replace(dcfg, max_frames=max_frames)

        x = np.zeros((1, tx), np.int32)
        x[0, : len(text[:tx])] = text[:tx]
        x_lens = _jnp.asarray([min(len(text), tx)], _jnp.int32)
        prm = np.full((1, p_max), s.pad, np.int32)
        prm[0, : len(prompt_toks[:p_max])] = prompt_toks[:p_max]
        prompt_lens = _jnp.asarray([min(len(prompt_toks), p_max)], _jnp.int32)
        targets = _jnp.asarray([target_total], _jnp.int32)
        rng = _jax.random.PRNGKey(dcfg.seed if seed is None else seed)

        pf, sf = _engine.jitted_segment_fns(cfg, dcfg)
        state = pf(params=self.params, x=_jnp.asarray(x), x_lens=x_lens,
                   prompt=_jnp.asarray(prm), prompt_lens=prompt_lens,
                   target_totals=targets)

        sv = StreamingVocoder(self.audio_tokenizer.params,
                              self.audio_tokenizer.cfg, chunk=vocode_chunk)
        strip = {s.y_sep, cfg.eog_inference}
        emitted = 0
        while True:
            until = min(int(state.step) + segment_frames, max_frames)
            state = sf(params=self.params, state=state, x_lens=x_lens,
                       prompt_lens=prompt_lens, target_totals=targets,
                       rng=rng, until=_jnp.int32(until))
            step = int(state.step)
            done = bool(state.done[0])
            n_final = int(state.gen_lens[0]) if done else step
            new = np.asarray(state.tokens[0, emitted:n_final])
            emitted = n_final
            new = new[~np.isin(new, list(strip))]
            if len(new):
                piece = sv.feed(new)
                if len(piece):
                    yield piece
            if done or step >= max_frames:
                break
        tail = sv.flush()
        if len(tail):
            yield tail
