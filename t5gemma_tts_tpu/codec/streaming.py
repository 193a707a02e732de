"""Streaming vocoder decode: emit waveform chunks while tokens arrive.

The Vocos stack is spatially local — the embed conv + 12 ConvNeXt blocks see
about (num_layers + 1) * (kernel//2) frames of context on each side, and each
ISTFT output sample depends on frames within one n_fft window — so decoding a
token window [context | chunk | context] reproduces the full-utterance
waveform exactly over the chunk's interior. This turns the token->audio stage
into a constant-latency stream: audio for chunk N is ready while the AR
engine is still generating chunk N+1.

The reference has no streaming path (its decode is one ``decode_code`` call,
reference data/tokenizer.py:117-123); this is beyond-parity serving surface.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Optional

import jax
import numpy as np

from . import model as model_mod
from .audio_tokenizer import _bucket
from .model import XCodec2Config


def context_frames(cfg: XCodec2Config) -> int:
    """Frames of one-sided context after which vocoder outputs are exact:
    conv receptive field + ISTFT window reach."""
    v = cfg.vocos
    conv = (v.num_layers + 1) * (v.kernel_size // 2)
    istft = -(-v.n_fft // v.hop_length)
    return conv + istft


class StreamingVocoder:
    """Feed codec tokens incrementally; pull out waveform chunks.

    Usage:
        sv = StreamingVocoder(params, cfg, chunk=100)
        for tokens in token_chunks:
            wav_piece = sv.feed(tokens)     # may be empty early on
        tail = sv.flush()
    """

    def __init__(self, params, cfg: XCodec2Config, chunk: int = 100,
                 context: Optional[int] = None):
        self.params = params
        self.cfg = cfg
        self.chunk = chunk
        self.context = context if context is not None else context_frames(cfg)
        self._decode = jax.jit(
            lambda p, c, l: model_mod.decode_code(p, cfg, c, lengths=l))
        self._tokens = np.zeros((0,), np.int64)
        self._emitted_frames = 0  # frames whose audio has been emitted

    def _window_decode(self, start: int, end: int) -> np.ndarray:
        """Exact audio for frames [start, end) using surrounding context.

        Windows are padded to shared length buckets + masked-exact decode
        (vocos lengths), so the vocoder compiles once per bucket instead of
        once per distinct window length — the variable-length flush() tail
        previously recompiled the full vocoder for every utterance."""
        import jax.numpy as jnp

        hop = self.cfg.hop_length
        lo = max(0, start - self.context)
        hi = min(len(self._tokens), end + self.context)
        win = self._tokens[lo:hi]
        n = len(win)
        padded = np.pad(win, (0, _bucket(n) - n))
        wav = np.asarray(self._decode(
            self.params, padded[None], jnp.asarray([n], jnp.int32)))[0]
        a = (start - lo) * hop
        b = a + (end - start) * hop
        return wav[a:b]

    def feed(self, tokens) -> np.ndarray:
        """Append tokens; return any newly-final audio."""
        tokens = np.asarray(tokens).reshape(-1)
        self._tokens = np.concatenate([self._tokens, tokens])
        out = []
        # a chunk is final once `context` future frames exist beyond it
        while (len(self._tokens) - (self._emitted_frames + self.chunk)
               >= self.context):
            start = self._emitted_frames
            out.append(self._window_decode(start, start + self.chunk))
            self._emitted_frames += self.chunk
        if out:
            return np.concatenate(out)
        return np.zeros((0,), np.float32)

    def flush(self) -> np.ndarray:
        """Emit the remaining (end-of-utterance) audio."""
        start = self._emitted_frames
        end = len(self._tokens)
        self._emitted_frames = end
        if end <= start:
            return np.zeros((0,), np.float32)
        return self._window_decode(start, end)


def stream_decode(params, cfg: XCodec2Config, token_chunks: Iterable,
                  chunk: int = 100) -> Iterator[np.ndarray]:
    """Generator form: yields waveform pieces per incoming token chunk."""
    sv = StreamingVocoder(params, cfg, chunk=chunk)
    for toks in token_chunks:
        piece = sv.feed(toks)
        if len(piece):
            yield piece
    tail = sv.flush()
    if len(tail):
        yield tail
