"""User-facing audio tokenizer: wav <-> XCodec2 codes on TPU.

API mirror of the reference ``AudioTokenizer`` (reference:
data/tokenizer.py:52-143): ``encode(wav) -> [B, T, 1]`` int codes and
``decode(frames[B, 1, T]) -> waveform``, plus the ``tokenize_audio`` file
helper. Underneath, both directions are jitted with length bucketing so
repeated calls hit the compile cache.
"""

from __future__ import annotations

import bisect
import logging
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..inference import audio_io
from . import model as model_mod
from .model import XCodec2Config

log = logging.getLogger(__name__)

_BUCKETS = [64, 128, 256, 512, 1024, 2048, 4096, 8192]


def _bucket(n: int) -> int:
    i = bisect.bisect_left(_BUCKETS, n)
    return _BUCKETS[min(i, len(_BUCKETS) - 1)] if n <= _BUCKETS[-1] else n


class AudioTokenizer:
    """XCodec2 wrapper. ``params`` must hold decoder params
    (init_decoder_params / converted checkpoint); encoder params are needed
    only for ``encode``."""

    def __init__(self, params, cfg: Optional[XCodec2Config] = None):
        self.cfg = cfg or XCodec2Config()
        self.params = params
        self.sample_rate = self.cfg.sample_rate
        self.encode_sample_rate = self.cfg.encode_sample_rate
        self.channels = 1
        self._decode_fn = jax.jit(
            partial(model_mod.decode_code, cfg=self.cfg)
        )  # (params, codes, lengths)
        self._encode_fn = jax.jit(
            partial(model_mod.encode_waveform, cfg=self.cfg)
        )

    # -- reference-layout API ------------------------------------------------

    def encode(self, wav: np.ndarray) -> np.ndarray:
        """wav: [S] | [B, S] float at encode_sample_rate -> codes [B, T, 1]."""
        wav = np.asarray(wav, np.float32)
        if wav.ndim == 1:
            wav = wav[None]
        if wav.ndim == 3:
            wav = wav.reshape(wav.shape[0], -1)
        s = wav.shape[1]
        pad_to = _bucket(s)
        padded = np.pad(wav, ((0, 0), (0, pad_to - s)))
        lens = jnp.full((wav.shape[0],), s, jnp.int32)
        codes = np.asarray(self._encode_fn(self.params, wav=jnp.asarray(padded),
                                           wav_lens=lens))
        # trim to true frame count for the unpadded signal
        t = s // int(np.prod(self.cfg.acoustic_cfg.ratios))
        t = min(t, codes.shape[1])
        return codes[:, :t, None].astype(np.int64)

    def decode(self, frames: np.ndarray,
               lengths: Optional[np.ndarray] = None) -> np.ndarray:
        """frames: [B, K=1, T] or [B, T] int codes -> waveform [B, 1, S].

        Length-bucketed and exact: the vocoder masks features beyond ``t``
        per block, so the result equals an unpadded decode."""
        frames = np.asarray(frames)
        if frames.ndim == 3:
            frames = frames[:, 0]
        t = frames.shape[1]
        if lengths is None:
            lengths = np.full((frames.shape[0],), t, np.int32)
        pad_to = _bucket(t)
        padded = np.pad(frames, ((0, 0), (0, pad_to - t)))
        wav = np.asarray(self._decode_fn(
            self.params, codes=jnp.asarray(padded),
            lengths=jnp.asarray(lengths, jnp.int32),
        ))
        return wav[:, None, : t * self.cfg.hop_length]


def tokenize_audio(tokenizer: AudioTokenizer, audio_path: str,
                   offset: int = -1, num_frames: int = -1) -> np.ndarray:
    """File -> codes [1, T, 1] (reference: data/tokenizer.py:125-143)."""
    off = offset if offset != -1 else 0
    n = num_frames if num_frames != -1 else None
    wav = audio_io.load_for_encode(
        audio_path, tokenizer.encode_sample_rate, offset=off, num_frames=n
    )
    return tokenizer.encode(wav)
