"""Kaldi-style log-mel frontend for the semantic (w2v-BERT) branch, in JAX.

Replicates the SeamlessM4T feature extraction the XCodec2 encoder consumes
(reference: data/tokenizer.py encodes via the pip package, which uses
``SeamlessM4TFeatureExtractor``): 16-bit scaling, per-frame DC removal,
0.97 preemphasis, povey window (400 samples, 10 ms hop), 512-point power
spectrum, 80 kaldi-mel triangular filters built in mel space, natural log
with floor, per-utterance per-bin mean/variance normalization (ddof=1), and
stride-2 frame stacking to 160-dim features at 50 Hz.

Framing/window/FFT are all fixed-shape tensor ops (the FFT lowers to XLA's
TPU FFT; the mel projection is a matmul), so batched feature extraction runs
on-device for Emilia-scale preprocessing.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

FRAME_LENGTH = 400
HOP_LENGTH = 160
FFT_LENGTH = 512
NUM_MEL = 80
PREEMPHASIS = 0.97
MEL_FLOOR = 1.192092955078125e-07
STACK = 2


def _hz_to_mel_kaldi(freq):
    return 1127.0 * np.log(1.0 + np.asarray(freq, np.float64) / 700.0)


@lru_cache(maxsize=4)
def kaldi_mel_filters(sampling_rate: int = 16000) -> np.ndarray:
    """[257, 80] triangular filters, triangularized in mel space (Kaldi)."""
    num_bins = FFT_LENGTH // 2 + 1
    fft_freqs = np.linspace(0, sampling_rate / 2, num_bins)
    mel_min = _hz_to_mel_kaldi(20.0)
    mel_max = _hz_to_mel_kaldi(sampling_rate / 2)
    mel_points = np.linspace(mel_min, mel_max, NUM_MEL + 2)
    mel_freqs = _hz_to_mel_kaldi(fft_freqs)

    filters = np.zeros((num_bins, NUM_MEL), np.float64)
    for m in range(NUM_MEL):
        left, center, right = mel_points[m], mel_points[m + 1], mel_points[m + 2]
        up = (mel_freqs - left) / (center - left)
        down = (right - mel_freqs) / (right - center)
        filters[:, m] = np.maximum(0.0, np.minimum(up, down))
    return filters.astype(np.float32)


@lru_cache(maxsize=1)
def povey_window() -> np.ndarray:
    n = np.arange(FRAME_LENGTH, dtype=np.float64)
    hann = 0.5 - 0.5 * np.cos(2 * np.pi * n / (FRAME_LENGTH - 1))
    return (hann ** 0.85).astype(np.float32)


def log_mel_frames(wav: jnp.ndarray, sampling_rate: int = 16000) -> jnp.ndarray:
    """wav: [B, S] float in [-1, 1] at 16 kHz -> log-mel [B, T, 80],
    T = 1 + (S - 400) // 160 (center=False)."""
    wav = wav.astype(jnp.float32) * 32768.0  # Kaldi 16-bit compliance
    b, s = wav.shape
    t = 1 + (s - FRAME_LENGTH) // HOP_LENGTH
    starts = jnp.arange(t) * HOP_LENGTH
    idx = starts[:, None] + jnp.arange(FRAME_LENGTH)[None, :]
    frames = wav[:, idx]  # [B, T, 400]

    # remove DC offset per frame
    frames = frames - frames.mean(axis=-1, keepdims=True)
    # preemphasis: y[0] *= (1 - c); y[n] -= c * y[n-1]
    first = frames[..., :1] * (1.0 - PREEMPHASIS)
    rest = frames[..., 1:] - PREEMPHASIS * frames[..., :-1]
    frames = jnp.concatenate([first, rest], axis=-1)

    frames = frames * jnp.asarray(povey_window())
    spec = jnp.fft.rfft(frames, n=FFT_LENGTH, axis=-1)
    power = jnp.abs(spec) ** 2  # [B, T, 257]
    mel = power @ jnp.asarray(kaldi_mel_filters(sampling_rate))
    return jnp.log(jnp.maximum(mel, MEL_FLOOR))


def normalize_and_stack(
    feats: jnp.ndarray, lengths: Optional[jnp.ndarray] = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-bin mean/var normalize over valid frames (ddof=1), then stack
    ``STACK`` consecutive frames. feats: [B, T, 80] -> [B, T//2, 160].

    Returns (stacked_features, stacked_lengths)."""
    b, t, c = feats.shape
    if lengths is None:
        lengths = jnp.full((b,), t, jnp.int32)
    valid = (jnp.arange(t)[None, :] < lengths[:, None]).astype(jnp.float32)
    n = jnp.maximum(valid.sum(1), 1.0)[:, None]
    vm = valid[..., None]
    mean = (feats * vm).sum(1) / n
    var = ((feats - mean[:, None]) ** 2 * vm).sum(1) / jnp.maximum(n - 1.0, 1.0)
    feats = (feats - mean[:, None]) / jnp.sqrt(var[:, None] + 1e-7)
    feats = feats * vm  # zero out padding

    t2 = t - (t % STACK)
    stacked = feats[:, :t2].reshape(b, t2 // STACK, c * STACK)
    return stacked, lengths // STACK


def extract_features(
    wav: jnp.ndarray, wav_lens: Optional[jnp.ndarray] = None,
    sampling_rate: int = 16000,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """wav [B, S] -> (input_features [B, T50, 160], feature lengths [B])."""
    feats = log_mel_frames(wav, sampling_rate)
    if wav_lens is None:
        lengths = None
    else:
        lengths = jnp.maximum(
            (wav_lens - FRAME_LENGTH) // HOP_LENGTH + 1, 0
        ).astype(jnp.int32)
    return normalize_and_stack(feats, lengths)
