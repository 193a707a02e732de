"""Whisper log-mel frontend in JAX — parity with WhisperFeatureExtractor.

Matches transformers' numpy reference exactly (tests/test_asr.py pins it):
pad/truncate to 30 s @ 16 kHz, center=True reflect padding, periodic Hann
window, 400-point power spectrum (computed as two DFT matmuls — XLA's TPU
FFT lowering is a known compile-time trap, docs/DESIGN.md §3), slaney mel
filter bank (built by transformers' own ``mel_filter_bank`` so the filter
math cannot drift), log10 with the max-8 dynamic floor and the (x+4)/4
normalization.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16000
N_FFT = 400
HOP = 160
CHUNK_SECONDS = 30
N_SAMPLES = SAMPLE_RATE * CHUNK_SECONDS           # 480000
N_FRAMES = N_SAMPLES // HOP                       # 3000


@lru_cache(maxsize=4)
def _mel_filters(n_mels: int) -> np.ndarray:
    """[201, n_mels] slaney filter bank, from transformers itself."""
    from transformers.audio_utils import mel_filter_bank

    return mel_filter_bank(
        num_frequency_bins=1 + N_FFT // 2,
        num_mel_filters=n_mels,
        min_frequency=0.0,
        max_frequency=8000.0,
        sampling_rate=SAMPLE_RATE,
        norm="slaney",
        mel_scale="slaney",
    ).astype(np.float32)


@lru_cache(maxsize=1)
def _dft_bases() -> tuple:
    """Windowed real-DFT bases [400, 201] (cos, -sin)."""
    n = np.arange(N_FFT)[:, None]
    k = np.arange(1 + N_FFT // 2)[None, :]
    ang = 2.0 * np.pi * n * k / N_FFT
    win = np.hanning(N_FFT + 1)[:-1]              # periodic Hann
    cos_b = (np.cos(ang) * win[:, None]).astype(np.float32)
    sin_b = (-np.sin(ang) * win[:, None]).astype(np.float32)
    return cos_b, sin_b


def log_mel(wav: jnp.ndarray, n_mels: int = 80) -> jnp.ndarray:
    """wav [T] f32 @16 kHz -> [n_mels, 3000] normalized log-mel features."""
    wav = jnp.asarray(wav, jnp.float32).reshape(-1)[:N_SAMPLES]
    wav = jnp.pad(wav, (0, N_SAMPLES - wav.shape[0]))
    x = jnp.pad(wav, (N_FFT // 2, N_FFT // 2), mode="reflect")
    # frames [3001, 400]; the LAST frame is dropped (HF magnitudes[..., :-1])
    idx = (jnp.arange(N_FRAMES)[:, None] * HOP
           + jnp.arange(N_FFT)[None, :])
    frames = x[idx]                                # [3000, 400]
    cos_b, sin_b = _dft_bases()
    re = frames @ jnp.asarray(cos_b)
    im = frames @ jnp.asarray(sin_b)
    power = re * re + im * im                      # [3000, 201]
    mel = power @ jnp.asarray(_mel_filters(n_mels))
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).T              # [n_mels, 3000]
