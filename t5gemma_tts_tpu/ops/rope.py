"""Rotary position embeddings with float (progress) position ids.

T5Gemma applies standard RoPE in self-attention; the TTS model additionally
applies *PM-RoPE* (progress-monitoring RoPE) in cross-attention, where the
position id is not an integer index but the float fraction of the target
duration elapsed, scaled by ``progress_scale`` (reference:
models/t5gemma.py:57-172 ``PMCrossAttention``, :601-624 position builders).

Everything here is pure; cos/sin are computed in float32 (matching the HF
rotary which forces fp32) and cast to the activation dtype at application.
"""

from __future__ import annotations

import jax.numpy as jnp


def rope_inv_freq(head_dim: int, theta: float) -> jnp.ndarray:
    """[head_dim/2] float32 inverse frequencies."""
    exponents = jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim
    return 1.0 / (theta ** exponents)


def rope_cos_sin(positions: jnp.ndarray, head_dim: int, theta: float):
    """cos/sin tables for (possibly float) positions.

    positions: [..., T] float32 or int. Returns (cos, sin) each
    [..., T, head_dim] float32, with the HF layout emb = concat(freqs, freqs).
    """
    inv = rope_inv_freq(head_dim, theta)
    freqs = positions.astype(jnp.float32)[..., None] * inv  # [..., T, hd/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: [B, H, T, hd]; cos/sin: [B, T, hd] -> broadcast over heads."""
    c = cos[:, None, :, :].astype(x.dtype)
    s = sin[:, None, :, :].astype(x.dtype)
    return x * c + rotate_half(x) * s


def progress_position_ids(lengths: jnp.ndarray, max_len: int,
                          progress_scale: float) -> jnp.ndarray:
    """PM position ids: pos / (len-1) * scale, 0 beyond each length.

    Matches reference models/t5gemma.py:609-624 (vectorized builder): the
    denominator clamps length to >= 2, and padded positions are zeroed.
    Returns float32 [B, max_len].
    """
    pos = jnp.arange(max_len, dtype=jnp.float32)[None, :]
    denom = jnp.maximum(lengths, 2).astype(jnp.float32)[:, None] - 1.0
    ids = pos / denom * progress_scale
    return jnp.where(pos < lengths[:, None].astype(jnp.float32), ids, 0.0)


def decode_step_position(current_index: jnp.ndarray, est_total: jnp.ndarray,
                         progress_scale: float) -> jnp.ndarray:
    """PM position for one generated token at absolute index ``current_index``.

    Matches reference models/t5gemma.py:1086-1094: pos = idx / max(1,
    est_total-1) * scale, clamped to at most ``progress_scale``.
    """
    denom = jnp.maximum(1, est_total - 1).astype(jnp.float32)
    val = current_index.astype(jnp.float32) / denom * progress_scale
    return jnp.minimum(val, progress_scale)
