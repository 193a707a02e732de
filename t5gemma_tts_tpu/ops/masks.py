"""Attention-mask construction as additive f32 biases.

All masks are produced as [B, 1, Tq, Tk] additive biases (0 = attend,
NEG_INF = blocked) so XLA folds them straight into the attention softmax.
Semantics match the reference mask stack:

- pad_mask            <- reference models/utils.py:40-50 (``make_pad_mask``)
- encoder self biases <- HF bidirectional (+ sliding-window) encoder masks the
  reference relies on (transformers t5gemma ``bidirectional_mask_function`` /
  ``sliding_window_bidirectional_mask_function``)
- decoder self biases <- causal (+ sliding causal) with key-padding, the dense
  [B,1,T,T] mask built at reference models/t5gemma.py:702-715
- cross bias          <- encoder key padding only
"""

from __future__ import annotations

import jax.numpy as jnp

# Large-negative instead of -inf: keeps softmax rows that are fully masked
# finite (they normalize to uniform garbage that is itself masked downstream)
# and avoids NaN gradients.
NEG_INF = -2.0 ** 30


def pad_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """True at padded positions. lengths: [B] int; returns bool [B, max_len]."""
    pos = jnp.arange(max_len, dtype=lengths.dtype)[None, :]
    return pos >= lengths[:, None]


def _key_valid(lengths: jnp.ndarray, t: int) -> jnp.ndarray:
    """bool [B, 1, 1, T]: key position is within its sequence."""
    return (~pad_mask(lengths, t))[:, None, None, :]


def encoder_self_bias(lengths: jnp.ndarray, t: int, dtype=jnp.float32):
    """(full_bias, sliding_bias_fn-less) is built by the caller; this returns
    the bidirectional full-attention bias: key must be non-pad."""
    ok = _key_valid(lengths, t)
    return jnp.where(ok, 0.0, NEG_INF).astype(dtype)


def encoder_sliding_bias(lengths: jnp.ndarray, t: int, window: int, dtype=jnp.float32):
    """Bidirectional sliding window: |q - k| < window AND key non-pad."""
    q = jnp.arange(t)[:, None]
    k = jnp.arange(t)[None, :]
    near = (q - window < k) & (k < q + window)
    ok = near[None, None, :, :] & _key_valid(lengths, t)
    return jnp.where(ok, 0.0, NEG_INF).astype(dtype)


def decoder_self_bias(lengths: jnp.ndarray, t: int, dtype=jnp.float32):
    """Causal + key padding, [B,1,T,T]."""
    q = jnp.arange(t)[:, None]
    k = jnp.arange(t)[None, :]
    causal = (k <= q)[None, None, :, :]
    ok = causal & _key_valid(lengths, t)
    return jnp.where(ok, 0.0, NEG_INF).astype(dtype)


def decoder_sliding_bias(lengths: jnp.ndarray, t: int, window: int, dtype=jnp.float32):
    """Causal sliding window: q - window < k <= q, + key padding."""
    q = jnp.arange(t)[:, None]
    k = jnp.arange(t)[None, :]
    causal = ((k <= q) & (q - window < k))[None, None, :, :]
    ok = causal & _key_valid(lengths, t)
    return jnp.where(ok, 0.0, NEG_INF).astype(dtype)


def cross_bias(enc_lengths: jnp.ndarray, tq: int, tk: int, dtype=jnp.float32):
    """Decoder->encoder cross-attention: encoder key padding only, [B,1,Tq,Tk]."""
    ok = _key_valid(enc_lengths, tk)
    return jnp.broadcast_to(
        jnp.where(ok, 0.0, NEG_INF).astype(dtype),
        (enc_lengths.shape[0], 1, tq, tk),
    )


def step_self_bias(q_pos: jnp.ndarray, t_max: int,
                   window: int | None = None, dtype=jnp.float32):
    """Single-step decode bias over a preallocated KV cache.

    q_pos: [B] current absolute position. Allowed keys: k <= q (causal over
    everything written so far) and, when ``window`` is set, q - window < k.
    Returns [B, 1, 1, t_max].
    """
    k = jnp.arange(t_max)[None, :]
    q = q_pos[:, None]
    ok = k <= q
    if window is not None:
        ok = ok & (q - window < k)
    return jnp.where(ok[:, None, None, :], 0.0, NEG_INF).astype(dtype)
