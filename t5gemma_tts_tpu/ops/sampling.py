"""Fused sampling filters: temperature -> min-p -> top-k -> top-p -> categorical.

Semantics are an exact, batched, jit-safe re-derivation of the reference
sampling helpers (reference: models/utils.py:53-111 ``top_k_top_p_filtering``
and :114-122 ``topk_sampling``):

- ``min_p`` (0 < min_p < 1): tokens with post-temperature probability below
  ``min_p`` are masked, but only if *every* row keeps at least one survivor
  (the reference checks ``torch.all`` over the whole tensor); when active,
  top-k / top-p are bypassed.
- ``top_k``: tokens strictly below the k-th largest logit are masked — ties at
  the threshold all survive, exactly like the reference's ``logits <
  threshold`` test.
- ``top_p``: nucleus filtering over the descending-sorted distribution with
  the keep-first-above-threshold shift.

Two entry points:

- :func:`filter_logits` / :func:`sample`: the exact path (full-vocab ops;
  used for parity tests and as the default).
- :func:`sample_topk_fast`: decode-loop fast path that restricts all work to
  the top-k candidates (k static, e.g. 30). Identical to the exact path
  except when several tokens tie exactly at the k-th logit (measure-zero for
  real model logits).

Sampling uses ``jax.random.categorical`` (Gumbel trick); draws cannot be
bit-identical to ``torch.multinomial``, so cross-framework parity is defined
on the *filtered logit sets* and greedy traces, which these functions preserve
exactly.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from .masks import NEG_INF


def _apply_top_k(logits: jnp.ndarray, top_k: int, min_tokens_to_keep: int) -> jnp.ndarray:
    v = logits.shape[-1]
    k = min(max(top_k, min_tokens_to_keep), v)
    thresh = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < thresh, NEG_INF, logits)


def _apply_top_p(logits: jnp.ndarray, top_p: float, min_tokens_to_keep: int) -> jnp.ndarray:
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    order = jnp.argsort(logits, axis=-1)[..., ::-1]
    cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    remove_sorted = cum > top_p
    if min_tokens_to_keep > 1:
        remove_sorted = remove_sorted.at[..., :min_tokens_to_keep].set(False)
    # shift right: always keep the first token that crosses the threshold
    remove_sorted = jnp.concatenate(
        [jnp.zeros_like(remove_sorted[..., :1]), remove_sorted[..., :-1]], axis=-1
    )
    remove = jnp.zeros_like(remove_sorted)
    batch_idx = jnp.arange(logits.shape[0])[:, None]
    remove = remove.at[batch_idx, order].set(remove_sorted)
    return jnp.where(remove, NEG_INF, logits)


def filter_logits(
    logits: jnp.ndarray,
    top_k: int = 0,
    top_p: float = 1.0,
    min_p: float = 0.0,
    min_tokens_to_keep: int = 1,
) -> jnp.ndarray:
    """Exact batched filter. logits: [B, V]; top_k/top_p/min_p are static."""
    assert logits.ndim == 2, "filter_logits expects [B, V]"
    min_p_enabled = 0.0 < min_p < 1.0

    filtered = logits
    if top_k and top_k > 0:
        filtered = _apply_top_k(filtered, top_k, min_tokens_to_keep)
    if top_p < 1.0:
        filtered = _apply_top_p(filtered, top_p, min_tokens_to_keep)

    if min_p_enabled:
        probs = jax.nn.softmax(logits, axis=-1)
        remove = probs < min_p
        # global activation flag, matching the reference's torch.all check
        active = jnp.all(remove.sum(-1) < logits.shape[-1])
        minp_filtered = jnp.where(remove, NEG_INF, logits)
        filtered = jnp.where(active, minp_filtered, filtered)
    return filtered


def sample(
    rng: jax.Array,
    logits: jnp.ndarray,
    top_k: int = 0,
    top_p: float = 1.0,
    min_p: float = 0.0,
    temperature: float = 1.0,
) -> jnp.ndarray:
    """Temperature + filter + categorical draw. Returns int32 [B]."""
    if temperature != 1.0:
        logits = logits / temperature
    filtered = filter_logits(logits, top_k=top_k, top_p=top_p, min_p=min_p)
    return jax.random.categorical(rng, filtered.astype(jnp.float32), axis=-1)


@partial(jax.jit, static_argnames=("top_k", "top_p", "temperature"))
def sample_topk_fast(
    rng: jax.Array,
    logits: jnp.ndarray,
    top_k: int = 30,
    top_p: float = 1.0,
    temperature: float = 1.0,
) -> jnp.ndarray:
    """Fast path: restrict top-p filtering + the draw to the top-k logits.

    Requires top_k > 0. min_p is deliberately NOT supported here: the
    reference's min_p bypasses top-k entirely and can keep more than k
    survivors, so a top-k-restricted min_p would sample a different
    distribution — use :func:`sample` (the decode engine already routes
    min_p through the exact path). Returns int32 [B].
    """
    assert top_k > 0
    if temperature != 1.0:
        logits = logits / temperature
    vals, idx = jax.lax.top_k(logits, top_k)  # vals descending, [B, k]

    kept = vals
    if top_p < 1.0:
        cum = jnp.cumsum(jax.nn.softmax(vals, axis=-1), axis=-1)
        remove = cum > top_p
        remove = jnp.concatenate(
            [jnp.zeros_like(remove[..., :1]), remove[..., :-1]], axis=-1
        )
        kept = jnp.where(remove, NEG_INF, vals)

    choice = jax.random.categorical(rng, kept.astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(idx, choice[:, None], axis=-1)[:, 0]


def greedy(logits: jnp.ndarray) -> jnp.ndarray:
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def sample_from_candidates(
    rng: jax.Array,
    vals: jnp.ndarray,   # [B, K] candidate logits, descending-ish, f32
    idx: jnp.ndarray,    # [B, K] candidate token ids
    top_k: int,
    top_p: float = 1.0,
    temperature: float = 1.0,
    min_p_mask: Optional[jnp.ndarray] = None,  # [B, K] bool (True = remove)
    min_p_active: Optional[jnp.ndarray] = None,  # scalar bool
    row_keys: Optional[jnp.ndarray] = None,  # [B] typed keys: per-row draw
) -> jnp.ndarray:
    """Sampling over a pre-extracted candidate set.

    The decode engine extracts the raw top-(top_k + 2) candidates ONCE per
    step, applies the stop-rule logit adjustments to them, and samples here —
    one vocab-wide pass per step instead of four. Exactness: the adjustments
    only *lower* at most two tokens (EOG + the silence-repeated token), so
    the adjusted top-k is always contained in the raw top-(k+2); filtering
    within the candidates equals the reference's adjust-then-filter order.
    Returns int32 [B].

    ``row_keys`` (continuous batching): each row draws from ITS OWN key —
    the filtering math stays batched (it is row-independent), only the
    categorical draw is vmapped. Each row's draw is shaped [1, K] exactly
    like a batch-1 call with that key, so a row's stream is bit-identical
    to running alone (the property tests/test_continuous.py pins); ``rng``
    is ignored in this mode.
    """
    assert top_k > 0 and vals.shape[-1] >= top_k
    if temperature != 1.0:
        vals = vals / temperature
    # re-sort after adjustments (K is tiny; this is a register sort)
    order = jnp.argsort(vals, axis=-1)[..., ::-1]
    vals = jnp.take_along_axis(vals, order, axis=-1)
    idx = jnp.take_along_axis(idx, order, axis=-1)

    # top-k threshold with tie keeping (reference models/utils.py:82-86)
    kept = vals
    thresh = vals[..., top_k - 1:top_k]
    kept = jnp.where(vals < thresh, NEG_INF, kept)
    if top_p < 1.0:
        cum = jnp.cumsum(jax.nn.softmax(kept, axis=-1), axis=-1)
        remove = cum > top_p
        remove = jnp.concatenate(
            [jnp.zeros_like(remove[..., :1]), remove[..., :-1]], axis=-1
        )
        kept = jnp.where(remove, NEG_INF, kept)
    if min_p_mask is not None and min_p_active is not None:
        mp = jnp.take_along_axis(min_p_mask, order, axis=-1)
        minp_kept = jnp.where(mp, NEG_INF, vals)
        kept = jnp.where(min_p_active, minp_kept, kept)

    if row_keys is not None:
        choice = jax.vmap(
            lambda k, row: jax.random.categorical(
                k, row.astype(jnp.float32)[None], axis=-1)[0]
        )(row_keys, kept)
    else:
        choice = jax.random.categorical(rng, kept.astype(jnp.float32),
                                        axis=-1)
    return jnp.take_along_axis(idx, choice[:, None], axis=-1)[:, 0].astype(jnp.int32)
