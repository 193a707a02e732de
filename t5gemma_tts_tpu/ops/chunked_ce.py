"""Chunked-vocabulary cross-entropy through the prediction head.

The reference computes training CE by materializing the full logits tensor
``[B, T, V]`` (reference models/t5gemma.py:738-798: ``predict_layer`` then
``F.cross_entropy``). At V = 65541 and f32 softmax that block is the
activation-memory wall of the training step: it capped full-FT micro
batches at 4 rows per micro and pinned MFU at 0.06 on a 16 GB chip
(VERDICT r4 weak #3 / next #3).

This module computes the SAME loss without ever materializing the full
logits: the head output is processed in vocab blocks of ``chunk`` columns
with an online (flash-style) logsumexp, the target logit gathered from
whichever block contains it, and a running top-10 value buffer for the
top-10-accuracy metric. A custom VJP recomputes each block's logits in the
backward and feeds the analytic CE gradient

    d nll / d logits = softmax - onehot

block by block, so the backward's live set is one ``[B, T, chunk]`` block
plus the (head-sized) weight-grad accumulators instead of ``[B, T, V]``.

Exactness: identical math to voice.token_loss up to float summation order
(the logsumexp accumulates per block); pinned by
tests/test_voice_model.py::test_chunked_ce_matches_dense against the dense
path on tiny shapes, values and grads.

Tie semantics for the top-10 metric: a target whose logit exactly equals
the 10th-largest value counts as a hit (rank-by-value), whereas the dense
path's ``top_k`` breaks ties by index. Ties have measure zero for real
activations; the equivalence is asserted on random inputs in the test.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def _gelu(x: jnp.ndarray) -> jnp.ndarray:
    # exact (erf) GELU, matching models/voice.predict_head
    return jax.nn.gelu(x, approximate=False)


def _h2(head: Dict[str, jnp.ndarray], hidden: jnp.ndarray) -> jnp.ndarray:
    """Post-GELU intermediate of the 2-layer head (model dtype)."""
    return _gelu(hidden @ head["w1"] + head["b1"])


def _block_logits(head, h2, st: int, en: int) -> jnp.ndarray:
    """f32 logits for vocab columns [st, en) — the dense path computes the
    matmul in model dtype then upcasts for the softmax; same here."""
    w2 = head["w2"][:, st:en]
    b2 = head["b2"][st:en]
    return (h2 @ w2 + b2).astype(jnp.float32)


def _blocks(va: int, chunk: int):
    return [(st, min(st + chunk, va)) for st in range(0, va, chunk)]


def _compute(chunk, head, hidden, targets):
    """Single pass over vocab blocks: returns (nll, top10_hit, lse)."""
    h2 = _h2(head, hidden)
    va = head["w2"].shape[1]
    b, t = targets.shape
    k = min(10, va)

    m = jnp.full((b, t), -jnp.inf, jnp.float32)     # running max
    s = jnp.zeros((b, t), jnp.float32)              # running Σ exp(x - m)
    tgt = jnp.zeros((b, t), jnp.float32)            # target logit
    run_k = jnp.full((b, t, k), -jnp.inf, jnp.float32)

    for st, en in _blocks(va, chunk):
        logits = _block_logits(head, h2, st, en)
        blk_max = jnp.max(logits, axis=-1)
        m_new = jnp.maximum(m, blk_max)
        s = s * jnp.exp(m - m_new) + jnp.sum(
            jnp.exp(logits - m_new[:, :, None]), axis=-1)
        m = m_new

        in_blk = (targets >= st) & (targets < en)
        idx = jnp.clip(targets - st, 0, en - st - 1)
        tl = jnp.take_along_axis(logits, idx[:, :, None], axis=-1)[..., 0]
        tgt = tgt + jnp.where(in_blk, tl, 0.0)

        blk_top = jax.lax.top_k(logits, min(k, en - st))[0]
        run_k = jax.lax.top_k(
            jnp.concatenate([run_k, blk_top], axis=-1), k)[0]

    lse = m + jnp.log(s)
    nll = lse - tgt
    # rank-by-value top-10: hit iff the target logit reaches the kth value
    hit = tgt >= run_k[..., k - 1]
    return nll, hit, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def head_nll_top10(chunk: int, head, hidden, targets
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(nll [B,T] f32, top10_hit [B,T] bool) of the 2-layer prediction head
    over ``hidden`` [B,T,D] against integer ``targets`` [B,T], computed in
    vocab blocks of ``chunk`` columns (never materializing [B,T,V])."""
    nll, hit, _ = _compute(chunk, head, hidden, targets)
    return nll, hit


def _fwd(chunk, head, hidden, targets):
    nll, hit, lse = _compute(chunk, head, hidden, targets)
    return (nll, hit), (head, hidden, targets, lse)


def _bwd(chunk, res, cots):
    head, hidden, targets, lse = res
    g_nll = cots[0].astype(jnp.float32)  # cot for the bool metric is float0
    va = head["w2"].shape[1]

    # recompute the head intermediate under vjp for the w1/b1/hidden pulls
    def first_layer(w1, b1, hidden):
        return _gelu(hidden @ w1 + b1)

    h2, pull1 = jax.vjp(first_layer, head["w1"], head["b1"], hidden)

    dw2_blocks, db2_blocks = [], []
    dh2 = jnp.zeros(h2.shape, jnp.float32)
    for st, en in _blocks(va, chunk):
        logits = _block_logits(head, h2, st, en)
        softmax = jnp.exp(logits - lse[:, :, None])
        cols = jnp.arange(st, en)
        onehot = (targets[:, :, None] == cols).astype(jnp.float32)
        # d nll / d logits = softmax - onehot, scaled by the upstream cot;
        # cast to model dtype at the same boundary the dense path does
        # (token_loss's logits.astype(f32) backward)
        dlogits = (g_nll[:, :, None] * (softmax - onehot)).astype(h2.dtype)
        dw2_blocks.append(
            jnp.einsum("btd,btv->dv", h2, dlogits).astype(head["w2"].dtype))
        db2_blocks.append(
            jnp.sum(dlogits, axis=(0, 1)).astype(head["b2"].dtype))
        dh2 = dh2 + (dlogits @ head["w2"][:, st:en].T).astype(jnp.float32)

    dw1, db1, dhidden = pull1(dh2.astype(h2.dtype))
    d_head = {
        "w1": dw1.astype(head["w1"].dtype),
        "b1": db1.astype(head["b1"].dtype),
        "w2": jnp.concatenate(dw2_blocks, axis=1),
        "b2": jnp.concatenate(db2_blocks, axis=0),
    }
    import numpy as np

    d_targets = np.zeros(targets.shape, jax.dtypes.float0)
    return d_head, dhidden, d_targets


head_nll_top10.defvjp(_fwd, _bwd)
