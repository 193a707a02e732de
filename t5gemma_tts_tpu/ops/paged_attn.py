"""Paged flash decode-attention (GQA) over ring-buffer KV caches.

The AR decode hot loop (reference: models/t5gemma.py:1057-1115 reads the whole
``EncoderDecoderCache`` every step) is HBM-bandwidth-bound on TPU: a dense
read of a [B, Hkv, Tmax, hd] cache streams every pre-allocated slot each step
even when only ``length`` of them are valid.  This module routes the per-step
cache read through the upstream Pallas TPU paged-attention kernel
(``jax.experimental.pallas.ops.tpu.paged_attention``, public JAX), which

- skips compute blocks beyond each row's current ``length`` (the decisive
  saving early in generation, when length << Tmax),
- double-buffers the page DMAs so cache reads overlap compute,
- supports grouped-query attention and tanh logit soft-capping natively.

Quantized mode stores pages as **float8_e4m3** instead of int8+scales: the
upstream int8 path broadcasts per-token scales to head_dim before the kernel
(f32 scale traffic = 4x the int8 payload, erasing the bandwidth win), while
fp8 needs no scales at all — the kernel's dequantization is already a pure
``astype``.  K/V magnitudes sit comfortably inside e4m3's +-448 range, and
the resulting attention-output error measures ~2% relative on realistic
shapes (see tests/test_paged_attn.py).

Layout contract (the "pages" are a contiguous per-row ring buffer — no
virtual paging, so page_indices are the identity):

  k_pages, v_pages: [Hkv, B * pages_per_seq, page_size, hd]  bf16 | f8_e4m3
  lengths: [B] int32 — row b attends keys [0, lengths[b])
  q: [B, H, hd], already rotary-embedded AND pre-scaled by q_scale
     (the kernel applies no internal scaling).

Off-TPU the pure-JAX ``paged_attention_reference`` runs instead (same math,
dense) so every test exercises the identical call graph on the CPU mesh.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.pallas.ops.tpu.paged_attention import (
    paged_attention as _upstream_paged_attention,
)
from jax.experimental.pallas.ops.tpu.paged_attention import (
    paged_attention_kernel as _upstream_kernel,
)

_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)

KV_STORE_DTYPES = {
    "bf16": jnp.bfloat16,
    "f8": jnp.float8_e4m3fn,
    "i8": jnp.int8,    # + per-token scale planes (ops/fused_attn.quantize_kv)
}

# PINNED NEGATIVE RESULT (round 2/3, VERDICT r2 #9): both compressed KV
# modes LOSE to bf16 pages on decode latency at batch 64 on v5e —
# paged_i8 11.61 ms/step vs bf16 10.53, paged_f8 slower still (emulated
# converts). The int8 loss is the four extra per-block scale-plane DMAs
# ([Hkv, ps] f32 for k and v in each of two segments): each is only 2 KB,
# so the cost is DMA issue latency, not bandwidth — batching them with the
# page DMA would require an interleaved [Hkv, NP, 2, ps(+scale)] page
# layout that ripples through init/flush/prefill/views for ~1 ms at batch
# 64 in a NON-default mode, and per-page scales (one f32 per page, riding
# scalar prefetch for zero DMAs) would relax the quantization granularity
# the error measurements were made at (per-token keeps attention-output
# error well under fp8's ~2%). Both modes are therefore kept as HBM
#-capacity options (half the cache bytes -> double the resident batch /
# double the 80 s window), not as speed options.


def identity_page_indices(batch: int, pages_per_seq: int) -> jnp.ndarray:
    return (jnp.arange(batch, dtype=jnp.int32)[:, None] * pages_per_seq
            + jnp.arange(pages_per_seq, dtype=jnp.int32)[None, :])


def paged_attention_reference(
    q: jnp.ndarray,          # [B, H, hd] (pre-scaled)
    k_pages: jnp.ndarray,    # [Hkv, NP, ps, hd]
    v_pages: jnp.ndarray,
    lengths: jnp.ndarray,    # [B] int32
    *,
    page_indices: Optional[jnp.ndarray] = None,  # [B, PP] (identity if None)
    attn_logits_soft_cap: Optional[float] = None,
) -> jnp.ndarray:
    """Dense pure-JAX equivalent of the Pallas kernel (CPU/test path).

    Matches the kernel's numerics: pages are widened to bf16 exactly as the
    kernel's ``wait_and_get_loaded`` does, logits/softmax run in f32, soft
    cap precedes the length mask.
    """
    b, h, hd = q.shape
    hkv = k_pages.shape[0]
    g = h // hkv
    ps = k_pages.shape[2]
    if page_indices is None:
        page_indices = identity_page_indices(b, k_pages.shape[1] // b)
    pps = page_indices.shape[1]
    t = pps * ps

    k = k_pages[:, page_indices].astype(jnp.bfloat16).reshape(hkv, b, t, hd)
    v = v_pages[:, page_indices].astype(jnp.bfloat16).reshape(hkv, b, t, hd)
    qg = q.reshape(b, hkv, g, hd).astype(jnp.float32)
    logits = jnp.einsum("bkgh,kbth->bkgt", qg, k.astype(jnp.float32))
    if attn_logits_soft_cap is not None:
        logits = jnp.tanh(logits / attn_logits_soft_cap) * attn_logits_soft_cap
    valid = (jnp.arange(t, dtype=jnp.int32)[None, :]
             < lengths[:, None])[:, None, None, :]
    logits = jnp.where(valid, logits, _MASK_VALUE)
    w = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bkgt,kbth->bkgh", w, v.astype(jnp.float32))
    return out.reshape(b, h, hd).astype(q.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("pages_per_compute_block", "attn_logits_soft_cap"),
)
def _paged_attention_ml_call(
    q: jnp.ndarray,             # [B, H, hd]
    k_pages: jnp.ndarray,       # [Hkv, NP, ps, hd]
    v_pages: jnp.ndarray,
    lengths: jnp.ndarray,       # [B] int32
    page_indices: jnp.ndarray,  # [B, PP]
    *,
    pages_per_compute_block: int,
    attn_logits_soft_cap: Optional[float],
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Upstream paged kernel, but returning (out, m, l) for flash merging.

    Identical pallas_call construction to upstream ``paged_attention``
    (inline_seq_dim, single TensorCore — v5e) minus the quantized-scales
    plumbing; the m/l flash statistics the upstream entry discards are
    returned so the decode step can merge the current token's K/V without
    the kernel ever reading this step's cache write (that read-after-write
    forces XLA to copy the whole multi-layer page buffer every layer).
    """
    batch_size, num_q_heads, head_dim = q.shape
    num_kv_heads, _, page_size, _ = k_pages.shape
    pages_per_sequence = page_indices.shape[1]
    num_groups = num_q_heads // num_kv_heads
    if num_groups % 8 != 0:
        # <8x128 q tile: hint a <1x128> layout (upstream does the same)
        q = q.reshape(batch_size, num_q_heads, 1, head_dim)
        q_block_spec = pl.BlockSpec(
            (None, num_groups, None, head_dim),
            lambda core, b, h, *_: (b, h, 0, 0),
        )
    else:
        q_block_spec = pl.BlockSpec(
            (None, num_groups, head_dim), lambda core, b, h, *_: (b, h, 0)
        )

    def kv_scratch(pages):
        return pltpu.VMEM(
            (2, pages_per_compute_block, page_size, head_dim), pages.dtype)

    out, m, l = pl.pallas_call(
        functools.partial(
            _upstream_kernel.paged_flash_attention_kernel_inline_seq_dim,
            pages_per_sequence=pages_per_sequence,
            batch_size=batch_size,
            pages_per_compute_block=pages_per_compute_block,
            mask_value=_MASK_VALUE,
            attn_logits_soft_cap=attn_logits_soft_cap,
            megacore_mode=None,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            # lengths, page_indices, buffer_index, init_flag
            num_scalar_prefetch=4,
            in_specs=[
                q_block_spec,
                pl.BlockSpec(memory_space=pl.ANY),
                None,
                pl.BlockSpec(memory_space=pl.ANY),
                None,
            ],
            out_specs=[q_block_spec, q_block_spec, q_block_spec],
            grid=(1, batch_size, num_kv_heads),
            scratch_shapes=(
                kv_scratch(k_pages), None, kv_scratch(v_pages), None,
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, jnp.float32),
            jax.ShapeDtypeStruct((*q.shape[:-1], 1), jnp.float32),
            jax.ShapeDtypeStruct((*q.shape[:-1], 1), jnp.float32),
        ],
    )(
        lengths,
        page_indices.reshape(-1),
        jnp.zeros((1,), jnp.int32),   # buffer index
        jnp.ones((1,), jnp.int32),    # init flag
        q.astype(jnp.float32),
        k_pages,
        None,
        v_pages,
        None,
    )
    shape = (batch_size, num_q_heads)
    return (out.reshape(*shape, head_dim), m.reshape(shape), l.reshape(shape))


def paged_flash_parts(
    q: jnp.ndarray,          # [B, H, hd], rope'd + q_scale pre-applied
    k_pages: jnp.ndarray,    # [Hkv, NP, ps, hd]
    v_pages: jnp.ndarray,
    lengths: jnp.ndarray,    # [B] valid-key count
    page_indices: jnp.ndarray,  # [B, PP]
    *,
    attn_logits_soft_cap: Optional[float] = None,
    pages_per_compute_block: int = 4,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Flash attention over one paged key segment -> (out, m, l), all f32.

    ``out`` [B, H, hd] is the NORMALIZED attention output over this segment,
    ``m``/``l`` [B, H] its flash statistics, so multiple segments (plus the
    in-flight token) compose exactly via :func:`merge_attention_parts`.
    Rows with lengths == 0 return (0, -inf, 0) — an empty segment.
    """
    b, h, hd = q.shape
    pps = page_indices.shape[1]
    lengths = lengths.astype(jnp.int32)
    if jax.default_backend() == "tpu" and hd % 128 == 0:
        return _paged_attention_ml_call(
            q, k_pages, v_pages, lengths, page_indices,
            pages_per_compute_block=min(pages_per_compute_block, pps),
            attn_logits_soft_cap=attn_logits_soft_cap,
        )
    # dense reference (CPU / small-head-dim): same math, same (out, m, l)
    hkv = k_pages.shape[0]
    g = h // hkv
    ps = k_pages.shape[2]
    t = pps * ps
    k = k_pages[:, page_indices].astype(jnp.bfloat16).reshape(hkv, b, t, hd)
    v = v_pages[:, page_indices].astype(jnp.bfloat16).reshape(hkv, b, t, hd)
    qg = q.reshape(b, hkv, g, hd).astype(jnp.float32)
    logits = jnp.einsum("bkgh,kbth->bkgt", qg, k.astype(jnp.float32))
    if attn_logits_soft_cap is not None:
        logits = jnp.tanh(logits / attn_logits_soft_cap) * attn_logits_soft_cap
    valid = (jnp.arange(t, dtype=jnp.int32)[None, :]
             < lengths[:, None])[:, None, None, :]
    logits = jnp.where(valid, logits, -jnp.inf)
    m = jnp.max(logits, axis=-1)                       # -inf if empty
    safe_m = jnp.where(jnp.isfinite(m), m, 0.0)
    e = jnp.where(valid, jnp.exp(logits - safe_m[..., None]), 0.0)
    l = jnp.sum(e, axis=-1)
    out = jnp.einsum("bkgt,kbth->bkgh", e, v.astype(jnp.float32))
    out = out / jnp.where(l == 0.0, 1.0, l)[..., None]
    return (out.reshape(b, h, hd), m.reshape(b, h), l.reshape(b, h))


def merge_attention_parts(
    parts,                 # sequence of (out [B,H,hd], m [B,H], l [B,H]) f32
    q: jnp.ndarray,        # [B, H, hd] f32, pre-scaled
    k_cur: jnp.ndarray,    # [B, Hkv, hd] in-flight token's key (post-rope)
    v_cur: jnp.ndarray,
    attn_logits_soft_cap: Optional[float],
    out_dtype,
) -> jnp.ndarray:
    """Exact flash-softmax composition of key segments + the current token.

    The current token is always valid (causal self-attention sees itself),
    which guarantees the merged denominator is nonzero even when every
    segment is empty (first decode step with an empty prompt)."""
    b, h, hd = q.shape
    hkv = k_cur.shape[1]
    g = h // hkv
    qg = q.reshape(b, hkv, g, hd)
    cur = jnp.einsum("bkgh,bkh->bkg", qg, k_cur.astype(jnp.float32))
    if attn_logits_soft_cap is not None:
        cur = jnp.tanh(cur / attn_logits_soft_cap) * attn_logits_soft_cap
    cur = cur.reshape(b, h)

    m_new = cur
    for _, m, _ in parts:
        m_new = jnp.maximum(m_new, m)
    beta = jnp.exp(cur - m_new)
    vg = jnp.broadcast_to(
        v_cur.astype(jnp.float32)[:, :, None], (b, hkv, g, hd)
    ).reshape(b, h, hd)
    num = vg * beta[..., None]
    den = beta
    for out, m, l in parts:
        w = l * jnp.exp(m - m_new)   # exp(-inf - finite) = 0 for empty parts
        w = jnp.where(jnp.isfinite(m), w, 0.0)
        num = num + out * w[..., None]
        den = den + w
    return (num / den[..., None]).astype(out_dtype)


def merge_attention_parts_chain(
    parts,                 # seq of (out [B*S,H,hd], m [B*S,H], l [B*S,H]) f32
    q: jnp.ndarray,        # [B, S, H, hd] f32, pre-scaled
    k_chain: jnp.ndarray,  # [B, S, Hkv, hd] the in-flight chain's keys
    v_chain: jnp.ndarray,
    attn_logits_soft_cap: Optional[float],
    out_dtype,
    store_dtype=None,
) -> jnp.ndarray:
    """Flash composition of paged segments + an in-flight S-token chain.

    The multi-token verify pass (decode/speculative.py) attends each chain
    position i to (a) the paged prompt/generation segments — whose lengths
    are IDENTICAL for every chain position, so the segment kernels run once
    over B*S pseudo-rows — and (b) chain positions j <= i, computed densely
    here with a causal mask and merged through exact flash statistics.
    Position 0 always sees itself, so the denominator is nonzero even with
    every segment empty. Generalizes :func:`merge_attention_parts` (S = 1).

    ``store_dtype``: the KV cache's storage dtype. In the sequential engine
    a token's predecessors are read from the (bf16/f8-quantized) cache while
    its OWN K/V joins raw through the flash merge; to keep the emitted
    stream bit-identical, chain positions j < i round-trip through
    ``store_dtype`` here while the diagonal (j == i) stays raw.
    Returns [B, S, H, hd]."""
    b, s_len, h, hd = q.shape
    hkv = k_chain.shape[2]
    g = h // hkv
    qg = q.reshape(b, s_len, hkv, g, hd)
    k32 = k_chain.astype(jnp.float32)
    v32 = v_chain.astype(jnp.float32)
    if store_dtype is not None:
        # mirror the cache round-trip exactly: pending blocks are held in
        # bf16 before the store-dtype flush (f32 -> bf16 -> store -> f32)
        k_st = k_chain.astype(jnp.bfloat16).astype(store_dtype
                                                   ).astype(jnp.float32)
        v_st = v_chain.astype(jnp.bfloat16).astype(store_dtype
                                                   ).astype(jnp.float32)
    else:
        k_st, v_st = k32, v32
    logits = jnp.einsum("bikgh,bjkh->bkgij", qg, k_st)   # [B,Hkv,G,S,S]
    diag = jnp.einsum("bikgh,bikh->bkgi", qg, k32)       # raw self logits
    eye = jnp.eye(s_len, dtype=bool)
    logits = jnp.where(eye[None, None, None], diag[..., None], logits)
    if attn_logits_soft_cap is not None:
        logits = jnp.tanh(logits / attn_logits_soft_cap) * attn_logits_soft_cap
    causal = (jnp.arange(s_len)[None, :] <= jnp.arange(s_len)[:, None])
    logits = jnp.where(causal[None, None, None], logits, -jnp.inf)
    m_c = jnp.max(logits, axis=-1)                       # [B,Hkv,G,S]
    e = jnp.where(causal[None, None, None], jnp.exp(logits - m_c[..., None]),
                  0.0)
    l_c = jnp.sum(e, axis=-1)
    e_off = jnp.where(eye[None, None, None], 0.0, e)
    e_diag = jnp.einsum("bkgij,ij->bkgi", e, jnp.eye(s_len, dtype=jnp.float32))
    out_c = (jnp.einsum("bkgij,bjkh->bkgih", e_off, v_st)
             + e_diag[..., None] * v32.transpose(0, 2, 1, 3)[:, :, None])

    # -> [B, S, H, ...] to line up with the pseudo-batched segment parts
    m_c = m_c.transpose(0, 3, 1, 2).reshape(b, s_len, h)
    l_c = l_c.transpose(0, 3, 1, 2).reshape(b, s_len, h)
    out_c = out_c.transpose(0, 3, 1, 2, 4).reshape(b, s_len, h, hd)

    m_new = m_c
    for _, m, _ in parts:
        m_new = jnp.maximum(m_new, m.reshape(b, s_len, h))
    beta = jnp.exp(m_c - m_new)
    num = out_c * beta[..., None]
    den = l_c * beta
    for out, m, l in parts:
        m = m.reshape(b, s_len, h)
        w = l.reshape(b, s_len, h) * jnp.exp(m - m_new)
        w = jnp.where(jnp.isfinite(m), w, 0.0)
        num = num + out.reshape(b, s_len, h, hd) * w[..., None]
        den = den + w
    return (num / den[..., None]).astype(out_dtype)


def paged_gqa_attention(
    q: jnp.ndarray,          # [B, H, hd], rope'd + q_scale pre-applied
    k_pages: jnp.ndarray,    # [Hkv, NP, ps, hd] (NP may cover many layers)
    v_pages: jnp.ndarray,
    lengths: jnp.ndarray,    # [B] int32 valid-key count
    *,
    page_indices: Optional[jnp.ndarray] = None,  # [B, PP]; identity if None
    attn_logits_soft_cap: Optional[float] = None,
    pages_per_compute_block: int = 4,
    out_dtype=None,
) -> jnp.ndarray:
    """Decode attention over a paged cache -> [B, H, hd].

    ``page_indices`` may point anywhere into ``k_pages``/``v_pages`` — the
    decode loop passes the full multi-layer buffer plus the current layer's
    indices so no per-layer slice copy is ever materialized.

    Dispatch: Pallas kernel on TPU, dense reference elsewhere (the upstream
    kernel has no interpreter path)."""
    out_dtype = out_dtype or q.dtype
    b = q.shape[0]
    if page_indices is None:
        page_indices = identity_page_indices(b, k_pages.shape[1] // b)
    pps = page_indices.shape[1]
    lengths = lengths.astype(jnp.int32)
    # Mosaic constraint: the kernel's [.., G, hd]-blocked outputs need
    # head_dim % 128 == 0 (holds for the 2b-2b flagship, hd=256). Small-dim
    # test configs fall back to the dense reference.
    if jax.default_backend() == "tpu" and q.shape[-1] % 128 == 0:
        out = _upstream_paged_attention(
            q, k_pages, v_pages, lengths, page_indices,
            pages_per_compute_block=min(pages_per_compute_block, pps),
            attn_logits_soft_cap=attn_logits_soft_cap,
            mask_value=_MASK_VALUE,
        )
    else:
        out = paged_attention_reference(
            q, k_pages, v_pages, lengths, page_indices=page_indices,
            attn_logits_soft_cap=attn_logits_soft_cap,
        )
    return out.astype(out_dtype)
