"""Fused two-segment paged decode attention (one Pallas launch per layer).

The paged decode step previously issued, per layer, TWO upstream
paged-attention kernels (prompt segment, generation segment) plus an XLA
flash-merge of their statistics with the in-flight token
(ops/paged_attn.py). At batch 64 the decode step is dominated by per-layer
dispatch overhead on top of the DMA floor (measured: ~12 ms observed vs
~7 ms weight-bandwidth theoretical — NEXT_STEPS perf #1). This kernel does
the whole self-attention read in ONE launch:

  for each (batch row, kv head) grid cell:
      flash-accumulate over the row's valid PROMPT pages,
      then its valid GENERATION pages (double-buffered page DMAs
      throughout, sequenced across the segment boundary),
      then the in-flight token's K/V (always valid), and normalize once.

Compared with the two-kernel + merge structure this removes one kernel
dispatch per layer, the per-segment normalization work, and the XLA merge
chain — and the DMA pipeline no longer drains between segments.

Layout contract matches ops/paged_attn.py: pages are [Hkv, NP, ps, hd]
(bf16 or f8_e4m3), per-row page indices address a multi-layer buffer, q is
pre-scaled and rotary-embedded. Math follows the upstream kernel: logits in
f32, soft cap before the length mask, mask value -0.7*f32max.

Runs in interpreter mode off-TPU, so the CPU test suite executes the
identical kernel code path (tests/test_fused_attn.py checks exactness
against the composed parts+merge reference).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def quantize_kv(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-token symmetric int8 quantization over the last (head) dim.

    x [..., hd] float -> (int8 [..., hd], scale [...] f32) with
    dequantization ``int8 * scale``. The int8 KV cache stores these pages +
    scale planes; per-token scaling keeps the attention-output error well
    under fp8-e4m3's (~2%) while halving cache DMA bytes."""
    x = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=-1)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def kv_int8_output_error(k, v, n_queries: int = 64, seed: int = 0) -> float:
    """Calibration check for the ``paged_i8`` serving mode.

    Attention-output relative L2 error of the production per-token int8
    K/V quantization on a real K/V sample ``[n_tok, head_dim]`` (run a
    calibration batch through the model and pass one head's K/V here).
    Real LLM K caches carry fixed per-channel outliers that per-token
    scaling handles worst (tools/stress_int8_kv.py measures up to ~21%
    output error at 50x outliers vs ~1% gaussian); serve with
    kv_cache="paged" (bf16 pages) when this exceeds the documented 0.05
    threshold. Pure numpy — the kernel's dequant math is pinned to this
    form by tests/test_megakernel.py::test_megakernel_int8_kv_matches_unfused."""
    import numpy as np

    k = np.asarray(k, np.float32)
    v = np.asarray(v, np.float32)
    hd = k.shape[-1]
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((n_queries, hd)).astype(np.float32)

    def roundtrip(x):
        amax = np.abs(x).max(axis=-1)
        s = np.maximum(amax, 1e-8) / 127.0
        xq = np.clip(np.round(x / s[:, None]), -127, 127).astype(np.int8)
        return xq.astype(np.float32) * s[:, None]

    def attn(kk, vv):
        logits = (q @ kk.T) * hd ** -0.5
        logits -= logits.max(axis=-1, keepdims=True)
        p = np.exp(logits)
        p /= p.sum(axis=-1, keepdims=True)
        return p @ vv

    ref = attn(k, v)
    got = attn(roundtrip(k), roundtrip(v))
    return float(np.linalg.norm(got - ref)
                 / max(np.linalg.norm(ref), 1e-12))


def _kernel(
    # scalar prefetch
    plens_s, glens_s, ppi_s, gpi_s,
    # inputs
    q_ref,        # [G, hd] f32
    kcur_ref,     # [1, hd]
    vcur_ref,     # [1, hd]
    pk_ref, pv_ref,   # [Hkv, NPp, ps, hd]  (HBM)
    gk_ref, gv_ref,   # [Hkv, NPg, ps, hd]  (HBM)
    # output
    out_ref,      # [G, hd] f32
    # scratch
    kbuf, vbuf,   # [2, ps, hd] store dtype
    ksem, vsem,   # DMA semaphores (2,)
    *,
    pages_per_prompt: int,
    pages_per_gen: int,
    page_size: int,
    soft_cap: Optional[float],
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    hd = q_ref.shape[-1]
    g = q_ref.size // hd          # ref is [G, hd] or [G, 1, hd]
    ps = page_size

    plen = plens_s[b]
    glen = glens_s[b]
    np_pages = pl.cdiv(plen, ps)
    ng_pages = pl.cdiv(glen, ps)
    total = np_pages + ng_pages

    def page_of(i):
        """global block i -> (in_prompt, page id within that buffer)."""
        in_prompt = i < np_pages
        ip = jnp.minimum(i, pages_per_prompt - 1)
        ig = jnp.clip(i - np_pages, 0, pages_per_gen - 1)
        pid_p = ppi_s[b * pages_per_prompt + ip]
        pid_g = gpi_s[b * pages_per_gen + ig]
        return in_prompt, pid_p, pid_g

    def start_dma(i, slot):
        in_prompt, pid_p, pid_g = page_of(i)

        @pl.when(in_prompt)
        def _():
            pltpu.make_async_copy(pk_ref.at[h, pid_p], kbuf.at[slot],
                                  ksem.at[slot]).start()
            pltpu.make_async_copy(pv_ref.at[h, pid_p], vbuf.at[slot],
                                  vsem.at[slot]).start()

        @pl.when(jnp.logical_not(in_prompt))
        def _():
            pltpu.make_async_copy(gk_ref.at[h, pid_g], kbuf.at[slot],
                                  ksem.at[slot]).start()
            pltpu.make_async_copy(gv_ref.at[h, pid_g], vbuf.at[slot],
                                  vsem.at[slot]).start()

    @pl.when(total > 0)
    def _():
        start_dma(0, 0)

    q = q_ref[...].reshape(g, hd).astype(jnp.float32)    # [G, hd]

    def capped(x):
        if soft_cap is None:
            return x
        return jnp.tanh(x / soft_cap) * soft_cap

    def block_step(i, carry):
        m, l, acc = carry
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < total)
        def _():
            start_dma(i + 1, jax.lax.rem(i + 1, 2))

        # wait: both buffers have identical block shape/dtype, so a
        # canonical descriptor matches the in-flight byte count
        pltpu.make_async_copy(pk_ref.at[h, 0], kbuf.at[slot],
                              ksem.at[slot]).wait()
        pltpu.make_async_copy(pv_ref.at[h, 0], vbuf.at[slot],
                              vsem.at[slot]).wait()

        kblk = kbuf[slot].astype(jnp.float32)            # [ps, hd]
        logits = jax.lax.dot_general(
            q, kblk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [G, ps]
        logits = capped(logits)

        in_prompt = i < np_pages
        base = jnp.where(in_prompt, i * ps, (i - np_pages) * ps)
        seglen = jnp.where(in_prompt, plen, glen)
        col = jax.lax.broadcasted_iota(jnp.int32, (g, ps), 1)
        valid = (base + col) < seglen
        logits = jnp.where(valid, logits, _MASK_VALUE)

        m_new = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
        p = jnp.where(valid, jnp.exp(logits - m_new), 0.0)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, vbuf[slot].astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m0 = jnp.full((g, 1), _MASK_VALUE, jnp.float32)
    l0 = jnp.zeros((g, 1), jnp.float32)
    acc0 = jnp.zeros((g, hd), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, total, block_step, (m0, l0, acc0))

    # in-flight token: always valid (causal attention sees itself), which
    # keeps the denominator nonzero even with an empty cache
    ck = kcur_ref[...].reshape(1, hd).astype(jnp.float32)
    cur = capped(jnp.sum(q * ck, axis=-1, keepdims=True))  # [G, 1]
    m_new = jnp.maximum(m, cur)
    p_c = jnp.exp(cur - m_new)
    alpha = jnp.exp(m - m_new)
    l = l * alpha + p_c
    acc = acc * alpha + p_c * vcur_ref[...].reshape(1, hd).astype(jnp.float32)
    out_ref[...] = (acc / l).reshape(out_ref.shape).astype(out_ref.dtype)


def _batch_kernel(
    # scalar prefetch
    alens_s, blens_s, api_s, bpi_s,
    # inputs
    q_ref,        # [H, hd] f32 query (pre-scaled, rope'd)
    kcur_ref,     # [Hkv, 1, hd] in-flight token K (ignored w/o current)
    vcur_ref,     # [Hkv, 1, hd]
    ak_ref, av_ref,   # [Hkv, NPa, ps, hd] segment-A pages (HBM)
    bk_ref, bv_ref,   # [Hkv, NPb, ps, hd] segment-B pages (HBM)
    ask_ref, asv_ref,  # [Hkv, NPa, ps] f32 per-token scales (int8 mode)
    bsk_ref, bsv_ref,  # [Hkv, NPb, ps] f32
    # output
    out_ref,      # [H, hd] f32
    # scratch
    kbuf, vbuf,   # [2, Hkv, ps, hd] store dtype
    skbuf, svbuf,  # [2, Hkv, ps] f32 scale blocks
    ksem, vsem,   # DMA semaphores (2,)
    sksem, svsem,
    slot_ref,     # SMEM (1,) int32 — DMA buffer parity carried across cells
    *,
    pages_per_a: int,
    pages_per_b: int,
    page_size: int,
    soft_cap: Optional[float],
    include_current: bool,
    quantized: bool,
):
    """One grid cell = one batch row; every page DMA moves ALL KV heads.

    The cell walks its valid segment-A pages then segment-B pages with one
    double-buffered DMA stream; the LAST block of a cell prefetches the
    NEXT cell's first block, so the pipeline never drains at cell
    boundaries (the buffer parity rides SMEM scratch across grid
    iterations — the same trick as the upstream paged kernel's
    buffer_index). With ``include_current`` the in-flight token's K/V joins
    the flash statistics at the end (decode self-attention); without it the
    caller guarantees segment A is non-empty (cross attention)."""
    b = pl.program_id(0)
    n_cells = pl.num_programs(0)
    _, hkv, ps, hd = kbuf.shape
    h_all = q_ref.shape[0]
    g = h_all // hkv

    def counts(cell):
        return pl.cdiv(alens_s[cell], ps), pl.cdiv(blens_s[cell], ps)

    na, nb_seg = counts(b)
    nblocks = na + nb_seg
    alen = alens_s[b]
    blen = blens_s[b]

    def start_dma(cell, i, slot, n_a):
        in_a = i < n_a
        ia = jnp.minimum(i, pages_per_a - 1)
        ib = jnp.clip(i - n_a, 0, pages_per_b - 1)
        pid_a = api_s[cell * pages_per_a + ia]
        pid_b = bpi_s[cell * pages_per_b + ib]

        @pl.when(in_a)
        def _():
            pltpu.make_async_copy(ak_ref.at[:, pid_a], kbuf.at[slot],
                                  ksem.at[slot]).start()
            pltpu.make_async_copy(av_ref.at[:, pid_a], vbuf.at[slot],
                                  vsem.at[slot]).start()
            if quantized:
                pltpu.make_async_copy(ask_ref.at[:, pid_a], skbuf.at[slot],
                                      sksem.at[slot]).start()
                pltpu.make_async_copy(asv_ref.at[:, pid_a], svbuf.at[slot],
                                      svsem.at[slot]).start()

        @pl.when(jnp.logical_not(in_a))
        def _():
            pltpu.make_async_copy(bk_ref.at[:, pid_b], kbuf.at[slot],
                                  ksem.at[slot]).start()
            pltpu.make_async_copy(bv_ref.at[:, pid_b], vbuf.at[slot],
                                  vsem.at[slot]).start()
            if quantized:
                pltpu.make_async_copy(bsk_ref.at[:, pid_b], skbuf.at[slot],
                                      sksem.at[slot]).start()
                pltpu.make_async_copy(bsv_ref.at[:, pid_b], svbuf.at[slot],
                                      svsem.at[slot]).start()

    @pl.when(b == 0)
    def _():
        slot_ref[0] = 0
        start_dma(0, 0, 0, na)

    s0 = slot_ref[0]
    q = q_ref[...].astype(jnp.float32).reshape(hkv, g, hd)

    def capped(x):
        if soft_cap is None:
            return x
        return jnp.tanh(x / soft_cap) * soft_cap

    def block_step(i, carry):
        m, l, acc = carry
        slot = jax.lax.rem(s0 + i, 2)
        nxt = jax.lax.rem(s0 + i + 1, 2)

        @pl.when(i + 1 < nblocks)
        def _():
            start_dma(b, i + 1, nxt, na)

        @pl.when(jnp.logical_and(i + 1 == nblocks, b + 1 < n_cells))
        def _():
            n_a1, _ = counts(b + 1)
            start_dma(b + 1, 0, nxt, n_a1)

        pltpu.make_async_copy(ak_ref.at[:, 0], kbuf.at[slot],
                              ksem.at[slot]).wait()
        pltpu.make_async_copy(av_ref.at[:, 0], vbuf.at[slot],
                              vsem.at[slot]).wait()
        if quantized:
            pltpu.make_async_copy(ask_ref.at[:, 0], skbuf.at[slot],
                                  sksem.at[slot]).wait()
            pltpu.make_async_copy(asv_ref.at[:, 0], svbuf.at[slot],
                                  svsem.at[slot]).wait()

        kblk = kbuf[slot].astype(jnp.float32)            # [Hkv, ps, hd]
        if quantized:
            kblk = kblk * skbuf[slot][..., None]
        in_a = i < na
        base = jnp.where(in_a, i * ps, (i - na) * ps)
        seglen = jnp.where(in_a, alen, blen)
        col = jax.lax.broadcasted_iota(jnp.int32, (hkv, g, ps), 2)
        valid = (base + col) < seglen

        logits = capped(jax.lax.dot_general(
            q, kblk, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))         # [Hkv, G, ps]
        logits = jnp.where(valid, logits, _MASK_VALUE)
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
        p = jnp.where(valid, jnp.exp(logits - m_new), 0.0)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        vblk = vbuf[slot].astype(jnp.float32)
        if quantized:
            vblk = vblk * svbuf[slot][..., None]
        acc_new = acc * alpha + jax.lax.dot_general(
            p, vblk, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m0 = jnp.full((hkv, g, 1), _MASK_VALUE, jnp.float32)
    l0 = jnp.zeros((hkv, g, 1), jnp.float32)
    acc0 = jnp.zeros((hkv, g, hd), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, nblocks, block_step, (m0, l0, acc0))
    slot_ref[0] = jax.lax.rem(s0 + nblocks, 2)

    if include_current:
        ck = kcur_ref[...].reshape(hkv, 1, hd).astype(jnp.float32)
        cv = vcur_ref[...].reshape(hkv, 1, hd).astype(jnp.float32)
        cur = capped(jnp.sum(q * ck, axis=-1, keepdims=True))  # [Hkv, G, 1]
        m_new = jnp.maximum(m, cur)
        p_c = jnp.exp(cur - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + p_c
        acc = acc * alpha + p_c * cv
    out_ref[...] = (acc / jnp.where(l > 0.0, l, 1.0)
                    ).reshape(h_all, hd).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("attn_logits_soft_cap", "include_current", "interpret"),
)
def batch_paged_attention(
    q: jnp.ndarray,            # [B, H, hd] f32, rope'd + q_scale pre-applied
    k_cur: Optional[jnp.ndarray],   # [B, Hkv, hd] in-flight K, or None
    v_cur: Optional[jnp.ndarray],
    a_k_pages: jnp.ndarray,    # [Hkv, NPa, ps, hd]
    a_v_pages: jnp.ndarray,
    b_k_pages: Optional[jnp.ndarray],   # [Hkv, NPb, ps, hd] or None
    b_v_pages: Optional[jnp.ndarray],
    a_lengths: jnp.ndarray,    # [B] int32
    b_lengths: Optional[jnp.ndarray],
    a_page_indices: jnp.ndarray,        # [B, PPa]
    b_page_indices: Optional[jnp.ndarray],
    a_k_scales: Optional[jnp.ndarray] = None,   # [Hkv, NPa, ps] f32 (int8)
    a_v_scales: Optional[jnp.ndarray] = None,
    b_k_scales: Optional[jnp.ndarray] = None,
    b_v_scales: Optional[jnp.ndarray] = None,
    *,
    attn_logits_soft_cap: Optional[float] = None,
    include_current: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash attention over up to two paged segments (+ the in-flight
    token) with a batch-only grid -> [B, H, hd] f32, normalized.

    The decode hot loop calls this twice per layer: self attention (A =
    prompt, B = generation, include_current=True) and cross attention
    (A = encoder pages alone). Requires H % 8 == 0 on TPU. Without
    ``include_current`` segment A must be non-empty for every row.
    With ``a_k_scales`` the pages are int8 and each token dequantizes as
    ``int8 * scale`` inside the kernel (per-token, per-kv-head scales) —
    half the cache DMA bytes of bf16 with native converts.

    A row with ALL segments empty would break the cross-cell DMA pipeline
    (its prefetched block is never waited, desynchronizing the semaphore
    parity for every later cell), so segment A is clamped to >= 1: a
    degenerate row reads one zero-initialized page (its output is garbage
    either way — in-repo callers always have BOS-prefixed prompts or
    clamped encoder lengths), and the pipeline invariant holds for any
    input."""
    b, h, hd = q.shape
    hkv, _, ps, _ = a_k_pages.shape
    a_lengths = jnp.maximum(a_lengths.astype(jnp.int32), 1)
    quantized = a_k_scales is not None
    if b_k_pages is None:
        b_k_pages = a_k_pages[:, :1]
        b_v_pages = a_v_pages[:, :1]
        b_lengths = jnp.zeros((b,), jnp.int32)
        b_page_indices = jnp.zeros((b, 1), jnp.int32)
        if quantized:
            b_k_scales = a_k_scales[:, :1]
            b_v_scales = a_v_scales[:, :1]
    if not quantized:
        # dummies: never DMA'd (quantized=False skips all scale traffic)
        a_k_scales = a_v_scales = jnp.zeros((hkv, 1, ps), jnp.float32)
        b_k_scales = b_v_scales = a_k_scales
    if k_cur is None:
        k_cur = jnp.zeros((b, hkv, hd), jnp.float32)
        v_cur = k_cur
    ppa = a_page_indices.shape[1]
    ppb = b_page_indices.shape[1]

    kernel = functools.partial(
        _batch_kernel,
        pages_per_a=ppa,
        pages_per_b=ppb,
        page_size=ps,
        soft_cap=attn_logits_soft_cap,
        include_current=include_current,
        quantized=quantized,
    )

    row_spec = pl.BlockSpec((None, h, hd), lambda i, *_: (i, 0, 0))
    cur_spec = pl.BlockSpec((None, hkv, 1, hd), lambda i, *_: (i, 0, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b,),
        in_specs=[
            row_spec, cur_spec, cur_spec,
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=row_spec,
        scratch_shapes=(
            pltpu.VMEM((2, hkv, ps, hd), a_k_pages.dtype),
            pltpu.VMEM((2, hkv, ps, hd), a_v_pages.dtype),
            pltpu.VMEM((2, hkv, ps), jnp.float32),
            pltpu.VMEM((2, hkv, ps), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((1,), jnp.int32),
        ),
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, hd), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        a_lengths.astype(jnp.int32),
        b_lengths.astype(jnp.int32),
        a_page_indices.reshape(-1).astype(jnp.int32),
        b_page_indices.reshape(-1).astype(jnp.int32),
        q.astype(jnp.float32),
        k_cur.reshape(b, hkv, 1, hd),
        v_cur.reshape(b, hkv, 1, hd),
        a_k_pages,
        a_v_pages,
        b_k_pages,
        b_v_pages,
        a_k_scales,
        a_v_scales,
        b_k_scales,
        b_v_scales,
    )
    return out


@functools.partial(
    jax.jit,
    static_argnames=("attn_logits_soft_cap", "interpret"),
)
def fused_decode_attention(
    q: jnp.ndarray,            # [B, H, hd] f32, rope'd + q_scale pre-applied
    k_cur: jnp.ndarray,        # [B, Hkv, hd] in-flight token K (post-rope)
    v_cur: jnp.ndarray,        # [B, Hkv, hd]
    prompt_k_pages: jnp.ndarray,   # [Hkv, NPp, ps, hd]
    prompt_v_pages: jnp.ndarray,
    gen_k_pages: jnp.ndarray,      # [Hkv, NPg, ps, hd]
    gen_v_pages: jnp.ndarray,
    prompt_lengths: jnp.ndarray,   # [B] int32
    gen_lengths: jnp.ndarray,      # [B] int32
    prompt_page_indices: jnp.ndarray,  # [B, PPp]
    gen_page_indices: jnp.ndarray,     # [B, PPg]
    *,
    attn_logits_soft_cap: Optional[float] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Self-attention over prompt pages + generation pages + the in-flight
    token, in one fused flash pass -> [B, H, hd] f32 (normalized)."""
    b, h, hd = q.shape
    hkv, _, ps, _ = prompt_k_pages.shape
    g = h // hkv
    ppp = prompt_page_indices.shape[1]
    ppg = gen_page_indices.shape[1]

    kernel = functools.partial(
        _kernel,
        pages_per_prompt=ppp,
        pages_per_gen=ppg,
        page_size=ps,
        soft_cap=attn_logits_soft_cap,
    )

    if g % 8 != 0:
        # Mosaic wants the last-two block dims (8, 128)-aligned; tiny GQA
        # group counts ride a [B, Hkv, G, 1, hd] view instead so the G axis
        # is not among them (the upstream paged kernel does the same)
        q_spec = pl.BlockSpec((None, None, g, None, hd),
                              lambda i, j, *_: (i, j, 0, 0, 0))
        q_shaped = (b, hkv, g, 1, hd)
    else:
        q_spec = pl.BlockSpec((None, g, hd), lambda i, j, *_: (i, j, 0))
        q_shaped = None

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b, hkv),
        in_specs=[
            q_spec,
            pl.BlockSpec((None, None, 1, hd), lambda i, j, *_: (i, j, 0, 0)),
            pl.BlockSpec((None, None, 1, hd), lambda i, j, *_: (i, j, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=q_spec,
        scratch_shapes=(
            pltpu.VMEM((2, ps, hd), prompt_k_pages.dtype),
            pltpu.VMEM((2, ps, hd), prompt_v_pages.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ),
    )

    q_in = q.astype(jnp.float32)
    if q_shaped is not None:
        q_in = q_in.reshape(q_shaped)
        out_shape = jax.ShapeDtypeStruct(q_shaped, jnp.float32)
    else:
        out_shape = jax.ShapeDtypeStruct((b, h, hd), jnp.float32)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(
        prompt_lengths.astype(jnp.int32),
        gen_lengths.astype(jnp.int32),
        prompt_page_indices.reshape(-1).astype(jnp.int32),
        gen_page_indices.reshape(-1).astype(jnp.int32),
        q_in,
        k_cur.reshape(b, hkv, 1, hd),
        v_cur.reshape(b, hkv, 1, hd),
        prompt_k_pages,
        prompt_v_pages,
        gen_k_pages,
        gen_v_pages,
    )
    return out.reshape(b, h, hd)
