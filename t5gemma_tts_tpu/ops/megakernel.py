"""Per-layer decode MEGAKERNEL: int8 weights + attention + norms, one launch.

The AR decode step is HBM-bandwidth-bound (reference hot loop being beaten:
models/t5gemma.py:1057-1115): every token streams the full decoder through
the chip. Round-2 measurements put the step at ~10.5 ms (batch 64) / ~4.3 ms
(batch 1) against a ~5.9 / ~3.0 ms DMA floor — the gap is per-matmul launch
overhead and pipeline drains between the ~7 kernels each layer dispatches.
This kernel runs an ENTIRE decoder layer in ONE ``pallas_call``:

  rms_norm -> fused int8 qkv matmul (streamed weight tiles) -> rope ->
  flash self-attention over the layer's dense K/V slabs (+ in-flight token)
  -> int8 o-proj -> post-norm residual -> cross-q -> flash cross-attention
  -> int8 cross-o -> post-norm residual -> GeGLU MLP with gate/up/down
  weight tiles streamed in one interleaved loop -> post-norm residual.

Design points (pallas_guide.md patterns: double buffering, scalar prefetch):

- **Weight streaming.** Stacked int8 weights stay in HBM (`pl.ANY`); the
  kernel double-buffers [K, 512] / [512, N] tiles with manual async copies,
  indexing the layer with a scalar-prefetch ``li`` — the surrounding
  ``lax.scan`` compiles the kernel ONCE for all layers.
- **W8A8 everywhere.** Activations are absmax-quantized per row (per tile
  for the MLP intermediate) to int8; matmuls run on the MXU int8 pipeline
  with exact int32 accumulation and an f32 rescale epilogue — the same math
  as ops/quant.py's `_w8a8` paths.
- **Dense-slab attention.** The windowed engine's "paged" cache is an
  identity ring layout (models/t5gemma.py:_layer_page_indices): layer li's
  K/V for row b is the contiguous slab ``buf[:, li*B + b]``. The kernel
  flash-accumulates over 128-token blocks of the prompt and generation
  slabs plus the in-flight token per row, with a double-buffered DMA
  stream whose slot parity carries ACROSS rows (the last block of row b
  prefetches row b+1's first block), so the pipeline never drains at row
  boundaries — the same trick as ops/fused_attn.py's batch kernel.
- **Head-major scratch.** Per-row attention wants q as [Hkv, G, hd]; the
  matmul produces row-major [B, H*hd]. Q/K/V/attn-out live in [heads, B,
  hd] scratch so every in-kernel reshape splits/merges LEADING dims only —
  no lane relayouts (Mosaic restriction).
- **bf16 K/V only.** int8 KV pages keep the existing two-kernel path.

The kernel runs in interpreter mode off-TPU, so the CPU test suite executes
the identical code path (tests/test_megakernel.py pins it against the
unfused layer body and the f32 reference).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)

WTILE = 512          # weight tile width (matches ops/quant.py N_TILE)
TBLOCK = 128         # attention time-block (= models/t5gemma.py PAGE_SIZE)
CHUNK = 2            # weight tiles per DMA (amortizes ~2.4 us start cost).
                     # Negative results, both measured at batch 64 serving
                     # dims: CHUNK=4 is WORSE (0.358 vs 0.316 ms/layer —
                     # the o/co/qkv streams collapse to 1-2 chunks and lose
                     # all DMA/MXU overlap); an XLA-precomputed flat block
                     # schedule for the attention walk with a 4-slot ring
                     # and 3-deep page prefetch was NEUTRAL (0.317) while
                     # 6x-ing Mosaic compile time (502 s vs 81 s) — the
                     # per-row 2-slot page walk already keeps the HBM
                     # stream busy. 0.316 ms/layer = ~680 GB/s effective,
                     # ~83% of v5e peak; further gains need fewer bytes
                     # (int4 weights / int8 KV), not better scheduling.
                     # int4 weights measured: batch 1 0.155 -> 0.099
                     # ms/layer (the latency mode); batch 64 NEUTRAL
                     # (0.313 vs 0.316 — attention-bound there, the
                     # unpack dots offset the DMA saving), so the
                     # serving headline stays int8.


def _rms(x32, w32, eps):
    n = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)
    return n * (1.0 + w32)


def _quant_rows(x32):
    """Per-row absmax int8 quantization (ops/quant.py _quantize_act math).

    The int8 cast routes through int32: a direct f32->int8
    convert_element_type inside a Mosaic kernel HANGS at run time on the
    current axon terminal's libtpu (bisected with minimal probes; the
    f32->i32->i8 chain runs fine and is value-identical after the clip)."""
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    sx = jnp.maximum(amax, 1e-8) / 127.0
    x8 = (jnp.clip(jnp.round(x32 / sx), -127, 127)
          .astype(jnp.int32).astype(jnp.int8))
    return x8, sx


def _rot_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


class _Meta(NamedTuple):
    nqkv: int     # qkv padded out width (multiple of WTILE)
    cqn: int      # cross-q padded out width (multiple of WTILE)
    ho: int       # H * hd
    dp: int       # o/co/down padded out width
    f: int        # intermediate size
    ppp: int      # prompt pages per row
    ppg: int      # generation pages per row
    ppx: int      # cross (encoder) pages per row
    o_tiled: bool   # o/co weights in "tiled_k" layout
    dn_tiled: bool  # down weight in "tiled_k" layout


def _kernel(
    # scalar prefetch
    li_s, plens_s, glens_s, elens_s,
    # inputs
    h_ref,                    # [BP, D] f32
    cos_ref, sin_ref,         # [BP, hd] f32 (self rope)
    qcos_ref, qsin_ref,       # [BP, hd] f32 (cross-query rope)
    n0_ref, n1_ref, n2_ref, n3_ref, n4_ref, n5_ref,   # [L, D] f32 norms
    qkvs_ref, os_ref, cqs_ref, cos_s_ref, gus_ref, dns_ref,  # [L, N] scales
    qkvw_ref, ow_ref, cqw_ref, cow_ref, guw_ref, dnw_ref,    # ANY int8
    pk_ref, pv_ref,           # [Hkv, L*B, Wp, hd] bf16/int8 (ANY)
    gk_ref, gv_ref,           # [Hkv, L*B, Tg, hd]
    xk_ref, xv_ref,           # [Hkv, L*B, Tx, hd]
    pks_ref, pvs_ref,         # [Hkv, NPp, TBLOCK] f32 scale pages (ANY;
    gks_ref, gvs_ref,         # dummy [1, 1, 1] when kv_quant is False)
    xks_ref, xvs_ref,
    # outputs
    hout_ref,                 # [BP, D] f32
    knew_ref, vnew_ref,       # [Hkv, BP, hd] f32 (head-major; also serves
                              # as the in-flight k/v the attention reads)
    knew2_ref, vnew2_ref,     # [BP, Hkv*hd] f32 (row-major twin: the
                              # engine consumes this one — [B, KVH] ->
                              # [B, Hkv, hd] is a free reshape, vs a
                              # [Hkv, B, hd] -> [B, Hkv, hd] XLA transpose
                              # per layer per k/v, ~52 launches/step)
    # scratch
    awbuf, bwbuf,             # [2, CHUNK, D, WTILE] int8 (N-tile streams)
    kwbuf,                    # [2, CHUNK, WTILE, DP] int8 (K-tile streams)
    qkv_buf,                  # [BP, NQKV] f32
    attn_buf,                 # [BP, HO] f32
    acc_buf,                  # [BP, DP] f32
    qh_buf,                   # [H, BP, hd] f32 (head-major q)
    ah_buf,                   # [H, BP, hd] f32 (head-major attn out)
    kbuf, vbuf,               # [2, Hkv, TBLOCK, hd] bf16 (slab blocks)
    x8_buf,                   # [BP, HO] int8 (staged kstream activations)
    gs_buf,                   # [1, 2F] f32 (staged gate/up scale row)
    asem, bsem, ksem2,        # weight DMA semaphores (2,)
    pksem, pvsem,             # slab DMA semaphores (2,)
    *scale_scratch,           # kv_quant only: spk, spv, sgk, sgv, sxk, sxv
                              # ([Hkv, B*pp, TBLOCK] f32 staged scale slabs)
                              # + ssem DMA semaphores (6,)
    meta: _Meta,
    true_batch: int,          # rows that exist in the cache slabs
    hidden: int,
    heads: int,
    kv_heads: int,
    head_dim: int,
    eps: float,
    soft_cap: Optional[float],
    q_scale: float,
    kv_quant: bool = False,   # int8 pages + per-token scale planes
    phases: tuple = ("self", "cross", "mlp"),  # compile-time phase mask
    w4: bool = False,         # lanes4 int4 weights (ops/quant.Lanes4Weight)
    layer_from_grid: bool = False,  # stacked mode: ONE pallas_call runs all
                              # layers as a sequential grid; the layer id is
                              # the grid index and h carries across steps in
                              # the revisited hout block (li_s is ignored)
    chain: int = 1,           # speculative verify: each cache row carries
                              # ``chain`` pseudo-rows (S = k+1 chain
                              # positions); pseudo-row b maps to cache row
                              # b // chain and attends causally to the
                              # fresh K/V of pseudo-rows (b//chain)*chain
                              # .. b (the generalized "current token")
):
    d = hidden
    hd = head_dim
    hkv = kv_heads
    g = heads // kv_heads
    ho = meta.ho
    kvh = hkv * hd
    li = pl.program_id(0) if layer_from_grid else li_s[0]
    bp = h_ref.shape[0]
    # w4 packed tiles carry HALF the bytes, which drops the per-chunk wire
    # time below the ~2.4 us scalar-core DMA start cost and turns the
    # stream issue-bound (measured at batch 1: 308 GB/s wire vs int8's
    # 598 — int4 was barely faster despite half the bytes). Doubling the
    # tiles-per-DMA restores bytes-per-chunk parity with the int8 stream.
    chunk = 2 * CHUNK if w4 else CHUNK

    def capped(x):
        if soft_cap is None:
            return x
        return jnp.tanh(x / soft_cap) * soft_cap

    # this layer's norm/scale rows arrive PRE-SLICED [1, n] (decode_layer
    # slices the [L, n] tables in XLA): in-kernel dynamic-sublane reads
    # were expensive to compile AND shipping whole [L, n] tables into VMEM
    # cost ~6 MB per launch at 26 layers
    n0 = n0_ref[...]
    n1 = n1_ref[...]
    n2 = n2_ref[...]
    n3 = n3_ref[...]
    n4 = n4_ref[...]
    n5 = n5_ref[...]
    qkvs_row = qkvs_ref[...]
    cqs_row = cqs_ref[...]
    gus_row = gus_ref[...]
    os_row = cos_row = dns_row = None
    if not w4:
        # w8: pre-read the kstream/MLP scale rows as VALUES, keeping the
        # kernel code byte-identical to the TPU-validated int8 variant
        # (the w4 branches below read half-slices from the REFS instead —
        # a half VALUE slice would carry a rejected lane offset)
        os_row = os_ref[...]
        cos_row = cos_s_ref[...]
        dns_row = dns_ref[...]

    def _qsum(x8):
        """sum(x8) per row, as the correction operand for the w4 lo-nibble
        recovery (x.q_lo = x8@(p&15) - 8*sum(x8)). Computed as an int8 DOT
        against a ones matrix: int8 MXU dots are the one PROVEN int8
        primitive on this terminal's libtpu, while elementwise int8
        widening (astype int32) is untested and the elementwise int8 op
        surface is known-hostile (shifts/mul/sub all fail to legalize).
        f32 is exact here (|sum| <= 127*K < 2^24)."""
        if not w4:
            return None
        ones = jnp.ones((x8.shape[1], 128), jnp.int8)
        s = jax.lax.dot_general(x8, ones, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return s[:, :1].astype(jnp.float32)      # offset-0 value slice

    # ---- streamed matmuls ----------------------------------------------
    # Weight-tile DMAs move FULL trailing dims of tile-major layouts
    # (ops/quant.retile_for_streaming): a lane-sliced HBM DMA hangs the
    # terminal at run time (bisected with minimal probes).
    def nstream(w_any, s_row, x8, sx, xsum, out_vmem, n_tiles, wbuf, wsem):
        """out[:, jT:(j+1)T] = (x8 @ w_tiled[li*NT + j]) * sx * scale;
        w_any is "tiled_n" FLATTENED to [L*NT, K, T]. Consecutive tiles
        move in CHUNKS of up to CHUNK per DMA: a dynamically addressed
        start costs ~2.4 us of scalar-core work (measured; flat indexing
        alone did not help) vs ~1.4 us of wire time per [2304, 512] int8
        tile, so per-tile DMAs left the HBM stream idle more than half the
        time. The loop is PYTHON-unrolled: Mosaic has no dynamic_slice on
        values, so tile offsets must be static.

        w4: tiles are lanes4-packed [K, T/2] (channel c pairs with
        c + T/2; byte = 16*q_hi + (q_lo + 8)). Only AND legalizes on int8
        vectors here, so the nibbles are never unpacked — two int8 dots
        recover both halves exactly (see ops/quant.py lanes4 header):
            x.q_hi = (x8@p - x8@ul) / 16,  x.q_lo = x8@ul - 8*sum(x8)
        with ul = p & 15; both land in their natural channel span, so the
        deferred full-row scale epilogue below is unchanged."""
        base = li * n_tiles
        n_chunks = -(-n_tiles // chunk)

        def gsize(c):
            return min(chunk, n_tiles - chunk * c)

        def start(c, slot):
            pltpu.make_async_copy(
                w_any.at[pl.ds(base + chunk * c, gsize(c))],
                wbuf.at[slot, pl.ds(0, gsize(c))], wsem.at[slot]).start()

        start(0, 0)
        for c in range(n_chunks):
            slot = c % 2
            if c + 1 < n_chunks:
                start(c + 1, (c + 1) % 2)
            pltpu.make_async_copy(
                w_any.at[pl.ds(base + chunk * c, gsize(c))],
                wbuf.at[slot, pl.ds(0, gsize(c))], wsem.at[slot]).wait()
            for g in range(gsize(c)):
                j = chunk * c + g
                if w4:
                    half = WTILE // 2
                    pg = wbuf[slot, g]                      # [K, T/2]
                    ul = jnp.bitwise_and(pg, jnp.int8(15))
                    dp_ = jax.lax.dot_general(
                        x8, pg, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    dul = jax.lax.dot_general(
                        x8, ul, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    out_vmem[:, j * WTILE:j * WTILE + half] = (
                        dul.astype(jnp.float32) - 8.0 * xsum)
                    out_vmem[:, j * WTILE + half:(j + 1) * WTILE] = (
                        (dp_ - dul).astype(jnp.float32) * 0.0625)
                else:
                    acc = jax.lax.dot_general(
                        x8, wbuf[slot, g], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    out_vmem[:, j * WTILE:(j + 1) * WTILE] = (
                        acc.astype(jnp.float32))
        # scale ONCE over the whole written span: a per-tile VALUE slice of
        # s_row carries its lane offset in the Mosaic layout and the [1,T]
        # -> [BP,T] broadcast from a non-zero lane offset is rejected
        # ("Invalid input layout"); the full-row broadcast is offset 0.
        n_out = n_tiles * WTILE
        out_vmem[:, :n_out] = out_vmem[:, :n_out] * sx * s_row

    def kstream(w_any, s_val, s_ref, x8, sx, xsum, k_size, tiled):
        """acc_buf[:] = (x8 @ w[li]) * sx * scale, streaming K-tiles; int32
        accumulation is exact (one act scale per row). ``tiled``:
        "tiled_k" [L, KT, T, DP] full-trailing DMAs (serving dims); the kn
        fallback (sublane-sliced DMA) exists only for interpreter-mode test
        dims where K < WTILE.

        w4: tiles are lanes4-packed [TK, DP/2] with GLOBAL channel pairing
        (c, c + DP/2); two dots per tile recover both halves, lo/hi
        accumulate in f32 and land in their channel spans of acc_buf with
        REF-read half-scales (a half-slice of the s VALUE would carry a
        lane offset the broadcast rejects)."""
        if w4:
            tk = WTILE if k_size % WTILE == 0 else k_size
            n_tiles = k_size // tk
            base = li * n_tiles      # l4k is flattened [L*KT, TK, DP/2]
            ck = chunk if tk == WTILE else 1
            n_chunks = -(-n_tiles // ck)
            x8_buf[:, :k_size] = x8
            dph = meta.dp // 2

            def gsize4(c):
                return min(ck, n_tiles - ck * c)

            def copy4(c, slot):
                if tk == WTILE:
                    return pltpu.make_async_copy(
                        w_any.at[pl.ds(base + ck * c, gsize4(c))],
                        kwbuf.at[slot, pl.ds(0, gsize4(c))], ksem2.at[slot])
                return pltpu.make_async_copy(
                    w_any.at[pl.ds(base + c, 1)],
                    kwbuf.at[slot, pl.ds(0, 1), pl.ds(0, tk), :],
                    ksem2.at[slot])

            copy4(0, 0).start()
            acc_lo = jnp.zeros((x8.shape[0], dph), jnp.float32)
            acc_hi = jnp.zeros((x8.shape[0], dph), jnp.float32)
            for c in range(n_chunks):
                slot = c % 2
                if c + 1 < n_chunks:
                    copy4(c + 1, (c + 1) % 2).start()
                copy4(c, slot).wait()
                for g in range(gsize4(c)):
                    t = ck * c + g
                    xt = x8_buf[:, t * tk:(t + 1) * tk]
                    pg = kwbuf[slot, g, pl.ds(0, tk), :]
                    ul = jnp.bitwise_and(pg, jnp.int8(15))
                    dp_ = jax.lax.dot_general(
                        xt, pg, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    dul = jax.lax.dot_general(
                        xt, ul, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    acc_lo = acc_lo + dul.astype(jnp.float32)
                    acc_hi = acc_hi + (dp_ - dul).astype(jnp.float32)
            # the per-tile -8*sum(x_tile) corrections telescope to one
            # full-row correction; 1/16 of the hi diff likewise once
            acc_lo = acc_lo - 8.0 * xsum
            acc_hi = acc_hi * 0.0625
            acc_buf[:, pl.ds(0, dph)] = acc_lo * sx * s_ref[:, pl.ds(0, dph)]
            acc_buf[:, pl.ds(dph, dph)] = (
                acc_hi * sx * s_ref[:, pl.ds(dph, dph)])
            return

        ktile = WTILE if tiled else (WTILE if k_size % WTILE == 0 else k_size)
        n_tiles = k_size // ktile
        base = li * n_tiles          # tiled_k is flattened [L*KT, T, DP]
        # K-tiles stream in CHUNKs too (same start-cost amortization as
        # nstream); the kn fallback stays per-tile (interpret-only dims)
        ck = chunk if tiled else 1
        n_chunks = -(-n_tiles // ck)
        # stage the quantized activations in VMEM so per-tile operands are
        # REF reads (clean layout); lane-offset VALUE slices feeding the
        # MXU hit the same Mosaic "Invalid input layout" class as nstream's
        # scale broadcast
        x8_buf[:, :k_size] = x8

        def gsize(c):
            return min(ck, n_tiles - ck * c)

        def start(c, slot):
            if tiled:
                pltpu.make_async_copy(
                    w_any.at[pl.ds(base + ck * c, gsize(c))],
                    kwbuf.at[slot, pl.ds(0, gsize(c))],
                    ksem2.at[slot]).start()
            else:
                pltpu.make_async_copy(
                    w_any.at[li, pl.ds(c * ktile, ktile), :],
                    kwbuf.at[slot, 0, pl.ds(0, ktile), :],
                    ksem2.at[slot]).start()

        def wait(c, slot):
            if tiled:
                pltpu.make_async_copy(
                    w_any.at[pl.ds(base + ck * c, gsize(c))],
                    kwbuf.at[slot, pl.ds(0, gsize(c))],
                    ksem2.at[slot]).wait()
            else:
                pltpu.make_async_copy(w_any.at[li, pl.ds(c * ktile, ktile), :],
                                      kwbuf.at[slot, 0, pl.ds(0, ktile), :],
                                      ksem2.at[slot]).wait()

        start(0, 0)
        acc32 = jnp.zeros((x8.shape[0], meta.dp), jnp.int32)
        for c in range(n_chunks):
            slot = c % 2
            if c + 1 < n_chunks:
                start(c + 1, (c + 1) % 2)
            wait(c, slot)
            for g in range(gsize(c)):
                t = ck * c + g
                xt = x8_buf[:, t * ktile:(t + 1) * ktile]
                acc32 = acc32 + jax.lax.dot_general(
                    xt, kwbuf[slot, g, pl.ds(0, ktile), :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
        acc_buf[...] = acc32.astype(jnp.float32) * sx * s_val

    # ---- flash attention over dense cache slabs ------------------------
    def slab_attention(ak_src, av_src, bk_src, bv_src, pp_a, pp_b,
                       alen_of, blen_of, with_current,
                       scale_srcs=None, scale_bufs=None, ssem0=0):
        """Per-row two-segment flash attention; q from qh_buf, output to
        ah_buf. The DMA slot parity carries across rows (row b's last
        block prefetches row b+1's first block). Sources are PAGES VIEWS
        [Hkv, NP, TBLOCK, hd] (free reshape of the identity slabs) so every
        DMA copies full trailing dims — the proven fused_attn pattern;
        pp_a/pp_b are each row's page counts.

        kv_quant: pages are int8 and ``scale_srcs`` = (ak, av, bk, bv)
        per-token scale PAGES VIEWS [Hkv, NP, TBLOCK] f32. The layer's
        whole scale slabs stage into VMEM ``scale_bufs`` in ONE DMA each
        (per-BLOCK scale DMAs are what made the two-kernel paged_i8 path
        SLOWER than bf16 — docs/DESIGN.md §1); the per-token k scale then
        multiplies the LOGITS and the v scale folds into p, both of which
        carry the token axis in LANES — no relayout, and the math is exact
        (q·(k8·s) = s·(q·k8); Σ p·(v8·s) = Σ (p·s)·v8)."""
        if kv_quant:
            row0 = li * true_batch
            aks, avs, bks, bvs = scale_srcs
            ska, sva, skb, svb = scale_bufs
            ssem = scale_scratch[-1]
            copies = [
                pltpu.make_async_copy(
                    aks.at[:, pl.ds(row0 * pp_a, true_batch * pp_a)],
                    ska, ssem.at[ssem0]),
                pltpu.make_async_copy(
                    avs.at[:, pl.ds(row0 * pp_a, true_batch * pp_a)],
                    sva, ssem.at[ssem0 + 1]),
            ]
            if skb is not ska:
                copies += [
                    pltpu.make_async_copy(
                        bks.at[:, pl.ds(row0 * pp_b, true_batch * pp_b)],
                        skb, ssem.at[ssem0 + 2]),
                    pltpu.make_async_copy(
                        bvs.at[:, pl.ds(row0 * pp_b, true_batch * pp_b)],
                        svb, ssem.at[ssem0 + 3]),
                ]
            for cp in copies:
                cp.start()
            for cp in copies:
                cp.wait()
        else:
            ska = sva = skb = svb = None

        def counts(b):
            na = pl.cdiv(alen_of(b), TBLOCK)
            nb = pl.cdiv(blen_of(b), TBLOCK)
            return na, nb

        def start_blk(b, i, slot):
            # pseudo-row b reads cache row b // chain (chain == 1: b itself)
            row = li * true_batch + jnp.minimum(b // chain, true_batch - 1)
            na, _ = counts(b)
            in_a = i < na
            pid_a = row * pp_a + jnp.minimum(i, pp_a - 1)
            pid_b = row * pp_b + jnp.clip(i - na, 0, pp_b - 1)

            @pl.when(in_a)
            def _():
                pltpu.make_async_copy(ak_src.at[:, pid_a], kbuf.at[slot],
                                      pksem.at[slot]).start()
                pltpu.make_async_copy(av_src.at[:, pid_a], vbuf.at[slot],
                                      pvsem.at[slot]).start()

            @pl.when(jnp.logical_not(in_a))
            def _():
                pltpu.make_async_copy(bk_src.at[:, pid_b], kbuf.at[slot],
                                      pksem.at[slot]).start()
                pltpu.make_async_copy(bv_src.at[:, pid_b], vbuf.at[slot],
                                      pvsem.at[slot]).start()

        def nblocks_of(b):
            na, nb = counts(b)
            return na + nb

        @pl.when(nblocks_of(0) > 0)
        def _():
            start_blk(0, 0, 0)

        def row_body(b, s0):
            alen = alen_of(b)
            blen = blen_of(b)
            na, nb = counts(b)
            nblocks = na + nb
            # [H, 1, hd] -> [hkv, g, hd]: leading-dims reshape only
            qrow = qh_buf[:, pl.ds(b, 1), :].reshape(hkv, g, hd)
            # bf16 q for the MXU-native bf16 x bf16 QK dot (the f32
            # convert-then-f32-dot is never faster). For int8 pages a
            # fully-int8 dot against a per-row quantized q + per-block
            # quantized p*vscale was tried and measured WORSE (10.02 vs
            # 9.20 ms/step at batch 64): the g=2-row dot shapes are too
            # small for the int8 MXU pipeline to win over the VPU
            # dequant-converts, so int8 pages convert to bf16 instead
            qbrow = qrow.astype(jnp.bfloat16)

            def blk(i, carry):
                m, l, acc = carry
                slot = jax.lax.rem(s0 + i, 2)
                nxt = jax.lax.rem(s0 + i + 1, 2)

                @pl.when(i + 1 < nblocks)
                def _():
                    start_blk(b, i + 1, nxt)

                @pl.when(jnp.logical_and(i + 1 == nblocks, b + 1 < bp))
                def _():
                    @pl.when(nblocks_of(b + 1) > 0)
                    def _():
                        start_blk(b + 1, 0, nxt)

                pltpu.make_async_copy(ak_src.at[:, 0], kbuf.at[slot],
                                      pksem.at[slot]).wait()
                pltpu.make_async_copy(av_src.at[:, 0], vbuf.at[slot],
                                      pvsem.at[slot]).wait()

                in_a = i < na
                base = jnp.where(in_a, i * TBLOCK, (i - na) * TBLOCK)
                seglen = jnp.where(in_a, alen, blen)
                col = jax.lax.broadcasted_iota(
                    jnp.int32, (hkv, g, TBLOCK), 2)
                valid = (base + col) < seglen
                if kv_quant:
                    # per-token scales, token axis in LANES throughout
                    # (the k scale multiplies the LOGITS and the v scale
                    # folds into p: q.(k8*s) = s.(q.k8) — no relayout)
                    brow = b // chain
                    sia = jnp.minimum(brow * pp_a + i, true_batch * pp_a - 1)
                    sib = jnp.clip(brow * pp_b + (i - na), 0,
                                   true_batch * pp_b - 1)
                    ks = jnp.where(in_a, ska[:, pl.ds(sia, 1), :],
                                   skb[:, pl.ds(sib, 1), :])  # [hkv, 1, ts]
                    vs = jnp.where(in_a, sva[:, pl.ds(sia, 1), :],
                                   svb[:, pl.ds(sib, 1), :])
                    raw = jax.lax.dot_general(
                        qbrow, kbuf[slot].astype(jnp.bfloat16),
                        (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32) * ks
                else:
                    raw = jax.lax.dot_general(
                        qbrow, kbuf[slot], (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
                logits = capped(raw)
                logits = jnp.where(valid, logits, _MASK_VALUE)
                m_new = jnp.maximum(m, jnp.max(logits, -1, keepdims=True))
                p = jnp.where(valid, jnp.exp(logits - m_new), 0.0)
                alpha = jnp.exp(m - m_new)
                l_new = l * alpha + jnp.sum(p, -1, keepdims=True)
                if kv_quant:
                    blk_acc = jax.lax.dot_general(
                        (p * vs).astype(jnp.bfloat16),
                        vbuf[slot].astype(jnp.bfloat16),
                        (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
                else:
                    blk_acc = jax.lax.dot_general(
                        p.astype(jnp.bfloat16), vbuf[slot],
                        (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
                acc_new = acc * alpha + blk_acc
                return m_new, l_new, acc_new

            m0 = jnp.full((hkv, g, 1), _MASK_VALUE, jnp.float32)
            l0 = jnp.zeros((hkv, g, 1), jnp.float32)
            acc0 = jnp.zeros((hkv, g, hd), jnp.float32)
            m, l, acc = jax.lax.fori_loop(0, nblocks, blk, (m0, l0, acc0))

            if with_current:
                # chain == 1: exactly the single in-flight token read.
                # chain > 1 (speculative verify): pseudo-row b attends to
                # the fresh K/V of its OWN chain positions 0..pos_in (the
                # intra-chain causal part the unfused path handles with
                # merge_attention_parts_chain); j > pos_in is masked.
                cb = (b // chain) * chain       # chain base pseudo-row
                cb = jnp.minimum(cb, bp - chain)  # padded-tail clamp
                pos_in = b - cb

                def store_round(x):
                    # chain positions j < pos_in: the sequential engine
                    # reads these from the FLUSHED cache, so round-trip
                    # through the storage dtype (pending blocks are held
                    # bf16 before the flush; int8 adds the per-token
                    # quantize/dequantize) to keep the emitted stream
                    # aligned with the sequential trace — the same
                    # store_dtype rule as paged_attn.merge_attention_
                    # parts_chain
                    xb = x.astype(jnp.bfloat16).astype(jnp.float32)
                    if not kv_quant:
                        return xb
                    amax = jnp.max(jnp.abs(xb), -1, keepdims=True)
                    s = jnp.maximum(amax, 1e-8) / 127.0
                    return jnp.clip(jnp.round(xb / s), -127.0, 127.0) * s

                # the flushed-slab dot runs in bf16 q; use the same
                # rounded q for the j < pos_in contributions so a token's
                # logits match (to summation order) what the sequential
                # engine computes once these tokens are in the slab
                qrow_st = qrow.astype(jnp.bfloat16).astype(jnp.float32)
                for j in range(chain):
                    ck = knew_ref[:, pl.ds(cb + j, 1), :]  # [hkv, 1, hd]
                    cv = vnew_ref[:, pl.ds(cb + j, 1), :]
                    qj = qrow
                    if chain > 1:
                        is_self = jnp.int32(j) >= pos_in
                        ck = jnp.where(is_self, ck, store_round(ck))
                        cv = jnp.where(is_self, cv, store_round(cv))
                        qj = jnp.where(is_self, qrow, qrow_st)
                    cur = capped(jnp.sum(qj * ck, -1, keepdims=True))
                    if chain > 1:
                        cur = jnp.where(j <= pos_in, cur, _MASK_VALUE)
                    m_new = jnp.maximum(m, cur)
                    p_c = jnp.exp(cur - m_new)
                    alpha = jnp.exp(m - m_new)
                    l = l * alpha + p_c
                    acc = acc * alpha + p_c * cv
                    m = m_new
            out = acc / jnp.where(l > 0.0, l, 1.0)        # [hkv, g, hd]
            ah_buf[:, pl.ds(b, 1), :] = out.reshape(heads, 1, hd)
            return jax.lax.rem(s0 + nblocks, 2)

        jax.lax.fori_loop(0, bp, row_body, 0, unroll=False)

    def heads_to_rows(src, n_heads, out_vmem):
        """[n_heads, BP, hd] scratch -> row-major [BP, n_heads*hd]."""
        for hh in range(n_heads):
            out_vmem[:, pl.ds(hh * hd, hd)] = src[hh]

    # ======================= phase 1: self attention =====================
    def phase_self(h32):
        hn = _rms(h32, n0, eps)
        x8, sx = _quant_rows(hn)
        nstream(qkvw_ref, qkvs_row, x8, sx, _qsum(x8), qkv_buf,
                meta.nqkv // WTILE, awbuf, asem)

        cosb = cos_ref[...]
        sinb = sin_ref[...]
        for hh in range(heads):
            qh = qkv_buf[:, pl.ds(hh * hd, hd)]
            qh = qh * cosb + _rot_half(qh) * sinb
            qh_buf[pl.ds(hh, 1)] = (qh * jnp.float32(q_scale)).reshape(
                1, bp, hd)
        for hh in range(hkv):
            kh = qkv_buf[:, pl.ds(ho + hh * hd, hd)]
            kh = kh * cosb + _rot_half(kh) * sinb
            knew_ref[pl.ds(hh, 1)] = kh.reshape(1, bp, hd)
            knew2_ref[:, pl.ds(hh * hd, hd)] = kh
            vh = qkv_buf[:, pl.ds(ho + kvh + hh * hd, hd)]
            vnew_ref[pl.ds(hh, 1)] = vh.reshape(1, bp, hd)
            vnew2_ref[:, pl.ds(hh * hd, hd)] = vh

        slab_attention(
            pk_ref, pv_ref, gk_ref, gv_ref, meta.ppp, meta.ppg,
            alen_of=lambda b: jnp.where(b < true_batch * chain,
                                        plens_s[b], 0),
            blen_of=lambda b: jnp.where(b < true_batch * chain,
                                        glens_s[b], 0),
            with_current=True,
            scale_srcs=(pks_ref, pvs_ref, gks_ref, gvs_ref),
            scale_bufs=(scale_scratch[0], scale_scratch[1],
                        scale_scratch[2], scale_scratch[3])
            if kv_quant else None,
            ssem0=0)

        heads_to_rows(ah_buf, heads, attn_buf)
        a8, sa = _quant_rows(attn_buf[...])
        kstream(ow_ref, os_row, os_ref, a8, sa, _qsum(a8), ho, meta.o_tiled)
        return h32 + _rms(acc_buf[:, pl.ds(0, d)], n1, eps)

    # ======================= phase 2: cross attention ====================
    def phase_cross(h32):
        hn = _rms(h32, n2, eps)
        x8, sx = _quant_rows(hn)
        nstream(cqw_ref, cqs_row, x8, sx, _qsum(x8), qkv_buf,
                meta.cqn // WTILE, awbuf, asem)
        qcosb = qcos_ref[...]
        qsinb = qsin_ref[...]
        for hh in range(heads):
            qh = qkv_buf[:, pl.ds(hh * hd, hd)]
            qh = qh * qcosb + _rot_half(qh) * qsinb
            qh_buf[pl.ds(hh, 1)] = (qh * jnp.float32(q_scale)).reshape(
                1, bp, hd)

        slab_attention(
            xk_ref, xv_ref, xk_ref, xv_ref, meta.ppx, 1,
            alen_of=lambda b: jnp.where(b < true_batch * chain,
                                        jnp.maximum(elens_s[b], 1), 0),
            blen_of=lambda b: jnp.int32(0),
            with_current=False,
            scale_srcs=(xks_ref, xvs_ref, xks_ref, xvs_ref),
            scale_bufs=(scale_scratch[4], scale_scratch[5],
                        scale_scratch[4], scale_scratch[5])
            if kv_quant else None,
            ssem0=4)

        heads_to_rows(ah_buf, heads, attn_buf)
        a8, sa = _quant_rows(attn_buf[...])
        kstream(cow_ref, cos_row, cos_s_ref, a8, sa, _qsum(a8), ho,
                meta.o_tiled)
        return h32 + _rms(acc_buf[:, pl.ds(0, d)], n3, eps)

    # ======================= phase 3: GeGLU MLP ==========================
    if layer_from_grid:
        # h carries layer -> layer in the REVISITED hout block (constant
        # index map => the block stays in VMEM across sequential grid
        # steps and flushes once at the end); step 0 seeds it from the
        # true input
        @pl.when(li == 0)
        def _seed_h():
            hout_ref[...] = h_ref[...]

        h32 = hout_ref[...].astype(jnp.float32)
    else:
        h32 = h_ref[...].astype(jnp.float32)
    if "self" in phases:
        h32 = phase_self(h32)
    else:
        knew_ref[...] = jnp.zeros_like(knew_ref[...])
        vnew_ref[...] = jnp.zeros_like(vnew_ref[...])
        knew2_ref[...] = jnp.zeros_like(knew2_ref[...])
        vnew2_ref[...] = jnp.zeros_like(vnew2_ref[...])
    if "cross" in phases:
        h32 = phase_cross(h32)
    if "mlp" not in phases:
        hout_ref[...] = h32.astype(hout_ref.dtype)
        return
    hn = _rms(h32, n4, eps)
    x8, sx = _quant_rows(hn)
    f = meta.f
    aligned = f % WTILE == 0        # serving dims; tiny test dims are < WTILE
    ftile = WTILE if aligned else f
    n_ff = f // ftile
    f_tiles = f // WTILE if aligned else 1

    # gate_up is "tiled_n" flattened [L*NGU, K, T]; NGU = 2*f_tiles when
    # aligned (gate tiles then up tiles), else 1 padded tile holding both
    n_gu = 2 * f_tiles if aligned else 1
    gu_base = li * n_gu
    dn_base = li * n_ff              # tiled_k flattened [L*KT, T, DP]
    cg = chunk if aligned else 1          # gate/up tiles per DMA
    cd = chunk if meta.dn_tiled else 1    # down K-tiles per DMA
    ngu_ch = -(-n_ff // cg)
    ndn_ch = -(-n_ff // cd)

    def gu_size(c):
        return min(cg, n_ff - cg * c)

    def dn_size(c):
        return min(cd, n_ff - cd * c)

    def gu_copies(c, slot):
        if aligned:
            # gate chunk [cg*c, ...) and the matching up chunk (offset
            # f_tiles) of the tiled_n layout, one DMA each
            return (
                pltpu.make_async_copy(
                    guw_ref.at[pl.ds(gu_base + cg * c, gu_size(c))],
                    awbuf.at[slot, pl.ds(0, gu_size(c))], asem.at[slot]),
                pltpu.make_async_copy(
                    guw_ref.at[pl.ds(gu_base + f_tiles + cg * c, gu_size(c))],
                    bwbuf.at[slot, pl.ds(0, gu_size(c))], bsem.at[slot]),
            )
        # tiny dims: gate AND up live inside the single padded tile
        return (pltpu.make_async_copy(guw_ref.at[gu_base], awbuf.at[slot, 0],
                                      asem.at[slot]),)

    def dn_copy(c, slot):
        if w4:
            # l4k flattened [L*KT, TK, DP/2]; explicit sublane slice of the
            # dst so tiny (interpret) TK < kwbuf rows also lines up
            return pltpu.make_async_copy(
                dnw_ref.at[pl.ds(dn_base + cd * c, dn_size(c))],
                kwbuf.at[slot, pl.ds(0, dn_size(c)), pl.ds(0, ftile), :],
                ksem2.at[slot])
        if meta.dn_tiled:
            return pltpu.make_async_copy(
                dnw_ref.at[pl.ds(dn_base + cd * c, dn_size(c))],
                kwbuf.at[slot, pl.ds(0, dn_size(c))], ksem2.at[slot])
        return pltpu.make_async_copy(
            dnw_ref.at[li, pl.ds(c * ftile, ftile), :],
            kwbuf.at[slot, 0, pl.ds(0, ftile), :], ksem2.at[slot])

    for cp in gu_copies(0, 0):
        cp.start()
    dn_copy(0, 0).start()

    # stage the gate/up scale row in VMEM: the per-tile slices below must
    # be REF reads — lane-offset VALUE slices cannot broadcast (Mosaic
    # "Invalid input layout", same class as nstream's deferred scale)
    gs_buf[...] = gus_row

    xsum_mlp = _qsum(x8)
    dph = meta.dp // 2

    def _lanes4_halves(pk_blk, xq, xq_sum):
        """Two int8 dots on a lanes4-packed block -> (lo, hi) raw f32
        contributions (pre-scale): lo = x.q_lo, hi = x.q_hi (exact)."""
        ul = jnp.bitwise_and(pk_blk, jnp.int8(15))
        dp_ = jax.lax.dot_general(xq, pk_blk, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        dul = jax.lax.dot_general(xq, ul, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return (dul.astype(jnp.float32) - 8.0 * xq_sum,
                (dp_ - dul).astype(jnp.float32) * 0.0625)

    acc = jnp.zeros((x8.shape[0], meta.dp), jnp.float32)
    if w4:
        acc_lo = jnp.zeros((x8.shape[0], dph), jnp.float32)
        acc_hi = jnp.zeros((x8.shape[0], dph), jnp.float32)
    for j in range(n_ff):                  # python-unrolled (static tiles)
        cgu, ggu = divmod(j, cg)
        cdn, gdn = divmod(j, cd)
        sgu = cgu % 2
        sdn = cdn % 2
        if ggu == 0:
            if cgu + 1 < ngu_ch:
                for cp in gu_copies(cgu + 1, (cgu + 1) % 2):
                    cp.start()
            for cp in gu_copies(cgu, sgu):
                cp.wait()
        if gdn == 0:
            if cdn + 1 < ndn_ch:
                dn_copy(cdn + 1, (cdn + 1) % 2).start()
            dn_copy(cdn, sdn).wait()
        sg = gs_buf[:, j * ftile:(j + 1) * ftile]
        su = gs_buf[:, f + j * ftile:f + (j + 1) * ftile]
        if w4:
            if aligned:
                # packed tiles [D, T/2]: lo/hi land in the tile's halves
                glo, ghi = _lanes4_halves(awbuf[sgu, ggu], x8, xsum_mlp)
                ulo, uhi = _lanes4_halves(bwbuf[sgu, ggu], x8, xsum_mlp)
                gi32 = jnp.concatenate([glo, ghi], axis=1)  # [BP, ftile]
                ui32 = jnp.concatenate([ulo, uhi], axis=1)
            else:
                # tiny (interpret-only): gate+up share one padded tile;
                # recovered channels 0..T cover gate 0..f, up f..2f
                flo, fhi = _lanes4_halves(awbuf[sgu, 0], x8, xsum_mlp)
                full = jnp.concatenate([flo, fhi], axis=1)
                gi32 = full[:, :f]
                ui32 = full[:, f:2 * f]
            gf = gi32 * sx * sg
            uf = ui32 * sx * su
        else:
            if aligned:
                gblk = awbuf[sgu, ggu]
                ublk = bwbuf[sgu, ggu]
            else:
                gblk = awbuf[sgu, 0, :, :f]
                ublk = awbuf[sgu, 0, :, f:2 * f]
            gi = jax.lax.dot_general(
                x8, gblk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            ui = jax.lax.dot_general(
                x8, ublk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            gf = gi.astype(jnp.float32) * sx * sg
            uf = ui.astype(jnp.float32) * sx * su
        t = jax.nn.gelu(gf, approximate=True) * uf        # [BP, ftile] f32
        t8, st = _quant_rows(t)                            # per-tile scales
        if w4:
            # down is l4k (global channel pairing): per-tile act scales
            # multiply each half's raw contribution before accumulation
            dlo, dhi = _lanes4_halves(
                kwbuf[sdn, gdn, pl.ds(0, ftile), :], t8, _qsum(t8))
            acc_lo = acc_lo + dlo * st
            acc_hi = acc_hi + dhi * st
        else:
            di = jax.lax.dot_general(
                t8, kwbuf[sdn, gdn, pl.ds(0, ftile), :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc = acc + di.astype(jnp.float32) * st
    if w4:
        # assemble halves through acc_buf so the n5 rms reads offset-0
        acc_buf[:, pl.ds(0, dph)] = acc_lo * dns_ref[:, pl.ds(0, dph)]
        acc_buf[:, pl.ds(dph, dph)] = acc_hi * dns_ref[:, pl.ds(dph, dph)]
        h32 = h32 + _rms(acc_buf[:, pl.ds(0, d)], n5, eps)
    else:
        mlp_out = acc * dns_row
        h32 = h32 + _rms(mlp_out[:, :d], n5, eps)
    hout_ref[...] = h32.astype(hout_ref.dtype)


def uses_w4(params_layers: Dict[str, Any]) -> bool:
    """Whether the decoder carries lanes4 int4 megakernel weights."""
    from .quant import Lanes4Weight

    sa = params_layers.get("self_attn", {})
    return isinstance(sa.get("qkv"), Lanes4Weight)


def supports(params_layers: Dict[str, Any], dims, cache) -> bool:
    """Whether the megakernel path applies: fused W8A8 int8 (or lanes4
    int4, the batch-1 latency mode) weights and a dense-slab windowed
    cache in bf16 OR int8 (+ per-token scale planes; fp8 keeps the
    two-kernel path)."""
    from .quant import Lanes4Weight, QuantWeight

    sa = params_layers.get("self_attn", {})
    ca = params_layers.get("cross_attn", {})
    mlp_p = params_layers.get("mlp", {})
    needed = [sa.get("qkv"), sa.get("o"), ca.get("q"), ca.get("o"),
              mlp_p.get("gate_up"), mlp_p.get("down")]
    w4 = all(isinstance(w, Lanes4Weight) for w in needed)
    if not w4 and not all(isinstance(w, QuantWeight) and w.act_bits == 8
                          for w in needed):
        return False
    if not (cache.gen_k.dtype == jnp.bfloat16
            or (cache.gen_k.dtype == jnp.int8
                and cache.gen_k_scale is not None)):
        return False
    if cache.gen_k.dtype == jnp.int8 and jax.default_backend() == "tpu":
        # int8-KV staged scale slabs: small batches FAULT the TPU worker
        # (kernel crash measured at batch 1 — the [Hkv, B*pages, TBLOCK]
        # scale scratch / its DMA slices land on sub-8 sublane extents;
        # batch 8 and 64 measure clean). Gate to batch % 8 == 0 and let
        # smaller batches take the two-kernel int8 path (fused_mode 2).
        batch = cache.gen_k.shape[1] // dims.num_layers
        if batch % 8 != 0:
            return False
    ho = dims.num_heads * dims.head_dim
    f = dims.intermediate_size
    if w4:
        n_ok = all(w.layout == "l4n"
                   for w in (sa["qkv"], ca["q"], mlp_p["gate_up"]))
        k_ok = all(w.layout == "l4k"
                   for w in (sa["o"], ca["o"], mlp_p["down"]))
        if not (n_ok and k_ok):
            return False
        if jax.default_backend() != "tpu":
            # tiny interpret dims: gate+up must share one padded tile
            return f % WTILE == 0 or 2 * f <= WTILE
        return (dims.hidden_size % 128 == 0 and dims.head_dim % 128 == 0
                and ho % WTILE == 0 and f % WTILE == 0)
    n_ok = all(w.layout == "tiled_n"
               for w in (sa["qkv"], ca["q"], mlp_p["gate_up"]))
    if jax.default_backend() != "tpu":
        # interpreter path (tests): tile math needs f either a WTILE
        # multiple or a single whole-K tile (quantize pads N, not K);
        # the kn fallbacks for o/co/down run only under interpret
        return n_ok and (f % WTILE == 0 or f < WTILE)
    k_ok = all(w.layout == "tiled_k"
               for w in (sa["o"], ca["o"], mlp_p["down"]))
    return (n_ok and k_ok
            and dims.hidden_size % 128 == 0 and dims.head_dim % 128 == 0
            and ho % WTILE == 0 and f % WTILE == 0)


@functools.partial(
    jax.jit,
    static_argnames=("dims_key", "true_batch", "eps", "soft_cap", "q_scale",
                     "interpret", "phases", "w4", "stacked", "chain"),
)
def _call(h, cos, sin, qcos, qsin, norms, scales, weights, slabs,
          li, plens, glens, elens, kv_scales=None, *, dims_key, true_batch,
          eps, soft_cap, q_scale, interpret,
          phases=("self", "cross", "mlp"), w4=False, stacked=False,
          chain=1):
    (bp, d, heads, hkv, hd) = dims_key
    qkvw, ow, cqw, cow, guw, dnw = weights
    pk, pv, gk, gv, xk, xv = slabs
    kv_quant = kv_scales is not None
    if w4:
        # lanes4: "l4n" [L, NT, K, T/2] (nibbles pack channel pairs),
        # "l4k" [L, KT, TK, DP/2]; padded widths are twice the byte widths
        nqkv = qkvw.shape[1] * qkvw.shape[-1] * 2
        cqn = cqw.shape[1] * cqw.shape[-1] * 2
        ho = heads * hd
        o_tiled = dn_tiled = True
        dp = ow.shape[-1] * 2
        f = dnw.shape[1] * dnw.shape[2]
    else:
        # "tiled_n" values are [L, NT, K, T]; padded width = NT * T
        nqkv = qkvw.shape[1] * qkvw.shape[-1]
        cqn = cqw.shape[1] * cqw.shape[-1]
        ho = heads * hd
        o_tiled = ow.ndim == 4
        dn_tiled = dnw.ndim == 4
        dp = ow.shape[-1]
        f = (dnw.shape[1] * dnw.shape[2]) if dn_tiled else dnw.shape[-2]
    t_p, t_g, t_x = pk.shape[2], gk.shape[2], xk.shape[2]
    meta = _Meta(nqkv=nqkv, cqn=cqn, ho=ho, dp=dp, f=f,
                 ppp=t_p // TBLOCK, ppg=t_g // TBLOCK, ppx=t_x // TBLOCK,
                 o_tiled=o_tiled, dn_tiled=dn_tiled)

    # flatten tile-major weights so every in-kernel DMA uses ONE dynamic
    # leading index ([L, NT, K, T] -> [L*NT, K, T], [L, KT, T, DP] ->
    # [L*KT, T, DP]): the [li, j] double-index forced per-start descriptor
    # recomputation (leading-dim merge is a free bitcast for the
    # contiguous layout)
    def flat(w):
        return w.reshape((-1,) + w.shape[2:]) if w.ndim == 4 else w

    qkvw, ow, cqw, cow, guw, dnw = (
        flat(w) for w in (qkvw, ow, cqw, cow, guw, dnw))
    # pages views: [Hkv, L*B, T, hd] -> [Hkv, NP, TBLOCK, hd] (free)
    def pview(buf):
        hkv_, lb, t, hd_ = buf.shape
        return buf.reshape(hkv_, lb * (t // TBLOCK), TBLOCK, hd_)

    pk, pv, gk, gv, xk, xv = (pview(x) for x in (pk, pv, gk, gv, xk, xv))

    if kv_quant:
        # scale pages views [Hkv, L*B, T] -> [Hkv, NP, TBLOCK] (free)
        def sview(buf):
            hkv_, lb, t = buf.shape
            return buf.reshape(hkv_, lb * (t // TBLOCK), TBLOCK)

        pks, pvs, gks, gvs, xks, xvs = (
            sview(s.astype(jnp.float32)) for s in kv_scales)
    else:
        dummy = jnp.zeros((1, 1, 1), jnp.float32)
        pks = pvs = gks = gvs = xks = xvs = dummy

    kernel = functools.partial(
        _kernel, meta=meta, true_batch=true_batch, hidden=d, heads=heads,
        kv_heads=hkv, head_dim=hd, eps=eps, soft_cap=soft_cap,
        q_scale=q_scale, kv_quant=kv_quant, phases=phases, w4=w4,
        layer_from_grid=stacked, chain=chain)

    n_layers = norms[0].shape[0]   # [L, d] tables (weights are flattened
                                   # tile-major by now, so their dim 0 is
                                   # L * tiles, not L)

    def full(*shape):
        return pl.BlockSpec(shape, lambda i, *_: (0,) * len(shape))

    any_spec = pl.BlockSpec(memory_space=pl.ANY)

    if stacked:
        # ONE pallas_call runs all layers as a sequential grid: the
        # per-layer norm/scale rows stay as full tables and the pipeline
        # fetches row l at grid step l; the per-layer k/v outputs get a
        # squeezed leading L block. The h carry lives in the revisited
        # hout block (constant index map). Tables reshape to [L, 1, n]
        # with a squeezed (None, 1, n) block because Mosaic requires the
        # last two BLOCK dims to equal the array dims (a (1, n) block
        # over [L, n] is rejected); the kernel still sees [1, n] refs.
        def per_l(n):
            return pl.BlockSpec((None, 1, n), lambda l, *_: (l, 0, 0))

        norms = tuple(t.reshape(t.shape[0], 1, t.shape[-1]) for t in norms)
        scales = tuple(t.reshape(t.shape[0], 1, t.shape[-1])
                       for t in scales)
        norm_specs = [per_l(d) for _ in range(6)]
        scale_specs = [per_l(t.shape[-1]) for t in scales]
        out_specs = [
            full(bp, d),
            pl.BlockSpec((None, hkv, bp, hd), lambda l, *_: (l, 0, 0, 0)),
            pl.BlockSpec((None, hkv, bp, hd), lambda l, *_: (l, 0, 0, 0)),
            pl.BlockSpec((None, bp, hkv * hd), lambda l, *_: (l, 0, 0)),
            pl.BlockSpec((None, bp, hkv * hd), lambda l, *_: (l, 0, 0)),
        ]
        grid = (n_layers,)
    else:
        # slice this layer's norm/scale rows in XLA (cheap fused gathers);
        # the kernel then reads [1, n] blocks statically
        li32 = li.astype(jnp.int32)
        norms = tuple(jax.lax.dynamic_slice_in_dim(t, li32, 1, 0)
                      for t in norms)
        scales = tuple(jax.lax.dynamic_slice_in_dim(t, li32, 1, 0)
                       for t in scales)
        norm_specs = [full(1, d) for _ in range(6)]
        # scale widths come from the scale tables themselves (the
        # tiled weight shapes no longer carry the padded width)
        scale_specs = [full(1, t.shape[-1]) for t in scales]
        out_specs = [
            full(bp, d),
            full(hkv, bp, hd), full(hkv, bp, hd),
            full(bp, hkv * hd), full(bp, hkv * hd),
        ]
        grid = (1,)
    n0, n1, n2, n3, n4, n5 = norms
    qkvs, os_, cqs, cos_s, gus, dns = scales
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=grid,
        in_specs=[
            full(bp, d),
            full(bp, hd), full(bp, hd),
            full(bp, hd), full(bp, hd),
            *norm_specs,
            *scale_specs,
            *[any_spec] * 18,
        ],
        out_specs=out_specs,
        scratch_shapes=(
            # w4 halves the per-tile bytes but DOUBLES tiles-per-DMA (the
            # kernel's `chunk`), so buffer bytes match the int8 variant
            pltpu.VMEM((2, 2 * CHUNK if w4 else CHUNK, d,
                        WTILE // 2 if w4 else WTILE), jnp.int8),
            pltpu.VMEM((2, 2 * CHUNK if w4 else CHUNK, d,
                        WTILE // 2 if w4 else WTILE), jnp.int8),
            pltpu.VMEM(
                (2, 2 * CHUNK if w4 else CHUNK,
                 max(WTILE if ho % WTILE == 0 else ho,
                     WTILE if f % WTILE == 0 else f) if w4 else WTILE,
                 dp // 2 if w4 else dp),
                jnp.int8),
            pltpu.VMEM((bp, nqkv), jnp.float32),
            pltpu.VMEM((bp, ho), jnp.float32),
            pltpu.VMEM((bp, dp), jnp.float32),
            pltpu.VMEM((heads, bp, hd), jnp.float32),
            pltpu.VMEM((heads, bp, hd), jnp.float32),
            pltpu.VMEM((2, hkv, TBLOCK, hd), pk.dtype),
            pltpu.VMEM((2, hkv, TBLOCK, hd), pv.dtype),
            pltpu.VMEM((bp, ho), jnp.int8),
            pltpu.VMEM((1, gus.shape[-1]), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            *((
                # staged per-token scale slabs for this layer (~1.3 MB at
                # serving dims) + their DMA semaphores
                pltpu.VMEM((hkv, true_batch * meta.ppp, TBLOCK),
                           jnp.float32),
                pltpu.VMEM((hkv, true_batch * meta.ppp, TBLOCK),
                           jnp.float32),
                pltpu.VMEM((hkv, true_batch * meta.ppg, TBLOCK),
                           jnp.float32),
                pltpu.VMEM((hkv, true_batch * meta.ppg, TBLOCK),
                           jnp.float32),
                pltpu.VMEM((hkv, true_batch * meta.ppx, TBLOCK),
                           jnp.float32),
                pltpu.VMEM((hkv, true_batch * meta.ppx, TBLOCK),
                           jnp.float32),
                pltpu.SemaphoreType.DMA((6,)),
            ) if kv_quant else ()),
        ),
    )

    if stacked:
        out_shape = [
            jax.ShapeDtypeStruct((bp, d), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, hkv, bp, hd), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, hkv, bp, hd), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, bp, hkv * hd), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, bp, hkv * hd), jnp.float32),
        ]
    else:
        out_shape = [
            jax.ShapeDtypeStruct((bp, d), jnp.float32),
            jax.ShapeDtypeStruct((hkv, bp, hd), jnp.float32),
            jax.ShapeDtypeStruct((hkv, bp, hd), jnp.float32),
            jax.ShapeDtypeStruct((bp, hkv * hd), jnp.float32),
            jax.ShapeDtypeStruct((bp, hkv * hd), jnp.float32),
        ]
    hout, _, _, knew2, vnew2 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # chunked double-buffered weight streams put ~18 MB of scratch
            # in VMEM (awbuf/bwbuf/kwbuf at CHUNK=2); raise the scoped
            # limit past the 16 MB default
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        li.astype(jnp.int32).reshape(1),
        plens.astype(jnp.int32),
        glens.astype(jnp.int32),
        elens.astype(jnp.int32),
        h.astype(jnp.float32),
        cos.astype(jnp.float32), sin.astype(jnp.float32),
        qcos.astype(jnp.float32), qsin.astype(jnp.float32),
        n0, n1, n2, n3, n4, n5,
        qkvs, os_, cqs, cos_s, gus, dns,
        qkvw, ow, cqw, cow, guw, dnw,
        pk, pv, gk, gv, xk, xv,
        pks, pvs, gks, gvs, xks, xvs,
    )
    return hout, knew2, vnew2


def _pad_rows(x, bp):
    b = x.shape[0]
    if b == bp:
        return x
    return jnp.pad(x, [(0, bp - b)] + [(0, 0)] * (x.ndim - 1))


def decode_layer(params_layers, dims, *, h, cos, sin, qcos, qsin,
                 li, plens, glens, elens, prompt_k, prompt_v,
                 gen_k, gen_v, cross_k, cross_v,
                 kv_scales=None,
                 interpret: bool = False,
                 phases: tuple = ("self", "cross", "mlp"),
                 chain: int = 1):
    """Run decoder layer ``li`` through the megakernel.

    h: [B, D]; cos/sin/qcos/qsin: [B, hd]; slabs are the cache's raw
    [Hkv, L*B, T, hd] bf16 — or int8 with ``kv_scales`` = the cache's six
    per-token scale planes [Hkv, L*B, T] (prompt_k, prompt_v, gen_k,
    gen_v, cross_k, cross_v order) — buffers (models/t5gemma.py identity
    layout). Returns (h_out [B, D] f32, k_new/v_new [B, Hkv, hd] f32).

    ``chain`` > 1 (speculative verify pass): the leading axis of h/cos/...
    carries B_cache * chain pseudo-rows, chain-position-major within each
    cache row; each pseudo-row additionally attends causally to the fresh
    K/V of its own chain prefix (models/t5gemma.py paged_decode_multi)."""
    from .quant import Lanes4Weight

    sa = params_layers["self_attn"]
    ca = params_layers["cross_attn"]
    mlp_p = params_layers["mlp"]

    norms = tuple(params_layers[n].astype(jnp.float32) for n in (
        "pre_self_attn_norm", "post_self_attn_norm",
        "pre_cross_attn_norm", "post_cross_attn_norm",
        "pre_ff_norm", "post_ff_norm"))
    wleaves = (sa["qkv"], sa["o"], ca["q"], ca["o"], mlp_p["gate_up"],
               mlp_p["down"])
    w4 = isinstance(sa["qkv"], Lanes4Weight)
    scales = tuple(w.scale.astype(jnp.float32) for w in wleaves)
    weights = tuple(w.packed if w4 else w.values for w in wleaves)
    slabs = (prompt_k, prompt_v, gen_k, gen_v, cross_k, cross_v)

    b = h.shape[0]
    # int8 MXU operands want a 32-row sublane tile; pad the batch (padded
    # rows are masked out of the attention walks and sliced off the output)
    bp = b if b % 32 == 0 else -(-b // 32) * 32
    if jax.default_backend() != "tpu":
        bp = b
    dims_key = (bp, dims.hidden_size, dims.num_heads, dims.num_kv_heads,
                dims.head_dim)
    hout, knew2, vnew2 = _call(
        _pad_rows(h, bp), _pad_rows(cos, bp), _pad_rows(sin, bp),
        _pad_rows(qcos, bp), _pad_rows(qsin, bp),
        norms, scales, weights, slabs,
        jnp.asarray(li), _pad_rows(plens, bp), _pad_rows(glens, bp),
        _pad_rows(elens, bp), kv_scales,
        dims_key=dims_key, true_batch=b // chain, eps=dims.rms_norm_eps,
        soft_cap=dims.attn_logit_softcap,
        q_scale=float(dims.q_scale), interpret=interpret, phases=phases,
        w4=w4, chain=chain)
    # row-major [BP, Hkv*hd] -> engine layout [B, Hkv, hd]: free reshape
    # (the head-major kernel outputs exist only for the in-kernel
    # current-token read; a transpose here cost ~52 XLA launches/step)
    hkv, hd = dims.num_kv_heads, dims.head_dim
    return (hout[:b], knew2[:b].reshape(b, hkv, hd),
            vnew2[:b].reshape(b, hkv, hd))


def decode_stack(params_layers, dims, *, h, cos, sin, qcos, qsin,
                 plens, glens, elens, prompt_k, prompt_v,
                 gen_k, gen_v, cross_k, cross_v,
                 kv_scales=None,
                 interpret: bool = False,
                 phases: tuple = ("self", "cross", "mlp"),
                 chain: int = 1):
    """Run ALL decoder layers through ONE megakernel launch (round 4).

    Same math as scanning :func:`decode_layer` over layers, but the layer
    loop is the pallas grid: grid step l IS layer l, the hidden state
    carries across steps in the revisited hout VMEM block, and the
    per-layer norm/scale rows stream in as pipelined [1, n] blocks. This
    removes 25 of the 26 kernel launches per decode step (the batch-1
    step is launch- and MXU-occupancy-sensitive — DESIGN "Batch-1 floor
    analysis"). Opt in per call; `T5G_MK_STACKED=1` flips the engine's
    paged decode step (models/t5gemma.py).

    Returns (h_out [B, D] f32, k_new [L, B, Hkv, hd] f32,
    v_new [L, B, Hkv, hd] f32) — the same stacked shapes the
    decode_layer scan produces.
    """
    from .quant import Lanes4Weight

    sa = params_layers["self_attn"]
    ca = params_layers["cross_attn"]
    mlp_p = params_layers["mlp"]

    norms = tuple(params_layers[n].astype(jnp.float32) for n in (
        "pre_self_attn_norm", "post_self_attn_norm",
        "pre_cross_attn_norm", "post_cross_attn_norm",
        "pre_ff_norm", "post_ff_norm"))
    wleaves = (sa["qkv"], sa["o"], ca["q"], ca["o"], mlp_p["gate_up"],
               mlp_p["down"])
    w4 = isinstance(sa["qkv"], Lanes4Weight)
    scales = tuple(w.scale.astype(jnp.float32) for w in wleaves)
    weights = tuple(w.packed if w4 else w.values for w in wleaves)
    slabs = (prompt_k, prompt_v, gen_k, gen_v, cross_k, cross_v)

    b = h.shape[0]
    bp = b if b % 32 == 0 else -(-b // 32) * 32
    if jax.default_backend() != "tpu":
        bp = b
    dims_key = (bp, dims.hidden_size, dims.num_heads, dims.num_kv_heads,
                dims.head_dim)
    hout, knew2, vnew2 = _call(
        _pad_rows(h, bp), _pad_rows(cos, bp), _pad_rows(sin, bp),
        _pad_rows(qcos, bp), _pad_rows(qsin, bp),
        norms, scales, weights, slabs,
        jnp.asarray(0), _pad_rows(plens, bp), _pad_rows(glens, bp),
        _pad_rows(elens, bp), kv_scales,
        dims_key=dims_key, true_batch=b // chain, eps=dims.rms_norm_eps,
        soft_cap=dims.attn_logit_softcap,
        q_scale=float(dims.q_scale), interpret=interpret, phases=phases,
        w4=w4, stacked=True, chain=chain)
    hkv, hd = dims.num_kv_heads, dims.head_dim
    n_layers = norms[0].shape[0]
    return (hout[:b],
            knew2[:, :b].reshape(n_layers, b, hkv, hd),
            vnew2[:, :b].reshape(n_layers, b, hkv, hd))
