"""Functional JAX T5Gemma encoder-decoder with PM-RoPE cross-attention.

This is a from-scratch TPU-native implementation of the architecture the
reference builds from HF transformers (reference: models/t5gemma.py loads
``google/t5gemma-2b-2b-ul2`` and monkey-patches decoder layers with PM-RoPE
cross-attention at models/t5gemma.py:57-243, 513-541). Here PM-RoPE is a
first-class argument, there is no patching, and the whole stack is a pure
function over explicit parameter pytrees:

- layers are *stacked* (leading axis = layer) and driven by ``lax.scan`` so
  the 26-layer 2B stacks trace/compile once, not 26 times;
- GQA attention groups queries as [B, Hkv, G, T, hd] and never materializes
  repeated K/V (saves HBM bandwidth vs torch's ``repeat_kv``);
- attention-logit softcapping (tanh), query_pre_attn_scalar scaling, RMSNorm
  with (1 + w) in fp32, sqrt(hidden) embedding normalizer — all matching the
  HF T5Gemma numerics bit-for-bit in fp32 (see tests/test_t5gemma_parity.py);
- a decode path with a pre-allocated per-layer KV cache written via
  per-row dynamic indices, used by the jitted AR decode engine.

Parameter layout (all kernels [in, out]):
  encoder:  {embed[V,D], layers{...stacked...}, final_norm[D]}
  decoder:  same + cross-attention params, no embed (the voice model feeds
            audio embeddings; reference prunes decoder.embed_tokens at
            models/t5gemma.py:309-317).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import os

import jax
import jax.numpy as jnp

from ..config import ModuleDims
from ..ops import rope as rope_ops
from ..ops.quant import q_matmul as _mm

PyTree = Any


# ---------------------------------------------------------------------------
# primitive blocks
# ---------------------------------------------------------------------------


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    """T5Gemma RMSNorm: fp32 compute, (1 + w) scale, cast back (HF parity)."""
    xf = x.astype(jnp.float32)
    normed = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    out = normed * (1.0 + weight.astype(jnp.float32))
    return out.astype(x.dtype)


def gelu_tanh(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=True)


def mlp(p: Dict[str, jnp.ndarray], x: jnp.ndarray) -> jnp.ndarray:
    """GeGLU: act(x @ gate) * (x @ up) @ down. Decode-fused params carry one
    concatenated gate_up kernel (see fuse_for_decode) to halve the matmul
    dispatch count on the weight-streaming-bound decode path."""
    if "gate_up" in p:
        gu = _mm(x, p["gate_up"])
        g, u = jnp.split(gu, 2, axis=-1)
        h = gelu_tanh(g) * u
    else:
        h = gelu_tanh(_mm(x, p["gate"])) * _mm(x, p["up"])
    return _mm(h, p["down"])


def _split_heads(x: jnp.ndarray, n_heads: int, head_dim: int) -> jnp.ndarray:
    b, t, _ = x.shape
    return x.reshape(b, t, n_heads, head_dim).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, t, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * d)


def gqa_attention(
    q: jnp.ndarray,  # [B, H, Tq, hd]
    k: jnp.ndarray,  # [B, Hkv, Tk, hd]
    v: jnp.ndarray,  # [B, Hkv, Tk, hd]
    bias: jnp.ndarray,  # [B, 1, Tq, Tk] additive
    scale: float,
    softcap: Optional[float],
) -> jnp.ndarray:
    """Grouped-query attention with fp32 softmax; returns [B, H, Tq, hd]."""
    b, h, tq, hd = q.shape
    hkv = k.shape[1]
    g = h // hkv
    qg = q.reshape(b, hkv, g, tq, hd)
    logits = jnp.einsum(
        "bkgth,bksh->bkgts", qg, k, preferred_element_type=jnp.float32
    ) * scale
    if softcap is not None:
        logits = jnp.tanh(logits / softcap) * softcap
    logits = logits + bias[:, :, None].astype(jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bkgts,bksh->bkgth", weights, v)
    return out.reshape(b, h, tq, hd)


class AttnParams(NamedTuple):
    q: jnp.ndarray
    k: jnp.ndarray
    v: jnp.ndarray
    o: jnp.ndarray


def _qkv_proj(p: Dict[str, jnp.ndarray], x: jnp.ndarray, dims: ModuleDims):
    """q/k/v projections; one fused matmul when the params carry "qkv"."""
    if "qkv" in p:
        qh = dims.num_heads * dims.head_dim
        kh = dims.num_kv_heads * dims.head_dim
        qkv = _mm(x, p["qkv"])
        q = _split_heads(qkv[..., :qh], dims.num_heads, dims.head_dim)
        k = _split_heads(qkv[..., qh:qh + kh], dims.num_kv_heads, dims.head_dim)
        v = _split_heads(qkv[..., qh + kh:], dims.num_kv_heads, dims.head_dim)
    else:
        q = _split_heads(_mm(x, p["q"]), dims.num_heads, dims.head_dim)
        k = _split_heads(_mm(x, p["k"]), dims.num_kv_heads, dims.head_dim)
        v = _split_heads(_mm(x, p["v"]), dims.num_kv_heads, dims.head_dim)
    return q, k, v


def self_attention(
    p: Dict[str, jnp.ndarray],
    x: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    bias: jnp.ndarray,
    dims: ModuleDims,
    cache_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    cache_pos: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Optional[Tuple[jnp.ndarray, jnp.ndarray]]]:
    """Self-attention with RoPE. With ``cache_kv`` ([B,Hkv,Tmax,hd] pair) and
    per-row ``cache_pos`` [B], writes this call's K/V at each row's position
    and attends over the whole cache (decode step/prefill)."""
    q, k, v = _qkv_proj(p, x, dims)
    q = rope_ops.apply_rope(q, cos, sin)
    k = rope_ops.apply_rope(k, cos, sin)

    new_cache = None
    if cache_kv is not None:
        ck, cv = cache_kv
        if cache_pos is None:
            # prefill: write the first T slots for every row
            t = k.shape[2]
            ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, 0, 0, 0))
            cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, 0, 0, 0))
        else:
            # step: write this token at each row's own position
            def write(c, kv, pos):
                return jax.lax.dynamic_update_slice(c, kv.astype(c.dtype), (0, pos, 0))

            ck = jax.vmap(write)(ck, k, cache_pos)
            cv = jax.vmap(write)(cv, v, cache_pos)
        k, v = ck.astype(x.dtype), cv.astype(x.dtype)
        new_cache = (ck, cv)

    out = gqa_attention(q, k, v, bias, dims.q_scale, dims.attn_logit_softcap)
    return _mm(_merge_heads(out), p["o"]), new_cache


def cross_attention(
    p: Dict[str, jnp.ndarray],
    x: jnp.ndarray,
    kv_cache: Tuple[jnp.ndarray, jnp.ndarray],
    bias: jnp.ndarray,
    dims: ModuleDims,
    q_cos: Optional[jnp.ndarray] = None,
    q_sin: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """PM-RoPE cross-attention. K/V are precomputed once per utterance from
    encoder memory (reference: models/t5gemma.py:117-149 caches cross K/V);
    the decoder query gets rotary with *progress* positions when q_cos/q_sin
    are given (reference: models/t5gemma.py:109-115)."""
    q = _split_heads(_mm(x, p["q"]), dims.num_heads, dims.head_dim)
    if q_cos is not None:
        q = rope_ops.apply_rope(q, q_cos, q_sin)
    k, v = kv_cache
    out = gqa_attention(q, k.astype(x.dtype), v.astype(x.dtype), bias,
                        dims.q_scale, dims.attn_logit_softcap)
    return _mm(_merge_heads(out), p["o"])


def cross_kv(
    p: Dict[str, jnp.ndarray],
    memory: jnp.ndarray,
    dims: ModuleDims,
    k_cos: Optional[jnp.ndarray] = None,
    k_sin: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Project encoder memory to cross K/V; encoder keys get PM rotary
    (reference: models/t5gemma.py:124-135)."""
    k = _split_heads(_mm(memory, p["k"]), dims.num_kv_heads, dims.head_dim)
    v = _split_heads(_mm(memory, p["v"]), dims.num_kv_heads, dims.head_dim)
    if k_cos is not None:
        k = rope_ops.apply_rope(k, k_cos, k_sin)
    return k, v


# ---------------------------------------------------------------------------
# parameter init
# ---------------------------------------------------------------------------


def _linear_init(rng, shape, dtype, std=0.02):
    return (jax.random.normal(rng, shape, jnp.float32) * std).astype(dtype)


def init_stack(rng: jax.Array, dims: ModuleDims, *, is_decoder: bool,
               with_embed: bool, dtype=jnp.bfloat16,
               cross_hidden: Optional[int] = None) -> PyTree:
    """Random-init parameters for one stack, layer-stacked along axis 0."""
    d, f = dims.hidden_size, dims.intermediate_size
    qh = dims.num_heads * dims.head_dim
    kh = dims.num_kv_heads * dims.head_dim
    ch = cross_hidden or d
    n = dims.num_layers
    keys = iter(jax.random.split(rng, 32))

    def lin(shape):
        return _linear_init(next(keys), (n, *shape), dtype)

    layers: Dict[str, Any] = {
        "pre_self_attn_norm": jnp.zeros((n, d), dtype),
        "post_self_attn_norm": jnp.zeros((n, d), dtype),
        "pre_ff_norm": jnp.zeros((n, d), dtype),
        "post_ff_norm": jnp.zeros((n, d), dtype),
        "self_attn": {"q": lin((d, qh)), "k": lin((d, kh)),
                      "v": lin((d, kh)), "o": lin((qh, d))},
        "mlp": {"gate": lin((d, f)), "up": lin((d, f)), "down": lin((f, d))},
    }
    if is_decoder:
        layers["pre_cross_attn_norm"] = jnp.zeros((n, d), dtype)
        layers["post_cross_attn_norm"] = jnp.zeros((n, d), dtype)
        layers["cross_attn"] = {"q": lin((d, qh)), "k": lin((ch, kh)),
                                "v": lin((ch, kh)), "o": lin((qh, d))}
    params: Dict[str, Any] = {"layers": layers, "final_norm": jnp.zeros((d,), dtype)}
    if with_embed:
        params["embed"] = _linear_init(next(keys), (dims.vocab_size, d), dtype)
    return params


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def encoder_forward(
    params: PyTree,
    dims: ModuleDims,
    *,
    input_ids: Optional[jnp.ndarray] = None,
    inputs_embeds: Optional[jnp.ndarray] = None,
    full_bias: jnp.ndarray,
    sliding_bias: jnp.ndarray,
    position_ids: jnp.ndarray,  # float32 [B, T] (PM or integer grid)
    remat: bool = False,
) -> jnp.ndarray:
    """Bidirectional encoder; returns last hidden state [B, T, D].

    ``remat`` rematerializes each layer in the backward pass (the
    reference's --t5_gradient_checkpointing, config.py:84): activations are
    recomputed instead of stored, trading ~1/3 more FLOPs for O(1) layer
    activation memory."""
    if inputs_embeds is None:
        inputs_embeds = jnp.take(params["embed"], input_ids, axis=0)
    h = inputs_embeds * jnp.asarray(
        dims.hidden_size ** 0.5, dtype=inputs_embeds.dtype
    )
    cos, sin = rope_ops.rope_cos_sin(position_ids, dims.head_dim, dims.rope_theta)
    sliding_flags = jnp.asarray(dims.sliding_flags)

    def body(h, xs):
        lp, is_sliding = xs
        bias = jnp.where(is_sliding, sliding_bias, full_bias)
        r = h
        hn = rms_norm(h, lp["pre_self_attn_norm"], dims.rms_norm_eps)
        a, _ = self_attention(lp["self_attn"], hn, cos, sin, bias, dims)
        h = r + rms_norm(a, lp["post_self_attn_norm"], dims.rms_norm_eps)
        r = h
        hn = rms_norm(h, lp["pre_ff_norm"], dims.rms_norm_eps)
        h = r + rms_norm(mlp(lp["mlp"], hn), lp["post_ff_norm"], dims.rms_norm_eps)
        return h, None

    if remat:
        body = jax.checkpoint(body)
    h, _ = jax.lax.scan(body, h, (params["layers"], sliding_flags))
    return rms_norm(h, params["final_norm"], dims.rms_norm_eps)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class DecoderCache(NamedTuple):
    """Pre-allocated KV cache. self_* are [L, B, Hkv, Tmax, hd]; cross_* are
    [L, B, Hkv, Tenc, hd] computed once at prefill."""

    self_k: jnp.ndarray
    self_v: jnp.ndarray
    cross_k: jnp.ndarray
    cross_v: jnp.ndarray


def init_cache(dims: ModuleDims, batch: int, max_len: int, enc_len: int,
               dtype=jnp.bfloat16) -> DecoderCache:
    shape_self = (dims.num_layers, batch, dims.num_kv_heads, max_len, dims.head_dim)
    shape_cross = (dims.num_layers, batch, dims.num_kv_heads, enc_len, dims.head_dim)
    return DecoderCache(
        self_k=jnp.zeros(shape_self, dtype),
        self_v=jnp.zeros(shape_self, dtype),
        cross_k=jnp.zeros(shape_cross, dtype),
        cross_v=jnp.zeros(shape_cross, dtype),
    )


def build_cross_kv(
    params: PyTree,
    dims: ModuleDims,
    memory: jnp.ndarray,
    pm_encoder_positions: Optional[jnp.ndarray],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compute all layers' cross K/V from encoder memory (once per utterance)."""
    if pm_encoder_positions is not None:
        k_cos, k_sin = rope_ops.rope_cos_sin(
            pm_encoder_positions, dims.head_dim, dims.rope_theta
        )
    else:
        k_cos = k_sin = None

    def per_layer(cp):
        return cross_kv(cp, memory, dims, k_cos, k_sin)

    ks, vs = jax.lax.map(per_layer, params["layers"]["cross_attn"])
    return ks, vs  # [L, B, Hkv, Tenc, hd]


def decoder_forward(
    params: PyTree,
    dims: ModuleDims,
    *,
    inputs_embeds: jnp.ndarray,  # [B, T, D] (audio embeddings)
    self_full_bias: jnp.ndarray,  # [B, 1, T, Tk]
    self_sliding_bias: jnp.ndarray,
    cross_bias: jnp.ndarray,  # [B, 1, T, Tenc]
    position_ids: jnp.ndarray,  # float32 [B, T] — self-attn rope positions
    pm_decoder_positions: Optional[jnp.ndarray],  # float32 [B, T] or None
    cross_k: jnp.ndarray,  # [L, B, Hkv, Tenc, hd]
    cross_v: jnp.ndarray,
    cache: Optional[DecoderCache] = None,
    cache_pos: Optional[jnp.ndarray] = None,  # [B] write index (step mode)
    remat: bool = False,
) -> Tuple[jnp.ndarray, Optional[DecoderCache]]:
    """Decoder stack. Without ``cache``: plain full-sequence training forward.
    With ``cache``: prefill (cache_pos=None) or single-step (cache_pos=[B]).
    ``remat`` (training path only) rematerializes layers in backward."""
    h = inputs_embeds * jnp.asarray(
        dims.hidden_size ** 0.5, dtype=inputs_embeds.dtype
    )
    cos, sin = rope_ops.rope_cos_sin(position_ids, dims.head_dim, dims.rope_theta)
    if pm_decoder_positions is not None:
        q_cos, q_sin = rope_ops.rope_cos_sin(
            pm_decoder_positions, dims.head_dim, dims.rope_theta
        )
    else:
        q_cos = q_sin = None
    sliding_flags = jnp.asarray(dims.sliding_flags)

    use_cache = cache is not None

    def layer_tail(h, lp, xk, xv):
        r = h
        hn = rms_norm(h, lp["pre_cross_attn_norm"], dims.rms_norm_eps)
        a = cross_attention(lp["cross_attn"], hn, (xk, xv), cross_bias, dims,
                            q_cos, q_sin)
        h = r + rms_norm(a, lp["post_cross_attn_norm"], dims.rms_norm_eps)

        r = h
        hn = rms_norm(h, lp["pre_ff_norm"], dims.rms_norm_eps)
        h = r + rms_norm(mlp(lp["mlp"], hn), lp["post_ff_norm"], dims.rms_norm_eps)
        return h

    if not use_cache:
        def body(h, xs):
            lp, is_sliding, (xk, xv) = xs
            bias = jnp.where(is_sliding, self_sliding_bias, self_full_bias)
            r = h
            hn = rms_norm(h, lp["pre_self_attn_norm"], dims.rms_norm_eps)
            a, _ = self_attention(lp["self_attn"], hn, cos, sin, bias, dims)
            h = r + rms_norm(a, lp["post_self_attn_norm"], dims.rms_norm_eps)
            return layer_tail(h, lp, xk, xv), None

        if remat:
            body = jax.checkpoint(body)
        h, _ = jax.lax.scan(
            body, h, (params["layers"], sliding_flags, (cross_k, cross_v))
        )
        return rms_norm(h, params["final_norm"], dims.rms_norm_eps), None

    # cached path: the KV cache rides the scan CARRY and is updated in place
    # with per-layer dynamic slices — carrying it as scan xs/ys would copy
    # the whole cache through HBM every decode step (~2 GB/step at the
    # flagship shapes), which measurably caps decode throughput.
    layer_ids = jnp.arange(dims.num_layers)

    def body(carry, xs):
        h, k_all, v_all = carry
        lp, is_sliding, li, (xk, xv) = xs
        bias = jnp.where(is_sliding, self_sliding_bias, self_full_bias)

        r = h
        hn = rms_norm(h, lp["pre_self_attn_norm"], dims.rms_norm_eps)
        q, k, v = _qkv_proj(lp["self_attn"], hn, dims)
        q = rope_ops.apply_rope(q, cos, sin)
        k = rope_ops.apply_rope(k, cos, sin)

        ck = jax.lax.dynamic_index_in_dim(k_all, li, 0, keepdims=False)
        cv = jax.lax.dynamic_index_in_dim(v_all, li, 0, keepdims=False)
        if cache_pos is None:
            ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, 0, 0, 0))
            cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, 0, 0, 0))
        else:
            def write(c, kv, pos):
                return jax.lax.dynamic_update_slice(
                    c, kv.astype(c.dtype), (0, pos, 0)
                )

            ck = jax.vmap(write)(ck, k, cache_pos)
            cv = jax.vmap(write)(cv, v, cache_pos)
        k_all = jax.lax.dynamic_update_index_in_dim(k_all, ck, li, 0)
        v_all = jax.lax.dynamic_update_index_in_dim(v_all, cv, li, 0)

        # NOTE(perf): a flash-style chunk-skipping attention over the cache
        # (lax.cond skipping unwritten chunks) measured SLOWER than the dense
        # read at batch 64 / T=567 (26.4x vs 31.6x RTF): the per-chunk
        # control flow serializes the layer and defeats XLA's overlap. Dense
        # cache reads stay until a fused Pallas decode kernel exists.
        out = gqa_attention(q, ck.astype(h.dtype), cv.astype(h.dtype),
                            bias, dims.q_scale, dims.attn_logit_softcap)
        a = _mm(_merge_heads(out), lp["self_attn"]["o"])
        h = r + rms_norm(a, lp["post_self_attn_norm"], dims.rms_norm_eps)
        h = layer_tail(h, lp, xk, xv)
        return (h, k_all, v_all), None

    # NOTE: unroll>1 here measures ~60% SLOWER — it breaks the in-place
    # aliasing of the cache carry and reintroduces full-cache copies.
    (h, new_k, new_v), _ = jax.lax.scan(
        body, (h, cache.self_k, cache.self_v),
        (params["layers"], sliding_flags, layer_ids, (cross_k, cross_v)),
    )
    h = rms_norm(h, params["final_norm"], dims.rms_norm_eps)
    new_cache = DecoderCache(self_k=new_k, self_v=new_v,
                             cross_k=cross_k, cross_v=cross_v)
    return h, new_cache

# ---------------------------------------------------------------------------
# paged decode path (Pallas flash decode-attention, write-free ring buffers)
# ---------------------------------------------------------------------------


class PagedDecoderCache(NamedTuple):
    """Decode KV cache for the Pallas paged-attention step path.

    Three dense buffers, each folding all layers into one array so per-layer
    kernel reads never materialize slice copies (the kernels address pages
    through per-layer ``page_indices``):

      prompt_k/v: [Hkv, L*B, Wp, hd] — prompt region, written once at
                  prefill; row validity = per-row prompt length.
      gen_k/v:    [Hkv, L*B, Tg, hd] — generated tokens, STEP-indexed: every
                  row's step-s token lives at slot s regardless of its
                  absolute position. That makes the per-step write a single
                  contiguous dynamic_update_slice, which XLA updates in
                  place. (Scatter-style per-position writes measured a
                  defensive copy of the whole buffer EVERY step: 17 ms for a
                  3.4 MB write at batch 64 — see round-2 notes.)
      cross_k/v:  [Hkv, L*B, Tx, hd] — encoder cross K/V, written at prefill.

    ``pending_k/v`` [L, B, Hkv, hd] hold the newest token's K/V. They are
    flushed into gen_k/v at the START of the next step, when the flush is the
    buffer's first use in the program; the in-flight token itself enters
    attention through an exact flash merge (ops/paged_attn.py
    merge_attention_parts), so no step ever reads a buffer it also writes.
    """

    prompt_k: jnp.ndarray
    prompt_v: jnp.ndarray
    gen_k: jnp.ndarray
    gen_v: jnp.ndarray
    cross_k: jnp.ndarray
    cross_v: jnp.ndarray
    pending_k: jnp.ndarray
    pending_v: jnp.ndarray
    # int8 mode (kv_cache="paged_i8"): per-token dequantization scales,
    # [Hkv, L*B, T] f32 alongside each int8 value buffer; None otherwise
    prompt_k_scale: Optional[jnp.ndarray] = None
    prompt_v_scale: Optional[jnp.ndarray] = None
    gen_k_scale: Optional[jnp.ndarray] = None
    gen_v_scale: Optional[jnp.ndarray] = None
    cross_k_scale: Optional[jnp.ndarray] = None
    cross_v_scale: Optional[jnp.ndarray] = None


# 128 measured fastest at batch 64 / 2b-2b (17.4 ms/step vs 19.5 at 64 and
# 19.7 at 256): fewer, larger page DMAs beat finer skip granularity.
PAGE_SIZE = 128


def _fused_attn_mode(dims: "ModuleDims") -> int:
    """Which fused decode-attention kernel to use (0 = none).

    T5G_FUSED_ATTN: "0" two-kernel + merge; "1" v1 (per-(row, kv-head)
    grid — measured 21.8 vs 19.5 ms/step at batch 64, kept only for A/B);
    "2" v2 ``fused_layer_attention`` (batch-only grid, all-head page
    DMAs, cross attention folded in, cross-cell DMA pipelining); "3" the
    per-layer megakernel. Default: 3 on TPU (falls back to 2 per config
    via megakernel.supports), 2 elsewhere — the CPU suite would otherwise
    run EVERY decode test through the (slow) interpreter megakernel."""
    import os

    default = "3" if jax.default_backend() == "tpu" else "2"
    mode = int(os.environ.get("T5G_FUSED_ATTN", default))
    # "3": per-layer megakernel (ops/megakernel.py) — int8 weights +
    # both attentions + norms in ONE pallas_call per layer; falls back
    # when megakernel.supports() is false for the config. Allowed off-TPU
    # (interpreter mode) so the CPU suite tests the identical kernel.
    if mode == 3:
        return 3
    if mode == 0 or jax.default_backend() != "tpu":
        return 0
    if dims.head_dim % 128 != 0:
        return 0
    if mode == 2 and dims.num_heads % 8 != 0:
        return 0
    return mode


def _pad_to(n: int, m: int) -> int:
    return -(-n // m) * m


def paged_ppcb(pages_per_seq: int, max_block: int = 4) -> int:
    """Largest power-of-two <= max_block dividing pages_per_seq."""
    p = 1
    while p * 2 <= max_block and pages_per_seq % (p * 2) == 0:
        p *= 2
    return p


def init_paged_cache(
    dims: ModuleDims,
    batch: int,
    prompt_len: int,
    gen_len: int,
    enc_len: int,
    *,
    store_dtype=jnp.bfloat16,
) -> PagedDecoderCache:
    """Allocate the paged cache (region lengths padded to page multiples)."""
    total = _pad_to(prompt_len, PAGE_SIZE) + _pad_to(gen_len, PAGE_SIZE)
    if total > dims.sliding_window:
        raise ValueError(
            f"paged KV cache supports prompt+gen <= sliding_window "
            f"({dims.sliding_window}); got {total}. Use the dense cache.")
    wp = _pad_to(prompt_len, PAGE_SIZE)
    tg = _pad_to(gen_len, PAGE_SIZE)
    tx = _pad_to(enc_len, PAGE_SIZE)
    l, hkv, hd = dims.num_layers, dims.num_kv_heads, dims.head_dim
    lb = l * batch
    quant = jnp.dtype(store_dtype) == jnp.int8

    def scale(t):
        return jnp.zeros((hkv, lb, t), jnp.float32) if quant else None

    return PagedDecoderCache(
        prompt_k=jnp.zeros((hkv, lb, wp, hd), store_dtype),
        prompt_v=jnp.zeros((hkv, lb, wp, hd), store_dtype),
        gen_k=jnp.zeros((hkv, lb, tg, hd), store_dtype),
        gen_v=jnp.zeros((hkv, lb, tg, hd), store_dtype),
        cross_k=jnp.zeros((hkv, lb, tx, hd), store_dtype),
        cross_v=jnp.zeros((hkv, lb, tx, hd), store_dtype),
        pending_k=jnp.zeros((l, batch, hkv, hd), jnp.bfloat16),
        pending_v=jnp.zeros((l, batch, hkv, hd), jnp.bfloat16),
        prompt_k_scale=scale(wp), prompt_v_scale=scale(wp),
        gen_k_scale=scale(tg), gen_v_scale=scale(tg),
        cross_k_scale=scale(tx), cross_v_scale=scale(tx),
    )


def _pages_view(buf: jnp.ndarray) -> jnp.ndarray:
    """[Hkv, L*B, T, hd] -> [Hkv, L*B*(T/ps), ps, hd] (free reshape)."""
    hkv, lb, t, hd = buf.shape
    return buf.reshape(hkv, lb * (t // PAGE_SIZE), PAGE_SIZE, hd)


def _scale_pages_view(buf: Optional[jnp.ndarray]) -> Optional[jnp.ndarray]:
    """[Hkv, L*B, T] -> [Hkv, L*B*(T/ps), ps] (free reshape)."""
    if buf is None:
        return None
    hkv, lb, t = buf.shape
    return buf.reshape(hkv, lb * (t // PAGE_SIZE), PAGE_SIZE)


def _layer_page_indices(li, batch: int, t: int) -> jnp.ndarray:
    """[B, T/ps] page indices of layer ``li`` inside a _pages_view buffer."""
    from ..ops.paged_attn import identity_page_indices

    pps = t // PAGE_SIZE
    return identity_page_indices(batch, pps) + li * batch * pps


def paged_prefill(
    params: PyTree,
    dims: ModuleDims,
    *,
    inputs_embeds: jnp.ndarray,      # [B, W, D] audio embeddings (BOS+prompt)
    self_full_bias: jnp.ndarray,     # [B, 1, W, W]
    self_sliding_bias: jnp.ndarray,  # [B, 1, W, W]
    cross_bias: jnp.ndarray,         # [B, 1, W, Tenc]
    position_ids: jnp.ndarray,       # [B, W] float
    pm_decoder_positions: Optional[jnp.ndarray],
    cross_k: jnp.ndarray,            # [L, B, Hkv, Tenc, hd] bf16 (dense)
    cross_v: jnp.ndarray,
    cache: PagedDecoderCache,
) -> Tuple[jnp.ndarray, PagedDecoderCache]:
    """Prompt prefill for the paged decode path.

    Attention during prefill only needs this call's own K/V (causality:
    nothing beyond the prompt exists yet), so it runs densely over the
    [W, W] extent — cheaper than the dense-cache prefill's [W, Tmax] read —
    and the fresh K/V land in the prompt buffers via one contiguous
    dynamic_update_slice per layer.
    """
    b, w, _ = inputs_embeds.shape
    h = inputs_embeds * jnp.asarray(
        dims.hidden_size ** 0.5, dtype=inputs_embeds.dtype)
    cos, sin = rope_ops.rope_cos_sin(position_ids, dims.head_dim, dims.rope_theta)
    if pm_decoder_positions is not None:
        q_cos, q_sin = rope_ops.rope_cos_sin(
            pm_decoder_positions, dims.head_dim, dims.rope_theta)
    else:
        q_cos = q_sin = None
    sliding_flags = jnp.asarray(dims.sliding_flags)
    layer_ids = jnp.arange(dims.num_layers)

    quant = cache.gen_k.dtype == jnp.int8

    def write_layer(buf, kv, li, scale_buf=None):
        # buf [Hkv, L*B, Wbuf, hd]; kv [B, Hkv, Wkv, hd] (prompt or encoder);
        # int8 mode also writes the per-token scale plane [Hkv, L*B, Wbuf]
        if quant:
            from ..ops.fused_attn import quantize_kv

            qv, sc = quantize_kv(kv.astype(jnp.bfloat16))
            block = qv.swapaxes(0, 1)                      # [Hkv, B, Wkv, hd]
            sblock = sc.swapaxes(0, 1)                     # [Hkv, B, Wkv]
        else:
            block = kv.swapaxes(0, 1).astype(buf.dtype)
            sblock = None
        wkv, wbuf = kv.shape[2], buf.shape[2]
        if wkv < wbuf:
            block = jnp.pad(block, ((0, 0), (0, 0), (0, wbuf - wkv), (0, 0)))
            if sblock is not None:
                sblock = jnp.pad(sblock, ((0, 0), (0, 0), (0, wbuf - wkv)))
        buf = jax.lax.dynamic_update_slice(buf, block, (0, li * b, 0, 0))
        if sblock is not None:
            scale_buf = jax.lax.dynamic_update_slice(
                scale_buf, sblock, (0, li * b, 0))
        return buf, scale_buf

    def body(carry, xs):
        (h, pk, pv, ck, cv), (pks, pvs, cks, cvs) = carry
        lp, is_sliding, li, (xk, xv) = xs
        bias = jnp.where(is_sliding, self_sliding_bias, self_full_bias)

        r = h
        hn = rms_norm(h, lp["pre_self_attn_norm"], dims.rms_norm_eps)
        q, k, v = _qkv_proj(lp["self_attn"], hn, dims)
        q = rope_ops.apply_rope(q, cos, sin)
        k = rope_ops.apply_rope(k, cos, sin)
        pk, pks = write_layer(pk, k, li, pks)
        pv, pvs = write_layer(pv, v, li, pvs)
        out = gqa_attention(q, k, v, bias, dims.q_scale,
                            dims.attn_logit_softcap)
        a = _mm(_merge_heads(out), lp["self_attn"]["o"])
        h = r + rms_norm(a, lp["post_self_attn_norm"], dims.rms_norm_eps)

        # cross attention (dense bf16 K/V; buffers written once per layer)
        r = h
        hn = rms_norm(h, lp["pre_cross_attn_norm"], dims.rms_norm_eps)
        a = cross_attention(lp["cross_attn"], hn, (xk, xv), cross_bias, dims,
                            q_cos, q_sin)
        h = r + rms_norm(a, lp["post_cross_attn_norm"], dims.rms_norm_eps)
        ck, cks = write_layer(ck, xk, li, cks)
        cv, cvs = write_layer(cv, xv, li, cvs)

        r = h
        hn = rms_norm(h, lp["pre_ff_norm"], dims.rms_norm_eps)
        h = r + rms_norm(mlp(lp["mlp"], hn), lp["post_ff_norm"],
                         dims.rms_norm_eps)
        return ((h, pk, pv, ck, cv), (pks, pvs, cks, cvs)), None

    ((h, pk, pv, ck, cv), (pks, pvs, cks, cvs)), _ = jax.lax.scan(
        body,
        ((h, cache.prompt_k, cache.prompt_v, cache.cross_k, cache.cross_v),
         (cache.prompt_k_scale, cache.prompt_v_scale,
          cache.cross_k_scale, cache.cross_v_scale)),
        (params["layers"], sliding_flags, layer_ids, (cross_k, cross_v)),
    )
    h = rms_norm(h, params["final_norm"], dims.rms_norm_eps)
    return h, cache._replace(prompt_k=pk, prompt_v=pv, cross_k=ck, cross_v=cv,
                             prompt_k_scale=pks, prompt_v_scale=pvs,
                             cross_k_scale=cks, cross_v_scale=cvs)


def paged_decode_step(
    params: PyTree,
    dims: ModuleDims,
    *,
    inputs_embeds: jnp.ndarray,       # [B, 1, D]
    position_ids: jnp.ndarray,        # [B, 1] float
    pm_decoder_positions: Optional[jnp.ndarray],
    cache: PagedDecoderCache,
    step: jnp.ndarray,                # scalar: # generation steps completed
    prompt_lengths: jnp.ndarray,      # [B] valid prompt tokens (incl. BOS)
    enc_lengths: jnp.ndarray,         # [B] encoder valid lengths
    unroll: int = 1,                  # layer-scan unroll factor
    gen_lengths: Optional[jnp.ndarray] = None,     # [B] per-row clocks
    flush_positions: Optional[jnp.ndarray] = None,  # [B] per-row flush slot
) -> Tuple[jnp.ndarray, PagedDecoderCache]:
    """One AR decode step over the paged cache (Pallas flash attention).

    Semantics match the dense ``decoder_forward`` step path: the sliding/full
    distinction vanishes because ``init_paged_cache`` guarantees the whole
    buffer fits inside the sliding window. Rows that have already stopped
    keep computing (their outputs are ignored by the engine); their slots
    beyond the stopping step hold garbage that only they can see.

    PER-ROW CLOCKS (continuous batching): pass ``gen_lengths`` [B] (each
    row's own generated count) and ``flush_positions`` [B] (each row's slot
    for the pending K/V block, normally ``max(gen_lengths - 1, 0)``); the
    uniform ``step`` is then ignored. The flush becomes a per-row scatter
    into the identity slabs and the flash kernels read each row's own
    segment length — this is what lets ContinuousServer run the paged
    cache instead of the dense one (VERDICT r2 next-round #2).
    """
    from ..ops import fused_attn, paged_attn

    fused_mode = _fused_attn_mode(dims)
    interp = False
    if cache.gen_k.dtype == jnp.int8:
        # int8 pages dequantize inside the batch kernel (mode 2) or the
        # megakernel (mode 3) only; off-TPU the kernels run in interpreter
        # mode (tiny test configs)
        if (jax.default_backend() == "tpu"
                and (dims.head_dim % 128 != 0 or dims.num_heads % 8 != 0)):
            raise ValueError(
                "kv_cache='paged_i8' needs head_dim % 128 == 0 and "
                f"num_heads % 8 == 0 on TPU (got hd={dims.head_dim}, "
                f"H={dims.num_heads}); use 'paged' or 'dense'")
        if fused_mode != 3:
            fused_mode = 2
        interp = jax.default_backend() != "tpu"
    b = inputs_embeds.shape[0]
    h = inputs_embeds * jnp.asarray(
        dims.hidden_size ** 0.5, dtype=inputs_embeds.dtype)
    cos, sin = rope_ops.rope_cos_sin(position_ids, dims.head_dim, dims.rope_theta)
    if pm_decoder_positions is not None:
        q_cos, q_sin = rope_ops.rope_cos_sin(
            pm_decoder_positions, dims.head_dim, dims.rope_theta)
    else:
        q_cos = q_sin = None
    layer_ids = jnp.arange(dims.num_layers)
    wp = cache.prompt_k.shape[2]
    tg = cache.gen_k.shape[2]
    tx = cache.cross_k.shape[2]

    # flush the previous step's K/V first: one contiguous in-place update at
    # the uniform step slot (slot 0 gets zeros on the very first step — it is
    # invisible then, gen length is 0 — and is overwritten by step 0's flush)
    flush_slot = jnp.maximum(step - 1, 0)
    quant = cache.gen_k.dtype == jnp.int8
    gks = gvs = None
    rowclock = flush_positions is not None
    n_layers, hkv_ = dims.num_layers, dims.num_kv_heads

    def flush(buf, pending, scale_buf):
        if quant:
            from ..ops.fused_attn import quantize_kv

            qv, sc = quantize_kv(pending)                   # [L,B,Hkv,*]
            if rowclock:
                s5 = scale_buf.reshape(hkv_, n_layers, b, -1)
                sblock = sc.transpose(2, 0, 1)               # [Hkv, L, B]
                # per-row dynamic_update_slice (unrolled over the static
                # batch) instead of a scatter: XLA lowers the batched
                # scatter over [Hkv, L, B, T] to a masked full-buffer
                # rewrite, which at serving sizes re-streams the whole
                # slab every step (measured: 9.9 ms/step at 16 slots vs
                # ~6 windowed)
                for row in range(b):
                    s5 = jax.lax.dynamic_update_slice(
                        s5, sblock[:, :, row][:, :, None, None],
                        (0, 0, row, flush_positions[row]))
                scale_buf = s5.reshape(scale_buf.shape)
            else:
                sblock = sc.transpose(2, 0, 1).reshape(hkv_, -1, 1)
                scale_buf = jax.lax.dynamic_update_slice(
                    scale_buf, sblock, (0, 0, flush_slot))
            pending = qv
        if rowclock:
            # per-row clocks: each row's pending block lands at its OWN
            # slot inside the identity slab [Hkv, L, B, T, hd]. One
            # dynamic_update_slice per row (unrolled; B is static): DUS
            # updates in place, while the equivalent batched scatter made
            # XLA re-stream the entire gen slab (~654 MB k+v at 16 slots)
            # every step.
            b5 = buf.reshape(hkv_, n_layers, b, buf.shape[2], buf.shape[3])
            block = pending.transpose(2, 0, 1, 3).astype(buf.dtype)
            for row in range(b):
                b5 = jax.lax.dynamic_update_slice(
                    b5, block[:, :, row][:, :, None, None, :],
                    (0, 0, row, flush_positions[row], 0))
            return b5.reshape(buf.shape), scale_buf
        block = pending.transpose(2, 0, 1, 3).reshape(
            hkv_, -1, 1, dims.head_dim).astype(buf.dtype)
        return (jax.lax.dynamic_update_slice(buf, block, (0, 0, flush_slot, 0)),
                scale_buf)

    gk, gks = flush(cache.gen_k, cache.pending_k, cache.gen_k_scale)
    gv, gvs = flush(cache.gen_v, cache.pending_v, cache.gen_v_scale)
    if gen_lengths is None:
        gen_lengths = jnp.broadcast_to(step.astype(jnp.int32), (b,))
    gen_lengths = gen_lengths.astype(jnp.int32)

    if fused_mode == 3:
        from ..ops import megakernel as mk

        if not mk.supports(params["layers"], dims, cache):
            if cache.gen_k.dtype == jnp.int8:
                fused_mode = 2      # int8 needs the batch kernel (interp
                                    # covers it off-TPU)
            else:
                fused_mode = 2 if (jax.default_backend() == "tpu"
                                   and dims.head_dim % 128 == 0
                                   and dims.num_heads % 8 == 0) else 0
    if fused_mode == 3:
        # per-layer megakernel: the whole layer (int8 matmuls + rope + both
        # attentions + norms) is one pallas_call over the dense cache slabs
        interp3 = jax.default_backend() != "tpu"
        cos1, sin1 = cos[:, 0], sin[:, 0]
        if q_cos is not None:
            qc1, qs1 = q_cos[:, 0], q_sin[:, 0]
        else:
            qc1, qs1 = cos1, sin1
        # int8 pages: ship the cache's per-token scale planes (gen planes
        # are the freshly flushed ones); the kernel stages each layer's
        # slabs in ONE DMA per plane and dequantizes at the logits/p
        kv_scales3 = None
        if cache.gen_k.dtype == jnp.int8:
            kv_scales3 = (cache.prompt_k_scale, cache.prompt_v_scale,
                          gks, gvs,
                          cache.cross_k_scale, cache.cross_v_scale)

        stacked = os.environ.get("T5G_MK_STACKED")
        if stacked is None:
            # default ON on real TPU: bit-equal to the scan on-chip at
            # b1/int4 AND at the b128/int8-KV serving shape
            # (tools/probe_stacked_serving.py), and never slower — the
            # scan pays ~0.3 ms/step of launch overhead at batch 1.
            # Interpreter (CPU suite) keeps the scan default; the stacked
            # grid is exercised there by tests/test_megakernel.py.
            stacked = "1" if jax.default_backend() == "tpu" else "0"
        if stacked == "1":
            # ONE launch for the whole stack: the layer loop is the pallas
            # grid, h carries in the revisited hout block (same math as
            # the scan below — pinned bit-level by
            # tests/test_megakernel.py::test_stacked_matches_scan)
            h3, k_new, v_new = mk.decode_stack(
                params["layers"], dims, h=h[:, 0].astype(jnp.float32),
                cos=cos1, sin=sin1, qcos=qc1, qsin=qs1,
                plens=prompt_lengths.astype(jnp.int32), glens=gen_lengths,
                elens=enc_lengths.astype(jnp.int32),
                prompt_k=cache.prompt_k, prompt_v=cache.prompt_v,
                gen_k=gk, gen_v=gv,
                cross_k=cache.cross_k, cross_v=cache.cross_v,
                kv_scales=kv_scales3,
                interpret=interp3)
        else:
            def body3(carry, li):
                hout, k_new, v_new = mk.decode_layer(
                    params["layers"], dims, h=carry, cos=cos1, sin=sin1,
                    qcos=qc1, qsin=qs1, li=li,
                    plens=prompt_lengths.astype(jnp.int32),
                    glens=gen_lengths,
                    elens=enc_lengths.astype(jnp.int32),
                    prompt_k=cache.prompt_k, prompt_v=cache.prompt_v,
                    gen_k=gk, gen_v=gv,
                    cross_k=cache.cross_k, cross_v=cache.cross_v,
                    kv_scales=kv_scales3,
                    interpret=interp3)
                return hout, (k_new, v_new)

            h3, (k_new, v_new) = jax.lax.scan(
                body3, h[:, 0].astype(jnp.float32), layer_ids,
                unroll=unroll)
        h3 = rms_norm(h3, params["final_norm"], dims.rms_norm_eps)
        return h3[:, None, :].astype(h.dtype), cache._replace(
            gen_k=gk, gen_v=gv, gen_k_scale=gks, gen_v_scale=gvs,
            pending_k=k_new.astype(jnp.bfloat16),
            pending_v=v_new.astype(jnp.bfloat16),
        )

    prompt_kp, prompt_vp = _pages_view(cache.prompt_k), _pages_view(cache.prompt_v)
    gen_kp, gen_vp = _pages_view(gk), _pages_view(gv)
    cross_kp, cross_vp = _pages_view(cache.cross_k), _pages_view(cache.cross_v)
    prompt_ksp = _scale_pages_view(cache.prompt_k_scale)
    prompt_vsp = _scale_pages_view(cache.prompt_v_scale)
    gen_ksp, gen_vsp = _scale_pages_view(gks), _scale_pages_view(gvs)
    cross_ksp = _scale_pages_view(cache.cross_k_scale)
    cross_vsp = _scale_pages_view(cache.cross_v_scale)
    prompt_lengths = prompt_lengths.astype(jnp.int32)

    def body(h, xs):
        lp, li = xs

        r = h
        hn = rms_norm(h, lp["pre_self_attn_norm"], dims.rms_norm_eps)
        q, k, v = _qkv_proj(lp["self_attn"], hn, dims)
        q = rope_ops.apply_rope(q, cos, sin)
        k = rope_ops.apply_rope(k, cos, sin)
        qv = q[:, :, 0].astype(jnp.float32) * dims.q_scale  # [B, H, hd]
        if fused_mode == 2:
            # batch-grid kernel: prompt+gen pages + in-flight token, one
            # launch, all-head page DMAs, cross-cell pipelining
            attn = fused_attn.batch_paged_attention(
                qv, k[:, :, 0], v[:, :, 0],
                prompt_kp, prompt_vp, gen_kp, gen_vp,
                prompt_lengths, gen_lengths,
                _layer_page_indices(li, b, wp),
                _layer_page_indices(li, b, tg),
                prompt_ksp, prompt_vsp, gen_ksp, gen_vsp,
                attn_logits_soft_cap=dims.attn_logit_softcap,
                include_current=True,
                interpret=interp,
            ).astype(h.dtype)
        elif fused_mode == 1:
            # one Pallas launch: prompt pages + gen pages + in-flight token
            attn = fused_attn.fused_decode_attention(
                qv, k[:, :, 0], v[:, :, 0],
                prompt_kp, prompt_vp, gen_kp, gen_vp,
                prompt_lengths, gen_lengths,
                _layer_page_indices(li, b, wp),
                _layer_page_indices(li, b, tg),
                attn_logits_soft_cap=dims.attn_logit_softcap,
            ).astype(h.dtype)
        else:
            parts = [
                paged_attn.paged_flash_parts(
                    qv, prompt_kp, prompt_vp, prompt_lengths,
                    _layer_page_indices(li, b, wp),
                    attn_logits_soft_cap=dims.attn_logit_softcap,
                    pages_per_compute_block=paged_ppcb(wp // PAGE_SIZE),
                ),
                paged_attn.paged_flash_parts(
                    qv, gen_kp, gen_vp, gen_lengths,
                    _layer_page_indices(li, b, tg),
                    attn_logits_soft_cap=dims.attn_logit_softcap,
                    pages_per_compute_block=paged_ppcb(tg // PAGE_SIZE),
                ),
            ]
            attn = paged_attn.merge_attention_parts(
                parts, qv, k[:, :, 0], v[:, :, 0],
                dims.attn_logit_softcap, h.dtype)
        a = _mm(attn.reshape(b, 1, -1), lp["self_attn"]["o"])
        h = r + rms_norm(a, lp["post_self_attn_norm"], dims.rms_norm_eps)

        r = h
        hn = rms_norm(h, lp["pre_cross_attn_norm"], dims.rms_norm_eps)
        cq = _split_heads(_mm(hn, lp["cross_attn"]["q"]), dims.num_heads,
                          dims.head_dim)
        if q_cos is not None:
            cq = rope_ops.apply_rope(cq, q_cos, q_sin)
        cqv = cq[:, :, 0].astype(jnp.float32) * dims.q_scale
        if fused_mode == 2:
            # clamp: a zero-length segment A would skip the DMA wait the
            # previous cell already prefetched (semaphore leak); a length-1
            # read of the zero-initialized slot is harmless for the
            # degenerate empty-text row (whose output is garbage either way)
            cattn = fused_attn.batch_paged_attention(
                cqv, None, None, cross_kp, cross_vp, None, None,
                jnp.maximum(enc_lengths, 1), None,
                _layer_page_indices(li, b, tx), None,
                cross_ksp, cross_vsp, None, None,
                attn_logits_soft_cap=dims.attn_logit_softcap,
                interpret=interp,
            ).astype(h.dtype)
        else:
            cattn = paged_attn.paged_gqa_attention(
                cqv, cross_kp, cross_vp, enc_lengths,
                page_indices=_layer_page_indices(li, b, tx),
                attn_logits_soft_cap=dims.attn_logit_softcap,
                pages_per_compute_block=paged_ppcb(tx // PAGE_SIZE),
                out_dtype=h.dtype,
            )
        a = _mm(cattn.reshape(b, 1, -1), lp["cross_attn"]["o"])
        h = r + rms_norm(a, lp["post_cross_attn_norm"], dims.rms_norm_eps)

        r = h
        hn = rms_norm(h, lp["pre_ff_norm"], dims.rms_norm_eps)
        h = r + rms_norm(mlp(lp["mlp"], hn), lp["post_ff_norm"],
                         dims.rms_norm_eps)
        return h, (k[:, :, 0], v[:, :, 0])

    h, (k_new, v_new) = jax.lax.scan(body, h, (params["layers"], layer_ids),
                                     unroll=unroll)
    h = rms_norm(h, params["final_norm"], dims.rms_norm_eps)
    return h, cache._replace(
        gen_k=gk, gen_v=gv, gen_k_scale=gks, gen_v_scale=gvs,
        pending_k=k_new.astype(jnp.bfloat16),
        pending_v=v_new.astype(jnp.bfloat16),
    )

def paged_decode_multi(
    params: PyTree,
    dims: ModuleDims,
    *,
    inputs_embeds: jnp.ndarray,       # [B, S, D] chain embeddings
    position_ids: jnp.ndarray,        # [B, S] float
    pm_decoder_positions: Optional[jnp.ndarray],
    cache: PagedDecoderCache,
    pending_k: jnp.ndarray,           # [L, B, S, Hkv, hd] prev pass's chain
    pending_v: jnp.ndarray,
    flush_start: jnp.ndarray,         # scalar gen slot for the pending block
    step: jnp.ndarray,                # scalar: tokens emitted so far
    prompt_lengths: jnp.ndarray,      # [B] valid prompt tokens (incl. BOS)
    enc_lengths: jnp.ndarray,         # [B]
) -> Tuple[jnp.ndarray, PagedDecoderCache, jnp.ndarray, jnp.ndarray]:
    """One S-token verify pass over the paged cache (speculative decoding).

    Multi-token counterpart of :func:`paged_decode_step` — the paged-cache
    extension the speculative engine needs (NEXT_STEPS perf #2):

    - the PREVIOUS pass's S-token chain K/V flush as one contiguous
      step-indexed dynamic_update_slice at ``flush_start`` (slots past the
      accepted prefix hold garbage that the next flush overwrites before the
      visible length ever reaches them; the caller guarantees
      ``flush_start + S`` fits the generation buffer via prefill
      ``cache_slack``);
    - every chain position shares the same paged segment lengths (prompt;
      generation = ``step``), so the segment kernels run ONCE over B*S
      pseudo-rows; intra-chain causal attention joins through the exact
      flash merge (ops/paged_attn.py merge_attention_parts_chain).

    Kernel selection (round 5, VERDICT r4 next #4): when the megakernel
    applies (fused int8/int4 weights + supported cache), the whole verify
    pass runs through ``megakernel.decode_stack(chain=S)`` — B*S
    pseudo-rows, intra-chain causality inside the kernel — so a verify
    pass costs about one fused decode step instead of the unfused
    two-kernel chain. int8 KV pages are supported ONLY on that path (the
    unfused segment kernels have no scale-plane support); bf16-weight
    configs keep the unfused chain below.

    Returns (hidden [B, S, D], cache, chain_k, chain_v) where chain_k/v
    [L, B, S, Hkv, hd] are this pass's K/V — the next pass's pending block.
    """
    from ..ops import paged_attn

    b, s_len, _ = inputs_embeds.shape
    h = inputs_embeds * jnp.asarray(
        dims.hidden_size ** 0.5, dtype=inputs_embeds.dtype)
    cos, sin = rope_ops.rope_cos_sin(position_ids, dims.head_dim,
                                     dims.rope_theta)
    if pm_decoder_positions is not None:
        q_cos, q_sin = rope_ops.rope_cos_sin(
            pm_decoder_positions, dims.head_dim, dims.rope_theta)
    else:
        q_cos = q_sin = None
    layer_ids = jnp.arange(dims.num_layers)
    wp = cache.prompt_k.shape[2]
    tg = cache.gen_k.shape[2]
    tx = cache.cross_k.shape[2]
    quant = cache.gen_k.dtype == jnp.int8

    # flush the previous pass's chain: one contiguous in-place update
    # (int8 pages: quantize the bf16 chain block per token and write the
    # matching scale-plane block, mirroring paged_decode_step's flush)
    if quant:
        from ..ops.fused_attn import quantize_kv

        qk, sck = quantize_kv(pending_k)       # [L,B,S,Hkv,hd], [L,B,S,Hkv]
        qv_, scv = quantize_kv(pending_v)
        pend_k_store, pend_v_store = qk, qv_
    else:
        pend_k_store, pend_v_store = pending_k, pending_v
    block_k = pend_k_store.transpose(3, 0, 1, 2, 4).reshape(
        dims.num_kv_heads, -1, s_len, dims.head_dim).astype(cache.gen_k.dtype)
    block_v = pend_v_store.transpose(3, 0, 1, 2, 4).reshape(
        dims.num_kv_heads, -1, s_len, dims.head_dim).astype(cache.gen_v.dtype)
    gk = jax.lax.dynamic_update_slice(cache.gen_k, block_k,
                                      (0, 0, flush_start, 0))
    gv = jax.lax.dynamic_update_slice(cache.gen_v, block_v,
                                      (0, 0, flush_start, 0))
    gks = gvs = None
    if quant:
        sblock_k = sck.transpose(3, 0, 1, 2).reshape(
            dims.num_kv_heads, -1, s_len)
        sblock_v = scv.transpose(3, 0, 1, 2).reshape(
            dims.num_kv_heads, -1, s_len)
        gks = jax.lax.dynamic_update_slice(cache.gen_k_scale, sblock_k,
                                           (0, 0, flush_start))
        gvs = jax.lax.dynamic_update_slice(cache.gen_v_scale, sblock_v,
                                           (0, 0, flush_start))

    # ---- megakernel chain path -----------------------------------------
    from ..ops import megakernel as mk

    fused_mode = _fused_attn_mode(dims)
    mk_ok = ((fused_mode == 3 or quant)
             and mk.supports(params["layers"], dims, cache))
    if quant and not mk_ok:
        raise ValueError(
            "paged_i8 verify pass requires the megakernel path (fused "
            "int8/int4 weights; on TPU also batch % 8 == 0) — the unfused "
            "segment kernels have no int8 scale-plane support")
    if mk_ok:
        interp3 = jax.default_backend() != "tpu"
        cosf = cos.reshape(b * s_len, dims.head_dim)
        sinf = sin.reshape(b * s_len, dims.head_dim)
        if q_cos is not None:
            qcf = q_cos.reshape(b * s_len, dims.head_dim)
            qsf = q_sin.reshape(b * s_len, dims.head_dim)
        else:
            qcf, qsf = cosf, sinf
        kv_scales3 = None
        if quant:
            kv_scales3 = (cache.prompt_k_scale, cache.prompt_v_scale,
                          gks, gvs,
                          cache.cross_k_scale, cache.cross_v_scale)

        def rep1(lens):
            return jnp.repeat(lens.astype(jnp.int32), s_len, axis=0)

        glens_f = rep1(jnp.broadcast_to(step.astype(jnp.int32), (b,)))
        hf = h.reshape(b * s_len, dims.hidden_size).astype(jnp.float32)

        stacked = os.environ.get("T5G_MK_STACKED")
        if stacked is None:
            stacked = "1" if jax.default_backend() == "tpu" else "0"
        common = dict(
            cos=cosf, sin=sinf, qcos=qcf, qsin=qsf,
            plens=rep1(prompt_lengths), glens=glens_f,
            elens=rep1(enc_lengths),
            prompt_k=cache.prompt_k, prompt_v=cache.prompt_v,
            gen_k=gk, gen_v=gv,
            cross_k=cache.cross_k, cross_v=cache.cross_v,
            kv_scales=kv_scales3, interpret=interp3, chain=s_len)
        if stacked == "1":
            h3, k_new, v_new = mk.decode_stack(
                params["layers"], dims, h=hf, **common)
        else:
            def body3(carry, li):
                hout, k_new, v_new = mk.decode_layer(
                    params["layers"], dims, h=carry, li=li, **common)
                return hout, (k_new, v_new)

            h3, (k_new, v_new) = jax.lax.scan(body3, hf, layer_ids)
        h3 = rms_norm(h3, params["final_norm"], dims.rms_norm_eps)
        hidden = h3.reshape(b, s_len, dims.hidden_size).astype(h.dtype)
        chain_k = k_new.reshape(dims.num_layers, b, s_len,
                                dims.num_kv_heads, dims.head_dim)
        chain_v = v_new.reshape(dims.num_layers, b, s_len,
                                dims.num_kv_heads, dims.head_dim)
        return (hidden,
                cache._replace(gen_k=gk, gen_v=gv,
                               gen_k_scale=gks, gen_v_scale=gvs),
                chain_k.astype(jnp.bfloat16), chain_v.astype(jnp.bfloat16))

    prompt_kp, prompt_vp = _pages_view(cache.prompt_k), _pages_view(cache.prompt_v)
    gen_kp, gen_vp = _pages_view(gk), _pages_view(gv)
    cross_kp, cross_vp = _pages_view(cache.cross_k), _pages_view(cache.cross_v)

    def rep(lens):  # [B] -> [B*S] pseudo-row lengths
        return jnp.repeat(lens.astype(jnp.int32), s_len, axis=0)

    def rep_pages(idx):  # [B, PP] -> [B*S, PP]
        return jnp.repeat(idx, s_len, axis=0)

    gen_lengths = rep(jnp.broadcast_to(step.astype(jnp.int32), (b,)))
    prompt_rep = rep(prompt_lengths)
    enc_rep = rep(enc_lengths)

    def body(h, xs):
        lp, li = xs

        r = h
        hn = rms_norm(h, lp["pre_self_attn_norm"], dims.rms_norm_eps)
        q, k, v = _qkv_proj(lp["self_attn"], hn, dims)  # [B, H|Hkv, S, hd]
        q = rope_ops.apply_rope(q, cos, sin)
        k = rope_ops.apply_rope(k, cos, sin)
        qv = (q.astype(jnp.float32) * dims.q_scale
              ).transpose(0, 2, 1, 3)                   # [B, S, H, hd]
        k_c = k.transpose(0, 2, 1, 3)                   # [B, S, Hkv, hd]
        v_c = v.transpose(0, 2, 1, 3)
        q2 = qv.reshape(b * s_len, dims.num_heads, dims.head_dim)
        parts = [
            paged_attn.paged_flash_parts(
                q2, prompt_kp, prompt_vp, prompt_rep,
                rep_pages(_layer_page_indices(li, b, wp)),
                attn_logits_soft_cap=dims.attn_logit_softcap,
                pages_per_compute_block=paged_ppcb(wp // PAGE_SIZE),
            ),
            paged_attn.paged_flash_parts(
                q2, gen_kp, gen_vp, gen_lengths,
                rep_pages(_layer_page_indices(li, b, tg)),
                attn_logits_soft_cap=dims.attn_logit_softcap,
                pages_per_compute_block=paged_ppcb(tg // PAGE_SIZE),
            ),
        ]
        attn = paged_attn.merge_attention_parts_chain(
            parts, qv, k_c, v_c, dims.attn_logit_softcap, h.dtype,
            store_dtype=cache.gen_k.dtype)
        a = _mm(attn.reshape(b, s_len, -1), lp["self_attn"]["o"])
        h = r + rms_norm(a, lp["post_self_attn_norm"], dims.rms_norm_eps)

        r = h
        hn = rms_norm(h, lp["pre_cross_attn_norm"], dims.rms_norm_eps)
        cq = _split_heads(_mm(hn, lp["cross_attn"]["q"]), dims.num_heads,
                          dims.head_dim)                # [B, H, S, hd]
        if q_cos is not None:
            cq = rope_ops.apply_rope(cq, q_cos, q_sin)
        cq2 = (cq.astype(jnp.float32) * dims.q_scale).transpose(
            0, 2, 1, 3).reshape(b * s_len, dims.num_heads, dims.head_dim)
        cattn = paged_attn.paged_gqa_attention(
            cq2, cross_kp, cross_vp, enc_rep,
            page_indices=rep_pages(_layer_page_indices(li, b, tx)),
            attn_logits_soft_cap=dims.attn_logit_softcap,
            pages_per_compute_block=paged_ppcb(tx // PAGE_SIZE),
            out_dtype=h.dtype,
        )
        a = _mm(cattn.reshape(b, s_len, -1), lp["cross_attn"]["o"])
        h = r + rms_norm(a, lp["post_cross_attn_norm"], dims.rms_norm_eps)

        r = h
        hn = rms_norm(h, lp["pre_ff_norm"], dims.rms_norm_eps)
        h = r + rms_norm(mlp(lp["mlp"], hn), lp["post_ff_norm"],
                         dims.rms_norm_eps)
        return h, (k_c, v_c)

    h, (k_new, v_new) = jax.lax.scan(body, h, (params["layers"], layer_ids))
    h = rms_norm(h, params["final_norm"], dims.rms_norm_eps)
    return (h, cache._replace(gen_k=gk, gen_v=gv),
            k_new.astype(jnp.bfloat16), v_new.astype(jnp.bfloat16))


def fuse_for_decode(params: PyTree) -> PyTree:
    """Concatenate q/k/v -> qkv and gate/up -> gate_up kernels in both
    stacks. The decode step is bound by per-matmul dispatch + DMA startup
    (measured ~40us each); fusing drops 3 of the 9 matmuls per decoder
    layer. Inference-only: checkpoints keep the unfused layout."""
    def fuse_stack(stack):
        stack = dict(stack)
        layers = dict(stack["layers"])
        sa = dict(layers["self_attn"])
        sa["qkv"] = jnp.concatenate([sa.pop("q"), sa.pop("k"), sa.pop("v")],
                                    axis=-1)
        layers["self_attn"] = sa
        mlp_p = dict(layers["mlp"])
        mlp_p["gate_up"] = jnp.concatenate([mlp_p.pop("gate"), mlp_p.pop("up")],
                                           axis=-1)
        layers["mlp"] = mlp_p
        stack["layers"] = layers
        return stack

    out = dict(params)
    out["encoder"] = fuse_stack(params["encoder"])
    out["decoder"] = fuse_stack(params["decoder"])
    return out
