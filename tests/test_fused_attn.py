"""Fused two-segment decode attention == composed parts + merge.

The fused kernel runs in interpreter mode on CPU, so the exact kernel code
path (DMA sequencing, masking, flash accumulation) is what the suite
checks — not a lookalike reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from t5gemma_tts_tpu.ops import fused_attn, paged_attn

PS = 128


def _pages(rng, hkv, npages, hd, dtype=jnp.bfloat16):
    x = jax.random.normal(rng, (hkv, npages, PS, hd), jnp.float32)
    return x.astype(dtype)


def _reference(q, k_cur, v_cur, pk, pv, gk, gv, plens, glens, ppi, gpi, cap):
    parts = [
        paged_attn.paged_flash_parts(q, pk, pv, plens, ppi,
                                     attn_logits_soft_cap=cap),
        paged_attn.paged_flash_parts(q, gk, gv, glens, gpi,
                                     attn_logits_soft_cap=cap),
    ]
    return paged_attn.merge_attention_parts(
        parts, q, k_cur, v_cur, cap, jnp.float32)


@pytest.mark.parametrize("cap", [None, 50.0])
@pytest.mark.parametrize("glen_mode", ["zero", "partial", "full"])
def test_fused_matches_merge(cap, glen_mode):
    b, h, hkv, hd = 4, 8, 4, 256
    ppp, ppg = 2, 3
    rngs = jax.random.split(jax.random.PRNGKey(0), 8)
    q = jax.random.normal(rngs[0], (b, h, hd), jnp.float32)
    k_cur = jax.random.normal(rngs[1], (b, hkv, hd), jnp.float32)
    v_cur = jax.random.normal(rngs[2], (b, hkv, hd), jnp.float32)
    pk = _pages(rngs[3], hkv, b * ppp, hd)
    pv = _pages(rngs[4], hkv, b * ppp, hd)
    gk = _pages(rngs[5], hkv, b * ppg, hd)
    gv = _pages(rngs[6], hkv, b * ppg, hd)
    plens = jnp.asarray([1, PS, PS + 37, 2 * PS], jnp.int32)
    if glen_mode == "zero":
        glens = jnp.zeros((b,), jnp.int32)
    elif glen_mode == "partial":
        glens = jnp.asarray([5, 77, PS + 1, 2 * PS + 64], jnp.int32)
    else:
        glens = jnp.full((b,), ppg * PS, jnp.int32)
    ppi = paged_attn.identity_page_indices(b, ppp)
    gpi = paged_attn.identity_page_indices(b, ppg)

    want = _reference(q, k_cur, v_cur, pk, pv, gk, gv, plens, glens,
                      ppi, gpi, cap)
    got = fused_attn.fused_decode_attention(
        q, k_cur, v_cur, pk, pv, gk, gv, plens, glens, ppi, gpi,
        attn_logits_soft_cap=cap, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_layer_offset_page_indices():
    """Page indices addressing a multi-layer buffer (non-identity)."""
    b, h, hkv, hd = 2, 2, 1, 256
    layers, ppp, ppg = 3, 1, 2
    li = 1
    rngs = jax.random.split(jax.random.PRNGKey(3), 8)
    q = jax.random.normal(rngs[0], (b, h, hd), jnp.float32)
    k_cur = jax.random.normal(rngs[1], (b, hkv, hd), jnp.float32)
    v_cur = jax.random.normal(rngs[2], (b, hkv, hd), jnp.float32)
    pk = _pages(rngs[3], hkv, layers * b * ppp, hd)
    pv = _pages(rngs[4], hkv, layers * b * ppp, hd)
    gk = _pages(rngs[5], hkv, layers * b * ppg, hd)
    gv = _pages(rngs[6], hkv, layers * b * ppg, hd)
    plens = jnp.asarray([PS, 40], jnp.int32)
    glens = jnp.asarray([PS + 3, 0], jnp.int32)
    ppi = paged_attn.identity_page_indices(b, ppp) + li * b * ppp
    gpi = paged_attn.identity_page_indices(b, ppg) + li * b * ppg

    want = _reference(q, k_cur, v_cur, pk, pv, gk, gv, plens, glens,
                      ppi, gpi, 50.0)
    got = fused_attn.fused_decode_attention(
        q, k_cur, v_cur, pk, pv, gk, gv, plens, glens, ppi, gpi,
        attn_logits_soft_cap=50.0, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_f8_pages():
    b, h, hkv, hd = 2, 4, 2, 256
    ppp = ppg = 1
    rngs = jax.random.split(jax.random.PRNGKey(5), 8)
    q = jax.random.normal(rngs[0], (b, h, hd), jnp.float32)
    k_cur = jax.random.normal(rngs[1], (b, hkv, hd), jnp.float32)
    v_cur = jax.random.normal(rngs[2], (b, hkv, hd), jnp.float32)
    dt = jnp.float8_e4m3fn
    pk = _pages(rngs[3], hkv, b, hd, dt)
    pv = _pages(rngs[4], hkv, b, hd, dt)
    gk = _pages(rngs[5], hkv, b, hd, dt)
    gv = _pages(rngs[6], hkv, b, hd, dt)
    plens = jnp.asarray([30, PS], jnp.int32)
    glens = jnp.asarray([0, 99], jnp.int32)
    ppi = paged_attn.identity_page_indices(b, ppp)
    gpi = paged_attn.identity_page_indices(b, ppg)

    want = _reference(q, k_cur, v_cur, pk, pv, gk, gv, plens, glens,
                      ppi, gpi, 50.0)
    got = fused_attn.fused_decode_attention(
        q, k_cur, v_cur, pk, pv, gk, gv, plens, glens, ppi, gpi,
        attn_logits_soft_cap=50.0, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
