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
                               rtol=5e-5, atol=5e-5)


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
                               rtol=5e-5, atol=5e-5)


@pytest.mark.parametrize("cap", [None, 50.0])
def test_batch_paged_attention_matches_reference(cap):
    """v2 batch-grid kernel == parts+merge (self) and paged cross."""
    b, h, hkv, hd = 4, 8, 4, 256
    ppp, ppg, ppc = 2, 3, 2
    rngs = jax.random.split(jax.random.PRNGKey(1), 12)
    qs = jax.random.normal(rngs[0], (b, h, hd), jnp.float32)
    qx = jax.random.normal(rngs[1], (b, h, hd), jnp.float32)
    k_cur = jax.random.normal(rngs[2], (b, hkv, hd), jnp.float32)
    v_cur = jax.random.normal(rngs[3], (b, hkv, hd), jnp.float32)
    pk = _pages(rngs[4], hkv, b * ppp, hd)
    pv = _pages(rngs[5], hkv, b * ppp, hd)
    gk = _pages(rngs[6], hkv, b * ppg, hd)
    gv = _pages(rngs[7], hkv, b * ppg, hd)
    ck = _pages(rngs[8], hkv, b * ppc, hd)
    cv = _pages(rngs[9], hkv, b * ppc, hd)
    plens = jnp.asarray([1, PS, PS + 37, 2 * PS], jnp.int32)
    glens = jnp.asarray([0, 77, PS + 1, 3 * PS], jnp.int32)
    elens = jnp.asarray([12, PS, PS + 5, 2 * PS], jnp.int32)
    ppi = paged_attn.identity_page_indices(b, ppp)
    gpi = paged_attn.identity_page_indices(b, ppg)
    cpi = paged_attn.identity_page_indices(b, ppc)

    want_self = _reference(qs, k_cur, v_cur, pk, pv, gk, gv, plens, glens,
                           ppi, gpi, cap)
    want_cross = paged_attn.paged_gqa_attention(
        qx, ck, cv, elens, page_indices=cpi, attn_logits_soft_cap=cap,
        out_dtype=jnp.float32)
    got_self = fused_attn.batch_paged_attention(
        qs, k_cur, v_cur, pk, pv, gk, gv, plens, glens, ppi, gpi,
        attn_logits_soft_cap=cap, include_current=True, interpret=True)
    got_cross = fused_attn.batch_paged_attention(
        qx, None, None, ck, cv, None, None, elens, None, cpi, None,
        attn_logits_soft_cap=cap, interpret=True)
    np.testing.assert_allclose(np.asarray(got_self), np.asarray(want_self),
                               rtol=5e-5, atol=5e-5)
    np.testing.assert_allclose(np.asarray(got_cross), np.asarray(want_cross),
                               rtol=5e-5, atol=5e-5)


def test_batch_paged_attention_layer_offsets():
    """Non-identity page indices into a multi-layer pool."""
    b, h, hkv, hd = 2, 8, 4, 256
    layers, ppp, ppg, ppc = 2, 1, 2, 1
    li = 1
    rngs = jax.random.split(jax.random.PRNGKey(2), 12)
    qs = jax.random.normal(rngs[0], (b, h, hd), jnp.float32)
    qx = jax.random.normal(rngs[1], (b, h, hd), jnp.float32)
    k_cur = jax.random.normal(rngs[2], (b, hkv, hd), jnp.float32)
    v_cur = jax.random.normal(rngs[3], (b, hkv, hd), jnp.float32)
    pk = _pages(rngs[4], hkv, layers * b * ppp, hd)
    pv = _pages(rngs[5], hkv, layers * b * ppp, hd)
    gk = _pages(rngs[6], hkv, layers * b * ppg, hd)
    gv = _pages(rngs[7], hkv, layers * b * ppg, hd)
    ck = _pages(rngs[8], hkv, layers * b * ppc, hd)
    cv = _pages(rngs[9], hkv, layers * b * ppc, hd)
    plens = jnp.asarray([PS, 40], jnp.int32)
    glens = jnp.asarray([PS + 3, 0], jnp.int32)
    elens = jnp.asarray([60, PS], jnp.int32)
    ppi = paged_attn.identity_page_indices(b, ppp) + li * b * ppp
    gpi = paged_attn.identity_page_indices(b, ppg) + li * b * ppg
    cpi = paged_attn.identity_page_indices(b, ppc) + li * b * ppc

    want_self = _reference(qs, k_cur, v_cur, pk, pv, gk, gv, plens, glens,
                           ppi, gpi, 50.0)
    want_cross = paged_attn.paged_gqa_attention(
        qx, ck, cv, elens, page_indices=cpi, attn_logits_soft_cap=50.0,
        out_dtype=jnp.float32)
    got_self = fused_attn.batch_paged_attention(
        qs, k_cur, v_cur, pk, pv, gk, gv, plens, glens, ppi, gpi,
        attn_logits_soft_cap=50.0, include_current=True, interpret=True)
    got_cross = fused_attn.batch_paged_attention(
        qx, None, None, ck, cv, None, None, elens, None, cpi, None,
        attn_logits_soft_cap=50.0, interpret=True)
    np.testing.assert_allclose(np.asarray(got_self), np.asarray(want_self),
                               rtol=5e-5, atol=5e-5)
    np.testing.assert_allclose(np.asarray(got_cross), np.asarray(want_cross),
                               rtol=5e-5, atol=5e-5)


def test_batch_paged_attention_int8_pages():
    """int8 pages + per-token scales: dequantized in-kernel, close to the
    bf16 result and much closer than raw value corruption."""
    b, h, hkv, hd = 4, 8, 4, 256
    ppp, ppg = 1, 2
    rngs = jax.random.split(jax.random.PRNGKey(9), 8)
    q = jax.random.normal(rngs[0], (b, h, hd), jnp.float32)
    k_cur = jax.random.normal(rngs[1], (b, hkv, hd), jnp.float32)
    v_cur = jax.random.normal(rngs[2], (b, hkv, hd), jnp.float32)
    pk_f = jax.random.normal(rngs[3], (hkv, b * ppp, PS, hd), jnp.float32)
    pv_f = jax.random.normal(rngs[4], (hkv, b * ppp, PS, hd), jnp.float32)
    gk_f = jax.random.normal(rngs[5], (hkv, b * ppg, PS, hd), jnp.float32)
    gv_f = jax.random.normal(rngs[6], (hkv, b * ppg, PS, hd), jnp.float32)
    plens = jnp.asarray([1, 40, PS, PS], jnp.int32)
    glens = jnp.asarray([0, 30, PS + 9, 2 * PS], jnp.int32)
    ppi = paged_attn.identity_page_indices(b, ppp)
    gpi = paged_attn.identity_page_indices(b, ppg)

    pk, psk = fused_attn.quantize_kv(pk_f)
    pv, psv = fused_attn.quantize_kv(pv_f)
    gk, gsk = fused_attn.quantize_kv(gk_f)
    gv, gsv = fused_attn.quantize_kv(gv_f)

    want = _reference(q, k_cur, v_cur, pk_f.astype(jnp.bfloat16),
                      pv_f.astype(jnp.bfloat16), gk_f.astype(jnp.bfloat16),
                      gv_f.astype(jnp.bfloat16), plens, glens, ppi, gpi, 50.0)
    got = fused_attn.batch_paged_attention(
        q, k_cur, v_cur, pk, pv, gk, gv, plens, glens, ppi, gpi,
        psk, psv, gsk, gsv,
        attn_logits_soft_cap=50.0, include_current=True, interpret=True)
    err = np.abs(np.asarray(got) - np.asarray(want))
    denom = np.abs(np.asarray(want)).mean()
    # on gaussian synthetic K/V, per-token int8 lands in the same ~2% band
    # as fp8-e4m3 (its edge is native converts + outlier robustness on real
    # activations, not accuracy on white noise)
    assert err.mean() / denom < 0.025, err.mean() / denom

    # quantization round-trip itself is tight
    deq = np.asarray(pk, np.float32) * np.asarray(psk)[..., None]
    rel = np.abs(deq - np.asarray(pk_f)).max() / np.abs(np.asarray(pk_f)).max()
    assert rel < 0.01


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


def test_kv_int8_output_error_calibration():
    """kv_int8_output_error (the documented paged_i8 fallback check,
    VERDICT r3 #7): small on gaussian K/V, large under the per-channel
    K outliers published LLM KV statistics show (KIVI/KVQuant shape)."""
    rng = np.random.default_rng(0)
    nt, hd = 512, 256
    k = rng.standard_normal((nt, hd)).astype(np.float32)
    v = rng.standard_normal((nt, hd)).astype(np.float32)
    e_gauss = fused_attn.kv_int8_output_error(k, v)
    assert e_gauss < 0.02

    # fixed outlier channels at ~50x with mild per-token amplitude jitter
    # (the KIVI shape): per-token amax is outlier-dominated, crushing the
    # other channels' resolution
    k_out = k.copy()
    ch = rng.choice(hd, 3, replace=False)
    amp = 50.0 * (1 + 0.25 * rng.standard_normal((nt, 3)))
    k_out[:, ch] *= amp.astype(np.float32)
    e_out = fused_attn.kv_int8_output_error(k_out, v)
    assert e_out > 0.04
    assert e_out > 3 * e_gauss

    # the helper's numpy roundtrip IS quantize_kv's math
    kq, ks = fused_attn.quantize_kv(jnp.asarray(k_out))
    deq_jax = np.asarray(kq, np.float32) * np.asarray(ks)[..., None]
    amax = np.abs(k_out).max(axis=-1)
    s = np.maximum(amax, 1e-8) / 127.0
    deq_np = np.clip(np.round(k_out / s[:, None]), -127, 127) * s[:, None]
    np.testing.assert_allclose(deq_jax, deq_np, rtol=1e-5, atol=1e-6)
