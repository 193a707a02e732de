"""Per-layer decode megakernel (ops/megakernel.py) vs the unfused step.

The megakernel runs in interpreter mode on CPU, so these tests execute the
exact kernel code path. Mode 0 (two flash-part kernels + XLA merge + XLA
W8A8 matmuls) is the reference; both paths quantize activations per row
with identical math, so the in-flight K/V must agree to bf16/rope
precision, while the hidden output tolerates the MLP's finer-grained
(per-tile) activation scales.
"""

import dataclasses
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from t5gemma_tts_tpu.config import tiny_voice_config
from t5gemma_tts_tpu.models import t5gemma, voice
from t5gemma_tts_tpu.ops.quant import quantize_params_for_decode


def _setup(b=2, step=5, seed=0):
    cfg = tiny_voice_config()
    dims = dataclasses.replace(cfg.backbone.decoder, sliding_window=4096)
    params = voice.init_params(jax.random.PRNGKey(seed), cfg)
    params = t5gemma.fuse_for_decode(params)
    params = quantize_params_for_decode(params, streaming_tiled=True)
    dec = params["decoder"]

    cache = t5gemma.init_paged_cache(dims, b, 5, 6, 7)

    def fill(x, k):
        if x is None:
            return None
        return (jax.random.normal(jax.random.PRNGKey(k), x.shape,
                                  jnp.float32) * 0.5).astype(x.dtype)

    cache = cache._replace(
        prompt_k=fill(cache.prompt_k, 1), prompt_v=fill(cache.prompt_v, 2),
        gen_k=fill(cache.gen_k, 3), gen_v=fill(cache.gen_v, 4),
        cross_k=fill(cache.cross_k, 5), cross_v=fill(cache.cross_v, 6),
        pending_k=fill(cache.pending_k, 7),
        pending_v=fill(cache.pending_v, 8),
    )

    rng = np.random.default_rng(seed)
    emb = jnp.asarray(rng.normal(size=(b, 1, dims.hidden_size)) * 0.3,
                      jnp.bfloat16)
    pos = jnp.asarray(rng.uniform(0, 100, (b, 1)), jnp.float32)
    plens = jnp.asarray([3, 5][:b], jnp.int32)
    elens = jnp.asarray([7, 2][:b], jnp.int32)
    return cfg, dims, dec, cache, emb, pos, plens, elens, jnp.int32(step)


def _run(mode, dec, dims, cache, emb, pos, plens, elens, step):
    os.environ["T5G_FUSED_ATTN"] = str(mode)
    # explicit 0, not unset: on a real-TPU suite run the unset default is
    # stacked (t5gemma.py paged_decode_step), which would make the
    # stacked-vs-scan tests compare stacked against itself (ADVICE r4)
    os.environ["T5G_MK_STACKED"] = "0"
    try:
        return t5gemma.paged_decode_step(
            dec, dims, inputs_embeds=emb, position_ids=pos,
            pm_decoder_positions=pos, cache=cache, step=step,
            prompt_lengths=plens, enc_lengths=elens)
    finally:
        os.environ.pop("T5G_FUSED_ATTN", None)
        os.environ.pop("T5G_MK_STACKED", None)


def _rel(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-9))


def test_megakernel_step_matches_unfused():
    cfg, dims, dec, cache, emb, pos, plens, elens, step = _setup()
    h0, c0 = _run(0, dec, dims, cache, emb, pos, plens, elens, step)
    h3, c3 = _run(3, dec, dims, cache, emb, pos, plens, elens, step)

    # the flush is identical code (outside the mode branch)
    np.testing.assert_array_equal(np.asarray(c0.gen_k), np.asarray(c3.gen_k))
    np.testing.assert_array_equal(np.asarray(c0.gen_v), np.asarray(c3.gen_v))

    # in-flight K/V: same per-row W8A8 quantization, rope in f32 vs bf16
    assert _rel(c3.pending_k, c0.pending_k) < 2e-2
    assert _rel(c3.pending_v, c0.pending_v) < 2e-2

    # hidden: bf16 + per-tile MLP scales vs per-row
    assert np.isfinite(np.asarray(h3, np.float32)).all()
    assert _rel(h3, h0) < 5e-2


def test_megakernel_respects_lengths():
    """Changing K/V beyond the valid prompt/enc lengths must not change the
    megakernel output (the flash masks are per-row exact)."""
    cfg, dims, dec, cache, emb, pos, plens, elens, step = _setup()
    h3, c3 = _run(3, dec, dims, cache, emb, pos, plens, elens, step)

    poison = cache._replace(
        prompt_k=cache.prompt_k.at[:, :, 5:, :].set(99.0),
        prompt_v=cache.prompt_v.at[:, :, 5:, :].set(-99.0),
        cross_k=cache.cross_k.at[:, :, 7:, :].set(77.0),
        cross_v=cache.cross_v.at[:, :, 7:, :].set(-77.0),
        gen_k=cache.gen_k.at[:, :, int(step):, :].set(55.0),
        gen_v=cache.gen_v.at[:, :, int(step):, :].set(-55.0),
    )
    hp, cp = _run(3, dec, dims, poison, emb, pos, plens, elens, step)
    np.testing.assert_allclose(np.asarray(hp, np.float32),
                               np.asarray(h3, np.float32), atol=1e-5)


def test_megakernel_multistep_chain():
    """Three chained steps (flush + attend + new pending each time) stay in
    agreement with the unfused path."""
    cfg, dims, dec, cache, emb, pos, plens, elens, step = _setup()
    c0 = c3 = cache
    h0 = h3 = None
    for i in range(3):
        h0, c0 = _run(0, dec, dims, c0, emb, pos, plens, elens,
                      step + i)
        h3, c3 = _run(3, dec, dims, c3, emb, pos, plens, elens,
                      step + i)
    assert _rel(h3, h0) < 8e-2
    assert _rel(c3.pending_k, c0.pending_k) < 3e-2
    assert _rel(c3.gen_k, c0.gen_k) < 3e-2


def test_megakernel_batch_one():
    cfg, dims, dec, cache, emb, pos, plens, elens, step = _setup(b=1)
    h0, _ = _run(0, dec, dims, cache, emb, pos, plens, elens, step)
    h3, _ = _run(3, dec, dims, cache, emb, pos, plens, elens, step)
    assert _rel(h3, h0) < 5e-2


def _setup_i8(b=2, step=5, seed=0):
    """Same fixture but with an int8 paged cache (per-token scale planes):
    quantize bf16 random content through ops/fused_attn.quantize_kv so the
    mode-0 two-kernel path and the megakernel dequantize IDENTICAL data."""
    from t5gemma_tts_tpu.ops.fused_attn import quantize_kv

    cfg = tiny_voice_config()
    dims = dataclasses.replace(cfg.backbone.decoder, sliding_window=4096)
    params = voice.init_params(jax.random.PRNGKey(seed), cfg)
    params = t5gemma.fuse_for_decode(params)
    params = quantize_params_for_decode(params, streaming_tiled=True)
    dec = params["decoder"]

    cache = t5gemma.init_paged_cache(dims, b, 5, 6, 7,
                                     store_dtype=jnp.int8)

    def qfill(x, k):
        vals = jax.random.normal(jax.random.PRNGKey(k), x.shape,
                                 jnp.float32) * 0.5
        return quantize_kv(vals)

    pk, pks = qfill(cache.prompt_k, 1)
    pv, pvs = qfill(cache.prompt_v, 2)
    gk, gks = qfill(cache.gen_k, 3)
    gv, gvs = qfill(cache.gen_v, 4)
    xk, xks = qfill(cache.cross_k, 5)
    xv, xvs = qfill(cache.cross_v, 6)

    def fill(x, k):
        return (jax.random.normal(jax.random.PRNGKey(k), x.shape,
                                  jnp.float32) * 0.5).astype(x.dtype)

    cache = cache._replace(
        prompt_k=pk, prompt_v=pv, gen_k=gk, gen_v=gv,
        cross_k=xk, cross_v=xv,
        prompt_k_scale=pks, prompt_v_scale=pvs,
        gen_k_scale=gks, gen_v_scale=gvs,
        cross_k_scale=xks, cross_v_scale=xvs,
        pending_k=fill(cache.pending_k, 7),
        pending_v=fill(cache.pending_v, 8),
    )

    rng = np.random.default_rng(seed)
    emb = jnp.asarray(rng.normal(size=(b, 1, dims.hidden_size)) * 0.3,
                      jnp.bfloat16)
    pos = jnp.asarray(rng.uniform(0, 100, (b, 1)), jnp.float32)
    plens = jnp.asarray([3, 5][:b], jnp.int32)
    elens = jnp.asarray([7, 2][:b], jnp.int32)
    return cfg, dims, dec, cache, emb, pos, plens, elens, jnp.int32(step)


def test_megakernel_int8_kv_matches_unfused():
    """int8 pages + staged per-token scale slabs: the megakernel's
    dequant-at-the-logits math (q.(k8*s) = s*(q.k8); sum p*(v8*s) =
    sum (p*s)*v8) must agree with the two-kernel paged_i8 path on the
    SAME quantized cache."""
    cfg, dims, dec, cache, emb, pos, plens, elens, step = _setup_i8()
    h0, c0 = _run(0, dec, dims, cache, emb, pos, plens, elens, step)
    h3, c3 = _run(3, dec, dims, cache, emb, pos, plens, elens, step)

    assert np.isfinite(np.asarray(h3, np.float32)).all()
    assert _rel(h3, h0) < 5e-2
    assert _rel(c3.pending_k, c0.pending_k) < 2e-2
    assert _rel(c3.pending_v, c0.pending_v) < 2e-2


def test_megakernel_int8_kv_respects_lengths():
    """Poisoning int8 pages AND scale planes beyond the valid lengths must
    not change the megakernel output."""
    cfg, dims, dec, cache, emb, pos, plens, elens, step = _setup_i8()
    h3, _ = _run(3, dec, dims, cache, emb, pos, plens, elens, step)

    poison = cache._replace(
        prompt_k=cache.prompt_k.at[:, :, 5:, :].set(99),
        prompt_v=cache.prompt_v.at[:, :, 5:, :].set(-99),
        prompt_k_scale=cache.prompt_k_scale.at[:, :, 5:].set(37.0),
        prompt_v_scale=cache.prompt_v_scale.at[:, :, 5:].set(53.0),
        cross_k=cache.cross_k.at[:, :, 7:, :].set(77),
        cross_v=cache.cross_v.at[:, :, 7:, :].set(-77),
        cross_k_scale=cache.cross_k_scale.at[:, :, 7:].set(19.0),
        cross_v_scale=cache.cross_v_scale.at[:, :, 7:].set(23.0),
        gen_k=cache.gen_k.at[:, :, int(step):, :].set(55),
        gen_v=cache.gen_v.at[:, :, int(step):, :].set(-55),
        gen_k_scale=cache.gen_k_scale.at[:, :, int(step):].set(41.0),
        gen_v_scale=cache.gen_v_scale.at[:, :, int(step):].set(43.0),
    )
    hp, _ = _run(3, dec, dims, poison, emb, pos, plens, elens, step)
    np.testing.assert_allclose(np.asarray(hp, np.float32),
                               np.asarray(h3, np.float32), atol=1e-5)


def _setup_w4(b=2, step=5, seed=0):
    """lanes4 int4 weights (the batch-1 latency mode). Mode 0 runs the
    SAME Lanes4Weight params through q_matmul's exact XLA lanes4 dispatch,
    so kernel-vs-unfused tolerances stay at activation-quant level — the
    int4 weight error is common to both sides."""
    cfg = tiny_voice_config()
    dims = dataclasses.replace(cfg.backbone.decoder, sliding_window=4096)
    params = voice.init_params(jax.random.PRNGKey(seed), cfg)
    params = t5gemma.fuse_for_decode(params)
    params = quantize_params_for_decode(params, streaming_tiled=True,
                                        weight_bits=4)
    dec = params["decoder"]

    from t5gemma_tts_tpu.ops.megakernel import supports, uses_w4
    assert uses_w4(dec["layers"])
    cache = t5gemma.init_paged_cache(dims, b, 5, 6, 7)
    assert supports(dec["layers"], dims, cache)

    def fill(x, k):
        if x is None:
            return None
        return (jax.random.normal(jax.random.PRNGKey(k), x.shape,
                                  jnp.float32) * 0.5).astype(x.dtype)

    cache = cache._replace(
        prompt_k=fill(cache.prompt_k, 1), prompt_v=fill(cache.prompt_v, 2),
        gen_k=fill(cache.gen_k, 3), gen_v=fill(cache.gen_v, 4),
        cross_k=fill(cache.cross_k, 5), cross_v=fill(cache.cross_v, 6),
        pending_k=fill(cache.pending_k, 7),
        pending_v=fill(cache.pending_v, 8),
    )

    rng = np.random.default_rng(seed)
    emb = jnp.asarray(rng.normal(size=(b, 1, dims.hidden_size)) * 0.3,
                      jnp.bfloat16)
    pos = jnp.asarray(rng.uniform(0, 100, (b, 1)), jnp.float32)
    plens = jnp.asarray([3, 5][:b], jnp.int32)
    elens = jnp.asarray([7, 2][:b], jnp.int32)
    return cfg, dims, dec, cache, emb, pos, plens, elens, jnp.int32(step)


def test_megakernel_w4_matches_unfused():
    cfg, dims, dec, cache, emb, pos, plens, elens, step = _setup_w4()
    h0, c0 = _run(0, dec, dims, cache, emb, pos, plens, elens, step)
    h3, c3 = _run(3, dec, dims, cache, emb, pos, plens, elens, step)

    np.testing.assert_array_equal(np.asarray(c0.gen_k), np.asarray(c3.gen_k))
    assert _rel(c3.pending_k, c0.pending_k) < 2e-2
    assert _rel(c3.pending_v, c0.pending_v) < 2e-2
    assert np.isfinite(np.asarray(h3, np.float32)).all()
    assert _rel(h3, h0) < 5e-2


def test_megakernel_w4_respects_lengths():
    cfg, dims, dec, cache, emb, pos, plens, elens, step = _setup_w4()
    h3, _ = _run(3, dec, dims, cache, emb, pos, plens, elens, step)
    poison = cache._replace(
        prompt_k=cache.prompt_k.at[:, :, 5:, :].set(99.0),
        cross_v=cache.cross_v.at[:, :, 7:, :].set(-77.0),
        gen_k=cache.gen_k.at[:, :, int(step):, :].set(55.0),
    )
    hp, _ = _run(3, dec, dims, poison, emb, pos, plens, elens, step)
    np.testing.assert_allclose(np.asarray(hp, np.float32),
                               np.asarray(h3, np.float32), atol=1e-5)


def test_megakernel_w4_batch_one():
    cfg, dims, dec, cache, emb, pos, plens, elens, step = _setup_w4(b=1)
    h0, _ = _run(0, dec, dims, cache, emb, pos, plens, elens, step)
    h3, _ = _run(3, dec, dims, cache, emb, pos, plens, elens, step)
    assert _rel(h3, h0) < 5e-2


def test_megakernel_w4_with_int8_kv():
    """The bench latency config combines lanes4 int4 WEIGHTS with int8 KV
    pages — the two kernel features are independent (weight streams vs
    slab attention) but must compose."""
    from t5gemma_tts_tpu.ops.fused_attn import quantize_kv

    cfg = tiny_voice_config()
    dims = dataclasses.replace(cfg.backbone.decoder, sliding_window=4096)
    params = voice.init_params(jax.random.PRNGKey(0), cfg)
    params = t5gemma.fuse_for_decode(params)
    params = quantize_params_for_decode(params, streaming_tiled=True,
                                        weight_bits=4)
    dec = params["decoder"]
    b = 2
    cache = t5gemma.init_paged_cache(dims, b, 5, 6, 7, store_dtype=jnp.int8)

    def qfill(x, k):
        vals = jax.random.normal(jax.random.PRNGKey(k), x.shape,
                                 jnp.float32) * 0.5
        return quantize_kv(vals)

    pk, pks = qfill(cache.prompt_k, 1)
    pv, pvs = qfill(cache.prompt_v, 2)
    gk, gks = qfill(cache.gen_k, 3)
    gv, gvs = qfill(cache.gen_v, 4)
    xk, xks = qfill(cache.cross_k, 5)
    xv, xvs = qfill(cache.cross_v, 6)

    def fill(x, k):
        return (jax.random.normal(jax.random.PRNGKey(k), x.shape,
                                  jnp.float32) * 0.5).astype(x.dtype)

    cache = cache._replace(
        prompt_k=pk, prompt_v=pv, gen_k=gk, gen_v=gv,
        cross_k=xk, cross_v=xv,
        prompt_k_scale=pks, prompt_v_scale=pvs,
        gen_k_scale=gks, gen_v_scale=gvs,
        cross_k_scale=xks, cross_v_scale=xvs,
        pending_k=fill(cache.pending_k, 7),
        pending_v=fill(cache.pending_v, 8),
    )
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.normal(size=(b, 1, dims.hidden_size)) * 0.3,
                      jnp.bfloat16)
    pos = jnp.asarray(rng.uniform(0, 100, (b, 1)), jnp.float32)
    plens = jnp.asarray([3, 5], jnp.int32)
    elens = jnp.asarray([7, 2], jnp.int32)
    step = jnp.int32(5)

    h0, c0 = _run(0, dec, dims, cache, emb, pos, plens, elens, step)
    h3, c3 = _run(3, dec, dims, cache, emb, pos, plens, elens, step)
    assert np.isfinite(np.asarray(h3, np.float32)).all()
    assert _rel(h3, h0) < 5e-2
    assert _rel(c3.pending_k, c0.pending_k) < 2e-2


def _run_stacked(dec, dims, cache, emb, pos, plens, elens, step):
    os.environ["T5G_FUSED_ATTN"] = "3"
    os.environ["T5G_MK_STACKED"] = "1"
    try:
        return t5gemma.paged_decode_step(
            dec, dims, inputs_embeds=emb, position_ids=pos,
            pm_decoder_positions=pos, cache=cache, step=step,
            prompt_lengths=plens, enc_lengths=elens)
    finally:
        os.environ.pop("T5G_FUSED_ATTN", None)
        os.environ.pop("T5G_MK_STACKED", None)


def test_stacked_matches_scan():
    """decode_stack (whole stack in ONE pallas grid, h carried in the
    revisited hout block) is the SAME math as scanning decode_layer:
    outputs must agree bit-level in interpreter mode."""
    cfg, dims, dec, cache, emb, pos, plens, elens, step = _setup()
    h3, c3 = _run(3, dec, dims, cache, emb, pos, plens, elens, step)
    hs, cs = _run_stacked(dec, dims, cache, emb, pos, plens, elens, step)
    np.testing.assert_array_equal(np.asarray(hs, np.float32),
                                  np.asarray(h3, np.float32))
    np.testing.assert_array_equal(np.asarray(cs.pending_k, np.float32),
                                  np.asarray(c3.pending_k, np.float32))
    np.testing.assert_array_equal(np.asarray(cs.pending_v, np.float32),
                                  np.asarray(c3.pending_v, np.float32))
    np.testing.assert_array_equal(np.asarray(cs.gen_k), np.asarray(c3.gen_k))


def test_stacked_matches_scan_int8_kv():
    """Stacked mode over int8 pages + staged per-token scale slabs."""
    cfg, dims, dec, cache, emb, pos, plens, elens, step = _setup_i8()
    h3, c3 = _run(3, dec, dims, cache, emb, pos, plens, elens, step)
    hs, cs = _run_stacked(dec, dims, cache, emb, pos, plens, elens, step)
    np.testing.assert_array_equal(np.asarray(hs, np.float32),
                                  np.asarray(h3, np.float32))
    np.testing.assert_array_equal(np.asarray(cs.pending_k, np.float32),
                                  np.asarray(c3.pending_k, np.float32))


def test_stacked_multistep_chain():
    """Three chained stacked steps track the scan path exactly."""
    cfg, dims, dec, cache, emb, pos, plens, elens, step = _setup()
    c3 = cs = cache
    h3 = hs = None
    for i in range(3):
        h3, c3 = _run(3, dec, dims, c3, emb, pos, plens, elens, step + i)
        hs, cs = _run_stacked(dec, dims, cs, emb, pos, plens, elens,
                              step + i)
    np.testing.assert_array_equal(np.asarray(hs, np.float32),
                                  np.asarray(h3, np.float32))
    np.testing.assert_array_equal(np.asarray(cs.gen_k), np.asarray(c3.gen_k))


def test_stacked_matches_scan_w4():
    """Stacked mode with lanes4 int4 weights (the b1 latency config)."""
    cfg, dims, dec, cache, emb, pos, plens, elens, step = _setup_w4()
    h3, c3 = _run(3, dec, dims, cache, emb, pos, plens, elens, step)
    hs, cs = _run_stacked(dec, dims, cache, emb, pos, plens, elens, step)
    np.testing.assert_array_equal(np.asarray(hs, np.float32),
                                  np.asarray(h3, np.float32))
    np.testing.assert_array_equal(np.asarray(cs.pending_k, np.float32),
                                  np.asarray(c3.pending_k, np.float32))


# ---------------------------------------------------------------------------
# (k+1)-token speculative verify pass through the megakernel chain mode
# (VERDICT r4 next #4): paged_decode_multi dispatches to decode_stack/
# decode_layer with chain=S when the weights are fused-quantized.
# ---------------------------------------------------------------------------


def _multi_inputs(dims, b, s_len, seed=11):
    rng = np.random.default_rng(seed)
    emb = jnp.asarray(rng.normal(size=(b, s_len, dims.hidden_size)) * 0.3,
                      jnp.bfloat16)
    pos = jnp.asarray(
        np.sort(rng.uniform(0, 100, (b, s_len)), axis=1), jnp.float32)
    pend_k = jnp.asarray(
        rng.normal(size=(dims.num_layers, b, s_len, dims.num_kv_heads,
                         dims.head_dim)) * 0.4, jnp.bfloat16)
    pend_v = jnp.asarray(
        rng.normal(size=pend_k.shape) * 0.4, jnp.bfloat16)
    return emb, pos, pend_k, pend_v


def _run_multi(mode, dec, dims, cache, emb, pos, pend_k, pend_v,
               flush_start, step, plens, elens):
    if mode is None:
        os.environ.pop("T5G_FUSED_ATTN", None)
    else:
        os.environ["T5G_FUSED_ATTN"] = str(mode)
    os.environ["T5G_MK_STACKED"] = "0"
    try:
        return t5gemma.paged_decode_multi(
            dec, dims, inputs_embeds=emb, position_ids=pos,
            pm_decoder_positions=pos, cache=cache,
            pending_k=pend_k, pending_v=pend_v,
            flush_start=jnp.int32(flush_start), step=step,
            prompt_lengths=plens, enc_lengths=elens)
    finally:
        os.environ.pop("T5G_FUSED_ATTN", None)
        os.environ.pop("T5G_MK_STACKED", None)


def test_chain_verify_matches_unfused_multi():
    """megakernel chain verify pass (bf16 pages) vs the unfused
    paged_decode_multi on the same quantized weights: same semantics,
    quantized-path tolerance (the same bar as the 1-token kernel)."""
    s_len = 3
    cfg, dims, dec, cache, _, _, plens, elens, step = _setup()
    emb, pos, pend_k, pend_v = _multi_inputs(dims, 2, s_len)

    h0, c0, ck0, cv0 = _run_multi(None, dec, dims, cache, emb, pos,
                                  pend_k, pend_v, 2, step, plens, elens)
    h3, c3, ck3, cv3 = _run_multi(3, dec, dims, cache, emb, pos,
                                  pend_k, pend_v, 2, step, plens, elens)
    assert np.isfinite(np.asarray(h3, np.float32)).all()
    assert _rel(h3, h0) < 5e-2
    assert _rel(ck3, ck0) < 2e-2
    assert _rel(cv3, cv0) < 2e-2
    # both paths flushed the same pending block
    np.testing.assert_array_equal(np.asarray(c3.gen_k), np.asarray(c0.gen_k))


def test_chain_verify_stacked_matches_scan():
    """chain mode through decode_stack (one launch) must bit-match the
    decode_layer chain scan (same math, grid-carried h)."""
    s_len = 3
    cfg, dims, dec, cache, _, _, plens, elens, step = _setup()
    emb, pos, pend_k, pend_v = _multi_inputs(dims, 2, s_len)

    os.environ["T5G_FUSED_ATTN"] = "3"
    try:
        os.environ["T5G_MK_STACKED"] = "0"
        h_scan, _, ck_s, cv_s = t5gemma.paged_decode_multi(
            dec, dims, inputs_embeds=emb, position_ids=pos,
            pm_decoder_positions=pos, cache=cache,
            pending_k=pend_k, pending_v=pend_v,
            flush_start=jnp.int32(2), step=step,
            prompt_lengths=plens, enc_lengths=elens)
        os.environ["T5G_MK_STACKED"] = "1"
        h_stk, _, ck_k, cv_k = t5gemma.paged_decode_multi(
            dec, dims, inputs_embeds=emb, position_ids=pos,
            pm_decoder_positions=pos, cache=cache,
            pending_k=pend_k, pending_v=pend_v,
            flush_start=jnp.int32(2), step=step,
            prompt_lengths=plens, enc_lengths=elens)
    finally:
        os.environ.pop("T5G_FUSED_ATTN", None)
        os.environ.pop("T5G_MK_STACKED", None)
    np.testing.assert_array_equal(np.asarray(h_stk, np.float32),
                                  np.asarray(h_scan, np.float32))
    np.testing.assert_array_equal(np.asarray(ck_k, np.float32),
                                  np.asarray(ck_s, np.float32))


def test_chain_verify_causality():
    """Chain position i must not depend on later drafts: corrupting
    embeddings at positions > i leaves hidden[:, :i+1] unchanged."""
    s_len = 3
    cfg, dims, dec, cache, _, _, plens, elens, step = _setup()
    emb, pos, pend_k, pend_v = _multi_inputs(dims, 2, s_len)

    h3, _, _, _ = _run_multi(3, dec, dims, cache, emb, pos,
                             pend_k, pend_v, 2, step, plens, elens)
    emb_bad = emb.at[:, 2, :].set(9.0)
    hb, _, _, _ = _run_multi(3, dec, dims, cache, emb_bad, pos,
                             pend_k, pend_v, 2, step, plens, elens)
    np.testing.assert_array_equal(np.asarray(hb[:, :2], np.float32),
                                  np.asarray(h3[:, :2], np.float32))


def test_chain_verify_int8_kv():
    """int8-KV chain verify (megakernel-only path): must agree with the
    unfused bf16 chain on a dequantized twin cache, and the flush must
    write quantized blocks + scale planes."""
    s_len = 3
    cfg, dims, dec, cache, _, _, plens, elens, step = _setup_i8()
    emb, pos, pend_k, pend_v = _multi_inputs(dims, 2, s_len)

    # quant path (mk forced by the int8 cache)
    h8, c8, ck8, cv8 = _run_multi(None, dec, dims, cache, emb, pos,
                                  pend_k, pend_v, 2, step, plens, elens)
    assert np.isfinite(np.asarray(h8, np.float32)).all()
    # scale planes were written for the flushed block
    assert c8.gen_k_scale is not None
    assert not np.allclose(
        np.asarray(c8.gen_k_scale[:, :, 2:2 + s_len]),
        np.asarray(cache.gen_k_scale[:, :, 2:2 + s_len]))

    # bf16 twin: dequantize the int8 pages into a bf16 cache
    def deq(x, s):
        return (x.astype(jnp.float32) * s[..., None]).astype(jnp.bfloat16)

    bf = t5gemma.init_paged_cache(dims, 2, 5, 6, 7)
    bf = bf._replace(
        prompt_k=deq(cache.prompt_k, cache.prompt_k_scale),
        prompt_v=deq(cache.prompt_v, cache.prompt_v_scale),
        gen_k=deq(cache.gen_k, cache.gen_k_scale),
        gen_v=deq(cache.gen_v, cache.gen_v_scale),
        cross_k=deq(cache.cross_k, cache.cross_k_scale),
        cross_v=deq(cache.cross_v, cache.cross_v_scale),
        pending_k=cache.pending_k, pending_v=cache.pending_v)
    hb, _, ckb, cvb = _run_multi(None, dec, dims, bf, emb, pos,
                                 pend_k, pend_v, 2, step, plens, elens)
    assert _rel(h8, hb) < 8e-2
    assert _rel(ck8, ckb) < 2e-2
