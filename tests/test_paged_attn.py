"""Paged flash decode-attention: reference math, flash-part merging, and
engine-level equivalence of the paged KV modes vs the dense cache.

The Pallas kernel itself only runs on real TPU hardware (the upstream kernel
has no interpreter path); these tests pin the pure-JAX reference that the
CPU/test path executes and that the kernel was verified against on-chip
(kernel vs reference max |err| ~2e-3 across page-boundary lengths, see
ops/paged_attn.py).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from t5gemma_tts_tpu.config import DecodeConfig, backbone_preset, tiny_voice_config
from t5gemma_tts_tpu.decode import engine
from t5gemma_tts_tpu.models import t5gemma, voice
from t5gemma_tts_tpu.ops import paged_attn


def _dense_softmax_attention(q, k, v, valid, softcap):
    """Oracle: plain masked softmax attention. q [B,H,hd] (pre-scaled),
    k/v [B,Hkv,T,hd] f32, valid [B,T] bool."""
    b, h, hd = q.shape
    hkv = k.shape[1]
    g = h // hkv
    qg = q.reshape(b, hkv, g, hd).astype(np.float64)
    logits = np.einsum("bkgh,bkth->bkgt", qg, np.asarray(k, np.float64))
    if softcap is not None:
        logits = np.tanh(logits / softcap) * softcap
    logits = np.where(valid[:, None, None, :], logits, -np.inf)
    m = logits.max(-1, keepdims=True)
    e = np.exp(logits - m)
    e = np.where(np.isfinite(logits), e, 0.0)
    w = e / e.sum(-1, keepdims=True)
    out = np.einsum("bkgt,bkth->bkgh", w, np.asarray(v, np.float64))
    return out.reshape(b, h, hd)


def _random_case(seed, b=3, hkv=2, g=2, hd=16, t=48, ps=16):
    rng = np.random.default_rng(seed)
    h = hkv * g
    q = rng.normal(size=(b, h, hd)).astype(np.float32) * 0.3
    k = rng.normal(size=(b, hkv, t, hd)).astype(np.float32)
    v = rng.normal(size=(b, hkv, t, hd)).astype(np.float32)
    # pages layout [Hkv, B*PP, ps, hd]
    kp = jnp.asarray(k).swapaxes(0, 1).reshape(hkv, b * (t // ps), ps, hd)
    vp = jnp.asarray(v).swapaxes(0, 1).reshape(hkv, b * (t // ps), ps, hd)
    return q, k, v, kp.astype(jnp.bfloat16), vp.astype(jnp.bfloat16)


def test_paged_reference_matches_dense_softmax():
    q, k, v, kp, vp = _random_case(0)
    lengths = jnp.asarray([1, 17, 48], jnp.int32)
    got = paged_attn.paged_gqa_attention(
        jnp.asarray(q), kp, vp, lengths, attn_logits_soft_cap=50.0,
        out_dtype=jnp.float32)
    valid = np.arange(48)[None, :] < np.asarray(lengths)[:, None]
    want = _dense_softmax_attention(
        q, np.asarray(kp.astype(jnp.float32)).reshape(2, 3, 48, 16).swapaxes(0, 1),
        np.asarray(vp.astype(jnp.float32)).reshape(2, 3, 48, 16).swapaxes(0, 1),
        valid, 50.0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-2, atol=2e-2)


def test_flash_parts_merge_equals_single_softmax():
    """Two key segments + the in-flight token, merged exactly, must equal one
    softmax over the concatenation."""
    q, k, v, kp, vp = _random_case(1)
    b, hkv, t, hd = k.shape[0], k.shape[1], k.shape[2], k.shape[3]
    lengths_a = jnp.asarray([5, 16, 48], jnp.int32)
    lengths_b = jnp.asarray([0, 12, 33], jnp.int32)
    q2, k2, v2, kp2, vp2 = _random_case(2)
    rng = np.random.default_rng(3)
    k_cur = rng.normal(size=(b, hkv, hd)).astype(np.float32)
    v_cur = rng.normal(size=(b, hkv, hd)).astype(np.float32)

    idx = paged_attn.identity_page_indices(b, kp.shape[1] // b)
    part_a = paged_attn.paged_flash_parts(
        jnp.asarray(q), kp, vp, lengths_a, idx, attn_logits_soft_cap=50.0)
    part_b = paged_attn.paged_flash_parts(
        jnp.asarray(q), kp2, vp2, lengths_b, idx, attn_logits_soft_cap=50.0)
    got = paged_attn.merge_attention_parts(
        [part_a, part_b], jnp.asarray(q), jnp.asarray(k_cur),
        jnp.asarray(v_cur), 50.0, jnp.float32)

    # oracle: one softmax over [segment A keys | segment B keys | current]
    kk = np.concatenate([
        np.asarray(kp.astype(jnp.float32)).reshape(hkv, b, t, hd).swapaxes(0, 1),
        np.asarray(kp2.astype(jnp.float32)).reshape(hkv, b, t, hd).swapaxes(0, 1),
        k_cur[:, :, None]], axis=2)
    vv = np.concatenate([
        np.asarray(vp.astype(jnp.float32)).reshape(hkv, b, t, hd).swapaxes(0, 1),
        np.asarray(vp2.astype(jnp.float32)).reshape(hkv, b, t, hd).swapaxes(0, 1),
        v_cur[:, :, None]], axis=2)
    pos = np.arange(2 * t + 1)[None, :]
    valid = ((pos < np.asarray(lengths_a)[:, None])
             | ((pos >= t) & (pos - t < np.asarray(lengths_b)[:, None]))
             | (pos == 2 * t))
    want = _dense_softmax_attention(q, kk, vv, valid, 50.0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-2, atol=2e-2)


def test_flash_parts_empty_segment():
    """lengths == 0 segments contribute nothing (m=-inf, l=0)."""
    q, k, v, kp, vp = _random_case(4)
    b = k.shape[0]
    idx = paged_attn.identity_page_indices(b, kp.shape[1] // b)
    out, m, l = paged_attn.paged_flash_parts(
        jnp.asarray(q), kp, vp, jnp.zeros((b,), jnp.int32), idx,
        attn_logits_soft_cap=50.0)
    assert np.all(np.asarray(l) == 0.0)
    assert np.all(np.isneginf(np.asarray(m)))


def _paged_test_cfg(**over):
    bb = backbone_preset("test")
    bb = dataclasses.replace(
        bb,
        encoder=dataclasses.replace(bb.encoder, sliding_window=512),
        decoder=dataclasses.replace(bb.decoder, sliding_window=512))
    return tiny_voice_config(backbone=bb, dtype="bfloat16", **over)


def _decode_all_modes(cfg, dcfg_kw, seed=7):
    params = voice.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    b = 2
    x = jnp.asarray(rng.integers(3, cfg.text_vocab_size, (b, 12)).astype(np.int32))
    x_lens = jnp.asarray([12, 9], jnp.int32)
    prompt = jnp.asarray(rng.integers(0, cfg.audio_vocab_size, (b, 5)).astype(np.int32))
    prompt_lens = jnp.asarray([5, 3], jnp.int32)
    targets = jnp.asarray([40, 30], jnp.int32)
    key = jax.random.PRNGKey(seed)
    outs = {}
    for mode in ["dense", "paged", "paged_f8"]:
        dcfg = DecodeConfig(kv_cache=mode, **dcfg_kw)
        out = engine.decode_tokens(params, cfg, dcfg, x, x_lens, prompt,
                                   prompt_lens, targets, key)
        outs[mode] = (np.asarray(out.tokens), np.asarray(out.gen_lens))
    return outs


def test_engine_paged_greedy_matches_dense():
    cfg = dataclasses.replace(_paged_test_cfg(), extra_cutoff=0.0)
    outs = _decode_all_modes(
        cfg, dict(top_k=1, top_p=1.0, temperature=1.0, max_frames=48))
    np.testing.assert_array_equal(outs["dense"][0], outs["paged"][0])
    np.testing.assert_array_equal(outs["dense"][1], outs["paged"][1])
    # f8 pages quantize K/V to ~2 decimal digits; greedy traces on a random
    # tiny model stay overwhelmingly aligned but are not bit-pinned
    agree = (outs["dense"][0] == outs["paged_f8"][0]).mean()
    assert agree > 0.8, f"paged_f8 greedy agreement too low: {agree}"


def test_engine_paged_sampled_runs_and_stops():
    cfg = dataclasses.replace(_paged_test_cfg(), extra_cutoff=0.0)
    outs = _decode_all_modes(
        cfg, dict(top_k=8, top_p=0.9, temperature=0.8, max_frames=48))
    for mode, (toks, lens) in outs.items():
        assert toks.shape == (2, 48)
        assert np.all(lens > 0) and np.all(lens <= 48)


def test_engine_paged_i8_matches_dense_mostly():
    """int8 KV cache (per-token scales, in-kernel dequant): greedy decode
    agrees with the dense cache on the overwhelming majority of tokens
    (quantization noise may flip occasional near-ties of a random model)."""
    cfg = dataclasses.replace(_paged_test_cfg(), extra_cutoff=0.0)
    outs = _decode_all_modes(cfg, dict(top_k=1, temperature=1.0,
                                       max_frames=40))
    params = voice.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    b = 2
    x = jnp.asarray(rng.integers(3, cfg.text_vocab_size, (b, 12)).astype(np.int32))
    x_lens = jnp.asarray([12, 9], jnp.int32)
    prompt = jnp.asarray(rng.integers(0, cfg.audio_vocab_size, (b, 5)).astype(np.int32))
    prompt_lens = jnp.asarray([5, 3], jnp.int32)
    targets = jnp.asarray([40, 30], jnp.int32)
    out = engine.decode_tokens(
        params, cfg, DecodeConfig(kv_cache="paged_i8", top_k=1,
                                  temperature=1.0, max_frames=40),
        x, x_lens, prompt, prompt_lens, targets, jax.random.PRNGKey(7))
    agree = (np.asarray(out.tokens) == outs["dense"][0]).mean()
    assert agree > 0.8, f"paged_i8 greedy agreement too low: {agree}"
    assert np.asarray(out.gen_lens).min() > 0


def test_resolve_kv_mode():
    cfg = _paged_test_cfg()  # window 512
    dcfg = DecodeConfig(kv_cache="auto", max_frames=64)
    # CPU backend -> dense
    assert engine.resolve_kv_mode(cfg, dcfg, 16, 64) == "dense"
    # explicit paged ok while it fits
    assert engine.resolve_kv_mode(
        cfg, DecodeConfig(kv_cache="paged"), 16, 64) == "paged"
    # too long for the sliding window -> error
    try:
        engine.resolve_kv_mode(cfg, DecodeConfig(kv_cache="paged"), 16, 4096)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
    # dense always allowed
    assert engine.resolve_kv_mode(
        cfg, DecodeConfig(kv_cache="dense"), 16, 4096) == "dense"


def test_init_paged_cache_shapes():
    dims = _paged_test_cfg().backbone.decoder
    dims = dataclasses.replace(dims, sliding_window=4096)
    cache = t5gemma.init_paged_cache(dims, batch=2, prompt_len=9, gen_len=100,
                                     enc_len=12)
    ps = t5gemma.PAGE_SIZE
    lb = dims.num_layers * 2
    assert cache.prompt_k.shape == (dims.num_kv_heads, lb, ps, dims.head_dim)
    assert cache.gen_k.shape[2] % ps == 0 and cache.gen_k.shape[2] >= 100
    assert cache.cross_k.shape[2] % ps == 0 and cache.cross_k.shape[2] >= 12
    assert cache.pending_k.shape == (dims.num_layers, 2, dims.num_kv_heads,
                                     dims.head_dim)


def test_compile_cache_and_warmup(tmp_path, monkeypatch):
    """enable_persistent_cache is idempotent; pipeline.warmup AOT-compiles
    the requested bucket grid without executing a step."""
    from t5gemma_tts_tpu.utils import compile_cache
    from t5gemma_tts_tpu.inference.pipeline import TTSPipeline

    monkeypatch.setattr(compile_cache, "_enabled_dir", None)
    d = compile_cache.enable_persistent_cache(str(tmp_path / "xla"))
    # the backend may already be initialized from earlier tests — either the
    # directory is applied or the call degrades to None without raising
    assert d is None or d.endswith("xla")
    assert compile_cache.enable_persistent_cache("/elsewhere") == d
    # turn the cache BACK OFF for the rest of the in-process suite:
    # jax.config is process-global, and leaving the cache armed makes later
    # tests (train-CLI e2e) SEGFAULT inside jax's executable serializer
    # (put_executable_and_time — same crash class the conftest
    # T5GEMMA_TTS_COMPILE_CACHE=off guard exists for)
    if d is not None:
        jax.config.update("jax_compilation_cache_dir", None)

    cfg = tiny_voice_config()
    params = voice.init_params(jax.random.PRNGKey(0), cfg)
    pipe = TTSPipeline(params, cfg, text_tokenizer=lambda s: [3, 4, 5],
                       fuse_matmuls=False)
    n = pipe.warmup(batch_sizes=(1,), text_buckets=(32,),
                    prompt_buckets=(64,), frame_buckets=(64,),
                    dcfg=DecodeConfig(max_frames=64))
    assert n == 1
