"""Continuous batching: a request's token stream must be bit-identical no
matter when it joins the resident batch, which slot it lands in, or what
else shares the batch (decode/continuous.py)."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from t5gemma_tts_tpu.config import DecodeConfig, tiny_voice_config
from t5gemma_tts_tpu.decode import continuous

TX, PMAX, B = 12, 6, 4


@pytest.fixture(scope="module")
def setup():
    from t5gemma_tts_tpu.models import voice

    cfg = dataclasses.replace(tiny_voice_config(), extra_cutoff=0.0)
    params = voice.init_params(jax.random.PRNGKey(0), cfg)
    dcfg = DecodeConfig(top_k=8, top_p=0.9, temperature=0.8, max_frames=48)
    fns = continuous.make_fns(cfg, dcfg)
    return cfg, dcfg, params, fns


def _request(seed):
    rng = np.random.default_rng(seed)
    cfg = tiny_voice_config()
    x = np.zeros((TX,), np.int32)
    xl = int(rng.integers(6, TX + 1))
    x[:xl] = rng.integers(3, cfg.text_vocab_size, xl)
    p = np.zeros((PMAX,), np.int32)
    pl = int(rng.integers(0, PMAX + 1))
    p[:pl] = rng.integers(0, cfg.audio_vocab_size, pl)
    tgt = pl + int(rng.integers(15, 35))
    return (jnp.asarray(x), jnp.int32(xl), jnp.asarray(p), jnp.int32(pl),
            jnp.int32(tgt), jax.random.PRNGKey(1000 + seed))


def _run_alone(cfg, dcfg, params, fns, req, slot=0):
    state = continuous.init_slots(cfg, dcfg, B, TX, PMAX)
    state = fns.admit(params, state, jnp.int32(slot), *req)
    for _ in range(10):
        state = fns.segment(params, state, jnp.int32(16))
        state, outs = continuous.harvest(state)
        if outs:
            return outs[0][1]
    raise AssertionError("request did not finish")


def test_join_mid_flight_stream_identical(setup):
    cfg, dcfg, params, fns = setup
    ra, rb, rc = _request(1), _request(2), _request(3)

    solo = {k: _run_alone(cfg, dcfg, params, fns, r)
            for k, r in [("a", ra), ("b", rb), ("c", rc)]}

    # a joins at t0, b two segments later (different slot), c after b
    state = continuous.init_slots(cfg, dcfg, B, TX, PMAX)
    state = fns.admit(params, state, jnp.int32(0), *ra)
    state = fns.segment(params, state, jnp.int32(7))
    state = fns.segment(params, state, jnp.int32(5))
    state = fns.admit(params, state, jnp.int32(2), *rb)
    state = fns.segment(params, state, jnp.int32(9))
    state = fns.admit(params, state, jnp.int32(1), *rc)

    got = {}
    for _ in range(12):
        state = fns.segment(params, state, jnp.int32(16))
        state, outs = continuous.harvest(state)
        for slot, toks in outs:
            name = {0: "a", 2: "b", 1: "c"}[slot]
            got[name] = toks
        if len(got) == 3:
            break
    assert set(got) == {"a", "b", "c"}
    for k in "abc":
        np.testing.assert_array_equal(got[k], solo[k], err_msg=k)


def test_slot_reuse_after_harvest(setup):
    cfg, dcfg, params, fns = setup
    ra, rb = _request(4), _request(5)
    solo_b = _run_alone(cfg, dcfg, params, fns, rb, slot=3)

    state = continuous.init_slots(cfg, dcfg, B, TX, PMAX)
    state = fns.admit(params, state, jnp.int32(3), *ra)
    # run a to completion, free its slot, then reuse the SAME slot for b
    done = False
    for _ in range(10):
        state = fns.segment(params, state, jnp.int32(16))
        state, outs = continuous.harvest(state)
        if outs:
            done = True
            break
    assert done
    state = fns.admit(params, state, jnp.int32(3), *rb)
    for _ in range(10):
        state = fns.segment(params, state, jnp.int32(16))
        state, outs = continuous.harvest(state)
        if outs:
            np.testing.assert_array_equal(outs[0][1], solo_b)
            return
    raise AssertionError("reused slot did not finish")


def test_continuous_server_end_to_end(setup):
    """ContinuousServer: concurrent requests resolve with audio; oversized
    request fails its own future only."""
    from t5gemma_tts_tpu.codec.audio_tokenizer import AudioTokenizer
    from t5gemma_tts_tpu.codec.model import (
        init_decoder_params, tiny_codec_config,
    )
    from t5gemma_tts_tpu.inference.pipeline import Request, TTSPipeline
    from t5gemma_tts_tpu.inference.server import ContinuousServer

    cfg, dcfg, params, _ = setup
    ccfg = tiny_codec_config()
    tok = AudioTokenizer(init_decoder_params(jax.random.PRNGKey(1), ccfg),
                         ccfg)
    pipe = TTSPipeline(params, cfg,
                       lambda t: [3 + (ord(c) % 100) for c in t], tok,
                       fuse_matmuls=False)
    srv = ContinuousServer(pipe, dcfg, slots=4, text_bucket=32,
                           prompt_bucket=8, segment_frames=16)
    try:
        futs = [srv.submit(Request(target_text=f"continuous {i}",
                                   target_duration=0.3))
                for i in range(6)]  # more requests than slots
        bad = srv.submit(Request(target_text="x" * 400,
                                 target_duration=0.3))
        results = [f.result(timeout=600) for f in futs]
        assert all(len(r.gen_frames) > 0 for r in results)
        assert all(r.wav is not None and len(r.wav) > 0 for r in results)
        with pytest.raises(Exception, match="exceeds resident buckets"):
            bad.result(timeout=600)
        assert srv.stats.requests >= 6
    finally:
        srv.close()


def test_empty_state_segment_is_noop(setup):
    cfg, dcfg, params, fns = setup
    state = continuous.init_slots(cfg, dcfg, B, TX, PMAX)
    out = fns.segment(params, state, jnp.int32(8))
    assert not bool(jnp.any(out.active))
    state2, outs = continuous.harvest(out)
    assert outs == []


# ---------------------------------------------------------------------------
# per-row-clock PAGED cache (VERDICT r2 next-round #2)
# ---------------------------------------------------------------------------


def _paged_cfg():
    cfg = dataclasses.replace(tiny_voice_config(), extra_cutoff=0.0)
    dims = dataclasses.replace(cfg.backbone.decoder, sliding_window=4096)
    return dataclasses.replace(
        cfg, backbone=dataclasses.replace(cfg.backbone, decoder=dims))


@pytest.fixture(scope="module")
def psetup():
    from t5gemma_tts_tpu.models import voice

    cfg = _paged_cfg()
    params = voice.init_params(jax.random.PRNGKey(0), cfg)
    dcfg = DecodeConfig(top_k=8, top_p=0.9, temperature=0.8, max_frames=48,
                        kv_cache="paged")
    fns = continuous.make_fns(cfg, dcfg)
    return cfg, dcfg, params, fns


def test_paged_state_uses_paged_cache(psetup):
    from t5gemma_tts_tpu.models import t5gemma as t5g

    cfg, dcfg, params, fns = psetup
    state = continuous.init_slots(cfg, dcfg, B, TX, PMAX)
    assert isinstance(state.cache, t5g.PagedDecoderCache)


def test_paged_join_mid_flight_stream_identical(psetup):
    """Same bit-exactness contract as the dense mode: a request's stream is
    independent of when it joined and what shares the paged batch."""
    cfg, dcfg, params, fns = psetup
    ra, rb, rc = _request(1), _request(2), _request(3)

    solo = {k: _run_alone(cfg, dcfg, params, fns, r)
            for k, r in [("a", ra), ("b", rb), ("c", rc)]}

    state = continuous.init_slots(cfg, dcfg, B, TX, PMAX)
    state = fns.admit(params, state, jnp.int32(0), *ra)
    state = fns.segment(params, state, jnp.int32(7))
    state = fns.admit(params, state, jnp.int32(2), *rb)
    state = fns.segment(params, state, jnp.int32(9))
    state = fns.admit(params, state, jnp.int32(1), *rc)

    got = {}
    for _ in range(12):
        state = fns.segment(params, state, jnp.int32(16))
        state, outs = continuous.harvest(state)
        for slot, toks in outs:
            got[{0: "a", 2: "b", 1: "c"}[slot]] = toks
        if len(got) == 3:
            break
    assert set(got) == {"a", "b", "c"}
    for k in "abc":
        np.testing.assert_array_equal(got[k], solo[k])


def test_paged_greedy_matches_dense_greedy():
    """Greedy traces agree across the dense and per-row-clock paged caches
    (same f32 math, different attention decomposition — argmax stable)."""
    from t5gemma_tts_tpu.models import voice

    cfg = _paged_cfg()
    params = voice.init_params(jax.random.PRNGKey(0), cfg)
    base = DecodeConfig(top_k=1, top_p=1.0, temperature=1.0, max_frames=48)
    req = _request(5)
    outs = {}
    for mode in ("dense", "paged"):
        dcfg = dataclasses.replace(base, kv_cache=mode)
        fns = continuous.make_fns(cfg, dcfg)
        outs[mode] = _run_alone(cfg, dcfg, params, fns, req)
    np.testing.assert_array_equal(outs["paged"], outs["dense"])
