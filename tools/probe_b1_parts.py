"""Decompose the batch-1 int4 (lanes4) decode latency (VERDICT r3 next #2).

The b1 5-s utterance p50 is 0.817 s (251 steps x 2.56 ms = 0.64 s of
steps + ~0.17 s unexplained). The step itself runs at ~30% of the HBM
floor (~640 MB of int4 weights + int8 head => ~0.8 ms ideal), so the win
is in finding the non-bandwidth cost, not shaving DMA bytes. This probe
prices each part with marginal in-jit loops (probe_step_parts scheme):

  layers     lax.scan of the w4 megakernel over 26 layers
  fullstep   t5gemma.paged_decode_step (flush + layers + final norm)
  head       voice.predict_head on [1, 1, D] (int8 w1/w2, ~75 MB/step)
  sample     engine.sample_step_token (candidate/approx-top-k path)
  engine     SLOPE of the full decode program between 125- and 250-frame
             targets (true marginal step cost incl. while-loop glue)
  prefill    jitted engine.prefill (the program intercept)
  vocoder    XCodec2 decode of the 251-token utterance

Run serially on the TPU (never two processes):
  python tools/probe_b1_parts.py [--seconds 5] [--iters 64]
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=5.0)
    ap.add_argument("--text", type=int, default=64)
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--weight-bits", type=int, default=4)
    ap.add_argument("--kv", default="auto")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from t5gemma_tts_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from t5gemma_tts_tpu.codec.model import (
        XCodec2Config, decode_code, init_decoder_params,
    )
    from t5gemma_tts_tpu.config import (DecodeConfig, VoiceConfig,
                                        backbone_preset)
    from t5gemma_tts_tpu.decode import engine
    from t5gemma_tts_tpu.models import t5gemma, voice
    from t5gemma_tts_tpu.ops import megakernel as mk
    from t5gemma_tts_tpu.ops import rope as rope_ops
    from t5gemma_tts_tpu.ops.quant import quantize_params_for_decode

    assert jax.default_backend() == "tpu", "b1 probe prices the TPU path"

    cfg = VoiceConfig(backbone=backbone_preset("2b-2b"))
    cfg = dataclasses.replace(cfg, extra_cutoff=0.0)
    dims = cfg.backbone.decoder
    sr = int(cfg.encodec_sr)
    frames = int(sr * args.seconds)
    dcfg = DecodeConfig(top_k=30, top_p=0.9, temperature=0.8,
                        max_frames=frames + sr + 16, kv_cache=args.kv,
                        approx_top_k=True)

    hd = dims.head_dim
    params = jax.jit(lambda k: voice.init_params(k, cfg))(jax.random.PRNGKey(0))
    params = jax.jit(t5gemma.fuse_for_decode, donate_argnums=0)(params)
    params = jax.jit(
        lambda p: quantize_params_for_decode(
            p, weight_bits=args.weight_bits, head_dim=hd),
        donate_argnums=0)(params)
    jax.block_until_ready(params)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(3, min(255000, cfg.text_vocab_size),
                                 (1, args.text)).astype(np.int32))
    x_lens = jnp.full((1,), args.text, jnp.int32)
    prompt = jnp.full((1, 8), cfg.special.pad, jnp.int32)
    prompt_lens = jnp.zeros((1,), jnp.int32)
    key = jax.random.PRNGKey(1)

    def timed(fn, *a):
        def sync(out):
            np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[:2]
        sync(fn(*a))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            sync(fn(*a))
            best = min(best, time.perf_counter() - t0)
        return best

    def marginal(make, *a, iters=args.iters):
        t1 = timed(make(iters), *a)
        t4 = timed(make(4 * iters), *a)
        return max(t4 - t1, 1e-9) / (3 * iters)

    rec = {"metric": "b1_parts", "weight_bits": args.weight_bits,
           "kv": args.kv, "frames": frames,
           "device": str(jax.devices()[0])}

    # ---- full engine program at two target lengths -> slope + intercept ---
    run = engine.jitted_decoder(cfg, dcfg)

    def engine_at(tgt):
        t = jnp.full((1,), tgt, jnp.int32)

        def go():
            out = run(params, x, x_lens, prompt, prompt_lens, t,
                      jax.random.fold_in(key, tgt))
            np.asarray(out.tokens.reshape(-1)[:4])
            return out
        go()
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = go()
            best = min(best, time.perf_counter() - t0)
        return best, int(np.asarray(out.gen_lens)[0])

    t_half, n_half = engine_at(frames // 2)
    t_full, n_full = engine_at(frames)
    step_slope = (t_full - t_half) / max(n_full - n_half, 1)
    rec["engine_full_sec"] = round(t_full, 4)
    rec["engine_half_sec"] = round(t_half, 4)
    rec["engine_step_ms"] = round(step_slope * 1e3, 3)
    rec["engine_intercept_sec"] = round(t_full - step_slope * n_full, 4)

    # ---- prefill alone -----------------------------------------------------
    pf, _ = engine.jitted_segment_fns(cfg, dataclasses.replace(
        dcfg, kv_cache=("paged" if args.kv == "auto" else args.kv)))

    def run_pf():
        st = pf(params, x=x, x_lens=x_lens, prompt=prompt,
                prompt_lens=prompt_lens,
                target_totals=jnp.full((1,), frames, jnp.int32))
        np.asarray(st.prev_token.reshape(-1)[:1])
        return st
    run_pf()
    t0 = time.perf_counter()
    st0 = run_pf()
    rec["prefill_sec"] = round(time.perf_counter() - t0, 4)

    # ---- vocoder over the full utterance ------------------------------------
    ccfg = XCodec2Config()
    cparams = jax.jit(lambda k: init_decoder_params(k, ccfg, jnp.bfloat16))(
        jax.random.PRNGKey(2))
    toks = jnp.asarray(rng.integers(0, ccfg.fsq.codebook_size, (1, frames)),
                       jnp.int32)
    voc = jax.jit(lambda p, c: decode_code(p, ccfg, c))
    rec["vocoder_sec"] = round(timed(voc, cparams, toks), 4)

    # ---- parts: layers scan / full step / head / sampling ------------------
    cache = st0.cache
    paged = isinstance(cache, t5gemma.PagedDecoderCache)
    emb0 = voice.embed_audio(params, st0.prev_token[:, None] % 100).astype(
        jnp.dtype(cfg.dtype))
    pos = rope_ops.decode_step_position(
        st0.current_length, jnp.full((1,), frames, jnp.int32),
        cfg.progress_scale)[:, None]
    h0 = emb0[:, 0].astype(jnp.float32)

    if paged and mk.supports(params["decoder"]["layers"], dims, cache):
        cos, sin = rope_ops.rope_cos_sin(pos, hd, dims.rope_theta)
        cos1, sin1 = cos[:, 0], sin[:, 0]
        layer_ids = jnp.arange(dims.num_layers)

        def make_layers(iters):
            @jax.jit
            def loop(params, st, h0, cache):
                def body3(carry, li):
                    hout, k_new, v_new = mk.decode_layer(
                        params["decoder"]["layers"], dims, h=carry,
                        cos=cos1, sin=sin1, qcos=cos1, qsin=sin1, li=li,
                        plens=prompt_lens + 1,
                        glens=jnp.ones((1,), jnp.int32) * 8,
                        elens=x_lens,
                        prompt_k=cache.prompt_k, prompt_v=cache.prompt_v,
                        gen_k=cache.gen_k, gen_v=cache.gen_v,
                        cross_k=cache.cross_k, cross_v=cache.cross_v)
                    return hout, (k_new, v_new)

                def step(i, h):
                    h3, (kn, vn) = jax.lax.scan(body3, h, layer_ids)
                    return h3 + jnp.sum(kn[..., :1].astype(jnp.float32)) * 1e-30
                h = jax.lax.fori_loop(0, iters, step, h0)
                return jnp.sum(h)
            return loop

        rec["layers_ms"] = round(marginal(
            make_layers, params, st0, h0, cache) * 1e3, 3)

        def make_full(iters):
            @jax.jit
            def loop(params, st, emb0, pos, cache):
                def body(i, c):
                    _, c = t5gemma.paged_decode_step(
                        params["decoder"], dims, inputs_embeds=emb0,
                        position_ids=pos, pm_decoder_positions=pos,
                        cache=c, step=jnp.int32(8) + i * 0,
                        prompt_lengths=prompt_lens + 1,
                        enc_lengths=x_lens)
                    return c
                c = jax.lax.fori_loop(0, iters, body, cache)
                return (jnp.sum(c.pending_k.astype(jnp.float32))
                        + jnp.sum(c.gen_k[..., -1:, :].astype(jnp.float32)))
            return loop

        rec["fullstep_ms"] = round(marginal(
            make_full, params, st0, emb0, pos, cache) * 1e3, 3)

    def make_head(iters):
        @jax.jit
        def loop(params, h):
            def step(i, acc):
                lg = voice.predict_head(
                    params["head"], h + (acc * 1e-30).astype(h.dtype))[:, 0]
                return jnp.sum(lg.astype(jnp.float32)) * 1e-30
            return jax.lax.fori_loop(0, iters, step, jnp.float32(0.0))
        return loop

    rec["head_ms"] = round(marginal(
        make_head, params, st0.last_hidden) * 1e3, 3)

    logits0 = voice.predict_head(params["head"], st0.last_hidden)[:, 0]
    logits0 = jax.block_until_ready(logits0)

    def make_sample(iters):
        @jax.jit
        def loop(logits, prev, consec):
            def step(i, carry):
                tok, acc = carry
                token, _ = engine.sample_step_token(
                    cfg, dcfg, logits + (acc * 1e-30).astype(logits.dtype),
                    i, tok, consec, key)
                return token, jnp.sum(token).astype(jnp.float32) * 1e-30
            tok, acc = jax.lax.fori_loop(
                0, iters, step, (prev, jnp.float32(0.0)))
            return tok
        return loop

    rec["sample_ms"] = round(marginal(
        make_sample, logits0, st0.prev_token,
        jnp.zeros((1,), jnp.int32)) * 1e3, 3)

    parts = rec.get("fullstep_ms", 0) + rec["head_ms"] + rec["sample_ms"]
    rec["parts_sum_ms"] = round(parts, 3)
    rec["glue_ms"] = round(rec["engine_step_ms"] - parts, 3)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
