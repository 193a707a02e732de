"""Decompose the windowed paged decode step (megakernel path) at serving dims.

probe_continuous_parts showed the 64-slot step costs ~10.1 ms with BOTH
per-row and scalar clocks (rowclock tax = 0), while the standalone
megakernel scan prices layers at ~0.316 ms x 26 = 8.2 ms. This probe
splits the remaining ~1.9 ms of STEP GLUE:

  layers    lax.scan of mk.decode_layer over 26 layers, fixed slabs
            (no flush, no final norm, no embed/pos)
  flush     the pending-K/V flush alone (scalar clock: 2 contiguous DUS)
  fullstep  t5gemma.paged_decode_step (flush + layers + final norm)

All three stages hold the step clock CONSTANT at glens=8 (the full-step
loop re-flushes the same slot every iteration), so every stage measures
the same attention geometry and the reported glue residual
(t_full - t_layers - t_flush - t_norm) is not biased by a growing
generation length.

The probe characterizes the bf16 paged path (kv_cache="auto" resolves to
bf16 pages on TPU), NOT the paged_i8 serving-headline config; it requires
a TPU backend (asserted at startup — off-TPU "auto" resolves to a dense
cache and the cache has no gen_k slabs).

Timing is marginal over in-jit chained loops (axon dispatch ~5-12 ms).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_step_parts.py
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--text", type=int, default=64)
    ap.add_argument("--prompt", type=int, default=128)
    ap.add_argument("--frames", type=int, default=384)
    ap.add_argument("--iters", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from t5gemma_tts_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from t5gemma_tts_tpu.config import DecodeConfig, VoiceConfig, backbone_preset
    from t5gemma_tts_tpu.decode import continuous
    from t5gemma_tts_tpu.models import t5gemma, voice
    from t5gemma_tts_tpu.ops import megakernel as mk
    from t5gemma_tts_tpu.ops import rope as rope_ops
    from t5gemma_tts_tpu.ops.quant import quantize_params_for_decode

    assert jax.default_backend() == "tpu", (
        "probe_step_parts measures the TPU paged megakernel path; off-TPU "
        "kv_cache='auto' resolves to a dense cache (no gen_k slabs) and "
        "make_full would fail opaquely")

    cfg = VoiceConfig(backbone=backbone_preset("2b-2b"))
    dcfg = DecodeConfig(top_k=30, top_p=0.9, temperature=0.8,
                        max_frames=args.frames, kv_cache="auto")
    dims = cfg.backbone.decoder
    params = jax.jit(lambda k: voice.init_params(k, cfg))(jax.random.PRNGKey(0))
    params = jax.jit(t5gemma.fuse_for_decode, donate_argnums=0)(params)
    params = jax.jit(quantize_params_for_decode, donate_argnums=0)(params)
    jax.block_until_ready(params)

    b = args.batch
    state = continuous.init_slots(cfg, dcfg, b, args.text, args.prompt)
    rng = np.random.default_rng(0)
    fns = continuous.make_fns(cfg, dcfg)
    for i in range(b):
        x = jnp.asarray(rng.integers(3, cfg.text_vocab_size, args.text),
                        jnp.int32)
        p = jnp.asarray(rng.integers(0, cfg.audio_vocab_size, args.prompt),
                        jnp.int32)
        state = fns.admit(params, state, jnp.int32(i), x,
                          jnp.int32(args.text), p, jnp.int32(args.prompt),
                          jnp.int32(args.prompt + args.frames + 100),
                          jax.random.PRNGKey(i))
    state = fns.segment(params, state, jnp.int32(8))
    jax.block_until_ready(state.steps)

    compute_dtype = jnp.dtype(cfg.dtype)
    emb0 = voice.embed_audio(params, state.prev_token[:, None] % 100).astype(
        compute_dtype)
    pos = rope_ops.decode_step_position(
        state.current_length, state.target_totals, cfg.progress_scale)[:, None]

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
        print(f"  [marginal] t1={t1*1e3:.2f} ms  t4={t4*1e3:.2f} ms")
        return max(t4 - t1, 1e-9) / (3 * iters)

    # ---- full step -------------------------------------------------------
    def make_full(iters):
        @jax.jit
        def loop(params, st, emb0, pos, cache):
            def body(i, c):
                # step held CONSTANT (same slot re-flushed) so the attention
                # geometry matches the layers-only stage at glens=8
                _, c = t5gemma.paged_decode_step(
                    params["decoder"], dims, inputs_embeds=emb0,
                    position_ids=pos, pm_decoder_positions=pos,
                    cache=c, step=jnp.int32(8) + i * 0,
                    prompt_lengths=st.prompt_lens + 1,
                    enc_lengths=st.x_lens)
                return c
            c = jax.lax.fori_loop(0, iters, body, cache)
            return (jnp.sum(c.pending_k.astype(jnp.float32))
                    + jnp.sum(c.gen_k[..., -1:, :].astype(jnp.float32)))
        return loop

    # ---- layers-only scan ------------------------------------------------
    cos, sin = rope_ops.rope_cos_sin(pos, dims.head_dim, dims.rope_theta)
    cos1, sin1 = cos[:, 0], sin[:, 0]
    layer_ids = jnp.arange(dims.num_layers)

    def make_layers(iters):
        @jax.jit
        def loop(params, st, h0, cache):
            def body3(carry, li):
                hout, k_new, v_new = mk.decode_layer(
                    params["decoder"]["layers"], dims, h=carry,
                    cos=cos1, sin=sin1, qcos=cos1, qsin=sin1, li=li,
                    plens=(st.prompt_lens + 1).astype(jnp.int32),
                    glens=st.steps.astype(jnp.int32),
                    elens=st.x_lens.astype(jnp.int32),
                    prompt_k=cache.prompt_k, prompt_v=cache.prompt_v,
                    gen_k=cache.gen_k, gen_v=cache.gen_v,
                    cross_k=cache.cross_k, cross_v=cache.cross_v)
                return hout, (k_new, v_new)

            def step(i, h):
                h3, (kn, vn) = jax.lax.scan(body3, h, layer_ids)
                # real (non-constant-folded) dependency on the K/V outputs so
                # the scan's attention writes cannot be dead-code-eliminated
                return h3 + jnp.sum(kn[..., :1].astype(jnp.float32)) * 1e-30
            h = jax.lax.fori_loop(0, iters, step, h0)
            return jnp.sum(h)
        return loop

    # ---- final norm only ---------------------------------------------------
    def make_norm(iters):
        @jax.jit
        def loop(params, h0):
            def step(i, h):
                return t5gemma.rms_norm(h, params["decoder"]["final_norm"],
                                        dims.rms_norm_eps) + 1e-9
            return jax.lax.fori_loop(0, iters, step, h0)
        return loop

    # ---- flush only --------------------------------------------------------
    def make_flush(iters):
        @jax.jit
        def loop(cache, pk, pv):
            hkv_ = dims.num_kv_heads
            n_layers = dims.num_layers

            def step(i, c):
                gk, gv = c
                slot = jnp.maximum(jnp.int32(8) + i - 1, 0)
                blk = pk.transpose(2, 0, 1, 3).reshape(
                    hkv_, -1, 1, dims.head_dim).astype(gk.dtype)
                gk = jax.lax.dynamic_update_slice(gk, blk, (0, 0, slot, 0))
                bv = pv.transpose(2, 0, 1, 3).reshape(
                    hkv_, -1, 1, dims.head_dim).astype(gv.dtype)
                gv = jax.lax.dynamic_update_slice(gv, bv, (0, 0, slot, 0))
                return (gk, gv)
            gk, gv = jax.lax.fori_loop(0, iters, step,
                                       (cache.gen_k, cache.gen_v))
            return jnp.sum(gk[..., -1:, :].astype(jnp.float32))
        return loop

    h0 = emb0[:, 0].astype(jnp.float32)
    t_layers = marginal(make_layers, params, state, h0, state.cache)
    t_flush = marginal(make_flush, state.cache, state.cache.pending_k,
                       state.cache.pending_v)
    t_norm = marginal(make_norm, params, h0)
    t_full = marginal(make_full, params, state, emb0, pos, state.cache)

    print(f"batch={b} prompt={args.prompt} frames={args.frames}")
    print(f"layers scan (26 mk) : {t_layers*1e3:.2f} ms "
          f"({t_layers*1e3/dims.num_layers:.3f} ms/layer)")
    print(f"flush (2 DUS)       : {t_flush*1e3:.2f} ms")
    print(f"final norm          : {t_norm*1e3:.2f} ms")
    print(f"full paged step     : {t_full*1e3:.2f} ms   (glue = "
          f"{(t_full-t_layers-t_flush-t_norm)*1e3:.2f} ms)")


if __name__ == "__main__":
    main()
