"""Marginal breakdown of the CONTINUOUS decode body at serving dims.

The continuous step measured 8.35 ms at 16 slots vs 5.01 ms windowed
(batch 16, paged_i8) — this probe isolates where the extra ~3.3 ms lives:

  decode_rc   paged_decode_step with PER-ROW clocks (rowclock flush: B
              unrolled dynamic-update-slices + per-row glens)
  decode_sc   same step with the windowed SCALAR clock (one contiguous
              flush) — the delta is the rowclock tax
  head+samp   predict head + per-row vmapped guarded sampling
              (_sample_rows) — vs the windowed batched sample_step_token

Timing is marginal over in-jit chained loops (dispatch on the tunneled
axon terminal costs ~5-12 ms and would swamp per-step times otherwise).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_continuous_parts.py
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=16)
    ap.add_argument("--text", type=int, default=64)
    ap.add_argument("--prompt", type=int, default=128)
    ap.add_argument("--frames", type=int, default=384)
    ap.add_argument("--iters", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from t5gemma_tts_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from t5gemma_tts_tpu.config import (
        DecodeConfig, VoiceConfig, backbone_preset,
    )
    from t5gemma_tts_tpu.decode import continuous, engine
    from t5gemma_tts_tpu.models import t5gemma, voice
    from t5gemma_tts_tpu.ops import rope as rope_ops
    from t5gemma_tts_tpu.ops.quant import quantize_params_for_decode

    cfg = VoiceConfig(backbone=backbone_preset("2b-2b"))
    dcfg = DecodeConfig(top_k=30, top_p=0.9, temperature=0.8,
                        max_frames=args.frames, kv_cache="auto")
    dims = cfg.backbone.decoder
    params = jax.jit(lambda k: voice.init_params(k, cfg))(jax.random.PRNGKey(0))
    params = jax.jit(t5gemma.fuse_for_decode, donate_argnums=0)(params)
    params = jax.jit(quantize_params_for_decode, donate_argnums=0)(params)
    jax.block_until_ready(params)

    b = args.slots
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

    def timed(fn, *a):
        # sync via an actual device->host read: on the tunneled axon backend
        # block_until_ready can return before the program runs (measured:
        # 0.06 ms for a 128-iteration decode loop), which zeroes every
        # marginal. Same trick as tools/microbench_step.run_timed.
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

    # ---- decode step: rowclock vs scalar clock -------------------------
    # params/state ship as jit ARGUMENTS (closure capture bakes the 2.3 GB
    # param tree into the lowering as constants -> glacial compiles)
    def make_decode(rowclock):
        def make(iters):
            @jax.jit
            def loop(params, st, emb0, cache):
                pos = rope_ops.decode_step_position(
                    st.current_length, st.target_totals,
                    cfg.progress_scale)[:, None]
                kw = {}
                if rowclock:
                    kw = dict(gen_lengths=st.steps,
                              flush_positions=jnp.maximum(st.steps - 1, 0))

                def body(i, c):
                    _, c = t5gemma.paged_decode_step(
                        params["decoder"], dims, inputs_embeds=emb0,
                        position_ids=pos, pm_decoder_positions=pos,
                        cache=c, step=jnp.int32(8) + i,
                        prompt_lengths=st.prompt_lens + 1,
                        enc_lengths=st.x_lens, **kw)
                    return c
                c = jax.lax.fori_loop(0, iters, body, cache)
                # return a TINY value: the sync in timed() transfers leaf 0
                # to host, and a multi-hundred-MB cache leaf over the axon
                # tunnel adds seconds of noise that swamps the marginal
                return (jnp.sum(c.pending_k.astype(jnp.float32))
                        + jnp.sum(c.gen_k[..., -1:, :].astype(jnp.float32)))
            return loop
        return make

    d_rc = marginal(make_decode(True), params, state, emb0, state.cache)
    d_sc = marginal(make_decode(False), params, state, emb0, state.cache)

    # ---- head + per-row sampling vs batched sampling --------------------
    def make_head(per_row):
        def make(iters):
            @jax.jit
            def loop(params, st, hid):
                def body(i, h):
                    logits = voice.predict_head(params["head"], h)[:, 0]
                    if per_row:
                        tok, _ = continuous._sample_rows(
                            cfg, dcfg, logits, st.steps,
                            st.prev_token, st.consec_silence,
                            st.rngs)
                    else:
                        tok, _ = engine.sample_step_token(
                            cfg, dcfg, logits, jnp.int32(8),
                            st.prev_token, st.consec_silence,
                            jax.random.PRNGKey(3))
                    emb = voice.embed_audio(params, tok[:, None]).astype(
                        compute_dtype)
                    return h + emb * 1e-6
                return jax.lax.fori_loop(0, iters, body, hid)
            return loop
        return make

    h_row = marginal(make_head(True), params, state, state.last_hidden)
    h_bat = marginal(make_head(False), params, state, state.last_hidden)

    print(f"slots={b} prompt={args.prompt} frames={args.frames} "
          f"cache={continuous.resolve_cache_mode(cfg, dcfg, args.prompt)}")
    print(f"decode step rowclock : {d_rc*1e3:.2f} ms")
    print(f"decode step scalar   : {d_sc*1e3:.2f} ms  "
          f"(rowclock tax {max(d_rc-d_sc,0)*1e3:.2f} ms)")
    print(f"head + per-row sample: {h_row*1e3:.2f} ms")
    print(f"head + batched sample: {h_bat*1e3:.2f} ms  "
          f"(per-row tax {max(h_row-h_bat,0)*1e3:.2f} ms)")
    print(f"sum (rowclock + row-sample): {(d_rc+h_row)*1e3:.2f} ms "
          f"vs measured segment 8.35 ms")


if __name__ == "__main__":
    main()
