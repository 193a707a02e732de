"""Component breakdown of the paged AR decode step on one TPU chip.

Times (marginal, in-jit — see tools/microbench_matmul.py for why) at the
flagship serving shape:

  step      full paged_decode_step (26 layers) chained through its cache
  attn      the per-layer attention block alone x layers (2 flash segments +
            exact merge + cross attention), chained
  head      prediction head + guarded sampling on [B, vocab]

Run: python tools/microbench_step.py [--batch 64] [--gen 384] [--prompt 128]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def run_timed(loop, *args):
    import jax

    from t5gemma_tts_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    out = loop(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[:2]
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = loop(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[:2]
        best = min(best, time.perf_counter() - t0)
    return best


def marginal(make, *args, iters=32):
    t1 = run_timed(make(iters), *args)
    t4 = run_timed(make(4 * iters), *args)
    return max(t4 - t1, 1e-9) / (3 * iters)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--gen", type=int, default=384, help="gen buffer (padded)")
    ap.add_argument("--prompt", type=int, default=128)
    ap.add_argument("--enc", type=int, default=128)
    ap.add_argument("--fill", type=float, default=0.5,
                    help="fraction of the gen buffer counted as valid")
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--kv", default="bf16", choices=["bf16", "f8", "i8"],
                    help="KV-cache store dtype (paged_i8 adds scale planes)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from t5gemma_tts_tpu.config import DecodeConfig, VoiceConfig, backbone_preset
    from t5gemma_tts_tpu.models import t5gemma, voice
    from t5gemma_tts_tpu.ops import paged_attn
    from t5gemma_tts_tpu.ops.quant import quantize_params_for_decode
    from t5gemma_tts_tpu.decode import engine

    cfg = VoiceConfig(backbone=backbone_preset("2b-2b"))
    dims = cfg.backbone.decoder
    b = args.batch
    params = jax.jit(lambda k: voice.init_params(k, cfg))(jax.random.PRNGKey(0))
    params = jax.jit(t5gemma.fuse_for_decode, donate_argnums=0)(params)
    params = jax.jit(quantize_params_for_decode, donate_argnums=0)(params)
    # only the decoder + head are benched; freeing the encoder (+embeddings)
    # keeps params + the double-buffered cache carry inside 16 GB HBM
    params = {"decoder": params["decoder"], "head": params["head"]}
    jax.block_until_ready(params)

    from t5gemma_tts_tpu.ops.paged_attn import KV_STORE_DTYPES

    cache = t5gemma.init_paged_cache(dims, b, args.prompt, args.gen, args.enc,
                                     store_dtype=KV_STORE_DTYPES[args.kv])
    emb = jnp.zeros((b, 1, dims.hidden_size), jnp.bfloat16)
    pos = jnp.zeros((b, 1), jnp.float32)
    plens = jnp.full((b,), args.prompt, jnp.int32)
    elens = jnp.full((b,), args.enc, jnp.int32)
    step0 = int(args.gen * args.fill)

    # ---- full step ---------------------------------------------------------
    def make_step(iters):
        @jax.jit
        def loop(params, emb, cache):
            # params must be an ARGUMENT: a closed-over param tree is baked
            # into the program as 2.4 GB of constants, which ships over the
            # tunnel on every compile (measured: makes the bench unrunnable)
            def body(i, carry):
                h, cache = carry
                hidden, cache = t5gemma.paged_decode_step(
                    params["decoder"], dims,
                    inputs_embeds=h,
                    position_ids=pos,
                    pm_decoder_positions=pos,
                    cache=cache,
                    step=jnp.int32(step0) + (i % 16),
                    prompt_lengths=plens,
                    enc_lengths=elens,
                )
                return hidden.astype(jnp.bfloat16), cache
            return jax.lax.fori_loop(0, iters, body, (emb, cache))
        return loop

    t_step = marginal(make_step, params, emb, cache, iters=args.iters)
    print(f"paged_decode_step: {t_step*1e3:.2f} ms")

    # ---- attention-only (26x: 2 flash segments + merge + cross) -----------
    q0 = jnp.ones((b, dims.num_heads, dims.head_dim), jnp.float32)
    kc = jnp.ones((b, dims.num_kv_heads, dims.head_dim), jnp.bfloat16)
    wp, tg, tx = args.prompt, args.gen, args.enc
    prompt_kp = t5gemma._pages_view(cache.prompt_k)
    prompt_vp = t5gemma._pages_view(cache.prompt_v)
    gen_kp = t5gemma._pages_view(cache.gen_k)
    gen_vp = t5gemma._pages_view(cache.gen_v)
    cross_kp = t5gemma._pages_view(cache.cross_k)
    cross_vp = t5gemma._pages_view(cache.cross_v)
    gen_lengths = jnp.full((b,), step0, jnp.int32)

    fused_mode = t5gemma._fused_attn_mode(dims)

    def attn_layer(q, li, prompt_kp, prompt_vp, gen_kp, gen_vp,
                   cross_kp, cross_vp):
        if fused_mode == 2:
            from t5gemma_tts_tpu.ops import fused_attn

            out = fused_attn.batch_paged_attention(
                q, kc, kc, prompt_kp, prompt_vp, gen_kp, gen_vp,
                plens, gen_lengths,
                t5gemma._layer_page_indices(li, b, wp),
                t5gemma._layer_page_indices(li, b, tg),
                attn_logits_soft_cap=dims.attn_logit_softcap,
                include_current=True,
            )
            cross = fused_attn.batch_paged_attention(
                q, None, None, cross_kp, cross_vp, None, None, elens, None,
                t5gemma._layer_page_indices(li, b, tx), None,
                attn_logits_soft_cap=dims.attn_logit_softcap,
            )
            return out + cross
        parts = [
            paged_attn.paged_flash_parts(
                q, prompt_kp, prompt_vp, plens,
                t5gemma._layer_page_indices(li, b, wp),
                attn_logits_soft_cap=dims.attn_logit_softcap,
                pages_per_compute_block=t5gemma.paged_ppcb(
                    wp // t5gemma.PAGE_SIZE),
            ),
            paged_attn.paged_flash_parts(
                q, gen_kp, gen_vp, gen_lengths,
                t5gemma._layer_page_indices(li, b, tg),
                attn_logits_soft_cap=dims.attn_logit_softcap,
                pages_per_compute_block=t5gemma.paged_ppcb(
                    tg // t5gemma.PAGE_SIZE),
            ),
        ]
        out = paged_attn.merge_attention_parts(
            parts, q, kc, kc, dims.attn_logit_softcap, jnp.float32)
        cross = paged_attn.paged_gqa_attention(
            q, cross_kp, cross_vp, elens,
            page_indices=t5gemma._layer_page_indices(li, b, tx),
            attn_logits_soft_cap=dims.attn_logit_softcap,
            pages_per_compute_block=t5gemma.paged_ppcb(
                tx // t5gemma.PAGE_SIZE),
            out_dtype=jnp.float32,
        )
        return out + cross

    def make_attn(iters):
        @jax.jit
        def loop(q, *kv):  # kv buffers as args, not captured constants
            def body(i, q):
                def layer(q, li):
                    return attn_layer(q, li, *kv).astype(jnp.float32), None
                q, _ = jax.lax.scan(layer, q, jnp.arange(dims.num_layers))
                return q * 1e-2
            return jax.lax.fori_loop(0, iters, body, q)
        return loop

    t_attn = marginal(make_attn, q0, prompt_kp, prompt_vp, gen_kp, gen_vp,
                      cross_kp, cross_vp, iters=max(args.iters // 4, 4))
    print(f"attention x{dims.num_layers}: {t_attn*1e3:.2f} ms")

    # ---- head + sampling ---------------------------------------------------
    hid = jnp.ones((b, 1, dims.hidden_size), jnp.bfloat16)
    dcfg = DecodeConfig(top_k=30, top_p=0.9, temperature=0.8,
                        max_frames=args.gen, approx_top_k=True)
    rng = jax.random.PRNGKey(0)
    prev = jnp.zeros((b,), jnp.int32)

    def make_head(iters):
        @jax.jit
        def loop(head_params, h):
            def body(i, h):
                logits = voice.predict_head(head_params, h)[:, 0]
                tok, _ = engine.sample_step_token(
                    cfg, dcfg, logits, i, prev, prev, rng)
                return h + (tok[:, None, None] * 1e-30).astype(h.dtype)
            return jax.lax.fori_loop(0, iters, body, h)
        return loop

    t_head = marginal(make_head, params["head"], hid, iters=args.iters)
    print(f"head+sampling: {t_head*1e3:.2f} ms")
    print(f"sum(attn+head): {(t_attn+t_head)*1e3:.2f} ms; "
          f"residual (weights+glue): {(t_step-t_attn)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
