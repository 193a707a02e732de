"""Serving-batch validation of the stacked (single pallas_call) megakernel.

The stacked decoder-stack kernel (ops/megakernel.decode_stack, commit
08d4db2) was measured at batch 1 / int4 only; it is env-gated
(T5G_MK_STACKED=1) pending validation at the serving headline shape.
This probe runs BOTH paths in one TPU process at the given batch / KV
config and reports:

  1. bit-equality of one full paged_decode_step (hidden + pending k/v)
     between the 26-launch scan and the single stacked launch;
  2. marginal in-jit step time for each (the one-shot dispatch cost on
     the tunneled backend is environmental and huge — see NEXT_STEPS
     process notes — so only marginal loop slopes are meaningful).

The env var is read at TRACE time inside models/t5gemma.paged_decode_step
(t5gemma.py:873), so flipping os.environ between two jit traces in the
same process selects the path without a second TPU client.

Run: python tools/probe_stacked_serving.py [--batch 128] [--kv i8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run_timed(loop, *args):
    import jax

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
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--prompt", type=int, default=128)
    ap.add_argument("--gen", type=int, default=384)
    ap.add_argument("--enc", type=int, default=128)
    ap.add_argument("--fill", type=float, default=0.5)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--kv", default="i8", choices=["bf16", "i8"])
    ap.add_argument("--w4", action="store_true",
                    help="lanes4 int4 weights (batch-1 latency config)")
    ap.add_argument("--skip-timing", action="store_true",
                    help="equality check only (fast bring-up)")
    ap.add_argument("--timing-only", action="store_true",
                    help="skip the equality step (validated: BIT-EQUAL at "
                         "b128/i8 on-chip 2026-08-20); the two held result "
                         "caches otherwise push b128 over HBM")
    args = ap.parse_args()

    import jax

    from t5gemma_tts_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp

    from t5gemma_tts_tpu.config import VoiceConfig, backbone_preset
    from t5gemma_tts_tpu.models import t5gemma, voice
    from t5gemma_tts_tpu.ops.paged_attn import KV_STORE_DTYPES
    from t5gemma_tts_tpu.ops.quant import quantize_params_for_decode

    cfg = VoiceConfig(backbone=backbone_preset("2b-2b"))
    dims = cfg.backbone.decoder
    b = args.batch
    params = jax.jit(lambda k: voice.init_params(k, cfg))(jax.random.PRNGKey(0))
    params = jax.jit(t5gemma.fuse_for_decode, donate_argnums=0)(params)
    params = jax.jit(
        lambda p: quantize_params_for_decode(
            p, weight_bits=4 if args.w4 else 8, head_dim=dims.head_dim),
        donate_argnums=0)(params)
    params = {"decoder": params["decoder"]}
    jax.block_until_ready(params)

    cache = t5gemma.init_paged_cache(dims, b, args.prompt, args.gen, args.enc,
                                     store_dtype=KV_STORE_DTYPES[args.kv])
    # non-degenerate cache content so the attention output actually
    # exercises the softmax/merge paths (zeros would hide ordering bugs)
    key = jax.random.PRNGKey(7)

    def fill_like(x, k):
        if x is None:
            return None
        if x.dtype == jnp.int8:
            return jax.random.randint(jax.random.fold_in(key, k), x.shape,
                                      -127, 128, jnp.int32).astype(jnp.int8)
        return (jax.random.normal(jax.random.fold_in(key, k), x.shape,
                                  jnp.float32) * 0.3).astype(x.dtype)

    filled = []
    for i, leaf in enumerate(jax.tree_util.tree_leaves(
            cache, is_leaf=lambda x: x is None)):
        filled.append(None if leaf is None else fill_like(leaf, i))
    cache = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(cache,
                                     is_leaf=lambda x: x is None), filled)
    # scale planes must be positive (dequant multiplies by them)
    cache = cache._replace(**{
        f: (None if getattr(cache, f) is None
            else jnp.abs(getattr(cache, f)) + 1e-3)
        for f in ("prompt_k_scale", "prompt_v_scale", "gen_k_scale",
                  "gen_v_scale", "cross_k_scale", "cross_v_scale")
        if hasattr(cache, f)})

    emb = (jax.random.normal(jax.random.fold_in(key, 99),
                             (b, 1, dims.hidden_size), jnp.float32)
           * 0.1).astype(jnp.bfloat16)
    pos = jnp.full((b, 1), 0.25, jnp.float32)
    plens = jnp.full((b,), args.prompt, jnp.int32)
    elens = jnp.full((b,), args.enc, jnp.int32)
    step0 = int(args.gen * args.fill)

    def one_step(params, emb, cache):
        return t5gemma.paged_decode_step(
            params["decoder"], dims, inputs_embeds=emb, position_ids=pos,
            pm_decoder_positions=pos, cache=cache, step=jnp.int32(step0),
            prompt_lengths=plens, enc_lengths=elens)

    # ---- bit-equality: scan vs stacked, same inputs --------------------
    if not args.timing_only:
        # explicit "0": unset now defaults to stacked on TPU
        # (t5gemma.py paged_decode_step), which would make this probe
        # compare stacked against itself (ADVICE r4)
        os.environ["T5G_MK_STACKED"] = "0"
        h_scan, c_scan = jax.jit(one_step)(params, emb, cache)
        jax.block_until_ready(h_scan)
        os.environ["T5G_MK_STACKED"] = "1"
        h_stk, c_stk = jax.jit(one_step)(params, emb, cache)
        jax.block_until_ready(h_stk)

        h_eq = bool(jnp.all(h_scan == h_stk))
        pk_eq = bool(jnp.all(c_scan.pending_k == c_stk.pending_k))
        pv_eq = bool(jnp.all(c_scan.pending_v == c_stk.pending_v))
        max_abs = float(jnp.max(jnp.abs(h_scan.astype(jnp.float32)
                                        - h_stk.astype(jnp.float32))))
        print(f"equality b{b} kv={args.kv} w4={args.w4}: "
              f"hidden={'BIT-EQUAL' if h_eq else f'DIFF max={max_abs:.3e}'} "
              f"pending_k={'ok' if pk_eq else 'DIFF'} "
              f"pending_v={'ok' if pv_eq else 'DIFF'}")
        # the two result caches are full cache copies; freeing them is
        # required headroom for the double-buffered timing loop at b128
        del h_scan, c_scan, h_stk, c_stk

    if args.skip_timing:
        return

    # ---- marginal step time, both paths --------------------------------
    def make_step(iters):
        @jax.jit
        def loop(params, emb, cache):
            def body(i, carry):
                h, cache = carry
                hidden, cache = t5gemma.paged_decode_step(
                    params["decoder"], dims, inputs_embeds=h,
                    position_ids=pos, pm_decoder_positions=pos, cache=cache,
                    step=jnp.int32(step0) + (i % 16),
                    prompt_lengths=plens, enc_lengths=elens)
                return hidden.astype(jnp.bfloat16), cache
            return jax.lax.fori_loop(0, iters, body, (emb, cache))
        return loop

    os.environ["T5G_MK_STACKED"] = "0"  # explicit: unset means stacked on TPU
    t_scan = marginal(make_step, params, emb, cache, iters=args.iters)
    print(f"scan   (26 launches): {t_scan*1e3:.3f} ms/step")
    os.environ["T5G_MK_STACKED"] = "1"
    t_stk = marginal(make_step, params, emb, cache, iters=args.iters)
    print(f"stacked (1 launch):   {t_stk*1e3:.3f} ms/step "
          f"({(t_scan-t_stk)*1e3:+.3f} ms, {t_scan/t_stk:.3f}x)")


if __name__ == "__main__":
    main()
