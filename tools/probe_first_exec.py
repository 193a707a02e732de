"""First-execution cost bisect for the serving headline program.

VERDICT r3 weak #1 (warm start): on this tunneled (axon) backend the XLA
persistent cache works — ``lowered.compile()`` is sub-second on a hit
(the axon client stages the serialized executable and the frontend routes
to ``load_serialized``) — yet the FIRST execute of the b128 paged_i8
megakernel program costs 200-450 s (second execute: ~5.2 s steady).  A
pure-XLA program's first execute is ~6 s over steady state.  The expensive
work happens terminal-side at first dispatch, scales with Mosaic/Pallas
content, and is not covered by any cache we control.

This probe times first vs second execute for ONE kernel configuration so
the cost can be bisected across:

  --fused 3   per-layer megakernel (serving default on TPU)
  --fused 2   fused_layer_attention v2 (no megakernel)
  --fused 0   two-kernel + merge (paged attention only)
  --kv dense  no paged cache (with --fused 0: no Pallas at all)

It also builds a SECOND identical jit instance after the first has run and
times its first execute — if that is fast, the terminal caches loaded
programs in-session (a resident server amortizes the cliff); if slow, the
cost is per-executable-load.

Run serially, never two TPU processes at once:

  python tools/probe_first_exec.py --batch 128 --kv paged_i8 --fused 3
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--seconds", type=float, default=5.0)
    ap.add_argument("--text-len", type=int, default=64)
    ap.add_argument("--kv", default="paged_i8")
    ap.add_argument("--fused", default=None,
                    help="T5G_FUSED_ATTN value (set before jax import)")
    ap.add_argument("--weight-bits", type=int, default=8,
                    help="0 = bf16 weights (skip quantization)")
    ap.add_argument("--preset", default="2b-2b")
    ap.add_argument("--no-cache", action="store_true")
    ap.add_argument("--second-instance", action="store_true",
                    help="after the timed run, rebuild an identical jit "
                         "instance and time ITS first execute")
    args = ap.parse_args()

    if args.fused is not None:
        os.environ["T5G_FUSED_ATTN"] = str(args.fused)

    import numpy as np

    import jax
    import jax.numpy as jnp

    from t5gemma_tts_tpu.utils.compile_cache import enable_persistent_cache

    if not args.no_cache:
        enable_persistent_cache()

    import dataclasses

    from t5gemma_tts_tpu.config import (DecodeConfig, VoiceConfig,
                                        backbone_preset)
    from t5gemma_tts_tpu.decode import engine
    from t5gemma_tts_tpu.models import voice
    from t5gemma_tts_tpu.models.t5gemma import fuse_for_decode
    from t5gemma_tts_tpu.ops.quant import quantize_params_for_decode

    # tiny program first: isolates per-process backend/session setup cost
    t0 = time.time()
    np.asarray(jax.jit(lambda a: a + 1)(jnp.ones((8, 128))))
    tiny_sec = time.time() - t0

    cfg = VoiceConfig(backbone=backbone_preset(args.preset))
    sr = int(cfg.encodec_sr)
    frames = int(sr * args.seconds)
    b = args.batch
    cfg = dataclasses.replace(cfg, extra_cutoff=0.0)
    dcfg = DecodeConfig(top_k=30, top_p=0.9, temperature=0.8,
                        max_frames=frames + sr + 16, kv_cache=args.kv,
                        approx_top_k=True)

    t0 = time.time()
    params = jax.jit(lambda k: voice.init_params(k, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    params = jax.jit(fuse_for_decode, donate_argnums=0)(params)
    if args.weight_bits:
        hd = cfg.backbone.decoder.head_dim
        params = jax.jit(
            lambda p: quantize_params_for_decode(
                p, weight_bits=args.weight_bits, head_dim=hd),
            donate_argnums=0)(params)
    np.asarray(jax.tree_util.tree_leaves(params)[0].reshape(-1)[:2])
    param_sec = time.time() - t0

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(3, min(255000, cfg.text_vocab_size),
                                 (b, args.text_len)).astype(np.int32))
    x_lens = jnp.full((b,), args.text_len, jnp.int32)
    prompt = jnp.full((b, 8), cfg.special.pad, jnp.int32)
    prompt_lens = jnp.zeros((b,), jnp.int32)
    targets = jnp.full((b,), frames, jnp.int32)
    key = jax.random.PRNGKey(1)

    def timed_instance(tag: str):
        fn = jax.jit(functools.partial(engine.decode_tokens, cfg=cfg,
                                       dcfg=dcfg))
        t0 = time.time()
        lowered = fn.lower(params, x=x, x_lens=x_lens, prompt=prompt,
                           prompt_lens=prompt_lens, target_totals=targets,
                           rng=key)
        trace_sec = time.time() - t0
        t0 = time.time()
        compiled = lowered.compile()
        compile_sec = time.time() - t0
        t0 = time.time()
        out = compiled(params, x=x, x_lens=x_lens, prompt=prompt,
                       prompt_lens=prompt_lens, target_totals=targets,
                       rng=key)
        np.asarray(out.tokens.reshape(-1)[:4])
        first_sec = time.time() - t0
        t0 = time.time()
        out = compiled(params, x=x, x_lens=x_lens, prompt=prompt,
                       prompt_lens=prompt_lens, target_totals=targets,
                       rng=jax.random.fold_in(key, 1))
        np.asarray(out.tokens.reshape(-1)[:4])
        second_sec = time.time() - t0
        return {f"{tag}trace_sec": round(trace_sec, 1),
                f"{tag}compile_sec": round(compile_sec, 1),
                f"{tag}first_exec_sec": round(first_sec, 1),
                f"{tag}second_exec_sec": round(second_sec, 1)}

    rec = {
        "metric": "first_exec_bisect",
        "batch": b,
        "kv": args.kv,
        "fused": os.environ.get("T5G_FUSED_ATTN", "<default>"),
        "weight_bits": args.weight_bits,
        "tiny_first_sec": round(tiny_sec, 1),
        "param_init_sec": round(param_sec, 1),
        "device": str(jax.devices()[0]),
    }
    rec.update(timed_instance(""))
    if args.second_instance:
        # identical program via a fresh partial → new jit wrapper → fresh
        # trace+compile+load; measures in-session terminal caching
        engine_decode = engine.decode_tokens

        def clone(*a, **k):
            return engine_decode(*a, **k)

        globals()["decode_clone"] = clone
        import t5gemma_tts_tpu.decode.engine as _e

        orig = _e.decode_tokens
        _e.decode_tokens = clone
        try:
            rec.update(timed_instance("i2_"))
        finally:
            _e.decode_tokens = orig
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
