"""Continuous-batching decode cost on one TPU chip (ms/step, tokens/s).

The resident-batch path (decode/continuous.py) now runs the per-row-clock
PAGED cache by default on TPU (kv "auto"); --kv dense measures the old
dense fallback for the A/B the serving docs carry.

Run: python tools/microbench_continuous.py [--slots 8] [--prompt 128]
     [--text 64] [--frames 384] [--kv auto|dense|paged]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--text", type=int, default=64)
    ap.add_argument("--prompt", type=int, default=128)
    ap.add_argument("--frames", type=int, default=384)
    ap.add_argument("--steps", type=int, default=64, help="steps per segment")
    ap.add_argument("--int8", dest="int8", action="store_true", default=True)
    ap.add_argument("--no-int8", dest="int8", action="store_false",
                    help="bf16 decoder weights (default: int8 on)")
    ap.add_argument("--kv", default="auto",
                    choices=["auto", "dense", "paged", "paged_i8"],
                    help="continuous cache mode (auto = paged on TPU; "
                         "paged_i8 = the serving headline config)")
    args = ap.parse_args()

    import jax

    from t5gemma_tts_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp

    from t5gemma_tts_tpu.config import (
        DecodeConfig, VoiceConfig, backbone_preset,
    )
    from t5gemma_tts_tpu.decode import continuous
    from t5gemma_tts_tpu.models import t5gemma, voice
    from t5gemma_tts_tpu.ops.quant import quantize_params_for_decode

    cfg = VoiceConfig(backbone=backbone_preset("2b-2b"))
    dcfg = DecodeConfig(top_k=30, top_p=0.9, temperature=0.8,
                        max_frames=args.frames, kv_cache=args.kv)
    params = jax.jit(lambda k: voice.init_params(k, cfg))(jax.random.PRNGKey(0))
    params = jax.jit(t5gemma.fuse_for_decode, donate_argnums=0)(params)
    if args.int8:
        params = jax.jit(quantize_params_for_decode, donate_argnums=0)(params)
    jax.block_until_ready(params)

    fns = continuous.make_fns(cfg, dcfg)
    state = continuous.init_slots(cfg, dcfg, args.slots, args.text,
                                  args.prompt)

    rng = np.random.default_rng(0)
    for i in range(args.slots):
        x = jnp.asarray(rng.integers(3, cfg.text_vocab_size, args.text),
                        jnp.int32)
        p = jnp.asarray(rng.integers(0, cfg.audio_vocab_size, args.prompt),
                        jnp.int32)
        state = fns.admit(params, state, jnp.int32(i), x,
                          jnp.int32(args.text), p, jnp.int32(args.prompt),
                          jnp.int32(args.prompt + args.frames + 100),
                          jax.random.PRNGKey(i))

    def run(state, n):
        out = fns.segment(params, state, jnp.int32(n))
        jax.block_until_ready(out)
        np.asarray(out.steps)
        return out

    state = run(state, 4)  # warm compile
    base = int(np.asarray(state.steps).min())
    t0 = time.perf_counter()
    state = run(state, args.steps)
    dt = time.perf_counter() - t0
    done = int(np.asarray(state.steps).min()) - base
    per_step = dt / max(done, 1)
    print(f"slots={args.slots} prompt={args.prompt} frames={args.frames} "
          f"int8={args.int8} cache="
          f"{continuous.resolve_cache_mode(cfg, dcfg, args.prompt)}")
    print(f"continuous decode: {per_step*1e3:.2f} ms/step "
          f"({args.slots / per_step:,.0f} tokens/s, "
          f"{args.slots / per_step / 50:.1f}x realtime aggregate)")


if __name__ == "__main__":
    main()
