"""Training-step throughput on one TPU chip (tokens/sec).

The inference bench (bench.py) covers serving; this measures the pjit
training path: full forward + backward + ScaledAdam/AdamW update with the
grad-accumulation scan, at recipe-like shapes (reference recipe:
max_num_tokens=30000/GPU, audio ~10 s, examples/training/t5gemma_2b-2b.sh).

One 16 GB chip cannot hold 2b-2b full-finetune optimizer state, so the
measured configs are:

  --preset b-b           full fine-tune of the smaller published backbone
  --preset 2b-2b --lora  LoRA (r16) fine-tune of the flagship

Run: python tools/microbench_train.py [--preset b-b] [--micro 4]
     [--per-micro 8] [--text-len 64] [--audio-len 512] [--optim ScaledAdam]

Marginal in-jit timing as in microbench_matmul.py (tunnel overhead).
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="b-b", choices=["2b-2b", "b-b", "test"])
    ap.add_argument("--lora", action="store_true")
    ap.add_argument("--micro", type=int, default=4, help="grad-accum micros")
    ap.add_argument("--per-micro", type=int, default=8, help="rows per micro")
    ap.add_argument("--text-len", type=int, default=64)
    ap.add_argument("--audio-len", type=int, default=512,
                    help="codec frames per row (~10 s at 50 Hz)")
    ap.add_argument("--optim", default="ScaledAdam",
                    choices=["ScaledAdam", "AdamW"])
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--remat", action="store_true",
                    help="gradient checkpointing (layer rematerialization)")
    args = ap.parse_args()

    import jax

    from t5gemma_tts_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp

    from t5gemma_tts_tpu.config import VoiceConfig, backbone_preset
    from t5gemma_tts_tpu.models import voice
    from t5gemma_tts_tpu.train import optim
    from t5gemma_tts_tpu.train import train_step as ts

    cfg = VoiceConfig(backbone=backbone_preset(args.preset),
                      gradient_checkpointing=args.remat)
    rng = jax.random.PRNGKey(0)
    params = jax.jit(lambda k: voice.init_params(k, cfg))(rng)

    if args.optim == "AdamW":
        ocfg = optim.AdamWConfig()
    else:
        ocfg = optim.ScaledAdamConfig()

    nm, pm = args.micro, args.per_micro
    tx, ty = args.text_len, args.audio_len
    rnp = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(rnp.integers(3, cfg.text_vocab_size, (nm, pm, tx)),
                         jnp.int32),
        "x_lens": jnp.full((nm, pm), tx, jnp.int32),
        "y": jnp.asarray(rnp.integers(0, cfg.audio_vocab_size, (nm, pm, ty)),
                         jnp.int32),
        "y_lens": jnp.full((nm, pm), ty, jnp.int32),
        "y_sep_position": jnp.zeros((nm, pm), jnp.int32),
    }
    tokens_per_step = nm * pm * ty

    if args.lora:
        from t5gemma_tts_tpu.train import lora as lora_mod

        lcfg = lora_mod.LoraConfig()
        adapters = lora_mod.init_adapters(jax.random.PRNGKey(1), params, lcfg)
        step_fn = ts.make_lora_train_step(cfg, ocfg, lcfg)
        opt_state = ts.opt_init(adapters, ocfg)

        @jax.jit
        def loop(adapters, opt_state, params, batch):
            def body(i, carry):
                ad, opt = carry
                ad, opt, _ = step_fn(ad, opt, params, batch,
                                     jnp.float32(1e-4))[:3]
                return ad, opt
            return jax.lax.fori_loop(0, args.iters, body, (adapters, opt_state))

        def run(*a):
            out = loop(*a)
            # axon quirk: block_until_ready alone does not block; force a
            # host materialization of one leaf (see microbench_step.py)
            jax.block_until_ready(out)
            np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[:2]
            return out

        run(adapters, opt_state, params, batch)
        t0 = time.perf_counter()
        run(adapters, opt_state, params, batch)
        dt = (time.perf_counter() - t0) / args.iters
    else:
        state = ts.init_state(params, ocfg)
        step_fn = ts.make_train_step(cfg, ocfg)

        @jax.jit
        def loop(state, batch):
            def body(i, st):
                st, _ = step_fn(st, batch, jnp.float32(1e-4))
                return st
            return jax.lax.fori_loop(0, args.iters, body, state)

        def run(*a):
            out = loop(*a)
            jax.block_until_ready(out)
            np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[:2]
            return out

        run(state, batch)
        t0 = time.perf_counter()
        run(state, batch)
        dt = (time.perf_counter() - t0) / args.iters

    print(f"preset={args.preset} lora={args.lora} optim={args.optim} "
          f"micros={nm}x{pm} audio_len={ty}")
    print(f"train step: {dt*1e3:.1f} ms  "
          f"({tokens_per_step / dt:,.0f} audio tokens/s, "
          f"{tokens_per_step} tokens/step)")


if __name__ == "__main__":
    main()
