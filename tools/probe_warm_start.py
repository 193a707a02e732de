"""Warm-start decomposition probe for the serving headline program.

VERDICT r3 weak #1: the driver artifact recorded compile_sec_warm=179.5 s
while the docs claimed 6.5 s. This probe measures, in ONE fresh process,
exactly where the time goes when the persistent XLA cache is already
populated:

  param_init_sec   jit init_params + fuse + quantize (param prep programs)
  trace_sec        jax.jit trace+lower of the headline decode program
  compile_sec      lowered.compile() — cache hit fetch or full compile
  first_exec_sec   first dispatch+execute (tunneled executable load)
  cache_hit        whether the persistent cache reported a hit (log scrape)

Run it twice back to back (NEVER concurrently — one TPU client at a time):

  python tools/probe_warm_start.py --batch 128          # populate / measure
  python tools/probe_warm_start.py --batch 128          # the warm number

Prints one JSON line per run.
"""

from __future__ import annotations

import argparse
import io
import json
import logging
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
    ap.add_argument("--preset", default="2b-2b")
    ap.add_argument("--no-cache", action="store_true",
                    help="skip enable_persistent_cache (measure cold)")
    ap.add_argument("--key-only", action="store_true",
                    help="stop after lowered.compile(): print the cache-key "
                         "stage hashes (jax._src.cache_key DEBUG) and skip "
                         "execution — for diagnosing key instability")
    args = ap.parse_args()

    # capture the compiler's persistent-cache hit/miss log lines
    log_buf = io.StringIO()
    handler = logging.StreamHandler(log_buf)
    handler.setLevel(logging.DEBUG)
    for name in ("jax._src.compiler", "jax._src.compilation_cache",
                 "jax._src.cache_key"):
        lg = logging.getLogger(name)
        lg.setLevel(logging.DEBUG)
        lg.addHandler(handler)

    t_import0 = time.time()
    import jax
    import jax.numpy as jnp
    import numpy as np

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

    dev = jax.devices()[0]
    import_sec = time.time() - t_import0

    cfg = VoiceConfig(backbone=backbone_preset(args.preset))
    sr = int(cfg.encodec_sr)
    frames = int(sr * args.seconds)
    b = args.batch
    max_frames = frames + sr + 16
    cfg = dataclasses.replace(cfg, extra_cutoff=0.0)
    dcfg = DecodeConfig(top_k=30, top_p=0.9, temperature=0.8,
                        max_frames=max_frames, kv_cache=args.kv,
                        approx_top_k=True)

    t0 = time.time()
    params = jax.jit(lambda k: voice.init_params(k, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    params = jax.jit(fuse_for_decode, donate_argnums=0)(params)
    hd = cfg.backbone.decoder.head_dim
    params = jax.jit(
        lambda p: quantize_params_for_decode(p, weight_bits=8, head_dim=hd),
        donate_argnums=0)(params)
    jax.block_until_ready(params)
    param_init_sec = time.time() - t0

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(3, min(255000, cfg.text_vocab_size),
                                 (b, args.text_len)).astype(np.int32))
    x_lens = jnp.full((b,), args.text_len, jnp.int32)
    prompt = jnp.full((b, 8), cfg.special.pad, jnp.int32)
    prompt_lens = jnp.zeros((b,), jnp.int32)
    targets = jnp.full((b,), frames, jnp.int32)
    key = jax.random.PRNGKey(1)

    import functools

    fn = jax.jit(functools.partial(engine.decode_tokens, cfg=cfg, dcfg=dcfg))

    t0 = time.time()
    lowered = fn.lower(params, x=x, x_lens=x_lens, prompt=prompt,
                       prompt_lens=prompt_lens, target_totals=targets,
                       rng=key)
    trace_sec = time.time() - t0

    t0 = time.time()
    compiled = lowered.compile()
    compile_sec = time.time() - t0

    if args.key_only:
        logs = log_buf.getvalue()
        for line in logs.splitlines():
            if "get_cache_key" in line or "jit__unknown" in line:
                print("#", line.split("jax._src.")[-1][:200])
        print(json.dumps({"metric": "key_probe",
                          "compile_sec": round(compile_sec, 1)}))
        return

    t0 = time.time()
    out = compiled(params, x=x, x_lens=x_lens, prompt=prompt,
                   prompt_lens=prompt_lens, target_totals=targets, rng=key)
    np.asarray(out.tokens.reshape(-1)[:4])
    first_exec_sec = time.time() - t0

    # second exec for reference (steady-state step cost)
    t0 = time.time()
    out = compiled(params, x=x, x_lens=x_lens, prompt=prompt,
                   prompt_lens=prompt_lens, target_totals=targets,
                   rng=jax.random.fold_in(key, 1))
    np.asarray(out.tokens.reshape(-1)[:4])
    second_exec_sec = time.time() - t0

    logs = log_buf.getvalue()
    hit = ("cache hit" in logs.lower())
    miss = ("cache miss" in logs.lower() or "not found in persistent" in logs.lower())
    print(json.dumps({
        "metric": "warm_start_decomposition",
        "batch": b,
        "kv": args.kv,
        "import_sec": round(import_sec, 1),
        "param_init_sec": round(param_init_sec, 1),
        "trace_sec": round(trace_sec, 1),
        "compile_sec": round(compile_sec, 1),
        "first_exec_sec": round(first_exec_sec, 1),
        "second_exec_sec": round(second_exec_sec, 1),
        "total_to_first_audio_sec": round(
            import_sec + param_init_sec + trace_sec + compile_sec
            + first_exec_sec, 1),
        "cache_log_hit": hit,
        "cache_log_miss": miss,
        "device": str(dev),
    }))
    # dump the cache-relevant log lines for diagnosis
    for line in logs.splitlines():
        low = line.lower()
        if "cache" in low and ("hit" in low or "miss" in low or "wrote" in low
                               or "fail" in low or "error" in low
                               or "persistent" in low):
            print("#", line[:300])


if __name__ == "__main__":
    main()
