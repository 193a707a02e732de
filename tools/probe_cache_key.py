"""Diagnose persistent-cache key instability for the headline decode program.

VERDICT r3 weak #1 follow-up: the cache dir shows many ~7.787 MB
``jit__unknown-<hash>-cache`` entries written hours apart — the same program
is keying DIFFERENTLY across fresh processes, so phase C of bench.py never
hits the cache and re-pays a full compile (the 179.5 s "warm" number).

This probe lowers the headline decode program (no compile, no execution —
safe to run back-to-back) and prints:
  - sha256 of the canonical lowered HLO text (is the *program* stable?)
  - jax's actual persistent cache key (is the *key* stable?)

Run twice in fresh processes and diff the output. If HLO hash differs,
tracing is non-deterministic (hash-randomized iteration / id()s in the
program). If HLO matches but the key differs, the instability is in compile
options / backend metadata.
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import hashlib
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--seconds", type=float, default=5.0)
    ap.add_argument("--text-len", type=int, default=64)
    ap.add_argument("--kv", default="paged_i8")
    ap.add_argument("--preset", default="2b-2b")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from t5gemma_tts_tpu.config import (DecodeConfig, VoiceConfig,
                                        backbone_preset)
    from t5gemma_tts_tpu.decode import engine
    from t5gemma_tts_tpu.models import voice
    from t5gemma_tts_tpu.ops.quant import quantize_params_for_decode
    from t5gemma_tts_tpu.models.t5gemma import fuse_for_decode

    cfg = VoiceConfig(backbone=backbone_preset(args.preset))
    sr = int(cfg.encodec_sr)
    frames = int(sr * args.seconds)
    b = args.batch
    cfg = dataclasses.replace(cfg, extra_cutoff=0.0)
    dcfg = DecodeConfig(top_k=30, top_p=0.9, temperature=0.8,
                        max_frames=frames + sr + 16, kv_cache=args.kv,
                        approx_top_k=True)

    # abstract params: eval_shape the init+fuse+quantize chain so no device
    # work happens — lowering only needs avals
    hd = cfg.backbone.decoder.head_dim

    def make_params(k):
        p = voice.init_params(k, cfg)
        p = fuse_for_decode(p)
        return quantize_params_for_decode(p, weight_bits=8, head_dim=hd)

    params_shape = jax.eval_shape(make_params, jax.random.PRNGKey(0))

    x = jax.ShapeDtypeStruct((b, args.text_len), jnp.int32)
    lens = jax.ShapeDtypeStruct((b,), jnp.int32)
    prompt = jax.ShapeDtypeStruct((b, 8), jnp.int32)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)

    fn = jax.jit(functools.partial(engine.decode_tokens, cfg=cfg, dcfg=dcfg))
    lowered = fn.lower(params_shape, x=x, x_lens=lens, prompt=prompt,
                       prompt_lens=lens, target_totals=lens, rng=key)

    hlo_text = lowered.as_text()
    hlo_hash = hashlib.sha256(hlo_text.encode()).hexdigest()

    # compute jax's own persistent cache key, exactly as the compiler does,
    # capturing the per-stage hash DEBUG lines to localize any instability
    import io
    import logging

    log_buf = io.StringIO()
    handler = logging.StreamHandler(log_buf)
    handler.setLevel(logging.DEBUG)
    cklog = logging.getLogger("jax._src.cache_key")
    cklog.setLevel(logging.DEBUG)
    cklog.addHandler(handler)

    key_hash = None
    key_err = None
    stages = []
    try:
        from jax._src import cache_key as ck
        from jax._src import compiler as _compiler

        module = lowered._lowering.stablehlo()
        backend = jax.devices()[0].client
        opts = None
        try:
            opts = lowered._lowering.compile_args.get("compile_options")
        except Exception:
            pass
        if opts is None:
            opts = _compiler.get_compile_options(
                num_replicas=1, num_partitions=1)
        key_hash = ck.get(module, np.array(jax.devices()), opts, backend)
        for line in log_buf.getvalue().splitlines():
            if "hash of" in line:
                stages.append(line.split("get_cache_key")[-1].strip()[:120])
    except Exception as exc:  # jax internals move; report instead of crash
        key_err = f"{type(exc).__name__}: {exc}"

    out = {
        "metric": "cache_key_probe",
        "pid": os.getpid(),
        "hashseed": os.environ.get("PYTHONHASHSEED", "<unset>"),
        "hlo_sha256": hlo_hash[:16],
        "hlo_lines": hlo_text.count("\n"),
        "cache_key": key_hash.rsplit("-", 1)[-1][:16] if key_hash else None,
        "cache_key_error": key_err,
    }
    print(json.dumps(out))
    for s in stages:
        print("#", s)
    dump = os.environ.get("T5G_DUMP_HLO")
    if dump:
        with open(dump, "w") as f:
            f.write(hlo_text)


if __name__ == "__main__":
    main()
