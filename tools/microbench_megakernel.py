"""Standalone megakernel bring-up bench: ONE layer at serving dims.

Builds a few stacked decoder layers' int8 weights + a dense-slab cache at
2b-2b dims and times ops/megakernel.decode_layer in isolation — much faster
to compile than the full 26-layer step, so Mosaic bring-up iterations are
minutes, not tens of minutes.

Run: python tools/microbench_megakernel.py [--batch 64] [--layers 2]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--prompt", type=int, default=128)
    ap.add_argument("--gen", type=int, default=384)
    ap.add_argument("--enc", type=int, default=128)
    ap.add_argument("--fill", type=float, default=0.5)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--ff", type=int, default=None,
                    help="override intermediate_size (compile-scaling probes)")
    ap.add_argument("--phases", default="self,cross,mlp",
                    help="comma list of kernel phases (bring-up bisection)")
    ap.add_argument("--w4", action="store_true",
                    help="lanes4 int4 weights (batch-1 latency mode)")
    args = ap.parse_args()

    import jax

    from t5gemma_tts_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp

    from t5gemma_tts_tpu.config import backbone_preset
    from t5gemma_tts_tpu.models import t5gemma
    from t5gemma_tts_tpu.ops import megakernel as mk
    from t5gemma_tts_tpu.ops.quant import (
        quantize_weight, quantize_weight_lanes4, retile_for_streaming,
    )

    import dataclasses

    base_dims = backbone_preset("2b-2b").decoder
    dims = dataclasses.replace(
        base_dims, num_layers=args.layers,
        layer_types=base_dims.layer_types[: args.layers],
        **({"intermediate_size": args.ff} if args.ff else {}))
    l, d, h, hkv, hd = (args.layers, dims.hidden_size, dims.num_heads,
                        dims.num_kv_heads, dims.head_dim)
    ho, f = h * hd, dims.intermediate_size
    b = args.batch
    key = jax.random.PRNGKey(0)

    def qw(k, shape, k_major=False):
        w = jax.random.normal(jax.random.fold_in(key, k), shape,
                              jnp.float32) * 0.02
        if args.w4:
            return quantize_weight_lanes4(w, k_major=k_major)
        return quantize_weight(w)

    layers = {
        "self_attn": {"qkv": qw(1, (l, d, ho + 2 * hkv * hd)),
                      "o": qw(2, (l, ho, d), k_major=True)},
        "cross_attn": {"q": qw(3, (l, d, ho)),
                       "o": qw(4, (l, ho, d), k_major=True)},
        "mlp": {"gate_up": qw(5, (l, d, 2 * f)),
                "down": qw(6, (l, f, d), k_major=True)},
    }
    for i, name in enumerate(("pre_self_attn_norm", "post_self_attn_norm",
                              "pre_cross_attn_norm", "post_cross_attn_norm",
                              "pre_ff_norm", "post_ff_norm")):
        layers[name] = jax.random.normal(
            jax.random.fold_in(key, 10 + i), (l, d), jnp.float32) * 0.01
    layers = retile_for_streaming(layers)

    cache = t5gemma.init_paged_cache(dims, b, args.prompt, args.gen, args.enc)

    def fill(x, k):
        return (jax.random.normal(jax.random.fold_in(key, 100 + k), x.shape,
                                  jnp.float32) * 0.3).astype(x.dtype)

    slabs = {n: fill(getattr(cache, n), i) for i, n in enumerate(
        ("prompt_k", "prompt_v", "gen_k", "gen_v", "cross_k", "cross_v"))}

    rng = np.random.default_rng(0)
    hbuf = jnp.asarray(rng.normal(size=(b, d)) * 0.1, jnp.float32)
    cos = jnp.asarray(rng.uniform(-1, 1, (b, hd)), jnp.float32)
    sin = jnp.asarray(rng.uniform(-1, 1, (b, hd)), jnp.float32)
    plens = jnp.full((b,), args.prompt, jnp.int32)
    elens = jnp.full((b,), args.enc, jnp.int32)
    glens = jnp.full((b,), int(args.gen * args.fill), jnp.int32)

    # layers/slabs MUST be jit ARGUMENTS: closed-over trees bake into the
    # program as constants and ship to the remote compile service in the
    # request body (measured: HTTP 413 at 2 layers of weights).
    # Timing is MARGINAL over an IN-JIT chained loop: per-dispatch cost on
    # the tunneled axon terminal is ~5-12 ms (each host call ships fresh
    # scalars over the wire), which swamped per-layer times when this
    # bench chained separate dispatches.
    phases = tuple(args.phases.split(","))

    def make_loop(iters):
        @jax.jit
        def loop(layers, slabs, hbuf):
            def body(i, h):
                h2, _, _ = mk.decode_layer(
                    layers, dims, h=h, cos=cos, sin=sin, qcos=cos,
                    qsin=sin, li=jax.lax.rem(i, args.layers),
                    plens=plens, glens=glens, elens=elens,
                    prompt_k=slabs["prompt_k"], prompt_v=slabs["prompt_v"],
                    gen_k=slabs["gen_k"], gen_v=slabs["gen_v"],
                    cross_k=slabs["cross_k"], cross_v=slabs["cross_v"],
                    phases=phases)
                return h2
            return jax.lax.fori_loop(0, iters, body, hbuf)
        return loop

    def timed(loop):
        out = loop(layers, slabs, hbuf)
        jax.block_until_ready(out)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(loop(layers, slabs, hbuf))
            best = min(best, time.perf_counter() - t0)
        return best

    n1 = args.iters
    t0 = time.time()
    loop1 = make_loop(n1)
    loop4 = make_loop(4 * n1)
    t1 = timed(loop1)
    print(f"compile+loop{n1}: {time.time() - t0:.1f} s "
          f"(loop body {t1/n1*1e3:.3f} ms incl dispatch)", flush=True)
    t4 = timed(loop4)
    dt = max(t4 - t1, 1e-9) / (3 * n1)
    per_layer_bytes = sum(
        int(np.prod((w.packed if args.w4 else w.values).shape))
        for grp in ("self_attn", "cross_attn", "mlp")
        for w in layers[grp].values()) // args.layers
    print(f"megakernel layer: {dt*1e3:.3f} ms "
          f"({per_layer_bytes/dt/1e9:.0f} GB/s weight stream; "
          f"x26 layers = {dt*26*1e3:.2f} ms/step)")


if __name__ == "__main__":
    main()
