"""Decompose the XCodec2/Vocos vocoder decode cost at batch 1 (round 4).

probe_b1_parts measured the 5-s b1 vocode at ~309 ms — half the 625 ms
budget of the >=8x-RT target and ~100x above the path's compute floor
(~38 GFLOP of pointwise matmuls + ~170 MB of weights). Every stage here
is timed with MARGINAL in-jit loops (t(4N) - t(N) over 3N iterations):
one-shot per-program timings on the tunneled backend are dominated by a
~40-50 ms dispatch cost and order stages nonsensically (first version of
this probe measured "one pw block" slower than the whole 12-block
backbone).

Run serially on the TPU: python tools/probe_vocoder_parts.py [--frames 250]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=250)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from t5gemma_tts_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from t5gemma_tts_tpu.codec import fsq as fsq_mod
    from t5gemma_tts_tpu.codec import vocos as vocos_mod
    from t5gemma_tts_tpu.codec.model import (XCodec2Config, decode_code,
                                             init_decoder_params)

    ccfg = XCodec2Config()
    vcfg = ccfg.vocos
    params = jax.jit(lambda k: init_decoder_params(k, ccfg, jnp.bfloat16))(
        jax.random.PRNGKey(2))
    jax.block_until_ready(params)

    b, t = args.batch, args.frames
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, ccfg.fsq.codebook_size, (b, t)),
                        jnp.int32)
    vp = params["vocos"]

    def sync(out):
        np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[:2]

    def timed(fn, *a):
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
        return max(t4 - t1, 1e-9) / (3 * iters)

    rec = {"metric": "vocoder_parts", "batch": b, "frames": t,
           "device": str(jax.devices()[0])}

    # full vocode program, looped in-jit with a dependency thread
    def make_vocode(iters):
        @jax.jit
        def loop(params, codes):
            def body(i, acc):
                wav = decode_code(params, ccfg, codes + (acc == 1.5))
                return jnp.sum(wav[..., :8].astype(jnp.float32)) * 1e-30
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
        return loop

    rec["vocode_ms"] = round(marginal(make_vocode, params, codes, iters=4)
                             * 1e3, 2)

    feats0 = jax.jit(lambda p, c: fsq_mod.decode(p["fsq"], ccfg.fsq, c)
                     @ p["fc_post_a"]["w"] + p["fc_post_a"]["b"])(
        params, codes)
    feats0 = jax.block_until_ready(feats0)

    def dep(x, acc):
        return x + (acc * 1e-30).astype(x.dtype)

    def make_feats(iters):
        @jax.jit
        def loop(params, codes):
            def body(i, acc):
                emb = fsq_mod.decode(params["fsq"], ccfg.fsq,
                                     codes + (acc == 1.5))
                f = emb @ params["fc_post_a"]["w"] + params["fc_post_a"]["b"]
                return jnp.sum(f[..., :2].astype(jnp.float32)) * 1e-30
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
        return loop

    def make_backbone(iters):
        @jax.jit
        def loop(vp, feats):
            def body(i, acc):
                h = vocos_mod.backbone(vp, dep(feats, acc), vcfg)
                return jnp.sum(h[..., :2].astype(jnp.float32)) * 1e-30
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
        return loop

    h0 = jax.block_until_ready(
        jax.jit(lambda vp, f: vocos_mod.backbone(vp, f, vcfg))(vp, feats0))

    def make_head(iters):
        @jax.jit
        def loop(vp, h):
            def body(i, acc):
                wav = vocos_mod.head(vp, dep(h, acc), vcfg)
                return jnp.sum(wav[..., :8].astype(jnp.float32)) * 1e-30
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
        return loop

    rec["feats_ms"] = round(marginal(make_feats, params, codes) * 1e3, 2)
    rec["backbone_ms"] = round(marginal(make_backbone, vp, feats0) * 1e3, 2)
    rec["head_ms"] = round(marginal(make_head, vp, h0) * 1e3, 2)

    # ---- backbone internals -------------------------------------------------
    bp0 = jax.tree_util.tree_map(lambda l: l[0], vp["blocks"])
    x0 = jnp.asarray(rng.normal(size=(b, t, vcfg.dim)).astype(np.float32),
                     feats0.dtype)

    def make_dw_grouped(iters):
        @jax.jit
        def loop(bp, x):
            def body(i, acc):
                o = vocos_mod.conv1d_same(dep(x, acc), bp["dwconv"]["w"],
                                          bp["dwconv"]["b"], groups=vcfg.dim)
                return jnp.sum(o[..., :2].astype(jnp.float32)) * 1e-30
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
        return loop

    def dw_shifted(bp, x):
        w = bp["dwconv"]["w"]                       # [K, 1, C]
        k = w.shape[0]
        pad_l = (k - 1) // 2
        xp = jnp.pad(x, ((0, 0), (pad_l, k - 1 - pad_l), (0, 0)))
        out = jnp.zeros_like(x)
        for j in range(k):
            out = out + xp[:, j:j + x.shape[1]] * w[j, 0]
        return out + bp["dwconv"]["b"]

    def make_dw_shifted(iters):
        @jax.jit
        def loop(bp, x):
            def body(i, acc):
                o = dw_shifted(bp, dep(x, acc))
                return jnp.sum(o[..., :2].astype(jnp.float32)) * 1e-30
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
        return loop

    def make_pw(iters):
        @jax.jit
        def loop(bp, x):
            def body(i, acc):
                xx = dep(x, acc)
                hh = xx @ bp["pw1"]["w"] + bp["pw1"]["b"]
                hh = jax.nn.gelu(hh, approximate=False)
                o = xx + bp["gamma"] * (hh @ bp["pw2"]["w"] + bp["pw2"]["b"])
                return jnp.sum(o[..., :2].astype(jnp.float32)) * 1e-30
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
        return loop

    rec["dwconv_grouped_ms"] = round(
        marginal(make_dw_grouped, bp0, x0) * 1e3, 2)
    rec["dwconv_shifted_ms"] = round(
        marginal(make_dw_shifted, bp0, x0) * 1e3, 2)
    a = np.asarray(jax.jit(lambda bp, x: vocos_mod.conv1d_same(
        x, bp["dwconv"]["w"], bp["dwconv"]["b"], groups=vcfg.dim))(bp0, x0),
        np.float32)
    c = np.asarray(jax.jit(dw_shifted)(bp0, x0), np.float32)
    rec["dwconv_max_diff"] = float(np.abs(a - c).max())
    rec["pw_block_ms"] = round(marginal(make_pw, bp0, x0) * 1e3, 2)

    # ---- head internals -----------------------------------------------------
    half = vcfg.n_fft // 2 + 1
    hw0 = jax.block_until_ready(
        jax.jit(lambda vp, h: h @ vp["head"]["w"] + vp["head"]["b"])(vp, h0))

    def make_head_linear(iters):
        @jax.jit
        def loop(vp, h):
            def body(i, acc):
                o = dep(h, acc) @ vp["head"]["w"] + vp["head"]["b"]
                return jnp.sum(o[..., :2].astype(jnp.float32)) * 1e-30
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
        return loop

    def make_irfft(iters):
        @jax.jit
        def loop(hw):
            def body(i, acc):
                hx = dep(hw, acc)
                mag = jnp.clip(jnp.exp(hx[..., :half].astype(jnp.float32)),
                               max=100.0)
                ph = hx[..., half:].astype(jnp.float32)
                fr = vocos_mod.irfft_matmul(mag * jnp.cos(ph),
                                            mag * jnp.sin(ph), vcfg.n_fft)
                return jnp.sum(fr[..., :2]) * 1e-30
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
        return loop

    frames0 = jax.block_until_ready(jax.jit(
        lambda hw: vocos_mod.irfft_matmul(
            hw[..., :half].astype(jnp.float32),
            hw[..., half:].astype(jnp.float32), vcfg.n_fft))(hw0))

    def make_ola(iters):
        window = jnp.asarray(np.hanning(vcfg.n_fft + 1)[:-1].astype(
            np.float32))

        @jax.jit
        def loop(frames):
            def body(i, acc):
                o = vocos_mod.overlap_add(dep(frames, acc) * window,
                                          vcfg.hop_length)
                return jnp.sum(o[..., :8]) * 1e-30
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
        return loop

    rec["head_linear_ms"] = round(
        marginal(make_head_linear, vp, h0) * 1e3, 2)
    rec["head_irfft_ms"] = round(marginal(make_irfft, hw0) * 1e3, 2)
    rec["head_ola_ms"] = round(marginal(make_ola, frames0) * 1e3, 2)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
