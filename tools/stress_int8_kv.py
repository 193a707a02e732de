"""int8-KV quality stress under outlier-heavy synthetic K/V (VERDICT r3 #7).

The serving headline runs ``kv_cache="paged_i8"``: per-token symmetric int8
over head_dim (ops/fused_attn.quantize_kv), dequantized at the attention
logits inside the megakernel. Round-3 validation used well-behaved gaussian
K/V (~2% band). Published LLM KV statistics (KIVI, KVQuant, SmoothQuant
observations) say real caches are NOT gaussian:

  - **K has fixed per-CHANNEL outliers**: a few head_dim channels carry
    5-50x the typical magnitude, consistently across tokens (RoPE phase
    pairs + "attention sink" geometry). Per-TOKEN scaling is the worst
    case for this shape: every token's amax is set by the outlier channel,
    crushing the other channels' resolution.
  - **V is outlier-free** (near-gaussian, per-token quantization is fine).
  - Per-element tails are heavier than gaussian (student-t like).

This tool quantifies the attention-OUTPUT error of the production
quantization math under that adversarial geometry, sweeping outlier
amplitude and channel fraction, and prints one JSON line per config plus a
summary band. The math here is the exact quantize_kv + dequant-at-logits
contraction the megakernel implements (kernel==math is pinned by
tests/test_megakernel.py::test_megakernel_int8_kv_matches_unfused), so the
band transfers to the kernel path without a TPU in the loop.

Outputs feed docs/DESIGN.md's int8-KV section and the documented fallback
rule: if a calibration sample of real K shows
``kv_int8_output_error > --threshold`` (default 0.05 relative L2 on the
attention output), serve with kv_cache="paged" (bf16 pages) instead.

Run (CPU, seconds):  python tools/stress_int8_kv.py
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def synth_kv(rng, n_tok, head_dim, outlier_amp, outlier_frac, df):
    """Heavy-tailed K with fixed per-channel outliers; gaussian-ish V."""
    if outlier_amp == 0.0:  # pure-gaussian control
        k = rng.standard_normal((n_tok, head_dim)).astype(np.float32)
        v = rng.standard_normal((n_tok, head_dim)).astype(np.float32)
        return k, v
    # student-t body (df=4 has realistic tails), unit-ish scale
    k = rng.standard_t(df, size=(n_tok, head_dim)).astype(np.float32)
    v = rng.standard_t(df, size=(n_tok, head_dim)).astype(np.float32)
    n_out = max(1, int(round(outlier_frac * head_dim))) if outlier_amp > 1 \
        else 0
    if n_out:
        ch = rng.choice(head_dim, size=n_out, replace=False)
        # fixed channels, consistent sign structure across tokens (the
        # KIVI observation): amplitude varies mildly per token
        amp = outlier_amp * (1.0 + 0.25 * rng.standard_normal((n_tok, n_out)))
        k[:, ch] *= amp.astype(np.float32)
    return k, v


def attn_out(q, k, v, scale):
    logits = (q @ k.T) * scale                       # [nq, n_tok]
    logits -= logits.max(axis=-1, keepdims=True)
    p = np.exp(logits)
    p /= p.sum(axis=-1, keepdims=True)
    return p @ v                                     # [nq, head_dim]


def quant_roundtrip_per_token(x):
    """Exact production math: ops/fused_attn.quantize_kv then dequant."""
    amax = np.abs(x).max(axis=-1)
    s = np.maximum(amax, 1e-8) / 127.0
    q = np.clip(np.round(x / s[:, None]), -127, 127).astype(np.int8)
    return q.astype(np.float32) * s[:, None]


def quant_roundtrip_per_channel(x):
    """The known remedy for K-channel outliers (not currently shipped):
    per-CHANNEL scales amortize the outlier into its own scale."""
    amax = np.abs(x).max(axis=0)
    s = np.maximum(amax, 1e-8) / 127.0
    q = np.clip(np.round(x / s[None, :]), -127, 127).astype(np.int8)
    return q.astype(np.float32) * s[None, :]


def rel_l2(a, b):
    return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12))


def kv_int8_output_error(k, v, n_queries=64, seed=0):
    """Calibration helper: attention-output rel-L2 error of the production
    per-token int8 K/V quantization on a K/V sample [n_tok, head_dim].
    Mirrored into t5gemma_tts_tpu.ops.fused_attn.kv_int8_output_error."""
    rng = np.random.default_rng(seed)
    hd = k.shape[-1]
    q = rng.standard_normal((n_queries, hd)).astype(np.float32)
    ref = attn_out(q, k, v, hd ** -0.5)
    got = attn_out(q, quant_roundtrip_per_token(k),
                   quant_roundtrip_per_token(v), hd ** -0.5)
    return rel_l2(got, ref)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--head-dim", type=int, default=256)
    ap.add_argument("--tokens", type=int, default=1024)
    ap.add_argument("--queries", type=int, default=64)
    ap.add_argument("--trials", type=int, default=8)
    ap.add_argument("--threshold", type=float, default=0.05,
                    help="documented fallback: output rel-L2 above this -> "
                         "serve kv_cache='paged' (bf16)")
    args = ap.parse_args()

    hd, nt = args.head_dim, args.tokens
    scale = hd ** -0.5
    rows = []
    # amp=0 -> pure-gaussian control (the round-3 "~2%" validation shape);
    # amp=1 -> heavy tails (student-t df=4), no channel outliers
    for amp in (0.0, 1.0, 5.0, 10.0, 20.0, 50.0):
        for frac in ((0.0,) if amp <= 1.0 else (0.01, 0.04)):
            errs_tok, errs_ch, errs_logit = [], [], []
            for t in range(args.trials):
                rng = np.random.default_rng(1000 * t + int(amp * 10))
                k, v = synth_kv(rng, nt, hd, amp, frac, df=4)
                q = rng.standard_normal((args.queries, hd)).astype(np.float32)
                ref = attn_out(q, k, v, scale)
                kq, vq = quant_roundtrip_per_token(k), \
                    quant_roundtrip_per_token(v)
                errs_tok.append(rel_l2(attn_out(q, kq, vq, scale), ref))
                kc = quant_roundtrip_per_channel(k)
                errs_ch.append(rel_l2(attn_out(q, kc, vq, scale), ref))
                # logit-level error (pre-softmax), in units of logit std
                lr = (q @ k.T) * scale
                lq = (q @ kq.T) * scale
                errs_logit.append(float(np.std(lq - lr) / np.std(lr)))
            row = {
                "metric": "int8_kv_stress",
                "outlier_amp": amp,
                "outlier_frac": frac,
                "out_rel_l2_per_token": round(float(np.mean(errs_tok)), 4),
                "out_rel_l2_per_token_max": round(float(np.max(errs_tok)), 4),
                "out_rel_l2_K_per_channel": round(float(np.mean(errs_ch)), 4),
                "logit_rel_std": round(float(np.mean(errs_logit)), 4),
                "exceeds_threshold": bool(np.max(errs_tok) > args.threshold),
            }
            rows.append(row)
            print(json.dumps(row))

    worst = max(rows, key=lambda r: r["out_rel_l2_per_token_max"])
    print(json.dumps({
        "metric": "int8_kv_stress_summary",
        "head_dim": hd, "tokens": nt, "trials": args.trials,
        "threshold": args.threshold,
        "worst_config": {k: worst[k] for k in
                         ("outlier_amp", "outlier_frac",
                          "out_rel_l2_per_token_max")},
        "gaussian_band": rows[0]["out_rel_l2_per_token"],
        "heavy_tail_band": rows[1]["out_rel_l2_per_token"],
        "fallback_rule": "if kv_int8_output_error(K_sample, V_sample) > "
                         f"{args.threshold} on a real-weights calibration "
                         "batch, set kv_cache='paged' (bf16 pages)",
    }))


if __name__ == "__main__":
    main()
