"""int4 prediction-head quality stress: token-distribution shift (r5 #7).

The batch-1 latency mode quantizes the prediction head's [D, Va] matmul to
lanes4 int4 (W4A8: per-output-channel absmax/7 weights, per-row absmax/127
activations — ops/quant.quantize_weight_lanes4 + _w4a8_2d_pallas). Unlike
the layer weights, the head's output IS the logits the sampler sees, so
weight round-off moves the emitted token distribution directly. VERDICT r4
next #7: bound that shift offline, with a documented fallback rule like
the int8-KV one (tools/stress_int8_kv.py).

This tool replicates the production quantization math in numpy and
measures, across structured weight/activation draws:

  - mean KL(ref || quant) of the sampling-temperature softmax,
  - top-1 (greedy) flip rate,
  - top-30 overlap (the CLI's top_k=30 default — which candidates survive
    the filter),

for the int4 head AND the int8 head (the int8 shift is the serving
headline's baseline noise floor; the int4 EXCESS over it is the cost of
the latency mode). Structured draws cover the known failure geometry:

  - gaussian control;
  - heavy-tailed weights (student-t df=4);
  - outlier OUTPUT channels (a few vocab columns at 10-50x — harmless to
    per-channel weight scales by construction, included as the control
    that proves it);
  - outlier ACTIVATION channels (a few hidden dims at 10-50x — the W4A8
    worst case: the per-ROW activation scale is set by the outlier,
    crushing resolution of every other channel's contribution).

Fallback rule (documented in docs/DESIGN.md): on a real-weights
calibration batch, if ``head_int4_token_shift`` exceeds the thresholds
(default top-1 flip > 0.02 or KL > 0.02), serve with
``quantize_params_for_decode(weight_bits=4, head_bits=8)`` — layer
weights keep the int4 DMA saving, the head falls back to int8.

Run (CPU, seconds):  python tools/stress_int4_head.py
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def quant_act_rows(x):
    """Per-row absmax int8 activations (ops/quant._quantize_act math)."""
    amax = np.abs(x).max(axis=-1, keepdims=True)
    s = np.maximum(amax, 1e-8) / 127.0
    q = np.clip(np.round(x / s), -127, 127).astype(np.int8)
    return q, s


def quant_w_cols(w, qmax):
    """Per-output-channel absmax weights: qmax=7 (int4) or 127 (int8)."""
    amax = np.abs(w).max(axis=0)
    s = np.maximum(amax, 1e-8) / qmax
    q = np.clip(np.round(w / s[None, :]), -qmax, qmax).astype(np.int8)
    return q, s


def head_matmul_quant(x, w, qmax):
    """Exact production W4A8/W8A8 math: int accumulate, f32 rescale."""
    x8, sx = quant_act_rows(x)
    q, sw = quant_w_cols(w, qmax)
    # f64 accumulate is exact for these integer magnitudes (|prod| <
    # 2^21, K-sums < 2^53) and runs on BLAS, unlike an int64 matmul
    acc = x8.astype(np.float64) @ q.astype(np.float64)
    return acc.astype(np.float32) * sx * sw[None, :]


def softmax(z, temp):
    z = z / temp
    z = z - z.max(axis=-1, keepdims=True)
    p = np.exp(z)
    return p / p.sum(axis=-1, keepdims=True)


def token_shift_metrics(ref_logits, q_logits, temp=0.8, topk=30):
    """(mean KL, top-1 flip rate, mean top-k overlap) of quant vs ref."""
    p = softmax(ref_logits, temp)
    qd = softmax(q_logits, temp)
    kl = float(np.mean(np.sum(p * (np.log(p + 1e-12) - np.log(qd + 1e-12)),
                              axis=-1)))
    flip = float(np.mean(np.argmax(ref_logits, -1) != np.argmax(q_logits, -1)))
    k = min(topk, ref_logits.shape[-1])
    tr = np.argpartition(-ref_logits, k - 1, axis=-1)[:, :k]
    tq = np.argpartition(-q_logits, k - 1, axis=-1)[:, :k]
    ov = np.mean([len(np.intersect1d(a, b)) / k for a, b in zip(tr, tq)])
    return kl, flip, float(ov)


def head_int4_token_shift(hidden, w, temp=0.8, topk=30):
    """Calibration helper: (KL, top1_flip, topk_overlap) of the int4 head
    vs the f32 head on a real hidden-state/weight sample. hidden [N, D]
    (post-GELU head intermediates from a calibration run), w [D, Va]."""
    ref = hidden.astype(np.float32) @ w.astype(np.float32)
    got = head_matmul_quant(hidden.astype(np.float32),
                            w.astype(np.float32), 7)
    return token_shift_metrics(ref, got, temp, topk)


def synth(rng, n, d, v, w_shape, a_shape, amp):
    """Structured draws; returns (hidden [n, d], w [d, v])."""
    if w_shape == "gauss":
        w = rng.standard_normal((d, v)).astype(np.float32) * 0.02
    else:  # heavy-tailed body
        w = rng.standard_t(4, size=(d, v)).astype(np.float32) * 0.02
    if w_shape == "col_outliers":
        ch = rng.choice(v, size=max(1, v // 100), replace=False)
        w[:, ch] *= amp
    x = rng.standard_normal((n, d)).astype(np.float32)
    if a_shape == "act_outliers":
        ch = rng.choice(d, size=max(1, d // 100), replace=False)
        # fixed channels, consistent sign across rows (SmoothQuant-style
        # activation outliers)
        x[:, ch] = amp * (1.0 + 0.25 * rng.standard_normal((n, len(ch))))
    return x, w


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hidden", type=int, default=2304)
    ap.add_argument("--vocab", type=int, default=8192,
                    help="columns sampled from the 65541-wide head (the "
                         "per-channel scales make columns independent)")
    ap.add_argument("--rows", type=int, default=256)
    ap.add_argument("--trials", type=int, default=4)
    ap.add_argument("--temp", type=float, default=0.8)
    ap.add_argument("--topk", type=int, default=30)
    ap.add_argument("--kl-threshold", type=float, default=0.02)
    ap.add_argument("--flip-threshold", type=float, default=0.02)
    args = ap.parse_args()

    d, v, n = args.hidden, args.vocab, args.rows
    rows = []
    configs = [
        ("gauss", "plain", 0.0),
        ("heavy", "plain", 0.0),
        ("col_outliers", "plain", 10.0),
        ("col_outliers", "plain", 50.0),
        ("heavy", "act_outliers", 10.0),
        ("heavy", "act_outliers", 50.0),
    ]
    for w_shape, a_shape, amp in configs:
        m4, m8 = [], []
        for t in range(args.trials):
            rng = np.random.default_rng(7000 + 31 * t + int(amp))
            x, w = synth(rng, n, d, v, w_shape, a_shape, amp)
            ref = x @ w
            m4.append(token_shift_metrics(
                ref, head_matmul_quant(x, w, 7), args.temp, args.topk))
            m8.append(token_shift_metrics(
                ref, head_matmul_quant(x, w, 127), args.temp, args.topk))
        m4 = np.mean(np.asarray(m4), axis=0)
        m8 = np.mean(np.asarray(m8), axis=0)
        row = {
            "metric": "int4_head_stress",
            "w_shape": w_shape, "a_shape": a_shape, "outlier_amp": amp,
            "int4_kl": round(float(m4[0]), 5),
            "int4_top1_flip": round(float(m4[1]), 5),
            "int4_top30_overlap": round(float(m4[2]), 4),
            "int8_kl": round(float(m8[0]), 6),
            "int8_top1_flip": round(float(m8[1]), 6),
            "int8_top30_overlap": round(float(m8[2]), 4),
            "exceeds_threshold": bool(m4[0] > args.kl_threshold
                                      or m4[1] > args.flip_threshold),
        }
        rows.append(row)
        print(json.dumps(row))

    worst = max(rows, key=lambda r: r["int4_top1_flip"])
    print(json.dumps({
        "metric": "int4_head_stress_summary",
        "hidden": d, "vocab": v, "rows": n, "trials": args.trials,
        "temp": args.temp, "topk": args.topk,
        "worst_config": {k: worst[k] for k in
                         ("w_shape", "a_shape", "outlier_amp",
                          "int4_kl", "int4_top1_flip")},
        "gaussian_band": {k: rows[0][k] for k in
                          ("int4_kl", "int4_top1_flip",
                           "int4_top30_overlap")},
        "thresholds": {"kl": args.kl_threshold,
                       "top1_flip": args.flip_threshold},
        "caveat": "synthetic random logits are near-uniform (every token "
                  "a near-tie), which inflates absolute flip rates far "
                  "beyond a trained model's peaked logits; the load-"
                  "bearing signal is the int4 EXCESS over the int8 "
                  "columns, and the thresholds apply to the real-weights "
                  "calibration run, not to this table",
        "fallback_rule": "if head_int4_token_shift(hidden_sample, w2) "
                         f"shows KL > {args.kl_threshold} or top-1 flip > "
                         f"{args.flip_threshold} on a real-weights "
                         "calibration batch, serve with "
                         "quantize_params_for_decode(weight_bits=4, "
                         "head_bits=8)",
    }))


if __name__ == "__main__":
    main()
