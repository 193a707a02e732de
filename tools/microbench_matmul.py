"""Microbenchmark: decode-step matmul variants on one TPU chip.

The AR decode step is weight-bandwidth bound; this tool measures each matmul
strategy in isolation at the flagship decode shapes so kernel work targets
real numbers (NEXT_STEPS.md perf #1). Run on the TPU:

    python tools/microbench_matmul.py [--m 64]

Shapes swept: the 2b-2b decoder's per-layer matmuls (qkv / o / gate_up /
down) plus the prediction-head w2 (the single largest weight read).
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def bench(fn, x, *rest, iters=100):
    """Marginal in-jit timing.

    The tunneled device has ~30-40 ms of FIXED per-program overhead, so wall
    time of one call measures nothing. Instead: run `iters` and `4*iters`
    dependent calls inside one jit each and report the difference / (3*iters).
    The feedback term reduces over the WHOLE output (a sliced feedback lets
    XLA dead-code the unused output columns — measured 96 TFLOP/s "speedups"
    from exactly that).
    """
    import jax

    from t5gemma_tts_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    def make(n_it):
        @jax.jit
        def loop(x, *rest):
            def body(_, carry):
                out = fn(carry, *rest)
                eps = (jnp.sum(out.astype(jnp.float32)) * 1e-30)
                return carry + eps.astype(carry.dtype)
            return jax.lax.fori_loop(0, n_it, body, x)
        return loop

    import jax.numpy as jnp

    def run(loop):
        out = loop(x, *rest)
        jax.block_until_ready(out)
        np.asarray(out.reshape(-1)[:4])
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = loop(x, *rest)
            np.asarray(out.reshape(-1)[:4])
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = run(make(iters))
    t4 = run(make(4 * iters))
    return max(t4 - t1, 1e-9) / (3 * iters)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=64)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--gbps", type=float, default=508.0,
                    help="achievable HBM bandwidth for the ideal-time column")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from t5gemma_tts_tpu.ops import quant

    shapes = {
        "qkv": (2304, 4096),
        "o": (2048, 2304),
        "gate_up": (2304, 18432),
        "down": (9216, 2304),
        "head_w2": (2304, 65664),
    }
    m = args.m
    rng = np.random.default_rng(0)
    print(f"m={m}  (ideal = int8 weight bytes / {args.gbps} GB/s)")
    header = f"{'name':>9} {'K':>5} {'N':>6} {'ideal':>7} {'bf16':>8} " \
             f"{'xla_i8':>8} {'pallas_i8':>9}"
    print(header)
    total = {"ideal": 0.0, "bf16": 0.0, "xla": 0.0, "pallas": 0.0}
    for name, (k, n) in shapes.items():
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k, n)) * 0.02, jnp.bfloat16)
        qw = quant.quantize_weight(w)

        t_bf16 = bench(lambda a, b: a @ b, x, w, iters=args.iters)
        t_xla = bench(quant._w8a8_2d_xla, x, qw, iters=args.iters)
        try:
            t_pl = bench(quant._w8a8_2d_pallas, x, qw, iters=args.iters)
        except Exception as e:  # pragma: no cover - dev tool
            print(f"pallas failed for {name}: {type(e).__name__}: {e}")
            t_pl = float("nan")
        ideal = k * n / (args.gbps * 1e9)
        total["ideal"] += ideal
        total["bf16"] += t_bf16
        total["xla"] += t_xla
        total["pallas"] += t_pl
        print(f"{name:>9} {k:>5} {n:>6} {ideal*1e6:>6.1f}u "
              f"{t_bf16*1e6:>7.1f}u {t_xla*1e6:>7.1f}u {t_pl*1e6:>8.1f}u")
    print(f"{'TOTAL':>9} {'':>5} {'':>6} {total['ideal']*1e6:>6.1f}u "
          f"{total['bf16']*1e6:>7.1f}u {total['xla']*1e6:>7.1f}u "
          f"{total['pallas']*1e6:>8.1f}u")


if __name__ == "__main__":
    main()
