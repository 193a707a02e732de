"""Probe: int4 nibble-unpack strategies inside Mosaic on this terminal.

Decides whether the megakernel's batch-1 int4 weight mode can hit its DMA
floor. int8 weights put batch-1 decode at a hard ~2.84 ms/step HBM floor
(2.27 GB/step at ~800 GB/s), i.e. >= 8x RT at batch 1 is unreachable at
int8 — the int4 mode is the only honest lever. The unpack must run
in-kernel without stalling the weight stream.

Stage 1 (legality): `arith.shli` on int8 vectors fails to legalize on the
terminal's libtpu (bisected 2026-08-17). Tests which of shrsi / muli /
andi on int8 vectors DO legalize, picking the cheapest unpack:
  plan A (shr+mul):  high = p >> 4;  low = p - (high * 16)     [3 ops/byte]
  plan B (and-dots): ul = p & 15; 3 half-dots + i32 epilogue   [1 op/byte]

Stage 2 (throughput): marginal per-tile cost via tile-count differencing
(NT=24 vs NT=96) — single-launch host timing is dispatch-dominated on the
tunneled backend and useless.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_int4_unpack.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K, T = 2304, 512
GROUP = 128
BP = 8


# ---------------------------------------------------------------------------
# stage 1: which int8 vector ops legalize?
# ---------------------------------------------------------------------------

def _legality(op_name):
    def kern(x_ref, o_ref):
        x = x_ref[...]
        if op_name == "shrsi":
            y = jnp.right_shift(x, 4)
        elif op_name == "muli":
            y = x * jnp.int8(16)
        elif op_name == "andi":
            y = jnp.bitwise_and(x, jnp.int8(15))
        elif op_name == "subi":
            y = x - jnp.int8(1)
        o_ref[...] = y

    f = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec((8, 128), lambda: (0, 0))],
        out_specs=pl.BlockSpec((8, 128), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int8),
    )
    x = jnp.asarray(np.random.default_rng(0).integers(-128, 128, (8, 128)),
                    jnp.int8)
    try:
        out = np.asarray(jax.jit(f)(x))
        xs = np.asarray(x)
        if op_name == "shrsi":
            ok = np.array_equal(out, xs >> 4)
        elif op_name == "muli":
            ok = np.array_equal(out, (xs.astype(np.int32) * 16).astype(np.int8))
        elif op_name == "andi":
            ok = np.array_equal(out, xs & 15)
        else:
            ok = np.array_equal(out, (xs.astype(np.int32) - 1).astype(np.int8))
        return "ok" if ok else "WRONG VALUES"
    except Exception as e:  # noqa: BLE001
        return f"FAIL ({type(e).__name__}: {str(e)[:80]})"


# ---------------------------------------------------------------------------
# stage 2: streamed-tile kernels, marginal timing
# ---------------------------------------------------------------------------

def _stream_kernel(x_ref, w_any, out_ref, wbuf, acc, sem, *, mode, nt):
    x8 = x_ref[...]

    def start(c, slot):
        pltpu.make_async_copy(w_any.at[pl.ds(c, 1)], wbuf.at[slot],
                              sem.at[slot]).start()

    def wait(c, slot):
        pltpu.make_async_copy(w_any.at[pl.ds(c, 1)], wbuf.at[slot],
                              sem.at[slot]).wait()

    start(0, 0)
    a = jnp.zeros((BP, T), jnp.float32)
    for c in range(nt):
        slot = c % 2
        if c + 1 < nt:
            start(c + 1, (c + 1) % 2)
        wait(c, slot)
        if mode == "int8":
            d = jax.lax.dot_general(x8, wbuf[slot, 0],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            a = a + d.astype(jnp.float32)
        elif mode == "lanes4":
            # PRODUCTION scheme (ops/megakernel.py nstream w4): packed
            # [K, T/2] lane-halves tiles, 1 AND + 2 dots, no unpack
            pk = wbuf[slot, 0]                       # [K, T/2] packed
            ul = jnp.bitwise_and(pk, jnp.int8(15))
            dp_ = jax.lax.dot_general(x8, pk, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            dul = jax.lax.dot_general(x8, ul, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            ones = jnp.ones((x8.shape[1], 128), jnp.int8)
            xsum = jax.lax.dot_general(
                x8, ones, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)[:, :1].astype(jnp.float32)
            lo = dul.astype(jnp.float32) - 8.0 * xsum
            hi = (dp_ - dul).astype(jnp.float32) * 0.0625
            a = a + jnp.concatenate([lo, hi], axis=1)
    acc[...] = a
    out_ref[...] = acc[...]


def build(mode, nt):
    tt = T // 2 if mode == "lanes4" else T
    kern = functools.partial(_stream_kernel, mode=mode, nt=nt)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(1,),
            in_specs=[pl.BlockSpec((BP, K), lambda i: (0, 0)),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((BP, T), lambda i: (0, 0)),
            scratch_shapes=(
                pltpu.VMEM((2, 1, K, tt), jnp.int8),
                pltpu.VMEM((BP, T), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((BP, T), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    ), tt


def lanes4_value_check():
    """One-tile lanes4 kernel vs the numpy decode — validates the
    production nibble-recovery math ON DEVICE (cheapest possible compile,
    run this before the full megakernel after any toolchain change)."""
    f, tt = build("lanes4", 1)
    rng = np.random.default_rng(7)
    q_lo = rng.integers(-7, 8, (K, tt)).astype(np.int8)
    q_hi = rng.integers(-7, 8, (K, tt)).astype(np.int8)
    packed = (((q_hi & 15) << 4) | (q_lo + 8)).astype(np.int8)
    x = rng.integers(-127, 128, (BP, K)).astype(np.int8)
    got = np.asarray(jax.jit(lambda xx, ww: f(xx, ww))(
        jnp.asarray(x), jnp.asarray(packed)[None]))
    ref_lo = x.astype(np.int64) @ q_lo.astype(np.int64)
    ref_hi = x.astype(np.int64) @ q_hi.astype(np.int64)
    ref = np.concatenate([ref_lo, ref_hi], axis=1).astype(np.float64)
    ok = np.allclose(got, ref, rtol=1e-6)
    print(f"lanes4 in-kernel math vs numpy: {'EXACT' if ok else 'MISMATCH'}"
          f" (max abs err {np.abs(got - ref).max():.3g})")
    return ok


def marginal(mode, n_lo=24, n_hi=96, reps=32):
    f_lo, tt = build(mode, n_lo)
    f_hi, _ = build(mode, n_hi)
    w = jnp.asarray(
        np.random.default_rng(0).integers(-7, 8, (n_hi, K, tt)), jnp.int8)
    x = jnp.asarray(
        np.random.default_rng(1).integers(-127, 128, (BP, K)), jnp.int8)

    def timed(f, wslice):
        jf = jax.jit(lambda xx, ww: f(xx, ww))
        np.asarray(jf(x, wslice)[:1, :4])
        t0 = time.time()
        for _ in range(reps):
            out = jf(x, wslice)
        np.asarray(out[:1, :4])
        return (time.time() - t0) / reps

    t_lo = timed(f_lo, w[:n_lo])
    t_hi = timed(f_hi, w)
    per_tile = (t_hi - t_lo) / (n_hi - n_lo)
    gbs = (K * tt) / per_tile / 1e9
    eff_gbs = (K * T) / per_tile / 1e9   # int8-equivalent bytes served
    print(f"{mode:10s}: {per_tile * 1e6:7.2f} us/tile "
          f"({gbs:6.1f} GB/s wire, {eff_gbs:6.1f} GB/s int8-equivalent)")
    return per_tile


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}")
    print("-- legality (int8 vector ops in Mosaic) --")
    for op in ("shrsi", "muli", "subi", "andi"):
        print(f"  {op:6s}: {_legality(op)}", flush=True)
    print("-- lanes4 value check (production scheme) --", flush=True)
    lanes4_value_check()
    print("-- marginal per-tile timing --", flush=True)
    t8 = marginal("int8")
    t4 = marginal("lanes4")
    print(f"lanes4 vs int8: {t4 / t8:.2f}x time at 0.5x bytes "
          f"(DMA-bound win if < ~0.75)")
