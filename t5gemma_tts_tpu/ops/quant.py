"""Int8 weight quantization for the decode path (W8A8 native / W8A16 Pallas).

Autoregressive decode at small batch is weight-bandwidth-bound: every step
streams the full decoder (~4.3 GB bf16 for t5gemma-2b-2b) through HBM. With
per-output-channel int8 weights that traffic halves.

Two execution modes per ``QuantWeight``:

- ``act_bits=8`` (default, **W8A8**): activations are quantized per token to
  int8 and the matmul runs natively on the MXU's int8 pipeline
  (``lax.dot_general(int8, int8) -> int32``), then the per-token x
  per-channel scales rescale the int32 accumulator. Measured 69 us vs 97 us
  bf16 per [64,2304]x[2304,9216] matmul on v5e (in-jit, amortized).
- ``act_bits=16`` (**W8A16**): bf16 activations, int8 weights dequantized
  on-chip inside a Pallas kernel (a plain ``x @ w_int8.astype(bf16)`` would
  NOT help — XLA materializes the converted bf16 weight buffer in HBM).
  Slightly more accurate, but measured no faster than bf16 (90 us) because
  the dequant doesn't overlap the DMA well; kept for accuracy-sensitive use.

``QuantWeight`` is a pytree, so layer-stacked quantized weights flow through
``lax.scan`` like ordinary parameters. ``q_matmul`` dispatches: plain arrays
use ``@``; QuantWeight picks the mode (the Pallas kernel is interpreted
off-TPU so tests run on CPU).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Tuple, Union

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_TILE = 512
M_TILE = 256  # rows per grid step (keeps the activation block in VMEM)
M_PAD = 16    # bf16 sublane tile


class QuantWeight(NamedTuple):
    values: jnp.ndarray   # int8 [..., K, N_pad]
    scale: jnp.ndarray    # f32  [..., N_pad]
    n: int                # true (unpadded) output dim — static
    act_bits: int = 8     # 8 = W8A8 native int8 dot; 16 = W8A16 Pallas


# make the static `n`/`act_bits` pytree aux values
jax.tree_util.register_pytree_node(
    QuantWeight,
    lambda qw: ((qw.values, qw.scale), (qw.n, qw.act_bits)),
    lambda aux, leaves: QuantWeight(leaves[0], leaves[1], aux[0], aux[1]),
)


def quantize_weight(w: jnp.ndarray, n_tile: int = N_TILE,
                    act_bits: int = 8) -> QuantWeight:
    """Per-output-channel absmax int8 quantization; pads N to the tile."""
    *lead, k, n = w.shape
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=-2)                   # [..., N]
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / scale[..., None, :]), -127, 127).astype(jnp.int8)
    n_pad = -(-n // n_tile) * n_tile
    if n_pad != n:
        pad = [(0, 0)] * len(lead) + [(0, 0), (0, n_pad - n)]
        q = jnp.pad(q, pad)
        scale = jnp.pad(scale, [(0, 0)] * len(lead) + [(0, n_pad - n)])
    return QuantWeight(values=q, scale=scale, n=n, act_bits=act_bits)


def _qmm_kernel(x_ref, w_ref, s_ref, o_ref):
    w = w_ref[:].astype(jnp.bfloat16)  # int8 -> bf16 in VMEM
    acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _qmm_2d(x: jnp.ndarray, values: jnp.ndarray, scale: jnp.ndarray,
            interpret: bool = False) -> jnp.ndarray:
    """x [M, K] bf16 x values [K, N_pad] int8 -> [M, N_pad] (x.dtype)."""
    m, k = x.shape
    n_pad = values.shape[-1]
    # tile M so big prefill/training activations never blow VMEM; decode
    # steps (M <= M_TILE) stay a single row-block
    m_tile = min(M_TILE, -(-m // M_PAD) * M_PAD)
    m_pad = -(-m // m_tile) * m_tile
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    out = pl.pallas_call(
        _qmm_kernel,
        grid=(m_pad // m_tile, n_pad // N_TILE),
        in_specs=[
            pl.BlockSpec((m_tile, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, N_TILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_TILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_tile, N_TILE), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k * n_pad,
            bytes_accessed=k * n_pad + m_pad * k * 2 + m_pad * n_pad * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), values, scale.reshape(1, n_pad))
    return out[:m]


def _quantize_act(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row absmax int8 activation quantization: [M, K] -> (int8, f32 [M,1])."""
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8) / 127.0
    x8 = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    return x8, sx


def _w8a8_2d_xla(x: jnp.ndarray, w: QuantWeight) -> jnp.ndarray:
    """Native int8 x int8 MXU matmul with per-token activation quantization.

    x [M, K] float -> int8 with per-row absmax scales; accumulate int32;
    rescale by (row scale x per-channel weight scale)."""
    x8, sx = _quantize_act(x)
    o = jax.lax.dot_general(
        x8, w.values, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (o.astype(jnp.float32) * sx * w.scale[None, :]).astype(x.dtype)


def _w8a8_kernel(x_ref, sx_ref, w_ref, sw_ref, o_ref):
    acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.int32)
    o_ref[:] = ((acc.astype(jnp.float32) * sx_ref[:]) * sw_ref[:]
                ).astype(o_ref.dtype)


M_PAD_I8 = 32  # int8 sublane tile


def _w8a8_core(x8: jnp.ndarray, sx: jnp.ndarray, values: jnp.ndarray,
               scale: jnp.ndarray, out_dtype,
               interpret: bool = False) -> jnp.ndarray:
    """pallas_call for pre-quantized inputs: x8 [M, K] int8 (M a multiple of
    the int8 sublane tile), sx [M, 1] f32, values [K, N_pad] int8,
    scale [N_pad] f32 -> [M, N_pad] out_dtype."""
    m_pad, k = x8.shape
    n_pad = values.shape[-1]
    # keep each weight block ~<=2.4 MB so two in-flight buffers fit VMEM
    # comfortably beside the activation block at any K
    n_tile = N_TILE if k <= 4608 else N_TILE // 2
    n_tile = min(n_tile, n_pad)
    return pl.pallas_call(
        _w8a8_kernel,
        grid=(n_pad // n_tile,),
        in_specs=[
            pl.BlockSpec((m_pad, k), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n_tile), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tile), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_pad, n_tile), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k * n_pad,
            bytes_accessed=k * n_pad + m_pad * k + m_pad * n_pad * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x8, sx, values, scale.reshape(1, n_pad))


@functools.partial(jax.jit, static_argnames=("interpret",))
def _w8a8_2d_pallas(x: jnp.ndarray, w: QuantWeight,
                    interpret: bool = False) -> jnp.ndarray:
    """Pallas W8A8: the matmul + f32 rescale epilogue in ONE kernel.

    Versus the XLA path, the int32->f32 rescale never round-trips an [M, N]
    intermediate through HBM, and the weight stream is the only large DMA —
    Pallas double-buffers the [K, n_tile] int8 blocks across the N grid.
    Same math as ``_w8a8_2d_xla``: int8 quantization, exact int32
    accumulation, f32 rescale (XLA may reassociate the two broadcast scale
    multiplies, so outputs can differ by 1 ULP between the two lowerings).
    """
    m, k = x.shape
    x8, sx = _quantize_act(x)
    m_pad = -(-m // M_PAD_I8) * M_PAD_I8
    if m_pad != m:
        x8 = jnp.pad(x8, ((0, m_pad - m), (0, 0)))
        sx = jnp.pad(sx, ((0, m_pad - m), (0, 0)))
    out = _w8a8_core(x8, sx, w.values, w.scale, x.dtype, interpret=interpret)
    return out[:m]


def _w8a8_2d(x: jnp.ndarray, w: QuantWeight) -> jnp.ndarray:
    # The XLA int8 dot is the default: isolated marginal timing has the
    # Pallas kernel ~3% faster (312 vs 321 us across the five decode shapes,
    # both at ~600-730 GB/s effective), but inside the 26-layer decode scan
    # the extra per-layer pallas_call launches measure 9% SLOWER end-to-end
    # (57.1x vs 62.7x RTF at batch 64) and 2.5x the compile time. Opt in with
    # T5G_PALLAS_W8A8=1 for kernels-in-isolation work.
    if (jax.default_backend() == "tpu" and x.shape[0] <= 256
            and os.environ.get("T5G_PALLAS_W8A8") == "1"):
        return _w8a8_2d_pallas(x, w)
    return _w8a8_2d_xla(x, w)


def q_matmul(x: jnp.ndarray, w: Union[jnp.ndarray, QuantWeight]) -> jnp.ndarray:
    """Drop-in for ``x @ w``; works for [..., K] activations.

    Also dispatches factored LoRA leaves (train/lora.py LoraWeight):
    ``x @ W + ((x @ A) @ B) * scale`` — never materializing W + AB, so LoRA
    backward touches only adapter-sized tensors."""
    if hasattr(w, "a") and hasattr(w, "b") and hasattr(w, "w"):
        base = q_matmul(x, w.w)
        upd = (x @ w.a.astype(x.dtype)) @ w.b.astype(x.dtype)
        return base + upd * jnp.asarray(w.scale, base.dtype)
    if not isinstance(w, QuantWeight):
        return x @ w
    *lead, k = x.shape
    x2 = x.reshape(-1, k)
    if w.act_bits == 8:
        out = _w8a8_2d(x2, w)
    else:
        interpret = jax.default_backend() != "tpu"
        out = _qmm_2d(x2, w.values, w.scale, interpret=interpret)
    return out[:, : w.n].reshape(*lead, w.n)


def dequantize(w: QuantWeight) -> jnp.ndarray:
    """Reference dequantization (for tests)."""
    full = w.values.astype(jnp.float32) * w.scale[..., None, :]
    return full[..., : w.n]


_QUANT_KEYS = ("q", "k", "v", "o", "gate", "up", "down", "w1", "w2",
               "qkv", "gate_up")


def quantize_params_for_decode(params, quantize_encoder: bool = False,
                               act_bits: int = 8):
    """Quantize the weight-bandwidth-heavy matmuls of the voice model for
    inference. By default the decoder stack + prediction head (read every
    decode step) go int8; the encoder (read once per utterance) stays bf16
    unless ``quantize_encoder``. ``act_bits`` picks W8A8 (8) or W8A16 (16)."""
    def walk(path, leaf):
        keys = [getattr(k, "key", None) for k in path]
        if not keys:
            return leaf
        if keys[0] == "decoder" or (quantize_encoder and keys[0] == "encoder"):
            if keys[-1] in _QUANT_KEYS and getattr(leaf, "ndim", 0) == 3:
                return quantize_weight(leaf, act_bits=act_bits)
        if keys[0] == "head" and keys[-1] in ("w1", "w2"):
            return quantize_weight(leaf, act_bits=act_bits)
        return leaf

    return jax.tree_util.tree_map_with_path(walk, params)
