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
from typing import NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_TILE = 512
M_TILE = 256  # rows per grid step (keeps the activation block in VMEM)
M_PAD = 16    # bf16 sublane tile


class QuantWeight(NamedTuple):
    values: jnp.ndarray   # int8; layout "kn": [..., K, N_pad];
                          # "tiled_n": [..., N_pad/T, K, T];
                          # "tiled_k": [..., K/T, T, N_pad]
    scale: jnp.ndarray    # f32  [..., N_pad]
    n: int                # true (unpadded) output dim — static
    act_bits: int = 8     # 8 = W8A8 native int8 dot; 16 = W8A16 Pallas
    layout: str = "kn"    # tiled layouts exist for the decode megakernel:
                          # weight-tile DMAs must move FULL trailing dims
                          # (a lane-sliced HBM DMA hangs the terminal)


# make the static `n`/`act_bits`/`layout` pytree aux values
jax.tree_util.register_pytree_node(
    QuantWeight,
    lambda qw: ((qw.values, qw.scale), (qw.n, qw.act_bits, qw.layout)),
    lambda aux, leaves: QuantWeight(leaves[0], leaves[1], *aux),
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


def _w8a8_2d_xla_tiled(x: jnp.ndarray, w: QuantWeight) -> jnp.ndarray:
    """W8A8 for the streaming-tiled layouts (same math as _w8a8_2d_xla)."""
    x8, sx = _quantize_act(x)
    if w.layout == "tiled_n":
        # values [NT, K, T]: contract K -> [M, NT, T] -> [M, N_pad]
        o = jax.lax.dot_general(
            x8, w.values, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        o = o.reshape(x.shape[0], -1)
    else:  # tiled_k: values [KT, T, N_pad]: contract (KT, T)
        kt, t, n_pad = w.values.shape
        o = jax.lax.dot_general(
            x8.reshape(x.shape[0], kt, t), w.values,
            (((1, 2), (0, 1)), ((), ())),
            preferred_element_type=jnp.int32)
    return (o.astype(jnp.float32) * sx * w.scale[None, :]).astype(x.dtype)


def _w8a8_2d(x: jnp.ndarray, w: QuantWeight) -> jnp.ndarray:
    # The XLA int8 dot is the default: isolated marginal timing has the
    # Pallas kernel ~3% faster (312 vs 321 us across the five decode shapes,
    # both at ~600-730 GB/s effective), but inside the 26-layer decode scan
    # the extra per-layer pallas_call launches measure 9% SLOWER end-to-end
    # (57.1x vs 62.7x RTF at batch 64) and 2.5x the compile time. Opt in with
    # T5G_PALLAS_W8A8=1 for kernels-in-isolation work.
    if w.layout != "kn":
        return _w8a8_2d_xla_tiled(x, w)
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
    if isinstance(w, Lanes4Weight):
        *lead, k = x.shape
        x2 = x.reshape(-1, k)
        # decode-step shapes (small M) take the Pallas kernel on TPU: the
        # XLA fallback MATERIALIZES the decoded int8 weights per call,
        # erasing the int4 bandwidth win; big-M (prefill/scoring) shapes
        # stay on XLA where the weight stream amortizes over rows
        if (w.layout == "l4n" and w.packed.ndim == 3
                and jax.default_backend() == "tpu" and x2.shape[0] <= 64):
            out = _w4a8_2d_pallas(x2, w)
        else:
            out = _w4a8_2d_xla(x2, w)
        return out[:, : w.n].reshape(*lead, w.n)
    if not isinstance(w, QuantWeight):
        return x @ w
    *lead, k = x.shape
    x2 = x.reshape(-1, k)
    if w.act_bits == 8:
        out = _w8a8_2d(x2, w)
    else:
        if w.layout != "kn":
            raise NotImplementedError(
                "W8A16 with streaming-tiled weights is not supported; "
                "retile only W8A8 params")
        interpret = jax.default_backend() != "tpu"
        out = _qmm_2d(x2, w.values, w.scale, interpret=interpret)
    return out[:, : w.n].reshape(*lead, w.n)


def dequantize(w: QuantWeight) -> jnp.ndarray:
    """Reference dequantization (for tests)."""
    v = w.values
    if w.layout == "tiled_n":
        # [..., NT, K, T] -> [..., K, NT*T]
        v = jnp.moveaxis(v, -3, -2)
        v = v.reshape(*v.shape[:-2], -1)
    elif w.layout == "tiled_k":
        # [..., KT, T, N_pad] -> [..., KT*T, N_pad]
        v = v.reshape(*v.shape[:-3], -1, v.shape[-1])
    full = v.astype(jnp.float32) * w.scale[..., None, :]
    return full[..., : w.n]


_QUANT_KEYS = ("q", "k", "v", "o", "gate", "up", "down", "w1", "w2",
               "qkv", "gate_up")


_W4_KEYS = ("qkv", "o", "gate_up", "down")   # + cross_attn "q"
_W4_K_MAJOR = ("o", "down")


def _w4_dims_supported(params, head_dim: Optional[int] = None) -> bool:
    """Whether the decoder's dims fit the megakernel's lanes4 int4 path
    (mirrors ops/megakernel.supports w4 dim checks, derived from leaf
    shapes so callers need no ModuleDims; pass ``head_dim`` when known —
    it cannot be inferred from weight shapes and supports() also requires
    head_dim % 128 == 0 on TPU)."""
    try:
        lay = params["decoder"]["layers"]
        _, ho, d = lay["self_attn"]["o"].shape
        _, f, _ = lay["mlp"]["down"].shape
    except Exception:
        return False
    if jax.default_backend() != "tpu":
        return f % N_TILE == 0 or 2 * f <= N_TILE
    if head_dim is not None and head_dim % 128 != 0:
        return False
    return ho % N_TILE == 0 and f % N_TILE == 0 and d % 128 == 0


def quantize_params_for_decode(params, quantize_encoder: bool = False,
                               act_bits: int = 8,
                               streaming_tiled: bool = None,
                               weight_bits: int = 8,
                               head_dim: Optional[int] = None,
                               head_bits: Optional[int] = None):
    """Quantize the weight-bandwidth-heavy matmuls of the voice model for
    inference. By default the decoder stack + prediction head (read every
    decode step) go int8; the encoder (read once per utterance) stays bf16
    unless ``quantize_encoder``. ``act_bits`` picks W8A8 (8) or W8A16 (16).
    ``streaming_tiled`` re-layouts the stacked decoder weights for the
    megakernel's DMA streams (default: on when T5G_FUSED_ATTN=3).

    ``weight_bits=4`` is the batch-1 LATENCY mode: the six megakernel
    matmuls (fused qkv, self o, cross q, cross o, gate_up, down — the
    2.27 GB/step that bounds batch-1 decode) pack to lane-halves int4
    (``Lanes4Weight``), everything else keeps int8. Speed/quality
    tradeoff — see the lanes4 section header.

    ``head_bits`` (default: follow ``weight_bits``) controls the
    prediction head's big [D, Va] matmul separately — the documented
    fallback for the int4 head's token-distribution shift
    (tools/stress_int4_head.py band in docs/DESIGN.md): pass
    ``head_bits=8`` to keep the head int8 while the layer weights stay
    int4."""
    if weight_bits not in (8, 4):
        raise ValueError(f"weight_bits must be 8 or 4, got {weight_bits}")
    if head_bits is None:
        head_bits = weight_bits
    if head_bits not in (8, 4):
        raise ValueError(f"head_bits must be 8 or 4, got {head_bits}")

    if weight_bits == 4 and not _w4_dims_supported(params, head_dim):
        # without the megakernel the int4 fallback path (q_matmul's XLA
        # dispatch) MATERIALIZES the decoded int8 weights per step —
        # strictly slower than int8. Quantize int8 instead of shipping a
        # silent slowdown.
        import logging

        logging.getLogger(__name__).warning(
            "weight_bits=4 requested but this backbone's dims don't fit "
            "the megakernel's int4 path (need ho%%512==0, f%%512==0, "
            "d%%128==0 on TPU); quantizing int8 instead")
        weight_bits = 8

    def walk4(path, leaf):
        # int4 applies to the stacked decoder leaves the megakernel streams
        # plus the prediction head's big [D, Va] matmul (read every decode
        # step like the layer weights; served by the standalone
        # _w4a8_2d_pallas kernel — NEXT_STEPS r3 #3)
        keys = [getattr(k, "key", None) for k in path]
        if not keys:
            return None
        if (keys[0] == "head" and keys[-1] == "w2" and leaf.ndim == 2
                and head_bits == 4):
            return quantize_weight_lanes4(leaf, k_major=False)
        if keys[0] != "decoder" or getattr(leaf, "ndim", 0) != 3:
            return None
        name = keys[-1]
        if name in _W4_KEYS or (name == "q" and "cross_attn" in keys):
            return quantize_weight_lanes4(leaf, k_major=name in _W4_K_MAJOR)
        return None

    def walk(path, leaf):
        keys = [getattr(k, "key", None) for k in path]
        if not keys:
            return leaf
        if weight_bits == 4:
            w4 = walk4(path, leaf)
            if w4 is not None:
                return w4
        if keys[0] == "decoder" or (quantize_encoder and keys[0] == "encoder"):
            if keys[-1] in _QUANT_KEYS and getattr(leaf, "ndim", 0) == 3:
                return quantize_weight(leaf, act_bits=act_bits)
        if keys[0] == "head" and keys[-1] in ("w1", "w2"):
            return quantize_weight(leaf, act_bits=act_bits)
        return leaf

    out = jax.tree_util.tree_map_with_path(walk, params)
    if streaming_tiled is None:
        # mirror models/t5gemma._fused_attn_mode's default: the megakernel
        # (mode 3) is the TPU default and needs the streaming-tiled layouts
        env = os.environ.get("T5G_FUSED_ATTN")
        streaming_tiled = (env == "3" or
                           (env is None
                            and jax.default_backend() == "tpu"))
    if streaming_tiled:
        out = retile_for_streaming(out)
    return out


# ---------------------------------------------------------------------------
# W4A8: nibble-packed int4 weights with per-K-group scales
# ---------------------------------------------------------------------------


class Quant4Weight(NamedTuple):
    """int4 weights for the batch-1 latency regime: the decode step there is
    purely weight-bandwidth-bound, and int8 already sits at its DMA floor —
    halving the bytes again (2.27 GB -> 1.14 GB for the 2b-2b decoder) is
    the only remaining lever. Two int4 values pack into one int8 byte in a
    HALVES layout (byte row i holds K-rows i and i + K/2), so the in-kernel
    unpack is a sign-extend + one concat along the sublane axis — no lane
    relayout. Per-(K-group, out-channel) scales bound the quantization
    error: on Gaussian weights, group=128 absmax/7 steps at ~0.43 sigma —
    ~12%% relative per matmul vs int8's ~1%% (tests/test_quant.py pins the
    ratio). Whether end-to-end audio quality survives W4 must be validated
    on the released checkpoint; until then this is the documented
    speed/quality tradeoff of the batch-1 latency mode."""

    packed: jnp.ndarray   # int8 [..., K//2, N_pad] (two nibbles per byte)
    scale: jnp.ndarray    # f32  [..., K//group, N_pad]
    n: int                # true (unpadded) output dim — static
    group: int = 128      # K rows sharing one scale


jax.tree_util.register_pytree_node(
    Quant4Weight,
    lambda qw: ((qw.packed, qw.scale), (qw.n, qw.group)),
    lambda aux, leaves: Quant4Weight(leaves[0], leaves[1], aux[0], aux[1]),
)


def quantize_weight_int4(w: jnp.ndarray, group: int = 128,
                         n_tile: int = N_TILE) -> Quant4Weight:
    """Per-(K-group, channel) absmax int4 quantization, nibble-packed."""
    *lead, k, n = w.shape
    if k % (2 * group) and k % 2:
        raise ValueError(f"int4 packing needs even K (got {k})")
    if k % group:
        raise ValueError(f"K ({k}) must be a multiple of group ({group})")
    wf = w.astype(jnp.float32)
    grouped = wf.reshape(*lead, k // group, group, n)
    absmax = jnp.max(jnp.abs(grouped), axis=-2)              # [..., K/g, N]
    scale = jnp.maximum(absmax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(grouped / scale[..., None, :]), -7, 7)
    q = q.astype(jnp.int8).reshape(*lead, k, n)
    low = q[..., : k // 2, :]
    high = q[..., k // 2:, :]
    packed = jnp.bitwise_or(
        jnp.bitwise_and(low, 0xF), jnp.left_shift(high, 4)).astype(jnp.int8)
    n_pad = -(-n // n_tile) * n_tile
    if n_pad != n:
        pad = [(0, 0)] * len(lead)
        packed = jnp.pad(packed, pad + [(0, 0), (0, n_pad - n)])
        scale = jnp.pad(scale, pad + [(0, 0), (0, n_pad - n)])
    return Quant4Weight(packed=packed, scale=scale, n=n, group=group)


def unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """int8 [..., K//2, N] nibble-packed (halves layout) -> int8 [..., K, N].

    Sign extension via arithmetic shifts; the halves layout makes the
    reassembly a single concat along the second-to-last (sublane) axis, so
    the same code runs inside a Pallas kernel without relayouts."""
    low = jnp.right_shift(jnp.left_shift(packed, 4), 4)
    high = jnp.right_shift(packed, 4)
    return jnp.concatenate([low, high], axis=-2)


def dequantize_int4(qw: Quant4Weight) -> jnp.ndarray:
    """Reference dequantization (tests)."""
    w8 = unpack_int4(qw.packed).astype(jnp.float32)
    *lead, k, n_pad = w8.shape
    g = qw.group
    full = (w8.reshape(*lead, k // g, g, n_pad)
            * qw.scale[..., :, None, :]).reshape(*lead, k, n_pad)
    return full[..., : qw.n]


def q4_matmul(x: jnp.ndarray, qw: Quant4Weight) -> jnp.ndarray:
    """Reference W4A8 matmul: per-row int8 activations, per-group rescale,
    f32 accumulation across groups (the megakernel mirrors this math with
    in-kernel unpack + per-group int32 dots)."""
    *lead, k = x.shape
    x2 = x.reshape(-1, k)
    x8, sx = _quantize_act(x2)
    w8 = unpack_int4(qw.packed)                          # [K, N_pad]
    g = qw.group
    n_pad = w8.shape[-1]
    acc = jnp.zeros((x2.shape[0], n_pad), jnp.float32)
    for gi in range(k // g):
        part = jax.lax.dot_general(
            x8[:, gi * g:(gi + 1) * g], w8[gi * g:(gi + 1) * g],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        acc = acc + part.astype(jnp.float32) * qw.scale[gi][None, :]
    out = (acc * sx).astype(x.dtype)
    return out[:, : qw.n].reshape(*lead, qw.n)


def retile_for_streaming(params, tile: int = N_TILE):
    """Re-layout stacked decoder QuantWeights for the megakernel's weight
    streams (one-time transform at model load; prefill and the fallback
    decode paths read the tiled layouts through q_matmul transparently).

    N-streamed matmuls (qkv, cross-q, gate_up) become "tiled_n"
    [L, N_pad/T, K, T]; K-streamed matmuls (o, cross-o, down) become
    "tiled_k" [L, K/T, T, N_pad]. Both layouts make every weight-tile DMA
    a FULL-trailing-dims copy of a contiguous block — a lane-sliced HBM
    DMA (the [*, :, jT:(j+1)T] shape the naive layout would need) hangs at
    run time on the current axon terminal (bisected with minimal probes).
    """
    n_major = ("qkv", "gate_up")
    k_major = ("o", "down")

    def walk(path, leaf):
        if not isinstance(leaf, QuantWeight) or leaf.layout != "kn":
            return leaf
        if leaf.values.ndim != 3:
            return leaf
        keys = [getattr(kk, "key", None) for kk in path]
        name = keys[-1]
        l, k, n_pad = leaf.values.shape
        if name in n_major or (name == "q" and "cross_attn" in keys):
            v = leaf.values.reshape(l, k, n_pad // tile, tile)
            v = v.transpose(0, 2, 1, 3)
            return QuantWeight(v, leaf.scale, leaf.n, leaf.act_bits,
                               "tiled_n")
        if name in k_major and k % tile == 0:
            v = leaf.values.reshape(l, k // tile, tile, n_pad)
            return QuantWeight(v, leaf.scale, leaf.n, leaf.act_bits,
                               "tiled_k")
        return leaf

    return jax.tree_util.tree_map_with_path(
        walk, params, is_leaf=lambda x: isinstance(x, QuantWeight))


# ---------------------------------------------------------------------------
# W4A8 "lanes4": megakernel-native int4 packing (AND-mask dot scheme)
# ---------------------------------------------------------------------------
#
# The batch-1 decode step is weight-DMA-bound with a hard int8 floor:
# 2.27 GB/step at ~800 GB/s peak is ~2.84 ms, i.e. >= 8x realtime at batch 1
# is UNREACHABLE with int8 weights. int4 halves the bytes — but on this
# terminal's libtpu the only int8 vector op Mosaic legalizes is bitwise AND
# (shli/shrsi/muli/subi all fail to legalize; bisected 2026-08-17 with
# minimal probes, see tools/probe_int4_unpack.py). So the kernel never
# unpacks nibbles. Instead:
#
#   byte p = ((q_hi & 15) << 4) | (q_lo + 8)      # hi signed, lo offset-8
#   value(p) = 16*q_hi + (q_lo + 8)               # exact as signed int8
#
# pairing output channels (c, c + T/2) of each weight tile in one byte
# ("lane halves": nibble pairing along N, NOT K, so both nibbles contract
# the SAME activation). Two int8 MXU dots recover both halves exactly:
#
#   D_p  = x8 @ p            = 16*(x8 . q_hi) + (x8 . q_lo) + 8*sum(x8)
#   D_ul = x8 @ (p & 15)     =                  (x8 . q_lo) + 8*sum(x8)
#   x8 . q_hi = (D_p - D_ul) / 16                 # exact multiple of 16
#   x8 . q_lo = D_ul - 8*sum(x8)                  # sum(x8) once per matmul
#
# All arithmetic after the dots is on [M, T/2] int32/f32 OUTPUTS (tiny);
# the only per-byte op is one AND. Scales are per OUTPUT CHANNEL (absmax/7
# over the full K, like the int8 path): per-group scales would need
# K/group dots per tile (measured-class MXU issue overhead) — the Gaussian
# error difference is ~14.4% vs ~12% and the mode is already the
# documented speed/quality tradeoff. Whether audio quality survives W4
# must be validated on the released checkpoint (offline-blocked).


class Lanes4Weight(NamedTuple):
    """int4 weights in the megakernel's lane-halves packing.

    layout "l4n" (N-streamed: qkv / cross-q / gate_up):
        packed [..., NT, K, T/2] — tile j packs channels (j*T + c) in the
        low nibble and (j*T + T/2 + c) in the high nibble of byte column c.
    layout "l4k" (K-streamed: o / cross-o / down):
        packed [..., KT, TK, N_pad/2] — byte column c packs channels c
        (low) and c + N_pad/2 (high), K split into TK-row tiles.
    scale: f32 [..., N_pad] per-channel (absmax/7), natural channel order.
    """

    packed: jnp.ndarray
    scale: jnp.ndarray
    n: int                 # true (unpadded) output dim — static
    layout: str            # "l4n" | "l4k"


jax.tree_util.register_pytree_node(
    Lanes4Weight,
    lambda qw: ((qw.packed, qw.scale), (qw.n, qw.layout)),
    lambda aux, leaves: Lanes4Weight(leaves[0], leaves[1], *aux),
)


def _pack_pair(lo: jnp.ndarray, hi: jnp.ndarray) -> jnp.ndarray:
    """(q_lo, q_hi) int8 in [-7, 7] -> packed byte 16*q_hi + (q_lo + 8)."""
    hi4 = jnp.bitwise_and(hi, 15)
    return jnp.bitwise_or(jnp.left_shift(hi4, 4),
                          (lo + jnp.int8(8))).astype(jnp.int8)


def quantize_weight_lanes4(w: jnp.ndarray, k_major: bool,
                           n_tile: int = N_TILE) -> Lanes4Weight:
    """Per-channel absmax int4 quantization straight into a stream layout."""
    *lead, k, n = w.shape
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=-2)                   # [..., N]
    scale = jnp.maximum(absmax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(wf / scale[..., None, :]), -7, 7).astype(jnp.int8)
    n_pad = -(-n // n_tile) * n_tile
    if n_pad != n:
        q = jnp.pad(q, [(0, 0)] * len(lead) + [(0, 0), (0, n_pad - n)])
        scale = jnp.pad(scale, [(0, 0)] * len(lead) + [(0, n_pad - n)])
    half = n_tile // 2
    if k_major:
        packed = _pack_pair(q[..., : n_pad // 2], q[..., n_pad // 2:])
        tk = n_tile if k % n_tile == 0 else k
        packed = packed.reshape(*lead, k // tk, tk, n_pad // 2)
        return Lanes4Weight(packed, scale, n, "l4k")
    qt = q.reshape(*lead, k, n_pad // n_tile, n_tile)
    packed = _pack_pair(qt[..., :half], qt[..., half:])
    packed = jnp.moveaxis(packed, -2, -3)        # [..., NT, K, T/2]
    return Lanes4Weight(packed, scale, n, "l4n")


def dequantize_lanes4(qw: Lanes4Weight) -> jnp.ndarray:
    """Reference dequantization: exact nibble decode + per-channel scale."""
    p = qw.packed.astype(jnp.int32)
    ul = jnp.bitwise_and(p, 15)                  # q_lo + 8, in [1, 15]
    q_lo = (ul - 8).astype(jnp.float32)
    q_hi = ((p - ul) // 16).astype(jnp.float32)  # exact (signed multiple)
    if qw.layout == "l4n":
        # [..., NT, K, T/2] x2 -> [..., K, NT*T]
        q = jnp.concatenate([q_lo, q_hi], axis=-1)          # [..., NT, K, T]
        q = jnp.moveaxis(q, -3, -2)
        q = q.reshape(*q.shape[:-2], -1)
    else:
        # [..., KT, TK, N/2] x2 -> [..., K, N]
        q = jnp.concatenate([q_lo, q_hi], axis=-1)
        q = q.reshape(*q.shape[:-3], -1, q.shape[-1])
    return (q * qw.scale[..., None, :])[..., : qw.n]


def _w4a8_kernel(x_ref, sx_ref, xsum_ref, p_ref, s_ref, o_ref):
    """One lanes4 (l4n) N-tile: two int8 dots recover the lo/hi nibble
    halves exactly (the megakernel's AND-mask scheme — see
    ops/megakernel._lanes4_halves): stored byte = 16*q_hi + (q_lo + 8), so
    x.q_lo = x.(byte & 15) - 8*sum(x) and x.q_hi = (x.byte - x.(byte & 15))/16."""
    pk = p_ref[0]                                  # [K, T/2] int8 packed
    ul = jnp.bitwise_and(pk, jnp.int8(15))
    dp_ = jax.lax.dot_general(x_ref[:], pk, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    dul = jax.lax.dot_general(x_ref[:], ul, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    lo = dul.astype(jnp.float32) - 8.0 * xsum_ref[:]
    hi = (dp_ - dul).astype(jnp.float32) * 0.0625
    acc = jnp.concatenate([lo, hi], axis=1)        # [M, T] natural order
    o_ref[:] = (acc * sx_ref[:] * s_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _w4a8_2d_pallas(x: jnp.ndarray, w: Lanes4Weight,
                    interpret: bool = False) -> jnp.ndarray:
    """Pallas W4A8 for l4n weights: nibble decode happens INSIDE the dot
    (two int8 MXU dots per tile), so the int4 stream is never materialized
    as int8 in HBM — the whole point of int4 for decode-step latency (the
    XLA fallback below decodes to int8 first, which reads + writes the
    full-size weights and is strictly slower than int8). Used for the
    prediction head's [D, Va] matmul at batch-1 (VERDICT r3 next #2 /
    NEXT_STEPS #3: the head was the last int8 stream, ~151 MB/step)."""
    m, k = x.shape
    nt, kw, th = w.packed.shape
    assert kw == k, (kw, k)
    t = 2 * th
    x8, sx = _quantize_act(x)
    m_pad = -(-m // M_PAD_I8) * M_PAD_I8
    if m_pad != m:
        x8 = jnp.pad(x8, ((0, m_pad - m), (0, 0)))
        sx = jnp.pad(sx, ((0, m_pad - m), (0, 0)))
    xsum = jnp.sum(x8.astype(jnp.float32), axis=-1, keepdims=True)
    n_pad = nt * t
    out = pl.pallas_call(
        _w4a8_kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((m_pad, k), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, th), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_pad, t), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * m_pad * k * n_pad // 2,
            bytes_accessed=k * n_pad // 2 + m_pad * k + m_pad * n_pad * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x8, sx, xsum, w.packed, w.scale.reshape(1, n_pad))
    return out[:m]


def _w4a8_2d_xla(x: jnp.ndarray, w: Lanes4Weight) -> jnp.ndarray:
    """XLA oracle with the kernel's EXACT math: per-row int8 activations,
    int8 dot against the decoded int4 levels, f32 rescale. (Used by
    prefill and the non-megakernel fallback paths; correctness-grade.)"""
    x8, sx = _quantize_act(x)
    p = w.packed.astype(jnp.int32)
    ul = jnp.bitwise_and(p, 15)
    q_lo = (ul - 8).astype(jnp.int8)
    q_hi = ((p - ul) // 16).astype(jnp.int8)
    if w.layout == "l4n":
        qv = jnp.concatenate([q_lo, q_hi], axis=-1)         # [NT, K, T]
        o = jax.lax.dot_general(x8, qv, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32)
        o = o.reshape(x.shape[0], -1)
    else:
        qv = jnp.concatenate([q_lo, q_hi], axis=-1)         # [KT, TK, N]
        kt, tk, n_pad = qv.shape
        o = jax.lax.dot_general(x8.reshape(x.shape[0], kt, tk), qv,
                                (((1, 2), (0, 1)), ((), ())),
                                preferred_element_type=jnp.int32)
    return (o.astype(jnp.float32) * sx * w.scale[None, :]).astype(x.dtype)
