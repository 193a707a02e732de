"""Finite Scalar Quantization (FSQ) — the XCodec2 single-codebook quantizer.

XCodec2 quantizes with a ResidualFSQ of ``num_quantizers=1`` over levels
[4]*8, i.e. a plain FSQ with a 65536-entry implicit codebook (reference:
data/tokenizer.py wraps the pip package; config.py:161/219 fixes
audio_vocab_size=65536). With one quantizer the residual wrapper reduces to
``project_in -> FSQ -> project_out`` with unit scale, which is what this
module implements.

The quantization math follows the published FSQ formulation:
  bound(z) = tanh(z + shift) * half_l - offset        (per dim)
  digits   = round(bound(z))       in [-(l-1)/2 .. (l-1)/2] (offset for even l)
  code     = digits / half_width   in [-1, 1]
  index    = sum_d (digit_d + half_width_d) * basis_d,  basis = cumprod(levels)

Everything is closed-form arithmetic — index decode needs no table lookup at
all (div/mod per dim), which XLA vectorizes onto the VPU directly; the
implicit 65536 x 8 codebook never materializes.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class FSQConfig:
    levels: Tuple[int, ...] = (4, 4, 4, 4, 4, 4, 4, 4)
    dim: int = 2048  # outer dim projected in/out of the codebook space

    @property
    def codebook_dim(self) -> int:
        return len(self.levels)

    @property
    def codebook_size(self) -> int:
        return int(np.prod(self.levels))


def _consts(cfg: FSQConfig):
    levels = jnp.asarray(cfg.levels, jnp.float32)
    basis = jnp.asarray(
        np.concatenate([[1], np.cumprod(cfg.levels[:-1])]).astype(np.int64),
        jnp.int32,
    )
    half_width = jnp.asarray([l // 2 for l in cfg.levels], jnp.float32)
    return levels, basis, half_width


def init_params(rng: jax.Array, cfg: FSQConfig, dtype=jnp.float32) -> Dict:
    k1, k2 = jax.random.split(rng)
    d, cd = cfg.dim, cfg.codebook_dim
    return {
        "project_in": {
            "w": (jax.random.normal(k1, (d, cd), jnp.float32) * d ** -0.5).astype(dtype),
            "b": jnp.zeros((cd,), dtype),
        },
        "project_out": {
            "w": (jax.random.normal(k2, (cd, d), jnp.float32) * cd ** -0.5).astype(dtype),
            "b": jnp.zeros((d,), dtype),
        },
    }


def bound(cfg: FSQConfig, z: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
    levels = jnp.asarray(cfg.levels, jnp.float32)
    half_l = (levels - 1) * (1 + eps) / 2
    offset = jnp.where(levels % 2 == 0, 0.5, 0.0)
    shift = jnp.arctanh(offset / half_l)
    return jnp.tanh(z + shift) * half_l - offset


def quantize(cfg: FSQConfig, z: jnp.ndarray) -> jnp.ndarray:
    """z: [..., codebook_dim] float -> normalized codes in [-1, 1] with a
    straight-through gradient."""
    _, _, half_width = _consts(cfg)
    bounded = bound(cfg, z.astype(jnp.float32))
    digits = jnp.round(bounded)
    digits = bounded + jax.lax.stop_gradient(digits - bounded)  # STE
    return digits / half_width


def codes_to_indices(cfg: FSQConfig, codes: jnp.ndarray) -> jnp.ndarray:
    """Normalized codes [..., d] -> int32 indices [...]."""
    _, basis, half_width = _consts(cfg)
    digits = jnp.round(codes * half_width + half_width).astype(jnp.int32)
    return jnp.sum(digits * basis, axis=-1)


def indices_to_codes(cfg: FSQConfig, indices: jnp.ndarray) -> jnp.ndarray:
    """int indices [...] -> normalized codes [..., d]; pure arithmetic."""
    levels_i = jnp.asarray(cfg.levels, jnp.int32)
    _, basis, half_width = _consts(cfg)
    digits = (indices[..., None] // basis) % levels_i
    return (digits.astype(jnp.float32) - half_width) / half_width


def encode(params: Dict, cfg: FSQConfig, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x: [..., dim] -> (quantized [..., dim], indices [...])."""
    z = x @ params["project_in"]["w"] + params["project_in"]["b"]
    codes = quantize(cfg, z)
    idx = codes_to_indices(cfg, codes)
    out = codes.astype(x.dtype) @ params["project_out"]["w"] + params["project_out"]["b"]
    return out, idx


def decode(params: Dict, cfg: FSQConfig, indices: jnp.ndarray) -> jnp.ndarray:
    """indices [...] -> dequantized embeddings [..., dim]
    (= ResidualFSQ.get_output_from_indices)."""
    codes = indices_to_codes(cfg, indices)
    w = params["project_out"]["w"]
    return codes.astype(w.dtype) @ w + params["project_out"]["b"]
