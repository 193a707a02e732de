"""w2v-BERT conformer encoder (semantic branch of XCodec2), in JAX.

The XCodec2 encoder conditions its quantizer on hidden layer 16 of
facebook/w2v-bert-2.0 (reference wraps this via the pip package; see
SURVEY.md §7.3). This module implements the conformer stack functionally:

  feature_projection:  LayerNorm(160) -> Linear(160 -> D)
  per layer:           0.5 * FFN1 + x
                       SelfAttention(relative_key distance bias) + x
                       ConvModule (GLU -> causal depthwise k=31 -> swish) + x
                       0.5 * FFN2 + x -> final LayerNorm
  output:              hidden state after ``num_layers`` layers (16 of 24 —
                       the deeper layers are never computed).

Layers are stacked and scanned; the relative-distance bias uses a clamped
distance embedding exactly like HF's ``position_embeddings_type='relative_key'``
(left 64 / right 8). Parity vs torch is tested in tests/test_codec_encoder.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..ops.masks import NEG_INF

PyTree = Any


@dataclass(frozen=True)
class ConformerConfig:
    input_dim: int = 160
    hidden_size: int = 1024
    num_layers: int = 16          # layers actually computed (hidden_states[16])
    num_heads: int = 16
    intermediate_size: int = 4096
    conv_kernel: int = 31
    left_max_pos: int = 64
    right_max_pos: int = 8
    eps: float = 1e-5

    @property
    def head_size(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def num_distance_embeddings(self) -> int:
        return self.left_max_pos + self.right_max_pos + 1


def tiny_conformer_config() -> ConformerConfig:
    return ConformerConfig(input_dim=160, hidden_size=32, num_layers=2,
                           num_heads=4, intermediate_size=64, conv_kernel=7,
                           left_max_pos=8, right_max_pos=3)


# ---------------------------------------------------------------------------
# params
# ---------------------------------------------------------------------------


def _lin(rng, i, o, dtype):
    return {
        "w": (jax.random.normal(rng, (i, o), jnp.float32) * i ** -0.5).astype(dtype),
        "b": jnp.zeros((o,), dtype),
    }


def _ln(d, dtype):
    return {"w": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)}


def init_params(rng: jax.Array, cfg: ConformerConfig, dtype=jnp.float32) -> PyTree:
    d, f = cfg.hidden_size, cfg.intermediate_size
    keys = jax.random.split(rng, 2 + 12 * cfg.num_layers)
    kit = iter(keys)

    def ffn():
        return {"norm": _ln(d, dtype),
                "in": _lin(next(kit), d, f, dtype),
                "out": _lin(next(kit), f, d, dtype)}

    layers = []
    for _ in range(cfg.num_layers):
        layers.append({
            "ffn1": ffn(),
            "attn_norm": _ln(d, dtype),
            "attn": {
                "q": _lin(next(kit), d, d, dtype),
                "k": _lin(next(kit), d, d, dtype),
                "v": _lin(next(kit), d, d, dtype),
                "o": _lin(next(kit), d, d, dtype),
                "distance_embedding": (
                    jax.random.normal(
                        next(kit), (cfg.num_distance_embeddings, cfg.head_size),
                        jnp.float32,
                    ) * 0.02
                ).astype(dtype),
            },
            "conv": {
                "norm": _ln(d, dtype),
                "pw1": (jax.random.normal(next(kit), (1, d, 2 * d), jnp.float32)
                        * d ** -0.5).astype(dtype),
                "dw": (jax.random.normal(next(kit), (cfg.conv_kernel, 1, d),
                                         jnp.float32) * 0.1).astype(dtype),
                "dw_norm": _ln(d, dtype),
                "pw2": (jax.random.normal(next(kit), (1, d, d), jnp.float32)
                        * d ** -0.5).astype(dtype),
            },
            "ffn2": ffn(),
            "final_norm": _ln(d, dtype),
        })
    layers = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)
    return {
        "feature_projection": {
            "norm": _ln(cfg.input_dim, dtype),
            "proj": _lin(next(kit), cfg.input_dim, d, dtype),
        },
        "layers": layers,
    }


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------


def _layer_norm(p, x, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return (((xf - mu) * jax.lax.rsqrt(var + eps)) * p["w"].astype(jnp.float32)
            + p["b"].astype(jnp.float32)).astype(x.dtype)


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _ffn(p, x, eps):
    h = _layer_norm(p["norm"], x, eps)
    h = _swish(h @ p["in"]["w"] + p["in"]["b"])
    return h @ p["out"]["w"] + p["out"]["b"]


def _attention(p, x, bias, cfg: ConformerConfig):
    b, t, d = x.shape
    h, hs = cfg.num_heads, cfg.head_size

    def split(z):
        return z.reshape(b, t, h, hs).transpose(0, 2, 1, 3)

    q = split(x @ p["q"]["w"] + p["q"]["b"])
    k = split(x @ p["k"]["w"] + p["k"]["b"])
    v = split(x @ p["v"]["w"] + p["v"]["b"])
    scale = hs ** -0.5
    scores = jnp.einsum("bhld,bhrd->bhlr", q, k,
                        preferred_element_type=jnp.float32) * scale

    # relative_key distance bias (HF Wav2Vec2BertSelfAttention, relative_key)
    pos_l = jnp.arange(t)[:, None]
    pos_r = jnp.arange(t)[None, :]
    dist = jnp.clip(pos_r - pos_l, -cfg.left_max_pos, cfg.right_max_pos)
    demb = jnp.take(p["distance_embedding"], dist + cfg.left_max_pos, axis=0)
    rel = jnp.einsum("bhld,lrd->bhlr", q.astype(jnp.float32),
                     demb.astype(jnp.float32)) * scale
    scores = scores + rel
    if bias is not None:
        scores = scores + bias
    w = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhlr,bhrd->bhld", w, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
    return out @ p["o"]["w"] + p["o"]["b"]


def _conv_module(p, x, pad_mask, cfg: ConformerConfig):
    h = _layer_norm(p["norm"], x, cfg.eps)
    if pad_mask is not None:
        h = jnp.where(pad_mask[..., None], 0.0, h)
    h = jax.lax.conv_general_dilated(
        h, p["pw1"], (1,), "VALID", dimension_numbers=("NWC", "WIO", "NWC")
    )
    a, g = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.sigmoid(g)  # GLU over channels
    h = jax.lax.conv_general_dilated(
        h, p["dw"], (1,), [(cfg.conv_kernel - 1, 0)],  # causal left padding
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=cfg.hidden_size,
    )
    h = _layer_norm(p["dw_norm"], h, cfg.eps)
    h = _swish(h)
    return jax.lax.conv_general_dilated(
        h, p["pw2"], (1,), "VALID", dimension_numbers=("NWC", "WIO", "NWC")
    )


def forward(
    params: PyTree,
    cfg: ConformerConfig,
    input_features: jnp.ndarray,          # [B, T, input_dim]
    lengths: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Returns the hidden state after cfg.num_layers conformer layers."""
    fp = params["feature_projection"]
    h = _layer_norm(fp["norm"], input_features, cfg.eps)
    h = h @ fp["proj"]["w"] + fp["proj"]["b"]

    if lengths is not None:
        t = h.shape[1]
        pad = jnp.arange(t)[None, :] >= lengths[:, None]
        h = jnp.where(pad[..., None], 0.0, h)
        bias = jnp.where(pad[:, None, None, :], NEG_INF, 0.0)
    else:
        pad, bias = None, None

    def body(h, lp):
        h = h + 0.5 * _ffn(lp["ffn1"], h, cfg.eps)
        a = _attention(lp["attn"], _layer_norm(lp["attn_norm"], h, cfg.eps),
                       bias, cfg)
        h = h + a
        h = h + _conv_module(lp["conv"], h, pad, cfg)
        h = h + 0.5 * _ffn(lp["ffn2"], h, cfg.eps)
        return _layer_norm(lp["final_norm"], h, cfg.eps), None

    h, _ = jax.lax.scan(body, h, params["layers"])
    return h
