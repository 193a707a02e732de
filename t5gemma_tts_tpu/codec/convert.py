"""Weight converters: published XCodec2 / w2v-BERT torch checkpoints -> JAX.

The reference loads XCodec2 weights from safetensors with a ``.beta -> .bias``
key rename (reference: data/tokenizer.py:82-84); this module applies the same
rename and maps the pip-package module names onto this framework's pytrees.
Torch convs are [out, in, k] -> ours are [k, in, out]; linears transpose.

``w2vbert_state_dict_to_params`` is validated against the local HF torch
implementation in tests/test_codec_encoder.py; the full-checkpoint mapping is
best-effort by name/shape until exercised against real released weights.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import numpy as np

from .semantic import ConformerConfig


def _t(x):  # linear: torch [out, in] -> [in, out]
    return np.asarray(x).T


def _conv(x):  # conv1d: torch [out, in, k] -> WIO [k, in, out]
    return np.asarray(x).transpose(2, 1, 0)


def rename_beta_keys(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """XCodec2 safetensors store some biases as ``.beta``
    (reference: data/tokenizer.py:82-84)."""
    return {k.replace(".beta", ".bias"): np.asarray(v) for k, v in sd.items()}


# ---------------------------------------------------------------------------
# w2v-BERT conformer
# ---------------------------------------------------------------------------


def w2vbert_state_dict_to_params(
    sd: Mapping[str, np.ndarray], cfg: ConformerConfig, prefix: str = "",
    dtype=None,
) -> Dict[str, Any]:
    import jax.numpy as jnp

    dtype = jnp.dtype(dtype or jnp.float32)
    g = lambda k: np.asarray(sd[prefix + k])  # noqa: E731

    def ln(base):
        return {"w": jnp.asarray(g(base + ".weight"), dtype),
                "b": jnp.asarray(g(base + ".bias"), dtype)}

    def lin(base):
        return {"w": jnp.asarray(_t(g(base + ".weight")), dtype),
                "b": jnp.asarray(g(base + ".bias"), dtype)}

    layers = []
    for i in range(cfg.num_layers):
        base = f"encoder.layers.{i}."
        layers.append({
            "ffn1": {"norm": ln(base + "ffn1_layer_norm"),
                     "in": lin(base + "ffn1.intermediate_dense"),
                     "out": lin(base + "ffn1.output_dense")},
            "attn_norm": ln(base + "self_attn_layer_norm"),
            "attn": {
                "q": lin(base + "self_attn.linear_q"),
                "k": lin(base + "self_attn.linear_k"),
                "v": lin(base + "self_attn.linear_v"),
                "o": lin(base + "self_attn.linear_out"),
                "distance_embedding": jnp.asarray(
                    g(base + "self_attn.distance_embedding.weight"), dtype),
            },
            "conv": {
                "norm": ln(base + "conv_module.layer_norm"),
                "pw1": jnp.asarray(
                    _conv(g(base + "conv_module.pointwise_conv1.weight")), dtype),
                "dw": jnp.asarray(
                    _conv(g(base + "conv_module.depthwise_conv.weight")), dtype),
                "dw_norm": ln(base + "conv_module.depthwise_layer_norm"),
                "pw2": jnp.asarray(
                    _conv(g(base + "conv_module.pointwise_conv2.weight")), dtype),
            },
            "ffn2": {"norm": ln(base + "ffn2_layer_norm"),
                     "in": lin(base + "ffn2.intermediate_dense"),
                     "out": lin(base + "ffn2.output_dense")},
            "final_norm": ln(base + "final_layer_norm"),
        })
    import jax

    layers = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)
    return {
        "feature_projection": {
            "norm": ln("feature_projection.layer_norm"),
            "proj": lin("feature_projection.projection"),
        },
        "layers": layers,
    }


# ---------------------------------------------------------------------------
# full XCodec2 checkpoint
# ---------------------------------------------------------------------------


def xcodec2_state_dict_to_params(
    sd: Mapping[str, np.ndarray], cfg, dtype=None
) -> Dict[str, Any]:
    """Map an XCodec2 ``model.safetensors`` state dict onto decoder+encoder
    pytrees. cfg: XCodec2Config."""
    import jax
    import jax.numpy as jnp

    dtype = jnp.dtype(dtype or jnp.float32)
    sd = rename_beta_keys(sd)

    def has(k):
        return k in sd

    def lin(base):
        return {"w": jnp.asarray(_t(sd[base + ".weight"]), dtype),
                "b": jnp.asarray(sd[base + ".bias"], dtype)}

    def ln(base):
        return {"w": jnp.asarray(sd[base + ".weight"], dtype),
                "b": jnp.asarray(sd[base + ".bias"], dtype)}

    def conv(base, bias=True):
        out = {"w": jnp.asarray(_conv(sd[base + ".weight"]), dtype)}
        if bias and has(base + ".bias"):
            out["b"] = jnp.asarray(sd[base + ".bias"], dtype)
        elif bias:
            out["b"] = jnp.zeros(out["w"].shape[-1], dtype)
        return out

    params: Dict[str, Any] = {}

    # quantizer (ResidualFSQ with one quantizer)
    for cand in ("generator.quantizer", "quantizer"):
        if has(cand + ".project_in.weight"):
            params["fsq"] = {
                "project_in": lin(cand + ".project_in"),
                "project_out": lin(cand + ".project_out"),
            }
            break

    if has("fc_post_a.weight"):
        params["fc_post_a"] = lin("fc_post_a")
    if has("fc_prior.weight"):
        params["fc_prior"] = lin("fc_prior")

    # vocos backbone + head
    vb = None
    for cand in ("generator.backbone", "backbone"):
        if has(cand + ".embed.weight"):
            vb = cand
            break
    if vb is not None:
        n_blocks = 0
        while has(f"{vb}.convnext.{n_blocks}.dwconv.weight"):
            n_blocks += 1
        blocks = []
        for i in range(n_blocks):
            b = f"{vb}.convnext.{i}."
            blocks.append({
                "dwconv": conv(b + "dwconv"),
                "norm": ln(b + "norm"),
                "pw1": lin(b + "pwconv1"),
                "pw2": lin(b + "pwconv2"),
                "gamma": jnp.asarray(sd[b + "gamma"], dtype),
            })
        blocks = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
        head_base = vb.replace("backbone", "head")
        params["vocos"] = {
            "embed": conv(vb + ".embed"),
            "norm": ln(vb + ".norm"),
            "blocks": blocks,
            "final_norm": ln(vb + ".final_layer_norm"),
            "head": lin(head_base + ".out"),
        }

    # semantic conformer
    if has("semantic_model.feature_projection.projection.weight") or has(
        "semantic_model.encoder.layers.0.ffn1.intermediate_dense.weight"
    ):
        params["semantic_model"] = w2vbert_state_dict_to_params(
            sd, cfg.conformer_cfg, prefix="semantic_model.", dtype=dtype
        )

    # semantic conv encoder
    if has("SemanticEncoder_module.initial_conv.weight"):
        params["semantic_encoder"] = {
            "initial": {"w": jnp.asarray(
                _conv(sd["SemanticEncoder_module.initial_conv.weight"]), dtype)},
            "res1": conv("SemanticEncoder_module.residual_blocks.1"),
            "res2": conv("SemanticEncoder_module.residual_blocks.3"),
            "final": {"w": jnp.asarray(
                _conv(sd["SemanticEncoder_module.final_conv.weight"]), dtype)},
        }

    # acoustic encoder: mapped positionally from CodecEnc.* conv weights
    acoustic_keys = sorted(
        k for k in sd if k.startswith("CodecEnc.") and k.endswith(".weight")
        and sd[k].ndim == 3
    )
    if acoustic_keys:
        params["_acoustic_raw"] = {
            k: jnp.asarray(_conv(sd[k]), dtype) for k in acoustic_keys
        }

    return params
