"""HF Whisper state_dict -> JAX pytree (key-exhaustive).

Consumes a ``WhisperForConditionalGeneration`` (or bare ``WhisperModel``)
state dict — torch tensors or numpy arrays — and builds asr/model.py's
parameter tree. Same loud-failure contract as models/convert.py and
codec/convert.py: every tensor must be consumed (or match a known-tied
pattern like ``proj_out.weight``); leftovers raise with their names.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from .model import WhisperConfig


def _np(v):
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v, np.float32)


def whisper_state_dict_to_params(
    sd: Mapping[str, Any], cfg: WhisperConfig,
) -> Dict[str, Any]:
    import jax.numpy as jnp

    flat = {}
    for k, v in sd.items():
        k = k[len("model."):] if k.startswith("model.") else k
        flat[k] = _np(v)
    used = set()

    def take(key):
        if key not in flat:
            raise KeyError(f"whisper conversion: missing tensor {key!r}")
        used.add(key)
        return flat[key]

    def lin(prefix, bias=True):
        out = {"w": take(prefix + ".weight").T}
        if bias:
            out["b"] = take(prefix + ".bias")
        return out

    def attn(prefix):
        q = lin(prefix + ".q_proj")
        k = lin(prefix + ".k_proj", bias=False)
        v = lin(prefix + ".v_proj")
        o = lin(prefix + ".out_proj")
        return {"q_w": q["w"], "q_b": q["b"], "k_w": k["w"],
                "v_w": v["w"], "v_b": v["b"], "o_w": o["w"], "o_b": o["b"]}

    def lnp(prefix):
        return {"g": take(prefix + ".weight"), "b": take(prefix + ".bias")}

    def enc_layer(i):
        p = f"encoder.layers.{i}"
        return {
            "ln1": lnp(p + ".self_attn_layer_norm"),
            "attn": attn(p + ".self_attn"),
            "ln2": lnp(p + ".final_layer_norm"),
            "mlp": {"fc1_w": take(p + ".fc1.weight").T,
                    "fc1_b": take(p + ".fc1.bias"),
                    "fc2_w": take(p + ".fc2.weight").T,
                    "fc2_b": take(p + ".fc2.bias")},
        }

    def dec_layer(i):
        p = f"decoder.layers.{i}"
        return {
            "ln1": lnp(p + ".self_attn_layer_norm"),
            "self_attn": attn(p + ".self_attn"),
            "ln2": lnp(p + ".encoder_attn_layer_norm"),
            "cross_attn": attn(p + ".encoder_attn"),
            "ln3": lnp(p + ".final_layer_norm"),
            "mlp": {"fc1_w": take(p + ".fc1.weight").T,
                    "fc1_b": take(p + ".fc1.bias"),
                    "fc2_w": take(p + ".fc2.weight").T,
                    "fc2_b": take(p + ".fc2.bias")},
        }

    def stack(layers):
        import jax

        return jax.tree_util.tree_map(
            lambda *xs: jnp.asarray(np.stack(xs)), *layers)

    params = {
        "encoder": {
            # torch conv [out, in, k] -> [k, in, out]
            "conv1": {"w": jnp.asarray(
                take("encoder.conv1.weight").transpose(2, 1, 0)),
                "b": jnp.asarray(take("encoder.conv1.bias"))},
            "conv2": {"w": jnp.asarray(
                take("encoder.conv2.weight").transpose(2, 1, 0)),
                "b": jnp.asarray(take("encoder.conv2.bias"))},
            "pos": jnp.asarray(take("encoder.embed_positions.weight")),
            "layers": stack([enc_layer(i)
                             for i in range(cfg.encoder_layers)]),
            "ln_post": {
                "g": jnp.asarray(take("encoder.layer_norm.weight")),
                "b": jnp.asarray(take("encoder.layer_norm.bias"))},
        },
        "decoder": {
            "embed": jnp.asarray(take("decoder.embed_tokens.weight")),
            "pos": jnp.asarray(take("decoder.embed_positions.weight")),
            "layers": stack([dec_layer(i)
                             for i in range(cfg.decoder_layers)]),
            "ln_post": {
                "g": jnp.asarray(take("decoder.layer_norm.weight")),
                "b": jnp.asarray(take("decoder.layer_norm.bias"))},
        },
    }
    # convert remaining numpy leaves (attn/mlp/ln dicts) to jnp
    import jax

    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, params)

    known_tied = {"proj_out.weight"}  # tied to decoder.embed_tokens
    leftovers = sorted(set(flat) - used - known_tied)
    if leftovers:
        raise ValueError(
            "whisper conversion left unconsumed tensors (layout mismatch): "
            + ", ".join(leftovers[:12])
            + ("..." if len(leftovers) > 12 else ""))
    return params
