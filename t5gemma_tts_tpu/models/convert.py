"""Weight interop: HF/PyTorch state dicts <-> this framework's pytrees.

Accepts numpy tensors keyed by torch ``state_dict`` names from any of:

- the reference training bundle (``T5GemmaVoiceModel``; keys under
  ``backbone.model.{encoder,decoder}...`` plus ``audio_embedding.0...`` and
  ``predict_layer.0...`` — reference models/t5gemma.py:266-418),
- the reference HF export (``T5GemmaVoiceForConditionalGeneration``; same but
  under ``model.{encoder,decoder}`` — reference
  hf_export/modeling_t5gemma_voice.py:338-507),
- a plain HF ``T5GemmaForConditionalGeneration`` (backbone only).

Torch ``nn.Linear`` stores [out, in]; our kernels are [in, out], so linears
are transposed. ``lm_head`` / ``decoder.embed_tokens`` are dropped, mirroring
prune_text_modules=2 (reference models/t5gemma.py:293-317). LoRA-wrapped
checkpoints are merged on the fly (W + alpha/r * B @ A).
"""

from __future__ import annotations

import logging
import re
from typing import Any, Dict, Mapping, Optional

import numpy as np

from ..config import VoiceConfig

log = logging.getLogger(__name__)

_DROP_PREFIXES = (
    "lm_head.", "encoder_module.", "decoder_module.",
    "class_weight", "accuracy_metrics",
    # pruned by the reference at prune_text_modules=2 (models/t5gemma.py:
    # 293-317): the decoder's text embedding is replaced by audio embeddings
    "decoder.embed_tokens.",
)

_NORM_MAP = {
    "pre_self_attn_layernorm": "pre_self_attn_norm",
    "post_self_attn_layernorm": "post_self_attn_norm",
    "pre_cross_attn_layernorm": "pre_cross_attn_norm",
    "post_cross_attn_layernorm": "post_cross_attn_norm",
    "pre_feedforward_layernorm": "pre_ff_norm",
    "post_feedforward_layernorm": "post_ff_norm",
}


def _strip_prefix(key: str) -> Optional[str]:
    """Normalize any supported naming scheme to ``{encoder|decoder}...`` or
    ``audio_embedding...`` / ``predict_layer...``; None -> dropped."""
    for pre in ("backbone.base_model.model.model.", "backbone.model.",
                "backbone.", "model."):
        if key.startswith(pre):
            key = key[len(pre):]
            break
    # tolerate a second nesting level (e.g. "model.encoder" after "backbone.")
    if key.startswith("model."):
        key = key[len("model."):]
    for d in _DROP_PREFIXES:
        if key.startswith(d) or f".{d}" in key:
            return None
    if "rotary_emb" in key or key.endswith("inv_freq"):
        return None
    return key


def _merge_lora(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Merge peft LoRA keys (``*.lora_A/B``, base at ``*.base_layer``) into
    plain weights (reference models/t5gemma.py:458-491 key layouts)."""
    if not any("lora_A" in k for k in sd):
        return sd
    out: Dict[str, np.ndarray] = {}
    loras: Dict[str, Dict[str, np.ndarray]] = {}
    for k, v in sd.items():
        m = re.match(r"(.*)\.lora_(A|B)(?:\.default)?\.weight$", k)
        if m:
            loras.setdefault(m.group(1), {})[m.group(2)] = v
            continue
        out[k.replace(".base_layer.weight", ".weight")] = v
    for base, ab in loras.items():
        if "A" not in ab or "B" not in ab:
            continue
        wkey = base + ".weight"
        if wkey in out:
            # peft scaling alpha/r is folded by merge_and_unload in the
            # reference export; raw adapters here assume alpha == 2r.
            out[wkey] = out[wkey] + 2.0 * (ab["B"] @ ab["A"])
    return out


class _Tracked(dict):
    """Dict recording which keys were read (conversion exhaustiveness)."""

    def __init__(self, *a):
        super().__init__(*a)
        self.used = set()

    def __getitem__(self, k):
        self.used.add(k)
        return super().__getitem__(k)

    def __contains__(self, k):
        # Membership probes do NOT count as consumption: a tensor that
        # conversion code only ever checks with ``in`` but never reads must
        # still show up as a leftover for the strict exhaustiveness check.
        return super().__contains__(k)


def torch_state_dict_to_params(
    sd: Mapping[str, np.ndarray], cfg: VoiceConfig, dtype=None,
    strict: bool = False,
) -> Dict[str, Any]:
    """Build this framework's parameter pytree from a torch state dict.

    Every tensor must either be consumed or match a known-prunable pattern
    (lm_head / tied text embeddings / rotary buffers — reference
    models/t5gemma.py:293-317); leftovers are logged, or raised with
    ``strict`` (the codec converter has the same contract)."""
    import jax.numpy as jnp

    dtype = jnp.dtype(dtype or cfg.dtype)
    sd = _merge_lora({k: np.asarray(v) for k, v in sd.items()})

    enc_layers: Dict[int, _Tracked] = {}
    dec_layers: Dict[int, _Tracked] = {}
    flat = _Tracked()
    locations: Dict[str, tuple] = {}
    for raw_key, val in sd.items():
        key = _strip_prefix(raw_key)
        if key is None:
            continue
        m = re.match(r"(encoder|decoder)\.layers\.(\d+)\.(.*)", key)
        if m:
            side, idx, rest = m.group(1), int(m.group(2)), m.group(3)
            store = enc_layers if side == "encoder" else dec_layers
            store.setdefault(idx, _Tracked())[rest] = val
            locations[raw_key] = (store[idx], rest)
        else:
            flat[key] = val
            locations[raw_key] = (flat, key)

    def stack_layers(layers: Dict[int, Dict[str, np.ndarray]], n: int,
                     is_decoder: bool) -> Dict[str, Any]:
        if len(layers) != n:
            raise ValueError(
                f"expected {n} layers, found {sorted(layers)} in state dict"
            )
        out: Dict[str, Any] = {
            new: jnp.asarray(
                np.stack([layers[i][f"{old}.weight"] for i in range(n)]), dtype
            )
            for old, new in _NORM_MAP.items()
            if (is_decoder or "cross" not in old)
        }
        def attn(name):
            return {
                p: jnp.asarray(
                    np.stack(
                        [layers[i][f"{name}.{p}_proj.weight"].T for i in range(n)]
                    ),
                    dtype,
                )
                for p in ("q", "k", "v", "o")
            }
        out["self_attn"] = attn("self_attn")
        if is_decoder:
            out["cross_attn"] = attn("cross_attn")
        out["mlp"] = {
            p: jnp.asarray(
                np.stack([layers[i][f"mlp.{p}_proj.weight"].T for i in range(n)]),
                dtype,
            )
            for p in ("gate", "up", "down")
        }
        return out

    enc_dims, dec_dims = cfg.backbone.encoder, cfg.backbone.decoder
    params: Dict[str, Any] = {
        "encoder": {
            "embed": jnp.asarray(flat["encoder.embed_tokens.weight"], dtype),
            "layers": stack_layers(enc_layers, enc_dims.num_layers, False),
            "final_norm": jnp.asarray(flat["encoder.norm.weight"], dtype),
        },
        "decoder": {
            "layers": stack_layers(dec_layers, dec_dims.num_layers, True),
            "final_norm": jnp.asarray(flat["decoder.norm.weight"], dtype),
        },
    }
    if "audio_embedding.0.weight" in flat:
        params["audio_embed"] = jnp.asarray(flat["audio_embedding.0.weight"], dtype)
        params["head"] = {
            "w1": jnp.asarray(flat["predict_layer.0.0.weight"].T, dtype),
            "b1": jnp.asarray(flat["predict_layer.0.0.bias"], dtype),
            "w2": jnp.asarray(flat["predict_layer.0.2.weight"].T, dtype),
            "b2": jnp.asarray(flat["predict_layer.0.2.bias"], dtype),
        }
    else:
        log.warning("state dict has no audio head; backbone-only conversion")

    leftovers = sorted(
        raw for raw, (cont, key) in locations.items() if key not in cont.used
    )
    if leftovers:
        msg = (f"{len(leftovers)} state-dict tensors were not consumed by the "
               f"conversion (first few: {leftovers[:8]})")
        if strict:
            raise ValueError(msg)
        log.warning(msg)
    return params


def params_to_torch_state_dict(params: Dict[str, Any],
                               prefix: str = "model.") -> Dict[str, np.ndarray]:
    """Inverse conversion for HF export (safetensors interchange).

    Every tensor is made C-contiguous: safetensors serializes the raw buffer
    and silently ignores transpose strides, so a ``.T`` view would round-trip
    scrambled."""
    sd: Dict[str, np.ndarray] = {}

    def unstack(side: str, layers: Dict[str, Any], is_decoder: bool):
        n = np.asarray(layers["pre_self_attn_norm"]).shape[0]
        inv_norm = {v: k for k, v in _NORM_MAP.items()}
        for i in range(n):
            base = f"{prefix}{side}.layers.{i}."
            for new, arr in layers.items():
                if new in inv_norm:
                    sd[base + inv_norm[new] + ".weight"] = np.asarray(
                        arr[i], np.float32
                    )
            for name, key in (("self_attn", "self_attn"),
                              ("cross_attn", "cross_attn")):
                if key not in layers:
                    continue
                for p in ("q", "k", "v", "o"):
                    sd[base + f"{name}.{p}_proj.weight"] = np.ascontiguousarray(np.asarray(
                        layers[key][p][i], np.float32
                    ).T)
            for p in ("gate", "up", "down"):
                sd[base + f"mlp.{p}_proj.weight"] = np.ascontiguousarray(
                    np.asarray(layers["mlp"][p][i], np.float32).T)

    unstack("encoder", params["encoder"]["layers"], False)
    unstack("decoder", params["decoder"]["layers"], True)
    sd[f"{prefix}encoder.embed_tokens.weight"] = np.asarray(
        params["encoder"]["embed"], np.float32
    )
    sd[f"{prefix}encoder.norm.weight"] = np.asarray(
        params["encoder"]["final_norm"], np.float32
    )
    sd[f"{prefix}decoder.norm.weight"] = np.asarray(
        params["decoder"]["final_norm"], np.float32
    )
    if "audio_embed" in params:
        sd["audio_embedding.0.weight"] = np.asarray(params["audio_embed"], np.float32)
        sd["predict_layer.0.0.weight"] = np.ascontiguousarray(
            np.asarray(params["head"]["w1"], np.float32).T)
        sd["predict_layer.0.0.bias"] = np.asarray(params["head"]["b1"], np.float32)
        sd["predict_layer.0.2.weight"] = np.ascontiguousarray(
            np.asarray(params["head"]["w2"], np.float32).T)
        sd["predict_layer.0.2.bias"] = np.asarray(params["head"]["b2"], np.float32)
    return sd
