"""Model loading: orbax bundles and HF-interchange safetensors directories.

Handles both checkpoint worlds:

- this framework's training output (``bundle`` orbax dir + ``config.json``),
- the reference's HF export format (``model.safetensors`` +
  ``T5GemmaVoiceConfig`` json — reference hf_export/, scripts/
  export_t5gemma_voice_hf.py), converted through models/convert.py, with the
  VoiceConfig reconstructed from the exported fields (token ids, PM-RoPE
  scale, backbone dims from the embedded ``t5_config_dict``).
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

from ..config import BackboneConfig, ModuleDims, VoiceConfig
from ..models import convert

log = logging.getLogger(__name__)


def _dims_from_t5_config(sub: Dict[str, Any]) -> ModuleDims:
    return ModuleDims(
        vocab_size=sub.get("vocab_size", 256000),
        hidden_size=sub.get("hidden_size", 2304),
        intermediate_size=sub.get("intermediate_size", 9216),
        num_layers=sub.get("num_hidden_layers", 26),
        num_heads=sub.get("num_attention_heads", 8),
        num_kv_heads=sub.get("num_key_value_heads", 4),
        head_dim=sub.get("head_dim", 256),
        rope_theta=sub.get("rope_theta", 10000.0),
        rms_norm_eps=sub.get("rms_norm_eps", 1e-6),
        attn_logit_softcap=sub.get("attn_logit_softcapping", 50.0),
        final_logit_softcap=sub.get("final_logit_softcapping", 30.0),
        query_pre_attn_scalar=sub.get("query_pre_attn_scalar", 256.0),
        sliding_window=sub.get("sliding_window", 4096),
        layer_types=tuple(sub.get("layer_types") or ()),
    )


def voice_config_from_hf(hf_cfg: Dict[str, Any]) -> VoiceConfig:
    """Reference T5GemmaVoiceConfig json -> VoiceConfig
    (reference hf_export/configuration_t5gemma_voice.py:50-152)."""
    t5 = hf_cfg.get("t5_config_dict") or {}
    enc = _dims_from_t5_config(t5.get("encoder", t5))
    dec = _dims_from_t5_config(t5.get("decoder", t5))
    return VoiceConfig(
        backbone=BackboneConfig(encoder=enc, decoder=dec),
        audio_vocab_size=int(hf_cfg.get("audio_vocab_size", 65536)),
        n_special=int(hf_cfg.get("n_special", 5)),
        encodec_sr=int(hf_cfg.get("encodec_sr", 50)),
        codec_audio_sr=int(hf_cfg.get("codec_audio_sr") or 44100),
        use_pm_rope=bool(hf_cfg.get("use_pm_rope", 1)),
        progress_scale=float(hf_cfg.get("progress_scale", 2000.0)),
        x_sep_token=hf_cfg.get("x_sep_token", 255999),
        add_eos_to_text=int(hf_cfg.get("add_eos_to_text", 0)),
        add_bos_to_text=int(hf_cfg.get("add_bos_to_text", 0)),
        special_first=bool(hf_cfg.get("special_first", 0)),
        text_guard_frames_per_token=int(
            hf_cfg.get("text_guard_frames_per_token", 0)),
        extra_cutoff=float(hf_cfg.get("extra_cutoff", 5.0)),
        dtype="bfloat16",
    )


def _load_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors import safe_open

    out = {}
    with safe_open(path, framework="np") as f:
        for k in f.keys():
            out[k] = f.get_tensor(k)
    return out


def load_hf_dir(model_dir: str, dtype: Optional[str] = None
                ) -> Tuple[Any, VoiceConfig, Dict[str, Any]]:
    """Load a reference-format HF export directory."""
    with open(os.path.join(model_dir, "config.json")) as f:
        hf_cfg = json.load(f)
    cfg = voice_config_from_hf(hf_cfg)
    st_files = [fn for fn in os.listdir(model_dir) if fn.endswith(".safetensors")]
    sd: Dict[str, np.ndarray] = {}
    for fn in sorted(st_files):
        sd.update(_load_safetensors(os.path.join(model_dir, fn)))
    params = convert.torch_state_dict_to_params(sd, cfg, dtype=dtype or cfg.dtype)
    return params, cfg, hf_cfg


def load_bundle_dir(model_dir: str) -> Tuple[Any, VoiceConfig, Dict[str, Any]]:
    """Load this framework's orbax bundle directory (params only)."""
    import orbax.checkpoint as ocp

    from ..train import checkpoint as ckpt

    with open(os.path.join(model_dir, "config.json")) as f:
        raw = json.load(f)
    cfg = voice_config_from_json(raw)
    for name in (ckpt.BEST_BUNDLE, ckpt.BUNDLE, ckpt.BUNDLE_PREV):
        path = os.path.join(model_dir, name)
        if os.path.exists(path):
            state = ocp.PyTreeCheckpointer().restore(path)
            params = state["params"] if "params" in state else state[0]
            return params, cfg, raw
    raise FileNotFoundError(f"no bundle under {model_dir}")


def voice_config_from_json(raw: Dict[str, Any]) -> VoiceConfig:
    b = raw.get("backbone", {})

    def dims(d):
        d = dict(d)
        d["layer_types"] = tuple(d.get("layer_types") or ())
        if isinstance(d["layer_types"], str):
            import ast

            d["layer_types"] = tuple(ast.literal_eval(d["layer_types"]))
        return ModuleDims(**d)

    kw = {k: v for k, v in raw.items() if k != "backbone"}
    if isinstance(kw.get("x_sep_token"), str):
        kw["x_sep_token"] = int(kw["x_sep_token"])
    return VoiceConfig(
        backbone=BackboneConfig(encoder=dims(b["encoder"]),
                                decoder=dims(b["decoder"])),
        **kw,
    )


def load_reference_pth(path: str) -> Tuple[Any, VoiceConfig, Dict[str, Any]]:
    """Load a reference training bundle (.pth with pickled args) directly
    (reference: inference_commandline.py:116-155). Requires torch."""
    import sys
    from pathlib import Path

    import torch

    bundle = torch.load(path, map_location="cpu", weights_only=False)
    args = bundle.get("args")
    sys.path.insert(0, str(Path(__file__).resolve().parents[2] / "tools"))
    try:
        from convert_reference_bundle import args_to_voice_config
    finally:
        sys.path.pop(0)
    cfg = args_to_voice_config(args)
    sd = {k: v.float().numpy() for k, v in bundle["model"].items()
          if hasattr(v, "numpy")}
    params = convert.torch_state_dict_to_params(sd, cfg, dtype=cfg.dtype)
    return params, cfg, {}


def load_voice_model(model_dir: str):
    """Auto-detect the checkpoint flavor: HF safetensors dir, orbax bundle
    dir, or a reference .pth bundle file."""
    if os.path.isfile(model_dir) and model_dir.endswith((".pth", ".pt")):
        return load_reference_pth(model_dir)
    files = set(os.listdir(model_dir))
    if any(f.endswith(".safetensors") for f in files):
        return load_hf_dir(model_dir)
    return load_bundle_dir(model_dir)
