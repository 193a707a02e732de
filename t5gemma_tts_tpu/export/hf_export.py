"""Export trained params to the reference's HF interchange format.

Produces a directory with ``model.safetensors`` + ``config.json`` carrying
the same tensor names and ``T5GemmaVoiceConfig`` fields as the reference
export (reference: scripts/export_t5gemma_voice_hf.py:78-177,
hf_export/configuration_t5gemma_voice.py:50-152), so checkpoints flow both
ways: the reference's ``trust_remote_code`` model class can consume our
exports, and our loader consumes theirs (inference/loading.py).

Usage: python -m t5gemma_tts_tpu.export.hf_export --bundle <exp_dir> --out <dir>
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
from typing import Any, Dict, Optional

import numpy as np

from ..config import VoiceConfig
from ..models import convert


def _module_config_dict(dims, is_decoder: bool, cross_hidden: int) -> Dict[str, Any]:
    d = {
        "vocab_size": dims.vocab_size,
        "hidden_size": dims.hidden_size,
        "intermediate_size": dims.intermediate_size,
        "num_hidden_layers": dims.num_layers,
        "num_attention_heads": dims.num_heads,
        "num_key_value_heads": dims.num_kv_heads,
        "head_dim": dims.head_dim,
        "rope_theta": dims.rope_theta,
        "rms_norm_eps": dims.rms_norm_eps,
        "attn_logit_softcapping": dims.attn_logit_softcap,
        "final_logit_softcapping": dims.final_logit_softcap,
        "query_pre_attn_scalar": dims.query_pre_attn_scalar,
        "sliding_window": dims.sliding_window,
        "layer_types": list(dims.layer_types),
        "is_decoder": is_decoder,
        "use_cache": True,
    }
    if is_decoder:
        d["cross_attention_hidden_size"] = cross_hidden
    return d


def voice_config_to_hf(cfg: VoiceConfig,
                       xcodec2_model_name: Optional[str] = None,
                       text_tokenizer_name: Optional[str] = None) -> Dict[str, Any]:
    s = cfg.special
    enc = _module_config_dict(cfg.backbone.encoder, False, 0)
    dec = _module_config_dict(cfg.backbone.decoder, True,
                              cfg.backbone.cross_attention_hidden_size)
    return {
        "model_type": "t5gemma_voice",
        "is_encoder_decoder": True,
        "architectures": ["T5GemmaVoiceForConditionalGeneration"],
        "t5_config_dict": {"encoder": enc, "decoder": dec,
                           "is_encoder_decoder": True},
        "t5gemma_model_name": "google/t5gemma-2b-2b-ul2",
        "attn_implementation": "eager",
        "precision": cfg.dtype,
        "prune_text_modules": 2,
        "use_pm_rope": int(cfg.use_pm_rope),
        "n_codebooks": cfg.n_codebooks,
        "audio_vocab_size": cfg.audio_vocab_size,
        "n_special": cfg.n_special,
        "empty_token": s.empty,
        "eog": s.eog,
        "eos": s.eos,
        "audio_pad_token": s.pad,
        "y_sep_token": s.y_sep,
        "x_sep_token": cfg.x_sep_token,
        "special_first": int(cfg.special_first),
        "encodec_sr": float(cfg.encodec_sr),
        "progress_scale": cfg.progress_scale,
        "extra_cutoff": cfg.extra_cutoff,
        "text_guard_frames_per_token": cfg.text_guard_frames_per_token,
        "add_eos_to_text": cfg.add_eos_to_text,
        "add_bos_to_text": cfg.add_bos_to_text,
        "audio_tokenizer": "xcodec2",
        "codec_audio_sr": float(cfg.codec_audio_sr),
        "xcodec2_model_name": xcodec2_model_name,
        "text_tokenizer_name": text_tokenizer_name,
        "bos_token_id": s.empty,
        "eos_token_id": s.eos,
        "pad_token_id": s.pad,
        "auto_map": {
            "AutoConfig": "configuration_t5gemma_voice.T5GemmaVoiceConfig",
            "AutoModelForSeq2SeqLM":
                "modeling_t5gemma_voice.T5GemmaVoiceForConditionalGeneration",
        },
    }


def export_hf(params: Any, cfg: VoiceConfig, out_dir: str,
              dtype: str = "bfloat16", **cfg_kwargs) -> str:
    os.makedirs(out_dir, exist_ok=True)
    sd = convert.params_to_torch_state_dict(params)
    from safetensors.numpy import save_file

    if dtype == "bfloat16":
        import ml_dtypes

        sd = {k: v.astype(ml_dtypes.bfloat16) for k, v in sd.items()}
    save_file(sd, os.path.join(out_dir, "model.safetensors"))
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(voice_config_to_hf(cfg, **cfg_kwargs), f, indent=2)
    # ship the trust_remote_code shims so auto_map resolves from the export
    # dir alone (reference: scripts/export_t5gemma_voice_hf.py:167-175 copies
    # its own modeling/config files for the same reason)
    import shutil

    templates = os.path.join(os.path.dirname(__file__), "templates")
    for fn in ("configuration_t5gemma_voice.py", "modeling_t5gemma_voice.py"):
        shutil.copy(os.path.join(templates, fn), os.path.join(out_dir, fn))
    return out_dir


def export_peft_adapter(adapters: Any, lcfg, out_dir: str,
                        base_model_name: str = "") -> str:
    """Write a PEFT-format adapter directory (adapter_model.safetensors +
    adapter_config.json) from this framework's adapter pytree, so users can
    ship adapters instead of merged checkpoints (reference:
    scripts/export_t5gemma_voice_hf_lora.py:105-108 saves the peft adapter
    via backbone.save_pretrained).

    Key layout matches what peft writes for the exported
    trust_remote_code model (templates/modeling_t5gemma_voice.py module
    names): ``base_model.model.model.{encoder|decoder}.layers.{i}.
    {self_attn|cross_attn|mlp}.{t}_proj.lora_{A|B}.weight`` with torch
    shapes A=[r, in], B=[out, r]; peft applies the alpha/r scale at load,
    identically to train/lora.py's wrap/merge."""
    import numpy as np
    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)
    sd = {}
    for side in ("encoder", "decoder"):
        tree = (adapters or {}).get(side)
        layer_tree = (tree or {}).get("layers") if isinstance(tree, dict) else None
        if not layer_tree:
            continue
        for mod in ("self_attn", "cross_attn", "mlp"):
            for tgt, ad in (layer_tree.get(mod) or {}).items():
                if ad is None:
                    continue
                a, b = np.asarray(ad["a"], np.float32), np.asarray(
                    ad["b"], np.float32)
                for i in range(a.shape[0]):
                    base = (f"base_model.model.model.{side}.layers.{i}."
                            f"{mod}.{tgt}_proj")
                    sd[base + ".lora_A.weight"] = np.ascontiguousarray(a[i].T)
                    sd[base + ".lora_B.weight"] = np.ascontiguousarray(b[i].T)
    if not sd:
        raise ValueError("adapter tree contains no adapters to export")
    save_file(sd, os.path.join(out_dir, "adapter_model.safetensors"))
    config = {
        "peft_type": "LORA",
        "base_model_name_or_path": base_model_name,
        "task_type": None,
        "inference_mode": True,
        "r": lcfg.r,
        "lora_alpha": lcfg.alpha,
        "lora_dropout": 0.05,
        "bias": "none",
        "fan_in_fan_out": False,
        "target_modules": sorted({t + "_proj" for t in lcfg.targets}),
        "modules_to_save": None,
    }
    with open(os.path.join(out_dir, "adapter_config.json"), "w") as f:
        json.dump(config, f, indent=2)
    return out_dir


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--bundle", required=True, help="training exp_dir")
    ap.add_argument("--out", required=True)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--lora_bundle", default=None,
                    help="adapter bundle to merge before export (the "
                         "reference's merge_and_unload path, "
                         "scripts/export_t5gemma_voice_hf_lora.py)")
    ap.add_argument("--lora_r", type=int, default=16)
    ap.add_argument("--lora_alpha", type=int, default=32)
    ap.add_argument("--save_adapter_dir", default=None,
                    help="also write a PEFT-format adapter directory "
                         "(reference --save_adapter_dir)")
    args = ap.parse_args(argv)

    from ..inference.loading import load_bundle_dir

    params, cfg, _ = load_bundle_dir(args.bundle)
    if args.lora_bundle:
        import orbax.checkpoint as ocp

        from ..train import lora

        adapters = ocp.PyTreeCheckpointer().restore(args.lora_bundle)
        lcfg = lora.LoraConfig(r=args.lora_r, alpha=args.lora_alpha)
        if args.save_adapter_dir:
            export_peft_adapter(adapters, lcfg, args.save_adapter_dir)
            print(f"saved PEFT adapter to {args.save_adapter_dir}")
        params = lora.merge(params, adapters, lcfg)
        print(f"merged LoRA adapters from {args.lora_bundle}")
    export_hf(params, cfg, args.out, dtype=args.dtype)
    print(f"exported to {args.out}")


if __name__ == "__main__":
    main()
