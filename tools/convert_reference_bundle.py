"""Convert a reference training bundle (.pth) into this framework's format.

The reference saves ``bundle.pth`` = {model, optimizer, scheduler, args}
torch pickles (reference: steps/trainer.py:604-640). This tool reads one with
torch (CPU), maps the model state dict through models/convert.py (including
LoRA-wrapped checkpoints, which are merged), reconstructs a VoiceConfig from
the pickled args, and writes an HF-interchange directory that both this
framework's loader and the reference's hf_export modeling code accept.

Usage: python tools/convert_reference_bundle.py --bundle bundle.pth --out dir/
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def args_to_voice_config(args_ns):
    from t5gemma_tts_tpu.config import (BackboneConfig, ModuleDims,
                                        VoiceConfig, backbone_preset)

    get = lambda k, d=None: getattr(args_ns, k, d)  # noqa: E731
    name = str(get("t5gemma_model_name", "google/t5gemma-2b-2b-ul2"))
    preset = "2b-2b" if "2b-2b" in name else ("b-b" if "-b-b-" in name else "2b-2b")
    # extension over the reference args: an explicit dims dict (written by
    # this framework's tools/tests for non-catalog backbones)
    dims = get("backbone_dims")
    if dims:
        md = ModuleDims(**dims)
        backbone = BackboneConfig(encoder=md, decoder=md)
    else:
        backbone = backbone_preset(preset)
    av = get("audio_vocab_size", 65536)
    if isinstance(av, list):
        av = av[0]
    return VoiceConfig(
        backbone=backbone,
        audio_vocab_size=int(av),
        n_special=int(get("n_special", 5)),
        encodec_sr=int(get("encodec_sr", 50)),
        use_pm_rope=bool(get("use_pm_rope", 1)),
        progress_scale=float(get("progress_scale", 2000.0)),
        x_sep_token=get("x_sep_token", 255999),
        add_eos_to_text=int(get("add_eos_to_text", 0) or 0),
        add_bos_to_text=int(get("add_bos_to_text", 0) or 0),
        eog_weight=float(get("eog_weight", 1.0)),
        text_guard_frames_per_token=int(get("text_guard_frames_per_token", 0) or 0),
        extra_cutoff=float(get("extra_cutoff", 5.0)),
    )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--bundle", required=True, help="reference bundle.pth")
    ap.add_argument("--out", required=True)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args(argv)

    import torch

    from t5gemma_tts_tpu.export.hf_export import export_hf
    from t5gemma_tts_tpu.models.convert import torch_state_dict_to_params

    bundle = torch.load(args.bundle, map_location="cpu", weights_only=False)
    model_sd = bundle["model"]
    cfg = args_to_voice_config(bundle.get("args", argparse.Namespace()))
    sd = {k: v.float().numpy() for k, v in model_sd.items()
          if hasattr(v, "numpy")}
    params = torch_state_dict_to_params(sd, cfg, dtype=args.dtype)
    export_hf(params, cfg, args.out, dtype=args.dtype)
    print(f"converted {args.bundle} -> {args.out}")


if __name__ == "__main__":
    main()
