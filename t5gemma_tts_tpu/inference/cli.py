"""TTS inference CLI — flag-compatible with the reference HF CLI.

Mirrors reference inference_commandline_hf.py:72-242: identical flag names
and defaults (top_k=30, top_p=0.9, temperature=0.8, seed=1), optional Whisper
auto-transcription of the reference recording, JA normalization, duration
estimation, generated.wav + stats output, and --dump_tokens .npy dumps.

Run: python -m t5gemma_tts_tpu.inference.cli --model_dir <dir> \
        --target_text "..." [--reference_speech ref.wav] ...
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
from typing import Optional

import numpy as np

log = logging.getLogger(__name__)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="T5Gemma-TTS (TPU) inference",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    # flags mirror reference inference_commandline_hf.py:72-95
    p.add_argument("--reference_speech", default=None)
    p.add_argument("--target_text",
                   default="こんにちは、私はAIです。これは音声合成のテストです。")
    p.add_argument("--model_dir", default="./t5gemma_voice_hf")
    p.add_argument("--reference_text", default=None)
    p.add_argument("--target_duration", type=float, default=None)
    p.add_argument("--top_k", type=int, default=30)
    p.add_argument("--top_p", type=float, default=0.9)
    p.add_argument("--min_p", type=float, default=0.0)
    p.add_argument("--temperature", type=float, default=0.8)
    p.add_argument("--silence_tokens", default=None)
    p.add_argument("--repeat_prompt", default="0")
    p.add_argument("--stop_repetition", type=int, default=3)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--output_dir", default="./generated_tts")
    p.add_argument("--cut_off_sec", type=float, default=100)
    p.add_argument("--dump_tokens", action="store_true")
    p.add_argument("--lang", default=None)
    p.add_argument("--xcodec2_model_name", default=None)
    p.add_argument("--codec_dir", default=None,
                   help="local dir with XCodec2 model.safetensors")
    p.add_argument("--quantize", default="none",
                   choices=["none", "int8", "int4"],
                   help="decode-weight quantization: int8 (W8A8, the "
                        "serving default in bench.py) or int4 (lanes4 "
                        "batch-1 latency mode; speed/quality tradeoff)")
    p.add_argument("--kv_cache", default="auto",
                   choices=["auto", "dense", "paged", "paged_f8", "paged_i8"],
                   help="decode KV-cache strategy (see DecodeConfig.kv_cache)")
    p.add_argument("--approx_top_k", action="store_true",
                   help="TPU-native approximate top-k candidate fetch")
    p.add_argument("--random_codec", action="store_true",
                   help="random-init codec weights (smoke testing only)")
    return p


def _load_codec(args, hf_cfg):
    from ..codec.audio_tokenizer import AudioTokenizer
    from ..codec.model import XCodec2Config, init_decoder_params

    ccfg = XCodec2Config()
    if args.random_codec:
        import jax

        params = init_decoder_params(jax.random.PRNGKey(0), ccfg)
        return AudioTokenizer(params, ccfg)
    codec_dir = args.codec_dir
    if codec_dir is None:
        model_id = args.xcodec2_model_name or (hf_cfg or {}).get(
            "xcodec2_model_name") or "NandemoGHS/Anime-XCodec2-44.1kHz-v2"
        try:
            from huggingface_hub import hf_hub_download

            path = hf_hub_download(repo_id=model_id, filename="model.safetensors")
            codec_dir = os.path.dirname(path)
        except Exception as exc:
            raise RuntimeError(
                f"cannot download codec weights for {model_id}: {exc}. "
                "Pass --codec_dir with a local model.safetensors."
            ) from exc
    from safetensors import safe_open

    from ..codec.convert import xcodec2_state_dict_to_params

    sd = {}
    with safe_open(os.path.join(codec_dir, "model.safetensors"),
                   framework="np") as f:
        for k in f.keys():
            sd[k] = f.get_tensor(k)
    params = xcodec2_state_dict_to_params(sd, ccfg)
    return AudioTokenizer(params, ccfg)


def _text_tokenizer(hf_cfg):
    from transformers import AutoTokenizer

    name = (hf_cfg or {}).get("text_tokenizer_name") or (hf_cfg or {}).get(
        "t5gemma_model_name") or "google/t5gemma-2b-2b-ul2"
    tok = AutoTokenizer.from_pretrained(name)
    return lambda text: tok.encode(text.strip(), add_special_tokens=False)


def run_inference(args: argparse.Namespace) -> str:
    from ..config import DecodeConfig
    from .audio_io import write_wav
    from .loading import load_voice_model
    from .pipeline import Request, TTSPipeline
    from .textnorm import normalize_text_with_lang

    params, cfg, hf_cfg = load_voice_model(args.model_dir)
    audio_tok = _load_codec(args, hf_cfg)
    text_tok = _text_tokenizer(hf_cfg)
    pipe = TTSPipeline(params, cfg, text_tok, audio_tok,
                       int8=args.quantize == "int8",
                       int4=args.quantize == "int4")

    reference_speech = args.reference_speech
    no_ref = reference_speech is None or str(reference_speech).lower() in {
        "", "none", "null"}
    ref_text = args.reference_text
    has_ref_text = ref_text is not None and str(ref_text).strip().lower() not in {
        "", "none", "null"}
    if no_ref and has_ref_text:
        raise ValueError("reference_text provided without reference_speech")

    prefix = ""
    if not no_ref and not has_ref_text:
        from .transcribe import load_transcriber

        prefix = load_transcriber()(reference_speech)
        print(f"[Info] Whisper transcribed text: {prefix}")
    elif has_ref_text:
        prefix = ref_text

    lang = None if args.lang in {None, "", "none", "null"} else str(args.lang)
    target_text, lang_code = normalize_text_with_lang(args.target_text, lang)

    silence = ()
    if args.silence_tokens:
        silence = tuple(json.loads(str(args.silence_tokens)))

    repeat = args.repeat_prompt
    if isinstance(repeat, str) and repeat.lower() != "max":
        repeat = int(repeat)

    prompt_end_frame = -1
    if not no_ref:
        # limit the reference read to cut_off_sec at the file's sample rate
        # (reference inference_commandline_hf.py:173-182)
        from .audio_io import read_wav

        try:
            import wave

            with wave.open(reference_speech, "rb") as w:
                file_sr = w.getframerate()
        except Exception:
            _, file_sr = read_wav(reference_speech)
        prompt_end_frame = int(args.cut_off_sec * file_sr)

    dcfg = DecodeConfig(
        top_k=args.top_k, top_p=args.top_p, min_p=args.min_p,
        temperature=args.temperature, stop_repetition=args.stop_repetition,
        silence_tokens=silence, seed=args.seed,
        kv_cache=args.kv_cache, approx_top_k=args.approx_top_k,
    )
    res = pipe.synthesize(
        Request(
            target_text=target_text, lang=lang_code,
            audio_path=None if no_ref else reference_speech,
            prompt_transcript=prefix or None,
            target_duration=args.target_duration,
            repeat_prompt=repeat,
            prompt_end_frame=prompt_end_frame,
        ),
        dcfg, seed=args.seed,
    )

    os.makedirs(args.output_dir, exist_ok=True)
    out = os.path.join(args.output_dir, "generated.wav")
    write_wav(out, res.wav, audio_tok.sample_rate)
    max_abs = float(np.abs(res.wav).max())
    rms = float(np.sqrt((res.wav ** 2).mean()))
    print(f"[Info] Generated audio stats -> max_abs: {max_abs:.6f}, rms: {rms:.6f}")
    if args.dump_tokens:
        np.save(os.path.join(args.output_dir, "generated_frames.npy"),
                res.gen_frames)
        np.save(os.path.join(args.output_dir, "concat_frames.npy"),
                res.concat_frames)
        print(f"[Info] Saved token arrays to {args.output_dir}")
    print(f"[Success] Generated audio saved to {out}")
    return out


def main(argv: Optional[list] = None) -> None:
    from ..utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    from ..utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    logging.basicConfig(level=logging.INFO)
    args = build_parser().parse_args(argv)
    run_inference(args)


if __name__ == "__main__":
    main()
