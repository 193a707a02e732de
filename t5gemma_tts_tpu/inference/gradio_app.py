"""Gradio web UI for interactive TTS (reference: inference_gradio.py:283-375).

Same controls as the reference Blocks app: reference-audio upload, reference
text (Whisper auto-transcription when empty), target text, target duration
(auto-estimate when 0), seed (random when blank), and top_k/top_p/min_p/
temperature sliders. Resources load once (the reference lru_caches +
torch.compiles; here the decode engine is jit-cached per shape bucket).

Run: python -m t5gemma_tts_tpu.inference.gradio_app --model_dir <dir> ...
"""

from __future__ import annotations

import argparse
import logging
import random
from functools import lru_cache
from typing import Optional

import numpy as np

log = logging.getLogger(__name__)


@lru_cache(maxsize=1)
def _load_resources(model_dir: str, codec_dir: Optional[str],
                    random_codec: bool, quantize: str = "none"):
    from argparse import Namespace

    from .cli import _load_codec, _text_tokenizer
    from .loading import load_voice_model
    from .pipeline import TTSPipeline

    params, cfg, hf_cfg = load_voice_model(model_dir)
    codec_args = Namespace(codec_dir=codec_dir, random_codec=random_codec,
                           xcodec2_model_name=None)
    audio_tok = _load_codec(codec_args, hf_cfg)
    text_tok = _text_tokenizer(hf_cfg)
    return TTSPipeline(params, cfg, text_tok, audio_tok,
                       int8=quantize == "int8", int4=quantize == "int4")


@lru_cache(maxsize=1)
def _load_whisper():
    from .transcribe import load_transcriber

    transcriber = load_transcriber()

    class _Compat:  # .transcribe(path)["text"] shape, as the UI callback uses
        def transcribe(self, path):
            return {"text": transcriber(path)}

    return _Compat()


def make_infer_fn(model_dir: str, codec_dir: Optional[str] = None,
                  random_codec: bool = False, *, quantize: str = "none",
                  error_cls=RuntimeError, whisper_loader=None):
    """The synthesis callback behind the UI button, gradio-free so tests can
    drive it directly (errors raise ``error_cls``; build_demo passes
    gr.Error)."""
    from ..config import DecodeConfig
    from .pipeline import Request

    whisper_loader = whisper_loader or _load_whisper

    def infer(reference_audio, reference_text, target_text, target_duration,
              seed, top_k, top_p, min_p, temperature):
        pipe = _load_resources(model_dir, codec_dir, random_codec,
                               quantize)
        if not target_text:
            raise error_cls("target text is required")
        if seed in (None, "", 0):
            seed = random.randint(1, 2 ** 31 - 1)  # reference :70-85
        prefix = reference_text or None
        if reference_audio and not prefix:
            try:
                prefix = whisper_loader().transcribe(reference_audio)["text"]
            except Exception as exc:
                raise error_cls(f"whisper transcription failed: {exc}")
        dcfg = DecodeConfig(
            top_k=int(top_k), top_p=float(top_p), min_p=float(min_p),
            temperature=float(temperature), seed=int(seed),
        )
        res = pipe.synthesize(
            Request(
                target_text=target_text,
                audio_path=reference_audio or None,
                prompt_transcript=prefix,
                target_duration=(float(target_duration)
                                 if target_duration else None),
            ),
            dcfg, seed=int(seed),
        )
        sr = pipe.audio_tokenizer.sample_rate
        info = (f"seed={seed} | {res.tokens_per_sec:.1f} tok/s | "
                f"RTF {res.rtf:.2f}x")
        return (sr, np.asarray(res.wav, np.float32)), info

    return infer


def build_demo(model_dir: str, codec_dir: Optional[str] = None,
               random_codec: bool = False, quantize: str = "none"):
    import gradio as gr

    infer = make_infer_fn(model_dir, codec_dir, random_codec,
                          quantize=quantize, error_cls=gr.Error)

    with gr.Blocks(title="T5Gemma-TTS (TPU)") as demo:
        gr.Markdown("## T5Gemma-TTS — TPU-native synthesis")
        with gr.Row():
            with gr.Column():
                ref_audio = gr.Audio(label="Reference audio (voice cloning)",
                                     type="filepath")
                ref_text = gr.Textbox(label="Reference transcript "
                                            "(blank = Whisper)")
                tgt_text = gr.Textbox(label="Target text", lines=3)
                duration = gr.Number(label="Target duration (s, 0 = auto)",
                                     value=0)
                seed = gr.Number(label="Seed (blank = random)", value=1)
                with gr.Row():
                    top_k = gr.Slider(0, 100, value=30, step=1, label="top_k")
                    top_p = gr.Slider(0.0, 1.0, value=0.9, label="top_p")
                with gr.Row():
                    min_p = gr.Slider(0.0, 0.5, value=0.0, label="min_p")
                    temperature = gr.Slider(0.1, 2.0, value=0.8,
                                            label="temperature")
                btn = gr.Button("Synthesize", variant="primary")
            with gr.Column():
                audio_out = gr.Audio(label="Generated audio")
                stats = gr.Textbox(label="Stats")
        btn.click(
            infer,
            [ref_audio, ref_text, tgt_text, duration, seed, top_k, top_p,
             min_p, temperature],
            [audio_out, stats],
        )
    return demo


def main(argv=None):
    from ..utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_dir", required=True)
    ap.add_argument("--codec_dir", default=None)
    ap.add_argument("--random_codec", action="store_true")
    ap.add_argument("--quantize", default="none",
                    choices=["none", "int8", "int4"],
                    help="decode-weight quantization (int4 = batch-1 "
                         "latency mode; speed/quality tradeoff)")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=7860)
    args = ap.parse_args(argv)
    demo = build_demo(args.model_dir, args.codec_dir, args.random_codec,
                      args.quantize)
    demo.launch(server_name=args.host, server_port=args.port)


if __name__ == "__main__":
    main()
