"""Reference-audio transcription (voice cloning without a transcript).

The reference shells out to the ``whisper`` pip package
(reference inference_commandline_hf.py:144-152, inference_gradio.py:92-96).
That package is optional here; when it is absent the HF ``transformers``
Whisper implementation (already a framework dependency) serves as the
fallback, so ``--reference_text`` stays optional either way:

  1. ``whisper`` package, model "large-v3-turbo"   (reference behavior)
  2. transformers WhisperForConditionalGeneration  (torch CPU; same weights
     family "openai/whisper-large-v3-turbo")

Audio loads through the framework's own wav reader/resampler
(inference/audio_io.py) — no torchaudio/ffmpeg needed for wav input.
"""

from __future__ import annotations

import logging
from typing import Callable, Optional

log = logging.getLogger(__name__)

Transcriber = Callable[[str], str]

WHISPER_SR = 16000


def hf_transcriber(processor, model) -> Transcriber:
    """transformers-backed transcriber from an already-built processor +
    WhisperForConditionalGeneration (separated so tests drive it with tiny
    local objects; ``load_transcriber`` wires the published checkpoint)."""
    from . import audio_io

    def transcribe(path: str) -> str:
        wav = audio_io.load_for_encode(path, WHISPER_SR)
        feats = processor(
            wav, sampling_rate=WHISPER_SR, return_tensors="pt"
        ).input_features.to(model.dtype)
        ids = model.generate(feats, max_new_tokens=min(
            444, model.config.max_target_positions - 4))
        return processor.batch_decode(ids, skip_special_tokens=True)[0].strip()

    return transcribe


def load_transcriber(
    model_name: str = "large-v3-turbo",
    hf_model_name: Optional[str] = None,
) -> Transcriber:
    """Best-available transcriber; raises RuntimeError when neither backend
    can load (callers turn that into "pass --reference_text")."""
    try:
        import whisper  # optional, reference's backend

        m = whisper.load_model(model_name)
        return lambda path: m.transcribe(path)["text"].strip()
    except ImportError:
        log.info("whisper package not installed; using transformers Whisper")
    except Exception as exc:  # model download/load failure
        log.warning("whisper.load_model failed (%s); trying transformers", exc)

    try:
        from transformers import (
            WhisperForConditionalGeneration,
            WhisperProcessor,
        )

        name = hf_model_name or "openai/whisper-large-v3-turbo"
        processor = WhisperProcessor.from_pretrained(name)
        model = WhisperForConditionalGeneration.from_pretrained(name)
        model.eval()
        return hf_transcriber(processor, model)
    except Exception as exc:
        raise RuntimeError(
            "no transcription backend available (install `whisper` or allow "
            f"downloading {hf_model_name or 'openai/whisper-large-v3-turbo'}); "
            "pass the reference transcript explicitly"
        ) from exc
