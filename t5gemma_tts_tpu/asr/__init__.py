"""In-repo JAX ASR (Whisper architecture) for reference-audio transcription.

The reference shells out to the ``whisper`` pip package for transcribing
cloning prompts (reference inference_commandline_hf.py:144-152); round 2
added a transformers/torch fallback. This package removes the torch model
from the serving path entirely: the Whisper encoder-decoder runs as JAX
(mel frontend included), with the HF processor used only for token<->text.

Modules:
  mel.py      log-mel features == transformers WhisperFeatureExtractor
  model.py    functional encoder/decoder + jitted greedy decode
  convert.py  HF Whisper state_dict -> pytree (key-exhaustive)
"""

from . import convert, mel, model  # noqa: F401
