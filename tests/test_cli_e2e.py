"""End-to-end CLI test: a tiny HF-export model dir + offline tokenizer +
random codec, driven through the real inference CLI main()."""

import json
import os

import numpy as np
import pytest
import jax

from t5gemma_tts_tpu.config import tiny_voice_config
from t5gemma_tts_tpu.export import hf_export
from t5gemma_tts_tpu.models import voice


def _make_offline_tokenizer(path: str, vocab_size: int = 500):
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers import Tokenizer, models, pre_tokenizers

    vocab = {"<pad>": 0, "<unk>": 1, "<eos>": 2}
    for i in range(3, vocab_size):
        vocab[f"tok{i}"] = i
    # map common words onto ids so encoding real text yields tokens
    for i, w in enumerate(["hello", "world", "this", "is", "a", "test",
                           "voice", "speech", "!", ".", ","]):
        vocab[w] = 100 + i
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    os.makedirs(path, exist_ok=True)
    tok.save(os.path.join(path, "tokenizer.json"))
    with open(os.path.join(path, "tokenizer_config.json"), "w") as f:
        json.dump({"tokenizer_class": "PreTrainedTokenizerFast",
                   "pad_token": "<pad>", "eos_token": "<eos>",
                   "unk_token": "<unk>"}, f)


def test_cli_end_to_end(tmp_path):
    pytest.importorskip("transformers")
    cfg = tiny_voice_config()
    params = voice.init_params(jax.random.PRNGKey(0), cfg)

    model_dir = str(tmp_path / "model")
    tok_dir = str(tmp_path / "tok")
    _make_offline_tokenizer(tok_dir, cfg.text_vocab_size)
    hf_export.export_hf(params, cfg, model_dir, dtype="float32",
                        text_tokenizer_name=tok_dir)

    out_dir = str(tmp_path / "out")
    from t5gemma_tts_tpu.inference import cli

    cli.main([
        "--model_dir", model_dir,
        "--target_text", "hello world this is a test",
        "--target_duration", "0.4",
        "--output_dir", out_dir,
        "--random_codec",
        "--top_k", "4",
        "--lang", "en",
        "--dump_tokens",
    ])
    wav_path = os.path.join(out_dir, "generated.wav")
    assert os.path.isfile(wav_path)
    from t5gemma_tts_tpu.inference.audio_io import read_wav

    wav, sr = read_wav(wav_path)
    assert len(wav) > 0 and np.isfinite(wav).all()
    assert os.path.isfile(os.path.join(out_dir, "generated_frames.npy"))
    frames = np.load(os.path.join(out_dir, "generated_frames.npy"))
    assert frames.ndim == 1 and len(frames) > 0
