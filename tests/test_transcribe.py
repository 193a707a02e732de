"""Transcription fallback: the transformers-backed transcriber must run
end-to-end (wav file -> text) with tiny offline Whisper components."""

import json

import numpy as np
import pytest

from t5gemma_tts_tpu.inference import audio_io, transcribe


def _tiny_whisper(tmp_path):
    torch = pytest.importorskip("torch")
    tr = pytest.importorskip("transformers")

    # offline GPT2-style BPE tokenizer files
    tokens = ["<|endoftext|>", "<|startoftranscript|>", "<|en|>",
              "<|transcribe|>", "<|notimestamps|>"]
    vocab = {t: i for i, t in enumerate(tokens)}
    for i in range(256):
        vocab.setdefault(chr(33 + i) if 33 + i < 0x110000 else f"x{i}",
                         len(vocab))
    vocab_fn = str(tmp_path / "vocab.json")
    merges_fn = str(tmp_path / "merges.txt")
    with open(vocab_fn, "w") as f:
        json.dump(vocab, f)
    with open(merges_fn, "w") as f:
        f.write("#version: 0.2\n")
    tok = tr.WhisperTokenizer(vocab_fn, merges_fn, unk_token="<|endoftext|>",
                              bos_token="<|endoftext|>",
                              eos_token="<|endoftext|>")
    feat = tr.WhisperFeatureExtractor(feature_size=80)
    proc = tr.WhisperProcessor(feature_extractor=feat, tokenizer=tok)

    cfg = tr.WhisperConfig(
        vocab_size=len(vocab),
        num_mel_bins=80,
        d_model=32,
        encoder_layers=1,
        decoder_layers=1,
        encoder_attention_heads=2,
        decoder_attention_heads=2,
        encoder_ffn_dim=64,
        decoder_ffn_dim=64,
        max_source_positions=1500,
        max_target_positions=64,
        decoder_start_token_id=1,
        eos_token_id=0,
        pad_token_id=0,
        bos_token_id=0,
        begin_suppress_tokens=None,
        suppress_tokens=None,
    )
    torch.manual_seed(0)
    model = tr.WhisperForConditionalGeneration(cfg).eval()
    model.generation_config.forced_decoder_ids = None
    model.generation_config.begin_suppress_tokens = None
    model.generation_config.suppress_tokens = None
    return proc, model


def test_hf_transcriber_end_to_end(tmp_path):
    proc, model = _tiny_whisper(tmp_path)
    sr = 16000
    t = np.arange(sr) / sr
    wav_fn = str(tmp_path / "ref.wav")
    audio_io.write_wav(wav_fn, np.sin(2 * np.pi * 220 * t).astype(np.float32),
                       sr)
    fn = transcribe.hf_transcriber(proc, model)
    text = fn(wav_fn)
    assert isinstance(text, str)  # random tiny model: any string is fine


def test_load_transcriber_reports_backends(monkeypatch):
    """With neither backend loadable the error names the fix."""
    import builtins

    real_import = builtins.__import__

    def blocked(name, *a, **k):
        if name in ("whisper", "transformers"):
            raise ImportError(name)
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", blocked)
    with pytest.raises(RuntimeError, match="reference transcript"):
        transcribe.load_transcriber()
