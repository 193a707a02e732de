"""Interop + front-end tests: HF export/load roundtrip, JA normalization,
duration estimation, CLI parser defaults."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from t5gemma_tts_tpu.config import tiny_voice_config
from t5gemma_tts_tpu.export import hf_export
from t5gemma_tts_tpu.inference import duration, loading, textnorm
from t5gemma_tts_tpu.models import voice


def test_hf_export_load_roundtrip(tmp_path):
    cfg = tiny_voice_config()
    params = voice.init_params(jax.random.PRNGKey(0), cfg)
    out = str(tmp_path / "hf")
    hf_export.export_hf(params, cfg, out, dtype="float32")
    assert os.path.isfile(os.path.join(out, "model.safetensors"))
    with open(os.path.join(out, "config.json")) as f:
        hf_cfg = json.load(f)
    # special-token derivation preserved (reference config.py:220-231)
    assert hf_cfg["empty_token"] == cfg.audio_vocab_size
    assert hf_cfg["eog"] == cfg.audio_vocab_size + 1
    assert hf_cfg["y_sep_token"] == cfg.audio_vocab_size + 4

    params2, cfg2, _ = loading.load_hf_dir(out, dtype="float32")
    assert cfg2.audio_vocab_size == cfg.audio_vocab_size
    assert cfg2.backbone.encoder.num_layers == cfg.backbone.encoder.num_layers
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), atol=1e-6)

    # loaded params produce identical losses
    rng = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(rng.integers(3, cfg.text_vocab_size, (1, 5)).astype(np.int32)),
        "x_lens": jnp.asarray([5], jnp.int32),
        "y": jnp.asarray(rng.integers(0, cfg.audio_vocab_size, (1, 6)).astype(np.int32)),
        "y_lens": jnp.asarray([6], jnp.int32),
        "y_sep_position": jnp.asarray([0], jnp.int32),
    }
    l1 = voice.forward(params, cfg, batch).loss
    l2 = voice.forward(params2, cfg2, batch).loss
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)


def test_japanese_normalization():
    # fullwidth -> halfwidth alnum, halfwidth katakana -> fullwidth,
    # wave dash -> chouon, punctuation mapping, ellipsis collapse
    out = textnorm.normalize_japanese("ＡＢＣ１２３　ｶﾀｶﾅ～？！………………")
    assert out.startswith("ABC123")
    assert "カタカナー" in out
    assert "?" in out and "!" in out
    assert "………" not in out


def test_normalize_only_when_japanese():
    text = "Hello　world"  # contains ideographic space
    same, lang = textnorm.normalize_text_with_lang(text, "en")
    assert same == text and lang == "en"
    ja, lang = textnorm.normalize_text_with_lang("こんにちは　世界", None)
    assert lang == "ja" and "　" not in ja


def test_language_detection_heuristics():
    assert textnorm.detect_language("こんにちは") == "ja"
    assert textnorm.detect_language("你好世界") == "zh"
    assert textnorm.detect_language("") == "other"


def test_duration_estimation_bounds_and_pacing():
    d_en = duration.estimate_duration("Hello world, this is a test sentence.")
    assert duration.MIN_DURATION_SEC <= d_en <= duration.MAX_DURATION_SEC
    # zh pacing is slower per character
    d_zh = duration.estimate_duration("你好世界你好世界", target_lang="zh")
    d_en2 = duration.estimate_duration("abcdefgh", target_lang="en")
    assert d_zh > d_en2
    # punctuation adds pause time
    with_punct = duration.estimate_duration("wait... what?! really...",
                                            target_lang="en")
    without = duration.estimate_duration("wait what really",
                                         target_lang="en")
    assert with_punct > without


def test_duration_uses_reference_audio(tmp_path):
    from t5gemma_tts_tpu.inference import audio_io

    sr = 16000
    wav = np.zeros(sr * 2, np.float32)  # 2 s reference
    p = str(tmp_path / "ref.wav")
    audio_io.write_wav(p, wav, sr)
    d = duration.estimate_duration(
        "same length text here", reference_speech=p,
        reference_transcript="same length text here", target_lang="en",
    )
    # spp derived from the 2 s / n-phoneme reference, clamped to en bounds
    assert duration.MIN_DURATION_SEC <= d <= 10.0


def test_cli_parser_defaults_match_reference():
    from t5gemma_tts_tpu.inference.cli import build_parser

    args = build_parser().parse_args(["--model_dir", "x"])
    # reference inference_commandline_hf.py:80-89
    assert args.top_k == 30 and args.top_p == 0.9
    assert args.temperature == 0.8 and args.seed == 1
    assert args.min_p == 0.0 and args.stop_repetition == 3


def test_train_cli_parser():
    from t5gemma_tts_tpu.train.cli import build_parser

    args = build_parser().parse_args(["--dataset_dir", "/x"])
    assert args.optimizer_name == "AdamW"
    assert args.audio_vocab_size == 65536
    assert args.x_sep_token == 255999


def test_lora_checkpoint_merge_on_load():
    """peft-style LoRA state dicts merge into plain weights
    (reference models/t5gemma.py:458-491 key layout)."""
    from t5gemma_tts_tpu.models.convert import _merge_lora

    rng = np.random.default_rng(0)
    w = rng.normal(size=(8, 6)).astype(np.float32)
    a = rng.normal(size=(2, 6)).astype(np.float32)   # lora_A [r, in]
    b = rng.normal(size=(8, 2)).astype(np.float32)   # lora_B [out, r]
    sd = {
        "backbone.model.encoder.layers.0.self_attn.q_proj.base_layer.weight": w,
        "backbone.model.encoder.layers.0.self_attn.q_proj.lora_A.default.weight": a,
        "backbone.model.encoder.layers.0.self_attn.q_proj.lora_B.default.weight": b,
        "other.weight": np.ones((3,), np.float32),
    }
    merged = _merge_lora(sd)
    key = "backbone.model.encoder.layers.0.self_attn.q_proj.weight"
    assert key in merged
    np.testing.assert_allclose(merged[key], w + 2.0 * (b @ a), rtol=1e-6)
    assert not any("lora" in k for k in merged)
