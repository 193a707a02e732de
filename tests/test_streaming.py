"""Streaming vocoder: incremental decode must equal full-utterance decode."""

import numpy as np
import jax

from t5gemma_tts_tpu.codec import streaming
from t5gemma_tts_tpu.codec.model import (
    decode_code, init_decoder_params, tiny_codec_config,
)


def test_streaming_matches_full_decode():
    cfg = tiny_codec_config()
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    n = 240
    codes = rng.integers(0, cfg.fsq.codebook_size, n)

    full = np.asarray(decode_code(params, cfg, codes[None]))[0]

    pieces = list(streaming.stream_decode(
        params, cfg, [codes[i:i + 17] for i in range(0, n, 17)], chunk=40,
    ))
    streamed = np.concatenate(pieces)
    assert streamed.shape == full.shape
    np.testing.assert_allclose(streamed, full, rtol=1e-4, atol=1e-5)


def test_streaming_emits_incrementally():
    cfg = tiny_codec_config()
    params = init_decoder_params(jax.random.PRNGKey(1), cfg)
    sv = streaming.StreamingVocoder(params, cfg, chunk=30)
    rng = np.random.default_rng(1)
    emitted = []
    got_early_audio = False
    total = 200
    for i in range(0, total, 25):
        piece = sv.feed(rng.integers(0, cfg.fsq.codebook_size, 25))
        emitted.append(piece)
        if i < total - 25 and len(piece):
            got_early_audio = True
    emitted.append(sv.flush())
    assert got_early_audio, "no audio emitted before the final token"
    assert sum(len(p) for p in emitted) == total * cfg.hop_length


def test_pipeline_streaming_matches_batch():
    """Streamed synthesis == one-shot synthesize (same seed): identical audio."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_pipeline import _char_tokenizer

    from t5gemma_tts_tpu.codec.audio_tokenizer import AudioTokenizer
    from t5gemma_tts_tpu.codec.model import init_encoder_params_for
    from t5gemma_tts_tpu.config import DecodeConfig, tiny_voice_config
    from t5gemma_tts_tpu.inference.pipeline import Request, TTSPipeline
    from t5gemma_tts_tpu.models import voice

    cfg = tiny_voice_config(extra_cutoff=0.0)
    params = voice.init_params(jax.random.PRNGKey(0), cfg)
    ccfg = tiny_codec_config()
    tok = AudioTokenizer(init_decoder_params(jax.random.PRNGKey(1), ccfg), ccfg)
    pipe = TTSPipeline(params, cfg, _char_tokenizer(cfg.text_vocab_size), tok)

    req = Request(target_text="stream me please", target_duration=1.2)
    dcfg = DecodeConfig(top_k=4, temperature=1.0)

    res = pipe.synthesize(req, dcfg, seed=5, quiet=True)
    pieces = list(pipe.synthesize_streaming(req, dcfg, seed=5,
                                            segment_frames=13,
                                            vocode_chunk=16))
    assert len(pieces) > 1, "streaming produced a single blob"
    streamed = np.concatenate(pieces)
    assert streamed.shape == res.wav.shape
    np.testing.assert_allclose(streamed, res.wav, rtol=1e-4, atol=1e-5)
