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
