"""Batching server tests: concurrent submits resolve; batching happens."""

import time

import jax
import pytest

from t5gemma_tts_tpu.codec.audio_tokenizer import AudioTokenizer
from t5gemma_tts_tpu.codec.model import init_decoder_params, tiny_codec_config
from t5gemma_tts_tpu.config import DecodeConfig, tiny_voice_config
from t5gemma_tts_tpu.inference.pipeline import Request, TTSPipeline
from t5gemma_tts_tpu.inference.server import BatchingServer
from t5gemma_tts_tpu.models import voice


@pytest.fixture(scope="module")
def server():
    cfg = tiny_voice_config(extra_cutoff=0.0)
    params = voice.init_params(jax.random.PRNGKey(0), cfg)
    ccfg = tiny_codec_config()
    tok = AudioTokenizer(init_decoder_params(jax.random.PRNGKey(1), ccfg), ccfg)
    pipe = TTSPipeline(params, cfg,
                       lambda t: [3 + (ord(c) % 100) for c in t], tok)
    srv = BatchingServer(
        pipe, DecodeConfig(top_k=4, temperature=1.0, max_frames=32),
        max_batch=8, max_wait_ms=200.0, decode_audio=False,
    )
    yield srv
    srv.close()


def test_concurrent_requests_batch_together(server):
    futs = [
        server.submit(Request(target_text=f"request number {i}",
                              target_duration=0.3))
        for i in range(6)
    ]
    results = [f.result(timeout=300) for f in futs]
    assert all(len(r.gen_frames) > 0 for r in results)
    # the 6 near-simultaneous requests ran in fewer than 6 batches
    assert server.stats.batches < 6
    assert max(server.stats.batch_sizes) > 1


def test_sequential_request(server):
    res = server.synthesize(Request(target_text="single", target_duration=0.2),
                            timeout=300)
    assert len(res.gen_frames) > 0
