"""Validation-generation diagnostics + profiling utils."""

import os

import numpy as np
import jax

from t5gemma_tts_tpu.codec.audio_tokenizer import AudioTokenizer
from t5gemma_tts_tpu.codec.model import init_decoder_params, tiny_codec_config
from t5gemma_tts_tpu.config import DecodeConfig, tiny_voice_config
from t5gemma_tts_tpu.models import voice
from t5gemma_tts_tpu.train.diagnostics import make_generation_hook
from t5gemma_tts_tpu.utils import profiling


def test_generation_hook_writes_wav(tmp_path):
    cfg = tiny_voice_config(extra_cutoff=0.0)
    params = voice.init_params(jax.random.PRNGKey(0), cfg)
    ccfg = tiny_codec_config()
    tok = AudioTokenizer(init_decoder_params(jax.random.PRNGKey(1), ccfg), ccfg)
    hook = make_generation_hook(
        cfg, lambda t: [3 + (ord(c) % 100) for c in t],
        sample_text="diagnostic sample", exp_dir=str(tmp_path),
        audio_tokenizer=tok,
        dcfg=DecodeConfig(top_k=4, temperature=1.0, max_frames=32),
        target_duration=0.3,
    )
    hook(params, step=100)
    assert os.path.isfile(tmp_path / "val_generations" / "step100.wav")


def test_meters():
    bank = profiling.MeterBank()
    bank.update(loss=2.0)
    bank.update(loss=4.0)
    assert bank.summary()["loss"] == 3.0
    with profiling.timed(bank, "t"):
        pass
    assert "t" in bank.summary()


def test_device_trace_smoke(tmp_path):
    import jax.numpy as jnp

    with profiling.device_trace(str(tmp_path)):
        with profiling.annotate("tiny-op"):
            _ = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    # a trace directory with at least one file appears
    found = [f for _, _, fs in os.walk(tmp_path) for f in fs]
    assert found, "no profiler trace written"
