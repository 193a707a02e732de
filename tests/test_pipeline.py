"""End-to-end pipeline tests with tiny models: text -> tokens -> waveform."""

import numpy as np
import pytest
import jax

from t5gemma_tts_tpu.codec.audio_tokenizer import AudioTokenizer
from t5gemma_tts_tpu.codec.model import (
    init_decoder_params, init_encoder_params_for, tiny_codec_config,
)
from t5gemma_tts_tpu.config import DecodeConfig, tiny_voice_config
from t5gemma_tts_tpu.inference import audio_io
from t5gemma_tts_tpu.inference.pipeline import Request, TTSPipeline
from t5gemma_tts_tpu.models import voice


def _char_tokenizer(vocab):
    def enc(text):
        return [3 + (ord(c) % (vocab - 10)) for c in text][:200]
    return enc


@pytest.fixture(scope="module")
def tiny_pipeline():
    cfg = tiny_voice_config()
    params = voice.init_params(jax.random.PRNGKey(0), cfg)
    ccfg = tiny_codec_config()
    cparams = init_decoder_params(jax.random.PRNGKey(1), ccfg)
    cparams.update(init_encoder_params_for(jax.random.PRNGKey(2), ccfg))
    tok = AudioTokenizer(cparams, ccfg)
    return TTSPipeline(
        params, cfg, _char_tokenizer(cfg.text_vocab_size), tok,
        audio_max_length=10.0,
    )


def test_synthesize_no_reference(tiny_pipeline):
    res = tiny_pipeline.synthesize(
        Request(target_text="hello world", target_duration=0.5),
        DecodeConfig(top_k=4, temperature=1.0, max_frames=64),
        quiet=True,
    )
    assert res.gen_frames.ndim == 1 and len(res.gen_frames) > 0
    # stripped output contains no special tokens
    s = tiny_pipeline.cfg.special
    assert not np.isin(res.gen_frames,
                       [s.y_sep, tiny_pipeline.cfg.eog_inference]).any()
    assert res.wav is not None and np.isfinite(res.wav).all()
    hop = tiny_pipeline.audio_tokenizer.cfg.hop_length
    assert len(res.wav) == len(res.gen_frames) * hop


def test_synthesize_voice_clone(tiny_pipeline, tmp_path):
    # make a fake reference recording (3 s at the tiny codec's 500 Hz rate)
    sr = 500
    t = np.arange(3 * sr) / sr
    ref = (0.3 * np.sin(2 * np.pi * 50 * t)).astype(np.float32)
    path = str(tmp_path / "ref.wav")
    audio_io.write_wav(path, ref, sr)

    res = tiny_pipeline.synthesize(
        Request(
            target_text="voice cloning test",
            audio_path=path,
            prompt_transcript="reference words",
            target_duration=0.5,
        ),
        DecodeConfig(top_k=4, temperature=1.0, max_frames=64),
        quiet=True,
    )
    assert len(res.concat_frames) > len(res.gen_frames)
    assert res.concat_wav is not None


def test_synthesize_batch_multilingual(tiny_pipeline):
    reqs = [
        Request(target_text="hello there", target_duration=0.4),
        Request(target_text="こんにちは、世界！", lang="ja", target_duration=0.6),
        Request(target_text="你好世界", lang="zh", target_duration=0.3),
    ]
    results = tiny_pipeline.synthesize_batch(
        reqs, DecodeConfig(top_k=4, temperature=1.0, max_frames=64),
        quiet=True, decode_audio=False,
    )
    assert len(results) == 3
    for r in results:
        assert len(r.gen_frames) > 0


def test_wav_roundtrip(tmp_path):
    sr = 16000
    wav = (np.random.default_rng(0).normal(size=8000) * 0.2).astype(np.float32)
    p = str(tmp_path / "x.wav")
    audio_io.write_wav(p, wav, sr)
    back, sr2 = audio_io.read_wav(p)
    assert sr2 == sr
    np.testing.assert_allclose(back, wav, atol=1e-3)


def test_resample_preserves_tone():
    sr1, sr2 = 16000, 8000
    t = np.arange(sr1) / sr1
    tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    out = audio_io.resample(tone, sr1, sr2)
    assert abs(len(out) - sr2) <= 2
    # dominant frequency preserved
    spec = np.abs(np.fft.rfft(out * np.hanning(len(out))))
    peak = np.argmax(spec) * sr2 / len(out)
    assert abs(peak - 440) < 5


def test_pipeline_seed_determinism(tiny_pipeline):
    req = Request(target_text="determinism check", target_duration=0.4)
    dcfg = DecodeConfig(top_k=4, temperature=1.0, max_frames=64)
    r1 = tiny_pipeline.synthesize(req, dcfg, seed=7, quiet=True,
                                  decode_audio=False)
    r2 = tiny_pipeline.synthesize(req, dcfg, seed=7, quiet=True,
                                  decode_audio=False)
    r3 = tiny_pipeline.synthesize(req, dcfg, seed=8, quiet=True,
                                  decode_audio=False)
    np.testing.assert_array_equal(r1.gen_frames, r2.gen_frames)
    assert not (len(r1.gen_frames) == len(r3.gen_frames)
                and (r1.gen_frames == r3.gen_frames).all())


def test_warmup_execute_registers_and_runs(tiny_pipeline):
    """warmup(execute=True) runs each program (not just AOT-compiles it)
    and registers the shape for warm routing (round-5 cold-serve fix)."""
    pipe = tiny_pipeline
    before = set(pipe._warm_shapes)
    n = pipe.warmup(batch_sizes=(1,), text_buckets=(32,),
                    prompt_buckets=(64,), frame_buckets=(256,),
                    dcfg=DecodeConfig(kv_cache="dense"),
                    execute=True, vocoder=True)
    # 1 decode program + the vocoder buckets <= 256
    assert n >= 2
    assert (1, 32, 64, 256) in pipe._warm_shapes - before


def test_warm_shape_routing_prefers_covering_shape(tiny_pipeline):
    """A request whose exact bucket combo is not warm routes onto an
    already-compiled covering shape instead of compiling a new program:
    padded rows/cols are masked, results identical in structure."""
    pipe = tiny_pipeline
    dcfg = DecodeConfig(top_k=1, temperature=1.0, kv_cache="dense")
    pipe._warm_shapes.clear()

    # warm a 2-row, 64-text shape (execute so it is genuinely live)
    pipe.warmup(batch_sizes=(2,), text_buckets=(64,), prompt_buckets=(64,),
                frame_buckets=(256,), dcfg=dcfg, execute=True)
    assert (2, 64, 64, 256) in pipe._warm_shapes

    # a single short request would exactly-bucket to (1, 32, 64, 256) —
    # absent from the warm set, so it must route onto (2, 64, 64, 256)
    res = pipe.synthesize(
        Request(target_text="hi", target_duration=0.5), dcfg, quiet=True)
    assert (1, 32, 64, 256) not in pipe._warm_shapes  # no new program
    assert res.gen_frames.ndim == 1 and len(res.gen_frames) > 0
    s = pipe.cfg.special
    assert not np.isin(res.gen_frames, [s.y_sep, pipe.cfg.eog_inference]).any()

    # exact warm hit still uses its own shape (no routing needed)
    pipe.synthesize_batch(
        [Request(target_text="hi", target_duration=0.5),
         Request(target_text="yo", target_duration=0.5)], dcfg, quiet=True)
    assert (2, 64, 64, 256) in pipe._warm_shapes


def test_warm_routing_output_matches_unrouted(tiny_pipeline):
    """Routing pads rows/columns only — the routed request's own row
    decodes the same number of frames it would in a fresh exact-shape
    program under greedy decoding (same masks, same budgets)."""
    pipe = tiny_pipeline
    dcfg = DecodeConfig(top_k=1, temperature=1.0, kv_cache="dense")
    req = Request(target_text="greedy check", target_duration=0.5)

    pipe._warm_shapes.clear()
    exact = pipe.synthesize(req, dcfg, quiet=True)          # exact shape

    pipe._warm_shapes.clear()
    pipe.warmup(batch_sizes=(3,), text_buckets=(64,), prompt_buckets=(64,),
                frame_buckets=(256,), dcfg=dcfg, execute=False)
    routed = pipe.synthesize(req, dcfg, quiet=True)         # padded to b=3

    # greedy trace is sampling-free, so padded rows cannot change the
    # request's own tokens
    np.testing.assert_array_equal(exact.gen_frames, routed.gen_frames)
