"""In-repo JAX Whisper ASR (asr/) vs the transformers implementation.

Parity oracles on tiny random configs (torch CPU): mel features vs
WhisperFeatureExtractor (its reference implementation is numpy), encoder
states + teacher-forced decoder logits vs WhisperModel, greedy ids vs a
hand-rolled HF greedy loop, converter key-exhaustiveness, and the
jax_transcriber end-to-end path with a mock tokenizer.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from t5gemma_tts_tpu.asr import convert as asr_convert
from t5gemma_tts_tpu.asr import mel as asr_mel
from t5gemma_tts_tpu.asr import model as asr_model

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _tiny_pair(seed=0):
    """(hf_model, cfg, params) with identical random weights."""
    from transformers import WhisperConfig as HFWhisperConfig
    from transformers import WhisperModel

    cfg = asr_model.tiny_whisper_config()
    hf_cfg = HFWhisperConfig(
        vocab_size=cfg.vocab_size,
        num_mel_bins=cfg.num_mel_bins,
        d_model=cfg.d_model,
        encoder_layers=cfg.encoder_layers,
        decoder_layers=cfg.decoder_layers,
        encoder_attention_heads=cfg.encoder_attention_heads,
        decoder_attention_heads=cfg.decoder_attention_heads,
        encoder_ffn_dim=cfg.encoder_ffn_dim,
        decoder_ffn_dim=cfg.decoder_ffn_dim,
        max_source_positions=cfg.max_source_positions,
        max_target_positions=cfg.max_target_positions,
        decoder_start_token_id=cfg.decoder_start_token_id,
        eos_token_id=cfg.eos_token_id,
        pad_token_id=1,                   # defaults exceed the tiny vocab
        bos_token_id=1,
        suppress_tokens=None,
        begin_suppress_tokens=None,
    )
    torch.manual_seed(seed)
    hf = WhisperModel(hf_cfg).eval()
    params = asr_convert.whisper_state_dict_to_params(hf.state_dict(), cfg)
    return hf, cfg, params


def test_mel_matches_whisper_feature_extractor():
    from transformers import WhisperFeatureExtractor

    rng = np.random.default_rng(0)
    wav = (rng.normal(size=32000) * 0.1).astype(np.float32)
    for n_mels in (80, 128):
        fe = WhisperFeatureExtractor(feature_size=n_mels)
        ref = fe(wav, sampling_rate=16000,
                 return_tensors="np").input_features[0]
        got = np.asarray(asr_mel.log_mel(jnp.asarray(wav), n_mels))
        assert got.shape == ref.shape == (n_mels, 3000)
        np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


def test_encoder_decoder_parity_with_transformers():
    hf, cfg, params = _tiny_pair()
    rng = np.random.default_rng(1)
    mel = rng.normal(size=(cfg.num_mel_bins,
                           2 * cfg.max_source_positions)).astype(np.float32)
    ids = rng.integers(4, cfg.vocab_size, size=9).astype(np.int64)
    ids[0] = cfg.decoder_start_token_id

    with torch.no_grad():
        out = hf(input_features=torch.from_numpy(mel)[None],
                 decoder_input_ids=torch.from_numpy(ids)[None],
                 output_hidden_states=True)
        enc_ref = out.encoder_last_hidden_state[0].numpy()
        dec_ref = out.last_hidden_state[0].numpy()

    enc = np.asarray(asr_model.encode(params, cfg, jnp.asarray(mel)))
    np.testing.assert_allclose(enc, enc_ref, atol=2e-4, rtol=1e-3)

    # teacher-forced decoder: compare final hidden via logits @ embed^T
    logits = np.asarray(asr_model.decoder_logits(
        params, cfg, jnp.asarray(ids, jnp.int32), jnp.asarray(enc_ref)))
    emb = np.asarray(params["decoder"]["embed"])
    logits_ref = dec_ref @ emb.T
    np.testing.assert_allclose(logits, logits_ref, atol=5e-4, rtol=1e-3)


def test_greedy_decode_matches_hf_loop():
    hf, cfg, params = _tiny_pair(seed=2)
    rng = np.random.default_rng(3)
    mel = rng.normal(size=(cfg.num_mel_bins,
                           2 * cfg.max_source_positions)).astype(np.float32)

    forced = [cfg.decoder_start_token_id, 5, 6]
    max_new = 10

    # hand-rolled HF greedy (same math as generate(num_beams=1))
    emb_t = torch.from_numpy(np.array(params["decoder"]["embed"]))
    ids = list(forced)
    with torch.no_grad():
        enc_t = hf.encoder(
            torch.from_numpy(mel)[None]).last_hidden_state
        for _ in range(max_new):
            dec = hf.decoder(
                input_ids=torch.tensor([ids]),
                encoder_hidden_states=enc_t).last_hidden_state
            logits = dec[0, -1] @ emb_t.T
            nxt = int(torch.argmax(logits))
            ids.append(nxt)
            if nxt == cfg.eos_token_id:
                break

    enc = asr_model.encode(params, cfg, jnp.asarray(mel))
    got, n = asr_model.greedy_decode(
        params, cfg, enc, jnp.asarray(forced, jnp.int32),
        jnp.int32(len(forced)), max_new)
    got = np.asarray(got)[: int(n)]
    np.testing.assert_array_equal(got, np.asarray(ids[: len(got)]))
    assert list(got[:3]) == forced


def test_converter_is_key_exhaustive():
    hf, cfg, params = _tiny_pair(seed=4)
    sd = dict(hf.state_dict())
    k = "encoder.layers.0.fc1.weight"
    sd["encoder.layers.0.fc1_RENAMED.weight"] = sd.pop(k)
    with pytest.raises((ValueError, KeyError)):
        asr_convert.whisper_state_dict_to_params(sd, cfg)


def test_jax_transcriber_end_to_end(tmp_path):
    """jax_transcriber over a real wav file with a mock tokenizer: drives
    mel -> encode -> language detection -> greedy -> decode()."""
    from t5gemma_tts_tpu.inference import audio_io
    from t5gemma_tts_tpu.inference.transcribe import jax_transcriber

    hf, cfg, params = _tiny_pair(seed=5)
    rng = np.random.default_rng(6)
    wav = (rng.normal(size=16000) * 0.05).astype(np.float32)
    path = str(tmp_path / "ref.wav")
    audio_io.write_wav(path, wav, 16000)

    class MockTok:
        unk_token_id = 0

        def convert_tokens_to_ids(self, t):
            table = {"<|transcribe|>": 7, "<|notimestamps|>": 8,
                     "<|en|>": 9, "<|ja|>": 10}
            return table.get(t, 0)

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(f"tok{i}" for i in ids if i > 10)

    # tiny cfg's mel frontend expects 2*max_source_positions frames, but
    # log_mel always emits 3000 — patch cfg to the real frontend geometry
    import dataclasses

    cfg2 = dataclasses.replace(cfg, max_source_positions=1500)
    # re-init params at the matching source length (random; e2e shape test)
    params2 = asr_model.init_params(jax.random.PRNGKey(0), cfg2)
    fn = jax_transcriber(params2, cfg2, MockTok(), max_new=6)
    text = fn(path)
    assert isinstance(text, str)


def test_decode_with_stats_temperature_zero_matches_greedy():
    """T=0 through decode_with_stats IS the greedy path, and sum_logprob
    accumulates the chosen tokens' log-softmax (<= 0, finite)."""
    hf, cfg, params = _tiny_pair(seed=7)
    rng = np.random.default_rng(8)
    mel = rng.normal(size=(cfg.num_mel_bins,
                           2 * cfg.max_source_positions)).astype(np.float32)
    enc = asr_model.encode(params, cfg, jnp.asarray(mel))
    forced = jnp.asarray([cfg.decoder_start_token_id, 5], jnp.int32)

    ids_g, n_g = asr_model.greedy_decode(params, cfg, enc, forced,
                                         jnp.int32(2), 8)
    ids_s, n_s, sum_lp = asr_model.decode_with_stats(
        params, cfg, enc, forced, jnp.int32(2), 8,
        jnp.float32(0.0), jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(ids_g), np.asarray(ids_s))
    assert int(n_g) == int(n_s)
    assert float(sum_lp) <= 0.0 and np.isfinite(float(sum_lp))
    # avg logprob over generated tokens is what the ladder gates on
    avg = float(sum_lp) / max(int(n_s) - 2, 1)
    assert avg <= 0.0


def test_decode_with_stats_sampling_respects_forced_prefix():
    """T>0 sampling: forced prefix preserved, tokens in-vocab, eos padding
    after the emitted length."""
    hf, cfg, params = _tiny_pair(seed=9)
    rng = np.random.default_rng(10)
    mel = rng.normal(size=(cfg.num_mel_bins,
                           2 * cfg.max_source_positions)).astype(np.float32)
    enc = asr_model.encode(params, cfg, jnp.asarray(mel))
    forced = jnp.asarray([cfg.decoder_start_token_id, 5, 6], jnp.int32)

    ids, n, sum_lp = asr_model.decode_with_stats(
        params, cfg, enc, forced, jnp.int32(3), 8,
        jnp.float32(0.8), jax.random.PRNGKey(4))
    ids = np.asarray(ids)
    n = int(n)
    assert list(ids[:3]) == [cfg.decoder_start_token_id, 5, 6]
    assert ((ids >= 0) & (ids < cfg.vocab_size)).all()
    assert (ids[n:] == cfg.eos_token_id).all()
    assert float(sum_lp) <= 0.0
    # different rng -> (almost surely) different trace at high temperature
    ids2, _, _ = asr_model.decode_with_stats(
        params, cfg, enc, forced, jnp.int32(3), 8,
        jnp.float32(0.8), jax.random.PRNGKey(5))
    assert not np.array_equal(ids, np.asarray(ids2)) or n <= 4


def test_jax_transcriber_no_speech_gate(tmp_path, monkeypatch):
    """A clip whose first decoder step puts high probability on
    <|nospeech|> while the decode is unconfident must transcribe to ""
    (silent reference clips: whisper transcribe() semantics, VERDICT r4
    missing #3)."""
    from t5gemma_tts_tpu.inference import audio_io
    from t5gemma_tts_tpu.inference.transcribe import jax_transcriber

    hf, cfg, params = _tiny_pair(seed=5)
    import dataclasses

    cfg2 = dataclasses.replace(cfg, max_source_positions=1500)
    params2 = asr_model.init_params(jax.random.PRNGKey(0), cfg2)
    path = str(tmp_path / "silence.wav")
    audio_io.write_wav(path, np.zeros(16000, np.float32), 16000)

    NOSPEECH = 11

    class MockTok:
        unk_token_id = 0

        def convert_tokens_to_ids(self, t):
            table = {"<|transcribe|>": 7, "<|notimestamps|>": 8,
                     "<|en|>": 9, "<|ja|>": 10, "<|nospeech|>": NOSPEECH}
            return table.get(t, 0)

        def decode(self, ids, skip_special_tokens=True):
            return "hallucinated words"

    def fake_logits(params, cfg, ids, enc):
        out = np.full((1, cfg.vocab_size), -10.0, np.float32)
        out[0, NOSPEECH] = 10.0      # ~all mass on <|nospeech|>
        return jnp.asarray(out)

    def fake_stats(params, cfg, enc, forced, n_forced, budget, temp, rng):
        # unconfident decode: avg logprob far below the -1.0 threshold
        ids = jnp.asarray([1, 9, 7, 8, 50, 60], jnp.int32)
        return ids, jnp.int32(6), jnp.float32(-6.0)

    monkeypatch.setattr(asr_model, "decoder_logits", fake_logits)
    monkeypatch.setattr(asr_model, "decode_with_stats", fake_stats)
    fn = jax_transcriber(params2, cfg2, MockTok(), max_new=6)
    assert fn(path) == ""

    # confident decode (avg logprob above threshold) overrides the gate
    def fake_stats_conf(params, cfg, enc, forced, n_forced, budget, temp,
                        rng):
        ids = jnp.asarray([1, 9, 7, 8, 50, 60], jnp.int32)
        return ids, jnp.int32(6), jnp.float32(-0.2)

    monkeypatch.setattr(asr_model, "decode_with_stats", fake_stats_conf)
    fn2 = jax_transcriber(params2, cfg2, MockTok(), max_new=6)
    assert fn2(path) == "hallucinated words"
