"""WSOLA time-stretch + dataset augmentation path (reference
combined_dataset.py:203-254, config.py:173-174)."""

import os

import numpy as np
import pytest

from t5gemma_tts_tpu.data import stretch
from t5gemma_tts_tpu.data.dataset import VoiceDataset
from t5gemma_tts_tpu.data.manifest import DataConfig
from t5gemma_tts_tpu.inference import audio_io

from test_data_and_trainer import _tokenizer, _write_dataset

SR = 16000


def _sine(freq, seconds, sr=SR):
    t = np.arange(int(seconds * sr)) / sr
    return np.sin(2 * np.pi * freq * t).astype(np.float32)


def _dominant_freq(wav, sr=SR):
    spec = np.abs(np.fft.rfft(wav * np.hanning(len(wav))))
    return np.argmax(spec) * sr / len(wav)


def test_identity_rate():
    wav = _sine(440, 1.0)
    out = stretch.time_stretch(wav, 1.0)
    np.testing.assert_array_equal(out, wav)


@pytest.mark.parametrize("rate", [0.7, 0.9, 1.1, 1.3])
def test_length_and_pitch(rate):
    wav = _sine(440, 2.0)
    out = stretch.time_stretch(wav, rate, SR)
    # duration scales ~ 1/rate (frame-quantized)
    assert abs(len(out) - len(wav) / rate) < 0.1 * len(wav)
    # pitch preserved (a resample would move it to 440*rate)
    f = _dominant_freq(out)
    assert abs(f - 440) < 15, f
    # energy in the same ballpark (windows normalized)
    rms_in, rms_out = np.sqrt(np.mean(wav ** 2)), np.sqrt(np.mean(out ** 2))
    assert 0.5 < rms_out / rms_in < 2.0


def test_speech_like_no_clipping():
    rng = np.random.default_rng(0)
    # amplitude-modulated noise (speech-ish envelope)
    wav = (rng.standard_normal(SR * 2).astype(np.float32) * 0.3
           * np.abs(np.sin(np.arange(SR * 2) / SR * 4)))
    out = stretch.time_stretch(wav, 1.2, SR)
    assert np.max(np.abs(out)) < np.max(np.abs(wav)) * 1.5
    assert len(out) > 0


def test_short_input():
    wav = _sine(200, 0.002)  # 32 samples, below one frame
    out = stretch.time_stretch(wav, 1.5, SR)
    assert len(out) == int(len(wav) / 1.5)


def test_dataset_stretch_reencode(tmp_path):
    """prob=1 + audio present + encoder hook => codes come from the hook;
    prob=0 => on-disk codes (reference fallback :248-254)."""
    root = _write_dataset(str(tmp_path / "ds"), n=8)
    os.makedirs(f"{root}/audio", exist_ok=True)
    for i in range(8):
        utt = f"utt{i:03d}"
        audio_io.write_wav(f"{root}/audio/{utt}.wav", _sine(300, 0.8), SR)

    calls = []

    def fake_encode(wav):
        calls.append(len(wav))
        return np.full((max(len(wav) // 320, 1),), 7, np.int32)

    dcfg = DataConfig(
        dataset_dir=root, audio_min_length=0.1, audio_max_length=10.0,
        encodec_sr=50.0, target_time_stretch_prob=1.0,
        target_time_stretch_bound=0.2,
    )
    ds = VoiceDataset(dcfg, "train", _tokenizer(128), x_sep_token=990,
                      y_sep_token=991, codec_encode=fake_encode,
                      encode_sample_rate=SR)
    ex = ds[0]
    assert ex is not None and calls, "encoder hook not exercised"
    assert np.all(ex.y == 7)

    dcfg0 = DataConfig(
        dataset_dir=root, audio_min_length=0.1, audio_max_length=10.0,
        encodec_sr=50.0, target_time_stretch_prob=0.0,
    )
    ds0 = VoiceDataset(dcfg0, "train", _tokenizer(128), x_sep_token=990,
                       y_sep_token=991, codec_encode=fake_encode,
                       encode_sample_rate=SR)
    n_calls = len(calls)
    ex0 = ds0[0]
    assert len(calls) == n_calls  # hook untouched
    assert not np.all(ex0.y == 7)  # disk codes


def test_dataset_stretch_encoder_failure_falls_back(tmp_path):
    root = _write_dataset(str(tmp_path / "ds"), n=4)
    os.makedirs(f"{root}/audio", exist_ok=True)
    for i in range(4):
        audio_io.write_wav(f"{root}/audio/utt{i:03d}.wav", _sine(300, 0.5), SR)

    def broken_encode(wav):
        raise RuntimeError("boom")

    dcfg = DataConfig(
        dataset_dir=root, audio_min_length=0.1, audio_max_length=10.0,
        encodec_sr=50.0, target_time_stretch_prob=1.0,
    )
    ds = VoiceDataset(dcfg, "train", _tokenizer(128), x_sep_token=990,
                      y_sep_token=991, codec_encode=broken_encode,
                      encode_sample_rate=SR)
    ex = ds[0]
    assert ex is not None and len(ex.y) > 0  # on-disk fallback
