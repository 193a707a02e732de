"""Preprocessing pipeline test: wav folder -> training layout -> trainable."""

import os

import numpy as np
import jax

from t5gemma_tts_tpu.codec.audio_tokenizer import AudioTokenizer
from t5gemma_tts_tpu.codec.model import (
    init_decoder_params, init_encoder_params_for, tiny_codec_config,
)
from t5gemma_tts_tpu.data import preprocess
from t5gemma_tts_tpu.data.dataset import VoiceDataset
from t5gemma_tts_tpu.data.manifest import DataConfig
from t5gemma_tts_tpu.inference import audio_io


def test_filters():
    cfg = preprocess.PreprocessConfig(languages=("en",), blocklist=("bad1",))
    mk = lambda **kw: preprocess.Sample(
        utt_id=kw.get("utt_id", "u"), text=kw.get("text", "hello world"),
        wav=np.zeros(kw.get("n", 2000), np.float32),
        language=kw.get("language", "en"),
        duration_sec=kw.get("dur", 1.0),
    )
    f = lambda s: preprocess.sample_filter(cfg, s, 200)
    assert f(mk()) is None
    assert f(mk(language="ja")) == "language"
    assert f(mk(utt_id="bad1")) == "blocklist"
    assert f(mk(text="")) == "empty_text"
    assert f(mk(text="see https://spam.com now")) == "bad_substring"
    assert f(mk(text="abcdabcdabcdabcdabcdabcdabcdabcdabcdabcdabcdabcd")) == "repetition"
    assert f(mk(dur=45.0)) == "duration"
    assert f(mk(dur=0.05)) == "duration"


def test_repetition_detector():
    assert preprocess.repetition_found("spam" * 12)
    assert not preprocess.repetition_found("a perfectly normal sentence here")


def test_prepare_roundtrip(tmp_path):
    ccfg = tiny_codec_config()
    params = init_decoder_params(jax.random.PRNGKey(0), ccfg)
    params.update(init_encoder_params_for(jax.random.PRNGKey(1), ccfg))
    tok = AudioTokenizer(params, ccfg)

    # build a wav+txt folder (3 speakers x 4 utts)
    src = tmp_path / "raw"
    src.mkdir()
    rng = np.random.default_rng(0)
    sr = ccfg.encode_sample_rate
    for spk in range(3):
        for j in range(4):
            utt = f"spk{spk}_{j:02d}"
            wav = (rng.normal(size=int(sr * (1.0 + j))) * 0.1).astype(np.float32)
            audio_io.write_wav(str(src / f"{utt}.wav"), wav, sr)
            (src / f"{utt}.txt").write_text(f"utterance {spk} number {j}")

    out = str(tmp_path / "prepared")
    pcfg = preprocess.PreprocessConfig(out_dir=out, valid_fraction=0.0,
                                       encode_batch=4)
    records = preprocess.prepare(
        preprocess.iter_wav_folder(str(src), sr), tok, pcfg
    )
    assert len(records) == 12
    # resume: nothing re-written
    records2 = preprocess.prepare(
        preprocess.iter_wav_folder(str(src), sr), tok, pcfg
    )
    assert len(records2) == 0

    # the produced layout loads as a training dataset
    dcfg = DataConfig(dataset_dir=out, audio_min_length=0.0,
                      audio_max_length=100.0, encodec_sr=ccfg.frame_rate,
                      neighbor_prompt_prob=1.0, min_prompt_len=0.0)
    ds = VoiceDataset(dcfg, "train", lambda t: [ord(c) % 50 for c in t],
                      x_sep_token=None, y_sep_token=None)
    assert len(ds) == 12
    ex = ds[0]
    assert ex is not None and len(ex.y) > 0

    # neighbors exist and point to the same speaker
    r = records[0]
    nb_path = os.path.join(out, "neighbors", r.utt_id + ".txt")
    assert os.path.isfile(nb_path)
    lines = open(nb_path).read().strip().splitlines()
    assert len(lines) == 3  # 3 same-speaker neighbors
    spk = r.utt_id.split("/")[-1].split("_")[0]
    for line in lines:
        assert spk in line


def test_preprocess_cli_e2e(tmp_path):
    """python -m t5gemma_tts_tpu.data.preprocess over a tiny wav folder
    produces the full training layout (reference flag surface:
    prepare_emilia_en.py:404-507), including resume and neighbors-only."""
    import subprocess
    import sys

    ccfg = tiny_codec_config()
    sr = ccfg.encode_sample_rate
    src = tmp_path / "raw"
    src.mkdir()
    rng = np.random.default_rng(1)
    for spk in range(2):
        for j in range(3):
            utt = f"spk{spk}_{j:02d}"
            wav = (rng.normal(size=int(sr * (1.0 + j))) * 0.1).astype(np.float32)
            audio_io.write_wav(str(src / f"{utt}.wav"), wav, sr)
            (src / f"{utt}.txt").write_text(f"utterance {spk} number {j}")
    # one sample that the blocklist-file must drop
    audio_io.write_wav(str(src / "dropme_00.wav"),
                       np.zeros(sr, np.float32), sr)
    (src / "dropme_00.txt").write_text("should be dropped")
    blf = tmp_path / "block.txt"
    blf.write_text("dropme_00\n")

    out = tmp_path / "prepared"
    cmd = [sys.executable, "-m", "t5gemma_tts_tpu.data.preprocess",
           "--wav-folder", str(src), "--output-dir", str(out),
           "--tiny-random-codec", "--encode-batch", "4",
           "--blocklist-file", str(blf), "--seed", "7"]
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       timeout=2400)
    assert r.returncode == 0, r.stderr[-2000:]

    # full layout present
    for sub in ("text", "xcodec2_1cb", "manifest_final", "neighbors"):
        assert (out / sub).is_dir()
    manifest = (out / "manifest_final" / "train.txt").read_text().splitlines()
    assert len(manifest) == 6          # blocklisted sample dropped
    assert all("\t" in ln for ln in manifest)
    utt0 = manifest[0].split("\t")[0]
    assert (out / "text" / (utt0 + ".txt")).is_file()
    codes = (out / "xcodec2_1cb" / (utt0 + ".txt")).read_text().split()
    assert all(c.isdigit() for c in codes)
    nb = (out / "neighbors" / (utt0 + ".txt")).read_text().splitlines()
    assert len(nb) == 2                # 2 same-speaker neighbors

    # resume: re-run writes nothing new, exits 0
    r2 = subprocess.run(cmd, capture_output=True, text=True, env=env,
                        timeout=2400)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert len((out / "manifest_final" / "train.txt")
               .read_text().splitlines()) == 6

    # neighbors-only replay rebuilds neighbor lists from manifests
    import shutil
    shutil.rmtree(out / "neighbors")
    r3 = subprocess.run(cmd + ["--neighbors-only"], capture_output=True,
                        text=True, env=env, timeout=2400)
    assert r3.returncode == 0, r3.stderr[-2000:]
    nb2 = (out / "neighbors" / (utt0 + ".txt")).read_text().splitlines()
    assert nb2 == nb
