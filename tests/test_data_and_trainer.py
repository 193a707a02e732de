"""Data pipeline + trainer integration: synthetic on-disk dataset with the
reference layout, bucketing, a short training run, checkpoint resume."""

import os

import numpy as np
import pytest
import jax

from t5gemma_tts_tpu.config import tiny_voice_config
from t5gemma_tts_tpu.data import batching, manifest
from t5gemma_tts_tpu.data.dataset import VoiceDataset
from t5gemma_tts_tpu.data.manifest import DataConfig
from t5gemma_tts_tpu.train.trainer import Trainer, TrainerConfig


def _write_dataset(root, n=24, vocab=128, seed=0, with_neighbors=True):
    rng = np.random.default_rng(seed)
    os.makedirs(f"{root}/text", exist_ok=True)
    os.makedirs(f"{root}/xcodec2_1cb", exist_ok=True)
    os.makedirs(f"{root}/manifest_final", exist_ok=True)
    os.makedirs(f"{root}/neighbors", exist_ok=True)
    rows = {"train": [], "valid": []}
    ids = []
    for i in range(n):
        utt = f"utt{i:03d}"
        length = int(rng.integers(8, 40))
        codes = rng.integers(0, vocab, length)
        with open(f"{root}/text/{utt}.txt", "w") as f:
            f.write("hello sample " + "word " * (i % 5))
        with open(f"{root}/xcodec2_1cb/{utt}.txt", "w") as f:
            f.write(" ".join(map(str, codes)))
        split = "valid" if i % 6 == 5 else "train"
        rows[split].append(f"{utt}\t{length}")
        ids.append((utt, length))
    for split, lines in rows.items():
        with open(f"{root}/manifest_final/{split}.txt", "w") as f:
            f.write("\n".join(lines))
    if with_neighbors:
        for i, (utt, _) in enumerate(ids):
            nb, nb_len = ids[(i + 1) % n]
            with open(f"{root}/neighbors/{utt}.txt", "w") as f:
                f.write(f"{nb}.txt\t5.0\t{nb_len / 50.0}")
    return root


def _tokenizer(vocab):
    return lambda text: [3 + (ord(c) % (vocab - 10)) for c in text][:100]


@pytest.fixture()
def tiny_data(tmp_path):
    root = _write_dataset(str(tmp_path / "ds"))
    cfg = tiny_voice_config()
    dcfg = DataConfig(
        dataset_dir=root, audio_min_length=0.1, audio_max_length=1.0,
        encodec_sr=50.0, neighbor_prompt_prob=1.0, min_prompt_len=0.05,
    )
    return cfg, dcfg, root


def test_manifest_and_dataset(tiny_data):
    cfg, dcfg, root = tiny_data
    ds = VoiceDataset(dcfg, "train", _tokenizer(cfg.text_vocab_size),
                      x_sep_token=cfg.x_sep_token,
                      y_sep_token=cfg.special.y_sep)
    assert len(ds) > 5
    ex = ds[0]
    assert ex is not None
    # neighbor prompting active: separator present, sep position recorded
    assert cfg.special.y_sep in ex.y.tolist()
    assert ex.y_sep_position == ex.y.tolist().index(cfg.special.y_sep) + 1
    assert cfg.x_sep_token in ex.x.tolist()


def test_parse_list_flag():
    assert manifest.parse_list_flag("/a/b") == ["/a/b"]
    assert manifest.parse_list_flag("['x','y']") == ["x", "y"]


def test_bucket_plan_and_sampler():
    lengths = list(np.random.default_rng(0).integers(10, 500, 200))
    plan = batching.make_plan(lengths, max_batch_tokens=1000, num_buckets=4,
                              max_len=500)
    sampler = batching.BucketBatchSampler(lengths, plan, seed=0, epoch=0)
    seen = []
    for bucket_id, rows in sampler:
        assert len(rows) == plan.batch_sizes[bucket_id]
        real = [r for r in rows if r >= 0]
        seen += real
        for r in real:
            assert lengths[r] <= plan.pad_lens[bucket_id]
    assert sorted(seen) == list(range(200))  # every example exactly once

    # deterministic per epoch, different across epochs
    s2 = batching.BucketBatchSampler(lengths, plan, seed=0, epoch=0)
    assert [r for _, r in s2] == [r for _, r in
                                  batching.BucketBatchSampler(lengths, plan,
                                                              seed=0, epoch=0)]
    s2.set_epoch(1)
    assert [r for _, r in s2] != [r for _, r in sampler]

    # mid-epoch resume skips batches
    s3 = batching.BucketBatchSampler(lengths, plan, seed=0, epoch=0)
    all_batches = list(s3)
    s3.set_epoch_resume(0, 3)
    assert list(s3) == all_batches[3:]


def test_trainer_end_to_end(tiny_data, tmp_path):
    cfg, dcfg, root = tiny_data
    tok = _tokenizer(cfg.text_vocab_size)
    train_ds = VoiceDataset(dcfg, "train", tok, cfg.x_sep_token,
                            cfg.special.y_sep)
    valid_ds = VoiceDataset(dcfg, "valid", tok, cfg.x_sep_token,
                            cfg.special.y_sep)
    tcfg = TrainerConfig(
        exp_dir=str(tmp_path / "exp"),
        lr=0.01, num_steps=6, val_every_n_steps=3,
        max_num_tokens=256, val_max_num_tokens=256, num_buckets=2,
        text_max_length=64, print_every_n_steps=2,
        early_stop_step=0, num_epochs=50,
    )
    trainer = Trainer(cfg, tcfg, train_ds, valid_ds)
    progress = trainer.train()
    assert progress["step"] == 6
    assert np.isfinite(progress["best_score"])

    # resume continues from the saved step
    trainer2 = Trainer(cfg, tcfg, train_ds, valid_ds)
    assert trainer2.progress["step"] == 6
    tcfg2 = TrainerConfig(**{**tcfg.__dict__, "num_steps": 8})
    trainer3 = Trainer(cfg, tcfg2, train_ds, valid_ds)
    progress3 = trainer3.train()
    assert progress3["step"] == 8
