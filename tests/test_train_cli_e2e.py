"""End-to-end training CLI: tiny dataset + offline tokenizer + 3 steps
through train.cli.main (args snapshot, logger, snapshot copy, trainer).

The CLI runs in a SUBPROCESS (python -m t5gemma_tts_tpu.train.cli), like a
real training launch. Running cli.main in-process is flaky at full-suite
scale: after a few hundred in-process compiles, XLA's CPU
backend_compile_and_load intermittently SEGFAULTS while compiling the
train step (observed twice at tests/ tail; the same test alone is green).
"""

import json
import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))
from test_cli_e2e import _make_offline_tokenizer  # noqa: E402
from test_data_and_trainer import _write_dataset  # noqa: E402


def _run_cli(argv):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-m", "t5gemma_tts_tpu.train.cli", *argv],
        capture_output=True, text=True, timeout=2400, env=env)
    assert proc.returncode == 0, (
        f"train CLI failed\nstdout:\n{proc.stdout[-4000:]}\n"
        f"stderr:\n{proc.stderr[-4000:]}")


def test_train_cli_end_to_end(tmp_path):
    pytest.importorskip("transformers")
    root = _write_dataset(str(tmp_path / "ds"), vocab=128)
    tok_dir = str(tmp_path / "tok")
    _make_offline_tokenizer(tok_dir, 512)
    exp = str(tmp_path / "exp")

    argv = [
        "--dataset_dir", root,
        "--exp_dir", exp,
        "--backbone_preset", "test",
        "--precision", "float32",
        "--audio_vocab_size", "128",
        "--x_sep_token", "500",
        "--text_tokenizer_name", tok_dir,
        "--num_steps", "3",
        "--num_epochs", "50",
        "--max_num_tokens", "256",
        "--val_max_num_tokens", "256",
        "--num_buckets", "2",
        "--text_max_length", "64",
        "--audio_min_length", "0.1",
        "--audio_max_length", "1.0",
        "--val_every_n_steps", "100",
        "--early_stop_step", "0",
        "--optimizer_name", "AdamW",
        "--lr", "1e-3",
    ]
    _run_cli(argv)

    assert os.path.isfile(os.path.join(exp, "args.json"))
    assert os.path.isfile(os.path.join(exp, "config.json"))
    assert os.path.isdir(os.path.join(exp, "bundle"))
    assert os.path.isdir(os.path.join(exp, "codebase"))
    with open(os.path.join(exp, "progress.json")) as f:
        progress = json.load(f)
    assert progress["step"] == 3

    # resume path: merged args + checkpoint restore, 2 more steps
    _run_cli(argv + ["--resume", "--num_steps", "5"])
    with open(os.path.join(exp, "progress.json")) as f:
        assert json.load(f)["step"] == 5
