"""Reference .pth bundle interop: a bundle in the reference trainer's
on-disk layout ({model, optimizer, scheduler, args} torch pickle with
backbone.model.* key naming, reference: steps/trainer.py:604-640) loads
through both load_reference_pth and tools/convert_reference_bundle.py."""

import argparse
import dataclasses
import sys
from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from t5gemma_tts_tpu.config import tiny_voice_config
from t5gemma_tts_tpu.models import convert, voice


def _tiny_dims_dict(cfg):
    d = cfg.backbone.decoder
    return dict(
        vocab_size=d.vocab_size, hidden_size=d.hidden_size,
        intermediate_size=d.intermediate_size, num_layers=d.num_layers,
        num_heads=d.num_heads, num_kv_heads=d.num_kv_heads,
        head_dim=d.head_dim, query_pre_attn_scalar=d.query_pre_attn_scalar,
        sliding_window=d.sliding_window,
    )


@pytest.fixture(scope="module")
def bundle_path(tmp_path_factory):
    torch = pytest.importorskip("torch")
    cfg = tiny_voice_config()
    params = voice.init_params(jax.random.PRNGKey(0), cfg)
    sd = convert.params_to_torch_state_dict(params, prefix="model.")
    # reference layout: T5GemmaVoiceModel holds the HF backbone at
    # .backbone (-> backbone.model.encoder...) plus audio head modules
    ref_sd = {}
    for k, v in sd.items():
        if k.startswith("model."):
            ref_sd["backbone." + k] = torch.tensor(v)
        else:
            ref_sd[k] = torch.tensor(v)
    args = argparse.Namespace(
        t5gemma_model_name="tiny-test-backbone",
        backbone_dims=_tiny_dims_dict(cfg),
        audio_vocab_size=[cfg.audio_vocab_size],
        n_special=cfg.n_special,
        encodec_sr=int(cfg.encodec_sr),
        use_pm_rope=1,
        progress_scale=cfg.progress_scale,
        x_sep_token=cfg.x_sep_token,
        eos=cfg.special.eos,
        eog=cfg.special.eog,
        empty_token=cfg.special.empty,
    )
    path = tmp_path_factory.mktemp("bundle") / "bundle.pth"
    torch.save({"model": ref_sd, "optimizer": {}, "scheduler": {},
                "args": args}, str(path))
    return str(path), params, cfg


def test_load_reference_pth_roundtrip(bundle_path):
    path, params, cfg = bundle_path
    from t5gemma_tts_tpu.inference.loading import load_reference_pth

    loaded, lcfg, _ = load_reference_pth(path)
    assert lcfg.audio_vocab_size == cfg.audio_vocab_size
    assert lcfg.backbone.decoder.hidden_size == cfg.backbone.decoder.hidden_size

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(loaded))
    assert len(flat_a) == len(flat_b)
    for path_k, leaf in flat_a:
        got = np.asarray(flat_b[path_k], np.float32)
        np.testing.assert_allclose(got, np.asarray(leaf, np.float32),
                                   rtol=1e-2, atol=1e-2)


def test_convert_reference_bundle_tool(bundle_path, tmp_path):
    path, params, cfg = bundle_path
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    try:
        import convert_reference_bundle as tool
    finally:
        sys.path.pop(0)
    out = str(tmp_path / "hf")
    tool.main(["--bundle", path, "--out", out, "--dtype", "float32"])

    from t5gemma_tts_tpu.inference.loading import load_hf_dir

    loaded, lcfg, _ = load_hf_dir(out)
    assert lcfg.audio_vocab_size == cfg.audio_vocab_size
    ref = dict(jax.tree_util.tree_leaves_with_path(params))
    for path_k, leaf in jax.tree_util.tree_leaves_with_path(loaded):
        np.testing.assert_allclose(
            np.asarray(leaf, np.float32), np.asarray(ref[path_k], np.float32),
            rtol=1e-2, atol=1e-2)
