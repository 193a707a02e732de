"""The HF export directory must be self-contained: auto_map resolves to the
shipped configuration/modeling shims, the model loads with zero missing or
unexpected tensors, and its greedy generation is token-identical to the JAX
decode engine (reference equivalent: scripts/export_t5gemma_voice_hf.py
copies its modeling files for the same reason, :167-175)."""

import dataclasses
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from t5gemma_tts_tpu.config import DecodeConfig, tiny_voice_config
from t5gemma_tts_tpu.decode import engine
from t5gemma_tts_tpu.export import hf_export
from t5gemma_tts_tpu.models import voice


@pytest.fixture(scope="module")
def export_dir(tmp_path_factory):
    cfg = dataclasses.replace(tiny_voice_config(), extra_cutoff=0.0)
    params = voice.init_params(jax.random.PRNGKey(0), cfg)
    out = str(tmp_path_factory.mktemp("hf") / "export")
    hf_export.export_hf(params, cfg, out, dtype="float32")
    return out, params, cfg


def test_export_ships_trust_remote_code_files(export_dir):
    out, _, _ = export_dir
    files = set(os.listdir(out))
    assert "configuration_t5gemma_voice.py" in files
    assert "modeling_t5gemma_voice.py" in files
    assert "model.safetensors" in files and "config.json" in files


def test_shim_loads_clean_and_matches_jax_greedy(export_dir):
    torch = pytest.importorskip("torch")
    pytest.importorskip("transformers")
    from transformers import AutoModelForSeq2SeqLM

    out, params, cfg = export_dir
    model, info = AutoModelForSeq2SeqLM.from_pretrained(
        out, trust_remote_code=True, dtype=torch.float32,
        output_loading_info=True)
    model.eval()
    assert not info["missing_keys"], info["missing_keys"]
    assert not info["unexpected_keys"], info["unexpected_keys"]
    assert not info["mismatched_keys"], info["mismatched_keys"]

    rng = np.random.default_rng(0)
    x = rng.integers(3, cfg.text_vocab_size, (1, 10)).astype(np.int64)
    prompt = rng.integers(0, cfg.audio_vocab_size, (1, 1, 4)).astype(np.int64)
    tgt = np.array([24], np.int64)

    _, gen = model.inference_tts(
        torch.tensor(x), torch.tensor([10]), torch.tensor(prompt),
        torch.tensor(tgt), top_k=1, top_p=1.0, temperature=1.0,
        stop_repetition=3, silence_tokens=[])
    torch_trace = gen[0, 0].tolist()

    dcfg = DecodeConfig(top_k=1, top_p=1.0, temperature=1.0, max_frames=40,
                        kv_cache="dense")
    outs = engine.decode_tokens(
        params, cfg, dcfg,
        jnp.asarray(x, jnp.int32), jnp.asarray([10], jnp.int32),
        jnp.asarray(prompt[:, 0], jnp.int32), jnp.asarray([4], jnp.int32),
        jnp.asarray(tgt, jnp.int32), jax.random.PRNGKey(1))
    jax_trace = np.asarray(outs.tokens)[0][: int(outs.gen_lens[0])].tolist()
    assert torch_trace == jax_trace


def test_shim_forward_matches_jax_loss_logits(export_dir):
    torch = pytest.importorskip("torch")
    out, params, cfg = export_dir
    from transformers import AutoModelForSeq2SeqLM

    model = AutoModelForSeq2SeqLM.from_pretrained(
        out, trust_remote_code=True, dtype=torch.float32)
    model.eval()

    rng = np.random.default_rng(1)
    x = rng.integers(3, cfg.text_vocab_size, (1, 8)).astype(np.int64)
    y = rng.integers(0, cfg.audio_vocab_size, (1, 1, 6)).astype(np.int64)
    with torch.no_grad():
        logits_t = model.forward(torch.tensor(x), torch.tensor([8]),
                                 torch.tensor(y)).numpy()

    from t5gemma_tts_tpu.models import t5gemma as tg
    memory, enc_pos = voice.encode_text(
        params, cfg, jnp.asarray(x, jnp.int32), jnp.asarray([8], jnp.int32))
    # teacher-forced decoder pass mirroring the shim's forward
    s = cfg.special
    tokens = np.concatenate([[[s.empty]], y[:, 0]], axis=1)
    t = tokens.shape[1]
    from t5gemma_tts_tpu.ops import masks as mask_ops
    from t5gemma_tts_tpu.ops import rope as rope_ops
    lens = jnp.asarray([t], jnp.int32)
    pos = rope_ops.progress_position_ids(lens, t, cfg.progress_scale)
    emb = voice.embed_audio(params, jnp.asarray(tokens, jnp.int32))
    cross_k, cross_v = tg.build_cross_kv(
        params["decoder"], cfg.backbone.decoder, memory, enc_pos)
    hidden, _ = tg.decoder_forward(
        params["decoder"], cfg.backbone.decoder,
        inputs_embeds=emb,
        self_full_bias=mask_ops.decoder_self_bias(lens, t),
        self_sliding_bias=mask_ops.decoder_sliding_bias(
            lens, t, cfg.backbone.decoder.sliding_window),
        cross_bias=mask_ops.cross_bias(jnp.asarray([8], jnp.int32), t, 8),
        position_ids=pos,
        pm_decoder_positions=pos,
        cross_k=cross_k, cross_v=cross_v)
    logits_j = np.asarray(voice.predict_head(params["head"], hidden))
    np.testing.assert_allclose(logits_t, logits_j, rtol=2e-4, atol=2e-4)


def test_shim_forward_padded_batch_matches_jax(export_dir):
    """Padded rows: the shim must scale PM progress positions by each row's
    own y_lens + 1, not the buffer width (code-review finding)."""
    torch = pytest.importorskip("torch")
    out, params, cfg = export_dir
    from transformers import AutoModelForSeq2SeqLM

    model = AutoModelForSeq2SeqLM.from_pretrained(
        out, trust_remote_code=True, dtype=torch.float32)
    model.eval()

    rng = np.random.default_rng(2)
    b, tx, ty = 2, 8, 6
    x = rng.integers(3, cfg.text_vocab_size, (b, tx)).astype(np.int64)
    x_lens = np.asarray([8, 5], np.int64)
    y = rng.integers(0, cfg.audio_vocab_size, (b, 1, ty)).astype(np.int64)
    y_lens = np.asarray([6, 3], np.int64)
    with torch.no_grad():
        logits_t = model.forward(
            torch.tensor(x), torch.tensor(x_lens), torch.tensor(y),
            y_lens=torch.tensor(y_lens)).numpy()

    # JAX teacher-forced pass with per-row lengths (what voice.forward does)
    from t5gemma_tts_tpu.models import t5gemma as tg
    from t5gemma_tts_tpu.ops import masks as mask_ops
    from t5gemma_tts_tpu.ops import rope as rope_ops

    s = cfg.special
    xl = jnp.asarray(x_lens, jnp.int32)
    memory, enc_pos = voice.encode_text(params, cfg,
                                        jnp.asarray(x, jnp.int32), xl)
    tokens = np.concatenate([np.full((b, 1), s.empty, np.int64), y[:, 0]],
                            axis=1)
    t = tokens.shape[1]
    lens = jnp.asarray(y_lens + 1, jnp.int32)
    pos = rope_ops.progress_position_ids(lens, t, cfg.progress_scale)
    emb = voice.embed_audio(params, jnp.asarray(tokens, jnp.int32))
    cross_k, cross_v = tg.build_cross_kv(
        params["decoder"], cfg.backbone.decoder, memory, enc_pos)
    hidden, _ = tg.decoder_forward(
        params["decoder"], cfg.backbone.decoder,
        inputs_embeds=emb,
        self_full_bias=mask_ops.decoder_self_bias(lens, t),
        self_sliding_bias=mask_ops.decoder_sliding_bias(
            lens, t, cfg.backbone.decoder.sliding_window),
        cross_bias=mask_ops.cross_bias(xl, t, tx),
        position_ids=pos,
        pm_decoder_positions=pos,
        cross_k=cross_k, cross_v=cross_v)
    logits_j = np.asarray(voice.predict_head(params["head"], hidden))
    # valid decoder positions per row: < y_lens + 1
    for i in range(b):
        n = int(y_lens[i]) + 1
        np.testing.assert_allclose(logits_t[i, :n], logits_j[i, :n],
                                   rtol=5e-4, atol=5e-4, err_msg=f"row {i}")


def test_peft_adapter_export_roundtrip(export_dir, tmp_path):
    """export_peft_adapter writes a directory that REAL peft can load onto
    the exported trust_remote_code model; peft's merge_and_unload must then
    equal this framework's lora.merge weight-for-weight (reference:
    scripts/export_t5gemma_voice_hf_lora.py:105-111 saves the adapter and
    merges with the same semantics)."""
    torch = pytest.importorskip("torch")
    peft = pytest.importorskip("peft")
    from transformers import AutoModelForSeq2SeqLM

    from t5gemma_tts_tpu.models import convert
    from t5gemma_tts_tpu.train import lora

    out, params, cfg = export_dir
    lcfg = lora.LoraConfig(r=4, alpha=8)
    ads = lora.init_adapters(jax.random.PRNGKey(7), params, lcfg)
    # non-zero B so the adapter actually perturbs every target weight
    ads = jax.tree_util.tree_map(
        lambda x: x + 0.01 if hasattr(x, "ndim") else x, ads)

    adapter_dir = str(tmp_path / "adapter")
    hf_export.export_peft_adapter(ads, lcfg, adapter_dir)
    assert os.path.isfile(os.path.join(adapter_dir,
                                       "adapter_model.safetensors"))
    assert os.path.isfile(os.path.join(adapter_dir, "adapter_config.json"))

    base = AutoModelForSeq2SeqLM.from_pretrained(
        out, trust_remote_code=True, dtype=torch.float32)
    pm = peft.PeftModel.from_pretrained(base, adapter_dir)
    merged_torch = pm.merge_and_unload().state_dict()

    merged_jax = lora.merge(params, ads, lcfg)
    want = convert.params_to_torch_state_dict(merged_jax)
    checked = 0
    for key in want:
        if "_proj.weight" not in key:
            continue
        got = merged_torch[key].detach().numpy()
        np.testing.assert_allclose(
            got, want[key], rtol=2e-5, atol=2e-6, err_msg=key)
        checked += 1
    assert checked >= 7 * 2  # all 7 targets across encoder+decoder layers
