"""Full-stack parity vs the actual reference implementation (when mounted).

Instantiates the reference ``T5GemmaVoiceModel`` (torch) on a tiny local
T5Gemma backbone, converts its weights, and checks:

- training forward: loss / top10 / ntokens match,
- ``inference_tts`` greedy decode: token-trace equality with the jitted
  batched engine (BASELINE.md "audio-token parity": greedy-trace equality).

Skipped when /root/reference is not available (CI without the snapshot).
"""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference snapshot not mounted"
)

torch = pytest.importorskip("torch")

from t5gemma_tts_tpu.config import (  # noqa: E402
    BackboneConfig, DecodeConfig, ModuleDims, VoiceConfig,
)
from t5gemma_tts_tpu.decode import engine  # noqa: E402
from t5gemma_tts_tpu.models import convert, voice  # noqa: E402

DIMS = ModuleDims(
    vocab_size=512, hidden_size=64, intermediate_size=128, num_layers=2,
    num_heads=4, num_kv_heads=2, head_dim=16, query_pre_attn_scalar=16.0,
    sliding_window=64,
)
AUDIO_V = 128


def _make_args(tmp_backbone_dir):
    a = types.SimpleNamespace()
    a.t5gemma_model_name = tmp_backbone_dir
    a.precision = "float32"
    a.attn_implementation = "eager"
    a.prune_text_modules = 2
    a.t5_gradient_checkpointing = 0
    a.use_lora = 0
    a.freeze_t5gemma = 0
    a.text_input_type = "text"
    a.text_embedding_dropout = 0.0
    a.audio_embedding_dropout = 0.0
    a.n_codebooks = 1
    a.audio_vocab_size = AUDIO_V
    a.n_special = 5
    a.empty_token = AUDIO_V
    a.eog = AUDIO_V + 1
    a.audio_pad_token = AUDIO_V + 2
    a.eos = AUDIO_V + 3
    a.y_sep_token = AUDIO_V + 4
    a.x_sep_token = 511
    a.special_first = 0
    a.eog_weight = 1.0
    a.codebook_weight = None
    a.no_loss_on_prefix = 0
    a.use_pm_rope = 1
    a.progress_scale = 2000.0
    a.encodec_sr = 50
    a.extra_cutoff = 0.0
    a.text_guard_frames_per_token = 0
    a.audio_max_length = 120.0
    a.seed = 1
    return a


@pytest.fixture(scope="module")
def models(tmp_path_factory):
    """(reference torch model, my params, my cfg)."""
    from transformers.models.t5gemma.configuration_t5gemma import (
        T5GemmaConfig, T5GemmaModuleConfig,
    )
    from transformers.models.t5gemma.modeling_t5gemma import (
        T5GemmaForConditionalGeneration,
    )

    mc = dict(
        vocab_size=DIMS.vocab_size, hidden_size=DIMS.hidden_size,
        intermediate_size=DIMS.intermediate_size,
        num_hidden_layers=DIMS.num_layers,
        num_attention_heads=DIMS.num_heads,
        num_key_value_heads=DIMS.num_kv_heads, head_dim=DIMS.head_dim,
        query_pre_attn_scalar=DIMS.query_pre_attn_scalar,
        sliding_window=DIMS.sliding_window,
    )
    hf_cfg = T5GemmaConfig(encoder=T5GemmaModuleConfig(**mc),
                           decoder=T5GemmaModuleConfig(**mc),
                           tie_word_embeddings=False)
    hf_cfg._attn_implementation = "eager"
    torch.manual_seed(0)
    backbone = T5GemmaForConditionalGeneration(hf_cfg)
    bdir = str(tmp_path_factory.mktemp("backbone"))
    backbone.save_pretrained(bdir)

    sys.path.insert(0, REFERENCE)
    try:
        from models.t5gemma import T5GemmaVoiceModel
    finally:
        sys.path.remove(REFERENCE)

    args = _make_args(bdir)
    torch.manual_seed(1)
    ref_model = T5GemmaVoiceModel(args)
    ref_model.eval()

    cfg = VoiceConfig(
        backbone=BackboneConfig(encoder=DIMS, decoder=DIMS),
        audio_vocab_size=AUDIO_V, text_vocab_size=DIMS.vocab_size,
        x_sep_token=511, dtype="float32", extra_cutoff=0.0,
        no_loss_on_prefix=False,
    )
    sd = {k: v.detach().float().numpy() for k, v in ref_model.state_dict().items()}
    params = convert.torch_state_dict_to_params(sd, cfg, dtype=jnp.float32)
    return ref_model, params, cfg, args


def test_training_forward_parity(models):
    ref_model, params, cfg, _ = models
    rng = np.random.default_rng(0)
    b, tx, ty = 2, 7, 11
    x = rng.integers(3, DIMS.vocab_size, (b, tx)).astype(np.int64)
    x_lens = np.array([7, 5], np.int64)
    y = rng.integers(0, AUDIO_V, (b, ty)).astype(np.int64)
    y_lens = np.array([11, 8], np.int64)
    for i in range(b):
        x[i, x_lens[i]:] = 0
        y[i, y_lens[i]:] = cfg.special.pad

    with torch.no_grad():
        ref = ref_model({
            "x": torch.tensor(x),
            "x_lens": torch.tensor(x_lens),
            "y": torch.tensor(y)[:, None, :],  # [B, K, T]
            "y_lens": torch.tensor(y_lens),
        })

    out = voice.forward(params, cfg, {
        "x": jnp.asarray(x.astype(np.int32)),
        "x_lens": jnp.asarray(x_lens.astype(np.int32)),
        "y": jnp.asarray(y.astype(np.int32)),
        "y_lens": jnp.asarray(y_lens.astype(np.int32)),
    })

    np.testing.assert_allclose(float(out.loss), float(ref["loss"]),
                               rtol=2e-3)
    assert int(out.effective_ntokens) == int(ref["effective_ntoken"])
    assert abs(int(out.top10acc) - int(ref["top10acc"])) <= 1


def test_greedy_decode_trace_parity(models):
    ref_model, params, cfg, args = models
    rng = np.random.default_rng(3)
    tx, p_len, extra = 6, 4, 9
    x = rng.integers(3, DIMS.vocab_size, (1, tx)).astype(np.int64)
    prompt = rng.integers(0, AUDIO_V, (1, p_len)).astype(np.int64)
    tgt_total = p_len + extra

    with torch.no_grad():
        _, gen_ref = ref_model.inference_tts(
            torch.tensor(x),
            torch.tensor([tx]),
            torch.tensor(prompt)[:, :, None],        # [B, T, K]
            torch.tensor([tgt_total]),
            top_k=1, top_p=1.0, min_p=0.0, temperature=1.0,
            stop_repetition=3, silence_tokens=[],
            prompt_frames=p_len,
        )
    ref_tokens = gen_ref[0, 0].tolist()

    dcfg = DecodeConfig(top_k=1, top_p=1.0, temperature=1.0, max_frames=64)
    out = engine.decode_tokens(
        params, cfg, dcfg,
        jnp.asarray(x.astype(np.int32)), jnp.asarray([tx], jnp.int32),
        jnp.asarray(prompt.astype(np.int32)),
        jnp.asarray([p_len], jnp.int32),
        jnp.asarray([tgt_total], jnp.int32),
        jax.random.PRNGKey(0),
    )
    got = np.asarray(out.tokens)[0, : int(out.gen_lens[0])].tolist()
    assert got == ref_tokens, f"\nref: {ref_tokens}\ngot: {got}"
