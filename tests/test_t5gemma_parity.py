"""Numerical parity of the JAX T5Gemma vs HF transformers (torch, CPU, fp32).

Builds a tiny randomly-initialized torch T5GemmaForConditionalGeneration,
converts its weights, and checks encoder/decoder hidden states agree to fp32
tolerance — including float (PM progress) position ids and PM-RoPE
cross-attention, whose torch oracle is assembled here from HF primitives
following the published PM-RoPE spec (rotary on decoder queries with progress
positions, rotary on encoder keys with encoder progress positions).
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from transformers.models.t5gemma.configuration_t5gemma import (
    T5GemmaConfig,
    T5GemmaModuleConfig,
)
from transformers.models.t5gemma.modeling_t5gemma import (
    T5GemmaForConditionalGeneration,
    T5GemmaRotaryEmbedding,
    rotate_half,
)

from t5gemma_tts_tpu.config import BackboneConfig, ModuleDims
from t5gemma_tts_tpu.models import convert, t5gemma
from t5gemma_tts_tpu.ops import masks as mask_ops
from t5gemma_tts_tpu.ops import rope as rope_ops

# window >= max T so sliding == full; HF passes 4D training masks through
# unchanged so sliding layers would otherwise see full masks anyway.
WINDOW = 64

DIMS = ModuleDims(
    vocab_size=512,
    hidden_size=64,
    intermediate_size=128,
    num_layers=4,
    num_heads=4,
    num_kv_heads=2,
    head_dim=16,
    query_pre_attn_scalar=16.0,
    sliding_window=WINDOW,
)


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    module_cfg = dict(
        vocab_size=DIMS.vocab_size,
        hidden_size=DIMS.hidden_size,
        intermediate_size=DIMS.intermediate_size,
        num_hidden_layers=DIMS.num_layers,
        num_attention_heads=DIMS.num_heads,
        num_key_value_heads=DIMS.num_kv_heads,
        head_dim=DIMS.head_dim,
        query_pre_attn_scalar=DIMS.query_pre_attn_scalar,
        sliding_window=DIMS.sliding_window,
        attn_logit_softcapping=50.0,
        rope_theta=10000.0,
    )
    cfg = T5GemmaConfig(
        encoder=T5GemmaModuleConfig(**module_cfg),
        decoder=T5GemmaModuleConfig(**module_cfg),
        tie_word_embeddings=False,
    )
    cfg._attn_implementation = "eager"
    model = T5GemmaForConditionalGeneration(cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def jax_params(torch_model):
    from t5gemma_tts_tpu.config import VoiceConfig

    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    cfg = VoiceConfig(
        backbone=BackboneConfig(encoder=DIMS, decoder=DIMS),
        audio_vocab_size=128, dtype="float32",
    )
    return convert.torch_state_dict_to_params(sd, cfg, dtype=jnp.float32)


def test_converter_key_exhaustive(torch_model):
    """Every HF tensor is consumed or known-prunable; an unexpected key is
    reported (and raises under strict)."""
    from t5gemma_tts_tpu.config import VoiceConfig

    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    cfg = VoiceConfig(
        backbone=BackboneConfig(encoder=DIMS, decoder=DIMS),
        audio_vocab_size=128, dtype="float32",
    )
    # clean dump converts strictly
    convert.torch_state_dict_to_params(sd, cfg, dtype=jnp.float32, strict=True)
    # a bogus tensor must be flagged
    sd2 = dict(sd)
    sd2["model.encoder.layers.0.mystery.weight"] = np.zeros((2, 2), np.float32)
    with pytest.raises(ValueError, match="not consumed"):
        convert.torch_state_dict_to_params(sd2, cfg, dtype=jnp.float32,
                                           strict=True)


def _rand_batch(seed=0, b=2, t=10):
    rng = np.random.default_rng(seed)
    ids = rng.integers(3, DIMS.vocab_size, size=(b, t)).astype(np.int32)
    lens = np.array([t, t - 3], np.int32)[:b]
    for i, l in enumerate(lens):
        ids[i, l:] = 0
    return ids, lens


def test_encoder_parity_integer_positions(torch_model, jax_params):
    ids, lens = _rand_batch()
    t = ids.shape[1]
    attn = (np.arange(t)[None] < lens[:, None]).astype(np.int64)
    with torch.no_grad():
        ref = torch_model.model.encoder(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(attn),
        ).last_hidden_state.numpy()
    got = t5gemma.encoder_forward(
        jax_params["encoder"], DIMS,
        input_ids=jnp.asarray(ids),
        full_bias=mask_ops.encoder_self_bias(jnp.asarray(lens), t),
        sliding_bias=mask_ops.encoder_sliding_bias(jnp.asarray(lens), t, WINDOW),
        position_ids=jnp.broadcast_to(
            jnp.arange(t, dtype=jnp.float32)[None], ids.shape
        ),
    )
    valid = np.arange(t)[None] < lens[:, None]
    np.testing.assert_allclose(
        np.asarray(got)[valid], ref[valid], rtol=2e-4, atol=2e-4
    )


def test_encoder_parity_float_pm_positions(torch_model, jax_params):
    ids, lens = _rand_batch(seed=1)
    t = ids.shape[1]
    attn = (np.arange(t)[None] < lens[:, None]).astype(np.int64)
    pm = np.asarray(
        rope_ops.progress_position_ids(jnp.asarray(lens), t, 2000.0)
    )
    with torch.no_grad():
        ref = torch_model.model.encoder(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(attn),
            position_ids=torch.tensor(pm),
        ).last_hidden_state.numpy()
    got = t5gemma.encoder_forward(
        jax_params["encoder"], DIMS,
        input_ids=jnp.asarray(ids),
        full_bias=mask_ops.encoder_self_bias(jnp.asarray(lens), t),
        sliding_bias=mask_ops.encoder_sliding_bias(jnp.asarray(lens), t, WINDOW),
        position_ids=jnp.asarray(pm),
    )
    valid = np.arange(t)[None] < lens[:, None]
    np.testing.assert_allclose(
        np.asarray(got)[valid], ref[valid], rtol=2e-4, atol=2e-4
    )


def _torch_pm_decoder(model, embeds, dec_bias4d, memory, enc_attn_2d,
                      dec_pos, enc_pos):
    """Torch oracle of the PM-RoPE decoder: HF self-attn layers, manual
    cross-attention with rotary(q @ dec progress) / rotary(k @ enc progress).
    """
    dec = model.model.decoder
    cfg = dec.config
    h = embeds * (cfg.hidden_size ** 0.5)
    rot = T5GemmaRotaryEmbedding(config=cfg)
    cos_d, sin_d = rot(h, dec_pos)
    cos_e, sin_e = rot(memory, enc_pos)
    cos_sa, sin_sa = rot(h, dec_pos)  # self-attn also uses PM positions
    cross_bias = torch.where(
        torch.tensor(enc_attn_2d, dtype=torch.bool)[:, None, None, :],
        0.0, -1e9,
    ).float()

    def rope_apply(x, cos, sin):
        return x * cos.unsqueeze(1) + rotate_half(x) * sin.unsqueeze(1)

    for layer in dec.layers:
        r = h
        hn = layer.pre_self_attn_layernorm(h)
        a, _ = layer.self_attn(
            hidden_states=hn, position_embeddings=(cos_sa, sin_sa),
            attention_mask=dec_bias4d,
        )
        h = r + layer.post_self_attn_layernorm(a)

        r = h
        hn = layer.pre_cross_attn_layernorm(h)
        ca = layer.cross_attn
        b, tq, _ = hn.shape
        q = ca.q_proj(hn).view(b, tq, -1, ca.head_dim).transpose(1, 2)
        q = rope_apply(q, cos_d, sin_d)
        tk = memory.shape[1]
        k = ca.k_proj(memory).view(b, tk, -1, ca.head_dim).transpose(1, 2)
        k = rope_apply(k, cos_e, sin_e)
        v = ca.v_proj(memory).view(b, tk, -1, ca.head_dim).transpose(1, 2)
        rep = ca.num_key_value_groups
        k = k.repeat_interleave(rep, dim=1)
        v = v.repeat_interleave(rep, dim=1)
        logits = q @ k.transpose(2, 3) * ca.scaling
        logits = torch.tanh(logits / 50.0) * 50.0
        logits = logits + cross_bias
        w = torch.softmax(logits.float(), dim=-1)
        a = (w @ v).transpose(1, 2).reshape(b, tq, -1)
        a = ca.o_proj(a)
        h = r + layer.post_cross_attn_layernorm(a)

        r = h
        hn = layer.pre_feedforward_layernorm(h)
        h = r + layer.post_feedforward_layernorm(layer.mlp(hn))
    return dec.norm(h)


def test_decoder_parity_pm_rope(torch_model, jax_params):
    rng = np.random.default_rng(3)
    b, tq, tk = 2, 8, 10
    d = DIMS.hidden_size
    embeds = rng.normal(size=(b, tq, d)).astype(np.float32) * 0.3
    memory = rng.normal(size=(b, tk, d)).astype(np.float32) * 0.3
    dec_lens = np.array([8, 5], np.int32)
    enc_lens = np.array([10, 7], np.int32)
    enc_attn = (np.arange(tk)[None] < enc_lens[:, None]).astype(np.int64)

    pm_dec = np.asarray(
        rope_ops.progress_position_ids(jnp.asarray(dec_lens), tq, 2000.0)
    )
    pm_enc = np.asarray(
        rope_ops.progress_position_ids(jnp.asarray(enc_lens), tk, 2000.0)
    )

    dec_bias = np.asarray(mask_ops.decoder_self_bias(jnp.asarray(dec_lens), tq))
    dec_bias_t = torch.tensor(np.maximum(dec_bias, -1e9), dtype=torch.float32)

    with torch.no_grad():
        ref = _torch_pm_decoder(
            torch_model,
            torch.tensor(embeds), dec_bias_t, torch.tensor(memory), enc_attn,
            torch.tensor(pm_dec), torch.tensor(pm_enc),
        ).numpy()

    cross_k, cross_v = t5gemma.build_cross_kv(
        jax_params["decoder"], DIMS, jnp.asarray(memory), jnp.asarray(pm_enc)
    )
    got, _ = t5gemma.decoder_forward(
        jax_params["decoder"], DIMS,
        inputs_embeds=jnp.asarray(embeds),
        self_full_bias=jnp.asarray(dec_bias),
        self_sliding_bias=mask_ops.decoder_sliding_bias(
            jnp.asarray(dec_lens), tq, WINDOW
        ),
        cross_bias=mask_ops.cross_bias(jnp.asarray(enc_lens), tq, tk),
        position_ids=jnp.asarray(pm_dec),
        pm_decoder_positions=jnp.asarray(pm_dec),
        cross_k=cross_k, cross_v=cross_v,
    )
    valid = np.arange(tq)[None] < dec_lens[:, None]
    np.testing.assert_allclose(
        np.asarray(got)[valid], ref[valid], rtol=3e-4, atol=3e-4
    )


def test_cache_prefill_matches_full_forward(jax_params):
    """Prefill-with-cache must produce identical hiddens to the plain path."""
    rng = np.random.default_rng(5)
    b, tq, tk, d = 2, 6, 9, DIMS.hidden_size
    embeds = jnp.asarray(rng.normal(size=(b, tq, d)).astype(np.float32) * 0.3)
    memory = jnp.asarray(rng.normal(size=(b, tk, d)).astype(np.float32) * 0.3)
    dec_lens = jnp.asarray(np.array([6, 4], np.int32))
    enc_lens = jnp.asarray(np.array([9, 9], np.int32))
    pm_dec = rope_ops.progress_position_ids(dec_lens, tq, 2000.0)
    pm_enc = rope_ops.progress_position_ids(enc_lens, tk, 2000.0)

    cross_k, cross_v = t5gemma.build_cross_kv(
        jax_params["decoder"], DIMS, memory, pm_enc
    )
    kwargs = dict(
        inputs_embeds=embeds,
        self_full_bias=mask_ops.decoder_self_bias(dec_lens, tq),
        self_sliding_bias=mask_ops.decoder_sliding_bias(dec_lens, tq, WINDOW),
        cross_bias=mask_ops.cross_bias(enc_lens, tq, tk),
        position_ids=pm_dec,
        pm_decoder_positions=pm_dec,
        cross_k=cross_k, cross_v=cross_v,
    )
    plain, _ = t5gemma.decoder_forward(jax_params["decoder"], DIMS, **kwargs)

    max_len = 16
    cache = t5gemma.init_cache(DIMS, b, max_len, tk, dtype=jnp.float32)
    # prefill biases extend key axis to max_len: keys beyond tq are invalid
    full = mask_ops.decoder_self_bias(dec_lens, max_len)[:, :, :tq, :]
    slid = mask_ops.decoder_sliding_bias(dec_lens, max_len, WINDOW)[:, :, :tq, :]
    cached, new_cache = t5gemma.decoder_forward(
        jax_params["decoder"], DIMS,
        **{**kwargs, "self_full_bias": full, "self_sliding_bias": slid},
        cache=cache,
    )
    np.testing.assert_allclose(
        np.asarray(cached), np.asarray(plain), rtol=1e-5, atol=1e-5
    )
    assert new_cache.self_k.shape == (DIMS.num_layers, b, DIMS.num_kv_heads,
                                      max_len, DIMS.head_dim)


def test_roundtrip_state_dict(jax_params):
    sd = convert.params_to_torch_state_dict(jax_params)
    from t5gemma_tts_tpu.config import VoiceConfig

    cfg = VoiceConfig(
        backbone=BackboneConfig(encoder=DIMS, decoder=DIMS),
        audio_vocab_size=128, dtype="float32",
    )
    back = convert.torch_state_dict_to_params(sd, cfg, dtype=jnp.float32)
    import jax

    for (p1, a), (p2, b2) in zip(
        jax.tree_util.tree_leaves_with_path(
            {"encoder": jax_params["encoder"], "decoder": jax_params["decoder"]}
        ),
        jax.tree_util.tree_leaves_with_path(
            {"encoder": back["encoder"], "decoder": back["decoder"]}
        ),
    ):
        assert p1 == p2
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2), rtol=1e-6)
