"""Encode-side codec tests: mel frontend vs HF oracle, conformer parity vs
torch Wav2Vec2Bert, full encode smoke."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from t5gemma_tts_tpu.codec import encoder as enc_mod
from t5gemma_tts_tpu.codec import features as feat_mod
from t5gemma_tts_tpu.codec import semantic as sem_mod
from t5gemma_tts_tpu.codec.model import (
    encode_waveform, init_decoder_params, init_encoder_params_for,
    tiny_codec_config,
)


def test_log_mel_matches_hf_feature_extractor():
    transformers = pytest.importorskip("transformers")
    from transformers import SeamlessM4TFeatureExtractor

    fe = SeamlessM4TFeatureExtractor()
    rng = np.random.default_rng(0)
    wav = (rng.normal(size=16000) * 0.1).astype(np.float32)

    ref = fe(wav, sampling_rate=16000, return_tensors="np")
    ref_feats = ref["input_features"][0]  # [T, 160]

    got, lens = feat_mod.extract_features(jnp.asarray(wav[None]))
    got = np.asarray(got)[0]

    t = min(got.shape[0], ref_feats.shape[0])
    np.testing.assert_allclose(got[:t], ref_feats[:t], rtol=2e-3, atol=2e-3)


def test_conformer_parity_with_torch_wav2vec2bert():
    torch = pytest.importorskip("torch")
    from transformers.models.wav2vec2_bert.configuration_wav2vec2_bert import (
        Wav2Vec2BertConfig,
    )
    from transformers.models.wav2vec2_bert.modeling_wav2vec2_bert import (
        Wav2Vec2BertModel,
    )

    ccfg = sem_mod.ConformerConfig(
        input_dim=24, hidden_size=32, num_layers=3, num_heads=4,
        intermediate_size=64, conv_kernel=7, left_max_pos=8, right_max_pos=3,
    )
    hf_cfg = Wav2Vec2BertConfig(
        hidden_size=32, num_hidden_layers=3, num_attention_heads=4,
        intermediate_size=64, feature_projection_input_dim=24,
        conv_depthwise_kernel_size=7, left_max_position_embeddings=8,
        right_max_position_embeddings=3, position_embeddings_type="relative_key",
        apply_spec_augment=False, layerdrop=0.0,
        num_adapter_layers=0, add_adapter=False,
    )
    torch.manual_seed(0)
    model = Wav2Vec2BertModel(hf_cfg)
    model.eval()

    # convert weights
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    from t5gemma_tts_tpu.codec.convert import w2vbert_state_dict_to_params

    params = w2vbert_state_dict_to_params(sd, ccfg)

    rng = np.random.default_rng(1)
    b, t = 2, 9
    feats = rng.normal(size=(b, t, 24)).astype(np.float32)
    lens = np.array([9, 6], np.int32)
    attn = (np.arange(t)[None] < lens[:, None]).astype(np.int64)

    with torch.no_grad():
        ref = model(
            input_features=torch.tensor(feats),
            attention_mask=torch.tensor(attn),
            output_hidden_states=True,
        ).hidden_states[3].numpy()  # after all 3 layers

    got = np.asarray(
        sem_mod.forward(params, ccfg, jnp.asarray(feats), jnp.asarray(lens))
    )
    valid = np.arange(t)[None] < lens[:, None]
    np.testing.assert_allclose(got[valid], ref[valid], rtol=3e-4, atol=3e-4)


def test_acoustic_encoder_shapes():
    acfg, _, _ = enc_mod.tiny_encoder_configs()
    params = enc_mod.init_acoustic_params(jax.random.PRNGKey(0), acfg)
    wav = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64)).astype(np.float32))
    out = enc_mod.acoustic_forward(params, acfg, wav)
    assert out.shape == (2, 64 // 4, acfg.out_dim)  # ratios (2, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_acoustic_encoder_pad_invariant():
    """Padded-to-bucket encode must equal unpadded: conv biases otherwise
    leak into the tail frames' receptive fields (code-review finding)."""
    acfg, _, _ = enc_mod.tiny_encoder_configs()
    params = enc_mod.init_acoustic_params(jax.random.PRNGKey(0), acfg)
    rng = np.random.default_rng(3)
    s_valid = 52
    wav = rng.normal(size=(1, s_valid)).astype(np.float32)
    want = np.asarray(enc_mod.acoustic_forward(
        params, acfg, jnp.asarray(wav)))
    for pad_to in (64, 96):
        padded = np.zeros((1, pad_to), np.float32)
        padded[:, :s_valid] = wav
        got = np.asarray(enc_mod.acoustic_forward(
            params, acfg, jnp.asarray(padded),
            wav_lens=jnp.asarray([s_valid], jnp.int32)))
        t = want.shape[1]
        np.testing.assert_allclose(got[:, :t], want, rtol=1e-5, atol=1e-5,
                                   err_msg=f"pad_to={pad_to}")


def test_full_encode_smoke():
    cfg = tiny_codec_config()
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    params.update(init_encoder_params_for(jax.random.PRNGKey(1), cfg))
    # 0.5 s of fake 16 kHz audio -> mel framing needs >= 400 samples
    wav = jnp.asarray(
        np.random.default_rng(2).normal(size=(1, 8000)).astype(np.float32) * 0.1
    )
    codes = encode_waveform(params, cfg, wav)
    assert codes.ndim == 2 and codes.shape[0] == 1
    assert int(codes.max()) < cfg.fsq.codebook_size
    assert int(codes.min()) >= 0


def test_acoustic_converter_torch_twin_parity():
    """Full CodecEnc conversion: a weight-normalized BigCodec-style torch
    encoder (dilated residual units, strided downsamplers, 2-layer LSTM,
    final projection) converts key-exhaustively and matches activations."""
    torch = pytest.importorskip("torch")
    import torch.nn as nn
    from torch.nn.utils import weight_norm

    ratios, dils, ngf, out_dim = (2, 5), (1, 3), 6, 12

    class Residual(nn.Module):
        def __init__(self, ch, d):
            super().__init__()
            self.c1 = weight_norm(nn.Conv1d(ch, ch, 7, dilation=d, padding=3 * d))
            self.c2 = weight_norm(nn.Conv1d(ch, ch, 1))

        def forward(self, x):
            return x + self.c2(nn.functional.elu(
                self.c1(nn.functional.elu(x))))

    class TorchCodecEnc(nn.Module):
        def __init__(self):
            super().__init__()
            mods = [weight_norm(nn.Conv1d(1, ngf, 7, padding=3))]
            ch = ngf
            for r in ratios:
                for d in dils:
                    mods.append(Residual(ch, d))
                mods.append(weight_norm(nn.Conv1d(
                    ch, ch * 2, 2 * r, stride=r, padding=-(-r // 2))))
                ch *= 2
            self.block = nn.Sequential(*mods)
            self.rnn = nn.LSTM(ch, ch, num_layers=2, batch_first=True)
            self.out = weight_norm(nn.Conv1d(ch, out_dim, 3, padding=1))

        def forward(self, wav):  # [B, S]
            h = wav[:, None]
            for m in self.block:
                if isinstance(m, Residual):
                    h = m(h)
                else:
                    h = m(nn.functional.elu(h)) if m is not self.block[0] else m(h)
            r = h.transpose(1, 2)
            y, _ = self.rnn(r)
            h = (y + r).transpose(1, 2)
            return self.out(nn.functional.elu(h)).transpose(1, 2)

    torch.manual_seed(0)
    tm = TorchCodecEnc().eval()
    sd = {"CodecEnc." + k: v.detach().numpy() for k, v in tm.state_dict().items()}

    from t5gemma_tts_tpu.codec.convert import acoustic_state_dict_to_params

    params, acfg, consumed = acoustic_state_dict_to_params(sd)
    assert acfg.ratios == ratios
    assert acfg.dilations == dils
    assert acfg.ngf == ngf and acfg.out_dim == out_dim
    assert acfg.rnn_layers == 2

    rng = np.random.default_rng(0)
    wav = rng.normal(size=(2, 80)).astype(np.float32) * 0.3
    with torch.no_grad():
        want = tm(torch.tensor(wav)).numpy()
    got = np.asarray(enc_mod.acoustic_forward(params, acfg, jnp.asarray(wav)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_acoustic_converter_rejects_unconsumed_keys():
    torch = pytest.importorskip("torch")
    import torch.nn as nn
    from torch.nn.utils import weight_norm

    m = nn.Sequential(
        weight_norm(nn.Conv1d(1, 4, 7, padding=3)),
        weight_norm(nn.Conv1d(4, 8, 4, stride=2, padding=1)),
        weight_norm(nn.Conv1d(8, 6, 3, padding=1)),
    )
    sd = {"CodecEnc." + k: v.detach().numpy() for k, v in m.state_dict().items()}
    sd["CodecEnc.mystery.scale"] = np.ones((4,), np.float32)

    from t5gemma_tts_tpu.codec.convert import acoustic_state_dict_to_params

    with pytest.raises(ValueError, match="unconsumed"):
        acoustic_state_dict_to_params(sd)


def test_w2vbert_hidden_state_index_offset():
    """XCodec2 takes hidden_states[16] of a 24-layer w2v-BERT; pin that
    hidden_states[k] == output AFTER k conformer layers (index 0 is the
    feature-projection output), so stopping our stack at num_layers=k is the
    right translation (reference consumes this via the pip package)."""
    torch = pytest.importorskip("torch")
    from transformers.models.wav2vec2_bert.configuration_wav2vec2_bert import (
        Wav2Vec2BertConfig,
    )
    from transformers.models.wav2vec2_bert.modeling_wav2vec2_bert import (
        Wav2Vec2BertModel,
    )

    k = 3  # take layer-k output from a DEEPER (5-layer) model
    ccfg = sem_mod.ConformerConfig(
        input_dim=24, hidden_size=32, num_layers=k, num_heads=4,
        intermediate_size=64, conv_kernel=7, left_max_pos=8, right_max_pos=3,
    )
    hf_cfg = Wav2Vec2BertConfig(
        hidden_size=32, num_hidden_layers=5, num_attention_heads=4,
        intermediate_size=64, feature_projection_input_dim=24,
        conv_depthwise_kernel_size=7, left_max_position_embeddings=8,
        right_max_position_embeddings=3, position_embeddings_type="relative_key",
        apply_spec_augment=False, layerdrop=0.0,
        num_adapter_layers=0, add_adapter=False,
    )
    torch.manual_seed(1)
    model = Wav2Vec2BertModel(hf_cfg).eval()
    sd = {key: v.detach().numpy() for key, v in model.state_dict().items()}
    from t5gemma_tts_tpu.codec.convert import w2vbert_state_dict_to_params

    params = w2vbert_state_dict_to_params(sd, ccfg)  # only first k layers

    rng = np.random.default_rng(2)
    b, t = 2, 9
    feats = rng.normal(size=(b, t, 24)).astype(np.float32)
    lens = np.array([9, 7], np.int32)
    attn = (np.arange(t)[None] < lens[:, None]).astype(np.int64)
    with torch.no_grad():
        hs = model(input_features=torch.tensor(feats),
                   attention_mask=torch.tensor(attn),
                   output_hidden_states=True).hidden_states
    got = np.asarray(sem_mod.forward(params, ccfg, jnp.asarray(feats),
                                     jnp.asarray(lens)))
    valid = np.arange(t)[None] < lens[:, None]
    np.testing.assert_allclose(got[valid], hs[k].numpy()[valid],
                               rtol=3e-4, atol=3e-4)
    # and make sure it is NOT the layer before/after (offset really matters)
    assert not np.allclose(got[valid], hs[k - 1].numpy()[valid], atol=1e-3)
    assert not np.allclose(got[valid], hs[k + 1].numpy()[valid], atol=1e-3)
