"""Global key-exhaustiveness of the full XCodec2 checkpoint converter.

The reference loads its codec checkpoint strictly (data/tokenizer.py:79-98);
our converter must mirror that contract: every tensor in a full synthetic
checkpoint is consumed, a renamed/unknown key raises naming it, and the
required-sections assertion distinguishes decode-only from full checkpoints.
"""

import dataclasses

import numpy as np
import pytest

from t5gemma_tts_tpu.codec.convert import xcodec2_state_dict_to_params
from t5gemma_tts_tpu.codec.encoder import AcousticEncoderConfig
from t5gemma_tts_tpu.codec.model import tiny_codec_config


def _rand(rng, *shape):
    return rng.normal(size=shape).astype(np.float32) * 0.1


def _semantic_keys(rng, n_layers, hidden=32, inter=64, conv_k=7, in_dim=24,
                   pos=12):
    """Fabricate a Wav2Vec2Bert-layout state dict (numpy; layout only —
    parity with the real torch module is pinned in test_codec_encoder.py)."""
    sd = {
        "semantic_model.masked_spec_embed": _rand(rng, hidden),
        "semantic_model.feature_projection.layer_norm.weight": _rand(rng, in_dim),
        "semantic_model.feature_projection.layer_norm.bias": _rand(rng, in_dim),
        "semantic_model.feature_projection.projection.weight": _rand(rng, hidden, in_dim),
        "semantic_model.feature_projection.projection.bias": _rand(rng, hidden),
    }
    for i in range(n_layers):
        b = f"semantic_model.encoder.layers.{i}."
        for base, shape_w, shape_b in (
            ("ffn1_layer_norm", (hidden,), (hidden,)),
            ("ffn1.intermediate_dense", (inter, hidden), (inter,)),
            ("ffn1.output_dense", (hidden, inter), (hidden,)),
            ("self_attn_layer_norm", (hidden,), (hidden,)),
            ("self_attn.linear_q", (hidden, hidden), (hidden,)),
            ("self_attn.linear_k", (hidden, hidden), (hidden,)),
            ("self_attn.linear_v", (hidden, hidden), (hidden,)),
            ("self_attn.linear_out", (hidden, hidden), (hidden,)),
            ("conv_module.layer_norm", (hidden,), (hidden,)),
            ("conv_module.depthwise_layer_norm", (hidden,), (hidden,)),
            ("ffn2_layer_norm", (hidden,), (hidden,)),
            ("ffn2.intermediate_dense", (inter, hidden), (inter,)),
            ("ffn2.output_dense", (hidden, inter), (hidden,)),
            ("final_layer_norm", (hidden,), (hidden,)),
        ):
            sd[b + base + ".weight"] = _rand(rng, *shape_w)
            sd[b + base + ".bias"] = _rand(rng, *shape_b)
        sd[b + "self_attn.distance_embedding.weight"] = _rand(
            rng, pos, hidden // 4)
        sd[b + "conv_module.pointwise_conv1.weight"] = _rand(
            rng, 2 * hidden, hidden, 1)
        sd[b + "conv_module.depthwise_conv.weight"] = _rand(
            rng, hidden, 1, conv_k)
        sd[b + "conv_module.pointwise_conv2.weight"] = _rand(
            rng, hidden, hidden, 1)
    return sd


def _decode_keys(rng, fsq_dim=32, voc_in=16, dim=24, inter=48, n_blocks=2):
    sd = {
        "generator.quantizer.project_in.weight": _rand(rng, fsq_dim, 32),
        "generator.quantizer.project_in.bias": _rand(rng, fsq_dim),
        "generator.quantizer.project_out.weight": _rand(rng, 32, fsq_dim),
        "generator.quantizer.project_out.bias": _rand(rng, 32),
        "fc_post_a.weight": _rand(rng, voc_in, 32),
        "fc_post_a.bias": _rand(rng, voc_in),
        "generator.backbone.embed.weight": _rand(rng, dim, voc_in, 7),
        "generator.backbone.embed.bias": _rand(rng, dim),
        "generator.backbone.norm.weight": _rand(rng, dim),
        "generator.backbone.norm.bias": _rand(rng, dim),
        "generator.backbone.final_layer_norm.weight": _rand(rng, dim),
        "generator.backbone.final_layer_norm.bias": _rand(rng, dim),
        "generator.head.out.weight": _rand(rng, 34, dim),
        "generator.head.out.bias": _rand(rng, 34),
    }
    for i in range(n_blocks):
        b = f"generator.backbone.convnext.{i}."
        sd[b + "dwconv.weight"] = _rand(rng, dim, 1, 7)
        sd[b + "dwconv.bias"] = _rand(rng, dim)
        sd[b + "norm.weight"] = _rand(rng, dim)
        sd[b + "norm.bias"] = _rand(rng, dim)
        sd[b + "pwconv1.weight"] = _rand(rng, inter, dim)
        sd[b + "pwconv1.bias"] = _rand(rng, inter)
        sd[b + "pwconv2.weight"] = _rand(rng, dim, inter)
        sd[b + "pwconv2.bias"] = _rand(rng, dim)
        sd[b + "gamma"] = _rand(rng, dim)
    return sd


def _encode_extra_keys(rng):
    sd = {
        "fc_prior.weight": _rand(rng, 32, 32),
        "fc_prior.bias": _rand(rng, 32),
        "SemanticEncoder_module.initial_conv.weight": _rand(rng, 24, 32, 3),
        "SemanticEncoder_module.residual_blocks.1.weight": _rand(rng, 24, 24, 3),
        "SemanticEncoder_module.residual_blocks.1.bias": _rand(rng, 24),
        "SemanticEncoder_module.residual_blocks.3.weight": _rand(rng, 24, 24, 3),
        "SemanticEncoder_module.residual_blocks.3.bias": _rand(rng, 24),
        "SemanticEncoder_module.final_conv.weight": _rand(rng, 16, 24, 3),
    }
    return sd


def _acoustic_keys():
    """Weight-normed BigCodec-style stack (needs torch for weight_norm)."""
    torch = pytest.importorskip("torch")
    import torch.nn as nn
    from torch.nn.utils import weight_norm

    ratios, dils, ngf, out_dim = (2, 5), (1, 3), 6, 12
    torch.manual_seed(0)
    mods = [weight_norm(nn.Conv1d(1, ngf, 7, padding=3))]
    ch = ngf
    for r in ratios:
        for d in dils:
            mods.append(weight_norm(nn.Conv1d(ch, ch, 7, dilation=d,
                                              padding=3 * d)))
            mods.append(weight_norm(nn.Conv1d(ch, ch, 1)))
        mods.append(weight_norm(nn.Conv1d(ch, ch * 2, 2 * r, stride=r,
                                          padding=-(-r // 2))))
        ch *= 2
    stack = nn.Sequential(*mods)
    rnn = nn.LSTM(ch, ch, num_layers=2, batch_first=True)
    out = weight_norm(nn.Conv1d(ch, out_dim, 3, padding=1))
    sd = {}
    for name, mod in (("block", stack), ("rnn", rnn), ("out", out)):
        for k, v in mod.state_dict().items():
            sd[f"CodecEnc.{name}.{k}"] = v.detach().numpy()
    acfg = AcousticEncoderConfig(ngf=ngf, ratios=ratios, dilations=dils,
                                 out_dim=out_dim, kernel=7, rnn_layers=2)
    return sd, acfg


def _full_checkpoint(extra_sem_layers=1):
    rng = np.random.default_rng(0)
    cfg = tiny_codec_config()
    ac_sd, acfg = _acoustic_keys()
    cfg = dataclasses.replace(cfg, acoustic_cfg=acfg)
    sd = {}
    sd.update(_decode_keys(rng))
    sd.update(_encode_extra_keys(rng))
    sd.update(_semantic_keys(
        rng, cfg.conformer_cfg.num_layers + extra_sem_layers))
    sd.update(ac_sd)
    return sd, cfg


def test_full_checkpoint_converts_exhaustively():
    sd, cfg = _full_checkpoint()
    params = xcodec2_state_dict_to_params(sd, cfg)
    for section in ("fsq", "vocos", "fc_post_a", "fc_prior", "semantic_model",
                    "semantic_encoder", "acoustic"):
        assert section in params, section
    # deeper-than-tapped conformer layers and masked_spec_embed were
    # exempted, everything else consumed -- strict did not raise above.


def test_unknown_key_raises_naming_it():
    sd, cfg = _full_checkpoint()
    sd["generator.quantizer.mystery.weight"] = np.ones((4, 4), np.float32)
    with pytest.raises(ValueError, match="mystery"):
        xcodec2_state_dict_to_params(sd, cfg)


def test_renamed_section_raises_required_sections():
    sd, cfg = _full_checkpoint()
    # rename the whole quantizer section: both candidate prefixes miss
    sd = {k.replace("generator.quantizer.", "generator.quantizerX."): v
          for k, v in sd.items()}
    with pytest.raises(ValueError, match="fsq"):
        xcodec2_state_dict_to_params(sd, cfg)


def test_decode_only_contract():
    rng = np.random.default_rng(1)
    cfg = tiny_codec_config()
    sd = _decode_keys(rng)
    params = xcodec2_state_dict_to_params(sd, cfg, decode_only=True)
    assert set(params) == {"fsq", "vocos", "fc_post_a"}
    with pytest.raises(ValueError, match="required sections missing"):
        xcodec2_state_dict_to_params(sd, cfg, decode_only=False)


def test_non_strict_downgrades_to_warning():
    sd, cfg = _full_checkpoint()
    sd["generator.quantizer.mystery.weight"] = np.ones((4, 4), np.float32)
    params = xcodec2_state_dict_to_params(sd, cfg, strict=False)
    assert "fsq" in params
