"""XCodec2 model assembly: token decode (vocoder) and audio encode paths.

Mirrors the pip-package model the reference wraps (reference:
data/tokenizer.py:52-123 ``AudioTokenizer``): a semantic branch (w2v-BERT
features) and an acoustic branch are fused, FSQ-quantized into a single
65536-entry codebook at 50 frames/sec, and decoded by a Vocos-style vocoder
to 44.1 kHz audio.

Decode path (this module, used by inference):
  codes [B, T] -> FSQ.project_out -> fc_post_a -> Vocos backbone -> ISTFT

Encode path (voice cloning + preprocessing):
  wav 16 kHz -> { semantic: mel -> w2v-BERT conformer[:17] -> SemanticEncoder,
                  acoustic: CodecEncoder conv stack }
  -> concat -> fc_prior -> FSQ -> codes
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import jax.numpy as jnp

from .fsq import FSQConfig
from .vocos import VocosConfig
from .semantic import ConformerConfig, tiny_conformer_config
from .encoder import (
    AcousticEncoderConfig, SemanticEncoderConfig, tiny_encoder_configs,
)
from . import fsq as fsq_mod
from . import vocos as vocos_mod

PyTree = Any


@dataclass(frozen=True)
class XCodec2Config:
    fsq: FSQConfig = field(default_factory=FSQConfig)
    vocos: VocosConfig = field(default_factory=VocosConfig)
    acoustic_cfg: AcousticEncoderConfig = field(
        default_factory=AcousticEncoderConfig)
    semantic_cfg: SemanticEncoderConfig = field(
        default_factory=SemanticEncoderConfig)
    conformer_cfg: ConformerConfig = field(default_factory=ConformerConfig)
    sample_rate: int = 44100        # output (Anime-XCodec2-44.1kHz)
    encode_sample_rate: int = 16000  # codec encoders consume 16 kHz
    frame_rate: int = 50
    semantic_dim: int = 1024
    acoustic_dim: int = 1024
    fused_dim: int = 2048           # semantic_dim + acoustic_dim

    @property
    def hop_length(self) -> int:
        return self.vocos.hop_length


def tiny_codec_config() -> XCodec2Config:
    """Toy sizes, real structure — for tests."""
    acfg, scfg, ccfg = tiny_encoder_configs()
    return XCodec2Config(
        fsq=FSQConfig(levels=(4, 4, 4), dim=32),
        vocos=VocosConfig(input_dim=16, dim=24, intermediate_dim=48,
                          num_layers=2, n_fft=32, hop_length=10),
        acoustic_cfg=acfg,
        semantic_cfg=scfg,
        conformer_cfg=ccfg,
        semantic_dim=16,
        acoustic_dim=16,
        fused_dim=32,
        sample_rate=500,
        encode_sample_rate=200,
        frame_rate=50,
    )


# ---------------------------------------------------------------------------
# decoder (vocoder) path
# ---------------------------------------------------------------------------


def init_decoder_params(rng: jax.Array, cfg: XCodec2Config,
                        dtype=jnp.float32) -> PyTree:
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "fsq": fsq_mod.init_params(k1, cfg.fsq, dtype),
        "fc_post_a": {
            "w": (jax.random.normal(k2, (cfg.fsq.dim, cfg.vocos.input_dim),
                                    jnp.float32) * cfg.fsq.dim ** -0.5).astype(dtype),
            "b": jnp.zeros((cfg.vocos.input_dim,), dtype),
        },
        "vocos": vocos_mod.init_params(k3, cfg.vocos, dtype),
    }


def decode_code(params: PyTree, cfg: XCodec2Config,
                codes: jnp.ndarray, lengths=None) -> jnp.ndarray:
    """codes: int [B, T] -> waveform [B, T * hop] at cfg.sample_rate.

    Mirrors XCodec2Model.decode_code: quantizer.get_output_from_indices ->
    fc_post_a -> generator. ``lengths`` makes length-bucketed decode exact
    (see vocos.backbone)."""
    emb = fsq_mod.decode(params["fsq"], cfg.fsq, codes)       # [B, T, fsq.dim]
    feats = emb @ params["fc_post_a"]["w"] + params["fc_post_a"]["b"]
    return vocos_mod.vocode(params["vocos"], feats, cfg.vocos, lengths)


def jitted_decode_code(params: PyTree, cfg: XCodec2Config):
    fn = jax.jit(lambda p, c: decode_code(p, cfg, c))
    return lambda codes: fn(params, codes)


# ---------------------------------------------------------------------------
# encoder path (semantic + acoustic -> codes); modules in encoder.py
# ---------------------------------------------------------------------------


def init_encoder_params_for(rng: jax.Array, cfg: XCodec2Config,
                            dtype=jnp.float32) -> PyTree:
    from . import encoder as enc_mod

    return enc_mod.init_encoder_params(
        rng, cfg.acoustic_cfg, cfg.semantic_cfg, cfg.conformer_cfg,
        cfg.fused_dim, dtype,
    )


def encode_waveform(params: PyTree, cfg: XCodec2Config,
                    wav: jnp.ndarray,
                    wav_lens: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """wav: [B, S] at encode_sample_rate -> codes [B, T]. Requires encoder
    params (see encoder.init_encoder_params)."""
    from . import encoder as enc_mod

    fused = enc_mod.fuse_features(params, cfg, wav, wav_lens)  # [B, T, fused]
    prior = fused @ params["fc_prior"]["w"] + params["fc_prior"]["b"]
    _, idx = fsq_mod.encode(params["fsq"], cfg.fsq, prior)
    return idx
