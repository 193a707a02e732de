"""XCodec2 encode-side modules: acoustic conv encoder, semantic conv encoder,
and the feature-fusion producing the quantizer input.

Acoustic branch: a BigCodec-style strided conv stack downsampling 16 kHz
waveform by 320x to 50 Hz (ratios 2*4*5*8), channels doubling per block, with
dilated residual units (dilations 1/3/9). Semantic branch: the w2v-BERT
conformer (semantic.py) followed by a residual conv ``SemanticEncoder``.
Fusion concatenates both 1024-d branches to the 2048-d quantizer input
(fc_prior -> FSQ in model.py).

The reference consumes all of this through the xcodec2 pip package
(reference: data/tokenizer.py:105-115 ``encode``); here it is native JAX so
Emilia-scale preprocessing shards across TPU devices (SURVEY.md §2.2).
Checkpoint conversion is structured and exhaustive (codec/convert.py
``acoustic_state_dict_to_params``): the conv/LSTM layout is inferred from
the checkpoint's own key inventory and validated against a torch twin in
tests/test_codec_encoder.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from . import features as feat_mod
from . import semantic as sem_mod
from .semantic import ConformerConfig

PyTree = Any


@dataclass(frozen=True)
class AcousticEncoderConfig:
    ngf: int = 48
    ratios: Tuple[int, ...] = (2, 4, 5, 8)  # product = 320 (16 kHz -> 50 Hz)
    dilations: Tuple[int, ...] = (1, 3, 9)
    out_dim: int = 1024
    kernel: int = 7
    # BigCodec-family encoders place an LSTM between the conv stack and the
    # final projection; layout inferred from checkpoint keys at conversion
    rnn_layers: int = 0
    rnn_residual: bool = True


@dataclass(frozen=True)
class SemanticEncoderConfig:
    input_channels: int = 1024
    code_dim: int = 1024
    encode_channels: int = 1024
    kernel: int = 3


def tiny_encoder_configs():
    return (
        AcousticEncoderConfig(ngf=4, ratios=(2, 2), out_dim=16, kernel=3),
        SemanticEncoderConfig(input_channels=32, code_dim=16,
                              encode_channels=24),
        sem_mod.tiny_conformer_config(),
    )


# ---------------------------------------------------------------------------
# acoustic encoder
# ---------------------------------------------------------------------------


def _conv_init(rng, k, cin, cout, dtype):
    scale = (k * cin) ** -0.5
    return {
        "w": (jax.random.normal(rng, (k, cin, cout), jnp.float32) * scale).astype(dtype),
        "b": jnp.zeros((cout,), dtype),
    }


def init_acoustic_params(rng: jax.Array, cfg: AcousticEncoderConfig,
                         dtype=jnp.float32) -> PyTree:
    kit = iter(jax.random.split(rng, 64))
    ch = cfg.ngf
    params: Dict[str, Any] = {
        "conv_in": _conv_init(next(kit), cfg.kernel, 1, ch, dtype),
        "blocks": [],
    }
    for ratio in cfg.ratios:
        units = []
        for d in cfg.dilations:
            units.append({
                "conv1": _conv_init(next(kit), cfg.kernel, ch, ch, dtype),
                "conv2": _conv_init(next(kit), 1, ch, ch, dtype),
            })
        down = _conv_init(next(kit), 2 * ratio, ch, ch * 2, dtype)
        params["blocks"].append({"units": units, "down": down})
        ch *= 2
    if cfg.rnn_layers:
        params["rnn"] = [
            _lstm_init(next(kit), ch, ch, dtype) for _ in range(cfg.rnn_layers)
        ]
    params["conv_out"] = _conv_init(next(kit), 3, ch, cfg.out_dim, dtype)
    return params


def _lstm_init(rng, cin, hidden, dtype):
    k1, k2 = jax.random.split(rng)
    s_i = cin ** -0.5
    s_h = hidden ** -0.5
    return {
        "w_ih": (jax.random.normal(k1, (cin, 4 * hidden), jnp.float32) * s_i
                 ).astype(dtype),
        "w_hh": (jax.random.normal(k2, (hidden, 4 * hidden), jnp.float32) * s_h
                 ).astype(dtype),
        "b_ih": jnp.zeros((4 * hidden,), dtype),
        "b_hh": jnp.zeros((4 * hidden,), dtype),
    }


def lstm_forward(p, x: jnp.ndarray) -> jnp.ndarray:
    """Unidirectional LSTM over [B, T, C] (torch gate order i,f,g,o)."""
    b, t, c = x.shape
    hidden = p["w_hh"].shape[0]
    pre = x @ p["w_ih"] + (p["b_ih"] + p["b_hh"])  # [B, T, 4H]

    def step(carry, u):
        h, cell = carry
        gates = u + h @ p["w_hh"]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        cell = jax.nn.sigmoid(f) * cell + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(cell)
        return (h, cell), h

    init = (jnp.zeros((b, hidden), x.dtype), jnp.zeros((b, hidden), x.dtype))
    _, hs = jax.lax.scan(step, init, pre.swapaxes(0, 1))
    return hs.swapaxes(0, 1)


def _conv1d(x, p, stride=1, dilation=1, padding="SAME"):
    out = jax.lax.conv_general_dilated(
        x, p["w"], (stride,), padding,
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return out + p["b"]


def _mask_time(h: jnp.ndarray, lens) -> jnp.ndarray:
    """Zero positions >= lens[b] along the time axis ([B, T, C])."""
    if lens is None:
        return h
    t = h.shape[1]
    keep = jnp.arange(t)[None, :, None] < lens[:, None, None]
    return jnp.where(keep, h, 0.0).astype(h.dtype)


def acoustic_forward(params: PyTree, cfg: AcousticEncoderConfig,
                     wav: jnp.ndarray, wav_lens=None) -> jnp.ndarray:
    """wav: [B, S] -> [B, S // prod(ratios), out_dim].

    Down convs use torch-style symmetric padding ceil(stride/2) on kernel
    2*stride (not XLA SAME, which pads asymmetrically for odd strides) so
    converted checkpoints produce sample-aligned activations.

    With ``wav_lens``, activations are zeroed past each row's valid length
    after EVERY conv, so length-bucketed padded encodes equal an unpadded
    encode: conv biases otherwise make the pad region nonzero from the
    second layer on, and the receptive fields of the last valid frames
    then see pad garbage instead of the implicit zero padding (the codes
    near the end of a voice-clone prompt changed with the bucket size)."""
    lens = None if wav_lens is None else wav_lens.astype(jnp.int32)
    h = _mask_time(_conv1d(wav[..., None], params["conv_in"]), lens)
    for block, ratio in zip(params["blocks"], cfg.ratios):
        for unit, d in zip(block["units"], cfg.dilations):
            r = h
            u = _mask_time(_conv1d(jax.nn.elu(h), unit["conv1"], dilation=d),
                           lens)
            u = _mask_time(_conv1d(jax.nn.elu(u), unit["conv2"]), lens)
            h = r + u
        pad = -(-ratio // 2)
        h = _conv1d(jax.nn.elu(h), block["down"], stride=ratio,
                    padding=[(pad, pad)])
        if lens is not None:
            # exact unpadded output length of this strided conv
            lens = (lens + 2 * pad - 2 * ratio) // ratio + 1
            h = _mask_time(h, lens)
    if cfg.rnn_layers and "rnn" in params:
        r = h
        for lp in params["rnn"]:
            h = lstm_forward(lp, h)   # causal: in-range outputs unaffected
        if cfg.rnn_residual:
            h = h + r
        h = _mask_time(h, lens)
    return _mask_time(_conv1d(jax.nn.elu(h), params["conv_out"]), lens)


# ---------------------------------------------------------------------------
# semantic conv encoder (post-conformer refinement)
# ---------------------------------------------------------------------------


def init_semantic_encoder_params(rng: jax.Array, cfg: SemanticEncoderConfig,
                                 dtype=jnp.float32) -> PyTree:
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    return {
        "initial": {"w": _conv_init(k1, cfg.kernel, cfg.input_channels,
                                    cfg.encode_channels, dtype)["w"]},
        "res1": _conv_init(k2, cfg.kernel, cfg.encode_channels,
                           cfg.encode_channels, dtype),
        "res2": _conv_init(k3, cfg.kernel, cfg.encode_channels,
                           cfg.encode_channels, dtype),
        "final": {"w": _conv_init(k4, cfg.kernel, cfg.encode_channels,
                                  cfg.code_dim, dtype)["w"]},
    }


def semantic_encoder_forward(params: PyTree, cfg: SemanticEncoderConfig,
                             x: jnp.ndarray) -> jnp.ndarray:
    """x: [B, T, input_channels] -> [B, T, code_dim]. Residual conv refiner:
    initial_conv -> (relu-conv-relu-conv) + x -> final_conv."""
    def conv(x, w, b=None):
        out = jax.lax.conv_general_dilated(
            x, w, (1,), "SAME", dimension_numbers=("NWC", "WIO", "NWC")
        )
        return out if b is None else out + b

    h = conv(x, params["initial"]["w"])
    r = conv(jax.nn.relu(h), params["res1"]["w"], params["res1"]["b"])
    r = conv(jax.nn.relu(r), params["res2"]["w"], params["res2"]["b"])
    h = h + r
    return conv(h, params["final"]["w"])


# ---------------------------------------------------------------------------
# full encode-side assembly
# ---------------------------------------------------------------------------


def init_encoder_params(rng: jax.Array, acfg: AcousticEncoderConfig,
                        scfg: SemanticEncoderConfig, ccfg: ConformerConfig,
                        fused_dim: int, dtype=jnp.float32) -> PyTree:
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    return {
        "acoustic": init_acoustic_params(k1, acfg, dtype),
        "semantic_model": sem_mod.init_params(k2, ccfg, dtype),
        "semantic_encoder": init_semantic_encoder_params(k3, scfg, dtype),
        "fc_prior": {
            "w": (jax.random.normal(k4, (fused_dim, fused_dim), jnp.float32)
                  * fused_dim ** -0.5).astype(dtype),
            "b": jnp.zeros((fused_dim,), dtype),
        },
    }


def fuse_features(params: PyTree, cfg, wav: jnp.ndarray,
                  wav_lens: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """wav [B, S] at 16 kHz -> fused [B, T50, semantic+acoustic] features.

    Branch lengths are aligned by truncating to the shorter one, mirroring
    the pip package's min-length alignment."""
    acfg = getattr(cfg, "acoustic_cfg", AcousticEncoderConfig())
    scfg = getattr(cfg, "semantic_cfg", SemanticEncoderConfig())
    ccfg = getattr(cfg, "conformer_cfg", ConformerConfig())

    acoustic = acoustic_forward(params["acoustic"], acfg, wav, wav_lens)
    feats, feat_lens = feat_mod.extract_features(wav, wav_lens)
    sem_hidden = sem_mod.forward(params["semantic_model"], ccfg, feats,
                                 feat_lens)
    sem = semantic_encoder_forward(params["semantic_encoder"], scfg,
                                   sem_hidden)
    t = min(acoustic.shape[1], sem.shape[1])
    return jnp.concatenate([sem[:, :t], acoustic[:, :t]], axis=-1)
