"""Vocos-style vocoder: ConvNeXt backbone + ISTFT head, in pure JAX.

This is the XCodec2 decoder/generator network re-derived TPU-first
(reference: data/tokenizer.py:117-123 calls the pip package's
``decode_code``; the network itself lives outside the reference repo, so this
follows the published Vocos/XCodec2 architecture):

- ConvNeXt blocks: depthwise conv (k=7) -> LayerNorm -> pointwise MLP with
  exact GELU -> layer-scale -> residual. Pointwise convs are plain matmuls on
  the MXU; the depthwise conv lowers to a VPU-friendly small convolution.
- ISTFT head: Linear(dim -> n_fft + 2) producing log-magnitude and phase;
  inverse real FFT per frame; vectorized overlap-add with "same" padding and
  squared-window envelope normalization. The overlap-add uses the
  pad-to-K*hop shift-add trick (K = ceil(n_fft / hop) static), so there is no
  scatter in the graph at all.

Layout convention: activations are [B, T, C] throughout (TPU-friendly; the
channel axis stays in lanes).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class VocosConfig:
    input_dim: int = 1024        # channels fed by fc_post_a
    dim: int = 1024              # backbone width
    intermediate_dim: int = 3072
    num_layers: int = 12
    kernel_size: int = 7
    n_fft: int = 2048
    hop_length: int = 882        # 44100 / 50 frames-per-second
    layer_scale_init: float = 1e-6
    eps: float = 1e-6


# ---------------------------------------------------------------------------
# params
# ---------------------------------------------------------------------------


def init_params(rng: jax.Array, cfg: VocosConfig, dtype=jnp.float32) -> Dict:
    keys = jax.random.split(rng, 4 + cfg.num_layers)

    def lin(k, i, o, scale=None):
        s = scale if scale is not None else i ** -0.5
        return (jax.random.normal(k, (i, o), jnp.float32) * s).astype(dtype)

    blocks = []
    for li in range(cfg.num_layers):
        bk = jax.random.split(keys[4 + li], 3)
        blocks.append({
            "dwconv": {
                "w": (jax.random.normal(bk[0], (cfg.kernel_size, 1, cfg.dim),
                                        jnp.float32) * 0.02).astype(dtype),
                "b": jnp.zeros((cfg.dim,), dtype),
            },
            "norm": {"w": jnp.ones((cfg.dim,), dtype),
                     "b": jnp.zeros((cfg.dim,), dtype)},
            "pw1": {"w": lin(bk[1], cfg.dim, cfg.intermediate_dim),
                    "b": jnp.zeros((cfg.intermediate_dim,), dtype)},
            "pw2": {"w": lin(bk[2], cfg.intermediate_dim, cfg.dim),
                    "b": jnp.zeros((cfg.dim,), dtype)},
            "gamma": jnp.full((cfg.dim,), cfg.layer_scale_init, dtype),
        })
    blocks = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)

    return {
        "embed": {
            "w": (jax.random.normal(keys[0],
                                    (cfg.kernel_size, cfg.input_dim, cfg.dim),
                                    jnp.float32) * 0.02).astype(dtype),
            "b": jnp.zeros((cfg.dim,), dtype),
        },
        "norm": {"w": jnp.ones((cfg.dim,), dtype),
                 "b": jnp.zeros((cfg.dim,), dtype)},
        "blocks": blocks,
        "final_norm": {"w": jnp.ones((cfg.dim,), dtype),
                       "b": jnp.zeros((cfg.dim,), dtype)},
        "head": {"w": lin(keys[1], cfg.dim, cfg.n_fft + 2),
                 "b": jnp.zeros((cfg.n_fft + 2,), dtype)},
    }


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------


def layer_norm(p: Dict, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (out * p["w"].astype(jnp.float32)
            + p["b"].astype(jnp.float32)).astype(x.dtype)


def conv1d_same(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                groups: int = 1) -> jnp.ndarray:
    """x: [B, T, Cin]; w: [K, Cin/groups, Cout]; SAME padding."""
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1,),
        padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )
    return out + b


def convnext_block(p: Dict, x: jnp.ndarray, cfg: VocosConfig) -> jnp.ndarray:
    r = x
    h = conv1d_same(x, p["dwconv"]["w"], p["dwconv"]["b"], groups=cfg.dim)
    h = layer_norm(p["norm"], h, cfg.eps)
    h = h @ p["pw1"]["w"] + p["pw1"]["b"]
    h = jax.nn.gelu(h, approximate=False)
    h = h @ p["pw2"]["w"] + p["pw2"]["b"]
    return r + p["gamma"] * h


def backbone(params: Dict, x: jnp.ndarray, cfg: VocosConfig,
             lengths=None) -> jnp.ndarray:
    """x: [B, T, input_dim] -> [B, T, dim].

    ``lengths`` re-masks features to zero beyond each row's true length after
    the embed conv and every block, so decoding a padded buffer is *exactly*
    the decode of the unpadded sequence (SAME-conv boundaries see zeros in
    both cases) — required for length-bucketed batch decode."""
    if lengths is not None:
        t = x.shape[1]
        valid = (jnp.arange(t)[None, :] < lengths[:, None])[..., None]
        x = jnp.where(valid, x, 0.0)

    h = conv1d_same(x, params["embed"]["w"], params["embed"]["b"])
    h = layer_norm(params["norm"], h, cfg.eps)
    if lengths is not None:
        h = jnp.where(valid, h, 0.0)

    def body(h, bp):
        h = convnext_block(bp, h, cfg)
        if lengths is not None:
            h = jnp.where(valid, h, 0.0)
        return h, None

    h, _ = jax.lax.scan(body, h, params["blocks"])
    return layer_norm(params["final_norm"], h, cfg.eps)


# ---------------------------------------------------------------------------
# ISTFT head
# ---------------------------------------------------------------------------


def overlap_add(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """frames: [B, T, n_fft] -> [B, (T-1)*hop + n_fft], no scatter.

    Pads frames to K*hop (K = ceil(n_fft/hop)), views them as K hop-sized
    chunks, and adds chunk k of every frame into output block (t + k): K
    static shifted adds, fully vectorized.
    """
    b, t, n_fft = frames.shape
    k = -(-n_fft // hop)
    padded = jnp.pad(frames, ((0, 0), (0, 0), (0, k * hop - n_fft)))
    chunks = padded.reshape(b, t, k, hop)
    out = jnp.zeros((b, t + k - 1, hop), frames.dtype)
    for j in range(k):
        out = out.at[:, j:j + t].add(chunks[:, :, j])
    return out.reshape(b, (t + k - 1) * hop)[:, : (t - 1) * hop + n_fft]


@lru_cache(maxsize=4)
def _irfft_basis(n_fft: int):
    """Inverse real-DFT as two matmul bases [n_fft/2+1, n_fft] (float32).

    x[n] = sum_k w_k/N * (Re X[k] cos(2pi k n/N) - Im X[k] sin(2pi k n/N)),
    w_k = 2 except the DC and Nyquist bins. Expressed as matmuls this runs on
    the MXU and sidesteps XLA's TPU FFT path, whose compile time for
    n_fft=2048 is minutes (measured 360 s) versus <1 s for the matmul.
    """
    k = np.arange(n_fft // 2 + 1)[:, None].astype(np.float64)
    n = np.arange(n_fft)[None, :].astype(np.float64)
    ang = 2.0 * np.pi * k * n / n_fft
    w = np.full((n_fft // 2 + 1, 1), 2.0)
    w[0, 0] = 1.0
    if n_fft % 2 == 0:
        w[-1, 0] = 1.0
    cos_b = (w * np.cos(ang) / n_fft).astype(np.float32)
    sin_b = (-w * np.sin(ang) / n_fft).astype(np.float32)
    return cos_b, sin_b


def irfft_matmul(spec_real: jnp.ndarray, spec_imag: jnp.ndarray,
                 n_fft: int) -> jnp.ndarray:
    """[..., n_fft//2+1] real/imag -> [..., n_fft] time frames via MXU."""
    cos_b, sin_b = _irfft_basis(n_fft)
    re = spec_real.astype(jnp.float32)
    im = spec_imag.astype(jnp.float32)
    return (
        jnp.matmul(re, jnp.asarray(cos_b), preferred_element_type=jnp.float32)
        + jnp.matmul(im, jnp.asarray(sin_b), preferred_element_type=jnp.float32)
    )


def istft_same(spec_real: jnp.ndarray, spec_imag: jnp.ndarray,
               cfg: VocosConfig, frame_lengths=None) -> jnp.ndarray:
    """Vocos "same"-padded ISTFT. spec_*: [B, T, n_fft//2 + 1] -> [B, T*hop].

    With ``frame_lengths`` [B], frames beyond each row's length are zeroed and
    excluded from the window envelope, so a padded buffer reproduces the
    unpadded decode exactly up to length*hop."""
    n_fft, hop = cfg.n_fft, cfg.hop_length
    b, t = spec_real.shape[:2]
    window = jnp.asarray(np.hanning(n_fft + 1)[:-1].astype(np.float32))
    frames = irfft_matmul(spec_real, spec_imag, n_fft) * window  # [B, T, n_fft]

    if frame_lengths is not None:
        valid = (jnp.arange(t)[None, :] < frame_lengths[:, None])[..., None]
        frames = jnp.where(valid, frames, 0.0)
        win_sq = jnp.where(valid, window ** 2, 0.0)        # [B, T, n_fft]
        env = overlap_add(win_sq, hop)                      # [B, S]
    else:
        win_sq = jnp.broadcast_to(window ** 2, (1, t, n_fft))
        env = overlap_add(win_sq, hop)                      # [1, S]

    audio = overlap_add(frames, hop)
    pad = (n_fft - hop) // 2
    audio = audio[:, pad:audio.shape[1] - pad]
    env = env[:, pad:env.shape[1] - pad]
    env = jnp.maximum(env, 1e-11)
    return audio / env


def head(params: Dict, x: jnp.ndarray, cfg: VocosConfig,
         lengths=None) -> jnp.ndarray:
    """Backbone features [B, T, dim] -> waveform [B, T*hop]."""
    h = x @ params["head"]["w"] + params["head"]["b"]  # [B, T, n_fft+2]
    half = cfg.n_fft // 2 + 1
    # Vocos ISTFTHead clips the MAGNITUDE at 1e2 (mag = clip(exp(x), 100)),
    # not the exponent — clipping the exponent at 100 is a no-op safeguard
    # and diverges from the reference for any |X| > 100
    mag = jnp.clip(jnp.exp(h[..., :half].astype(jnp.float32)), max=100.0)
    phase = h[..., half:].astype(jnp.float32)
    return istft_same(mag * jnp.cos(phase), mag * jnp.sin(phase), cfg,
                      frame_lengths=lengths)


def vocode(params: Dict, features: jnp.ndarray, cfg: VocosConfig,
           lengths=None) -> jnp.ndarray:
    """Full decode: quantizer-output features [B, T, input_dim] -> waveform.
    With ``lengths``, samples beyond length*hop are garbage to be trimmed;
    samples inside are exact (see backbone)."""
    return head(params, backbone(params, features, cfg, lengths), cfg,
                lengths)
