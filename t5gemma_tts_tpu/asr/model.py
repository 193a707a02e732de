"""Functional JAX Whisper (encoder-decoder ASR) + jitted greedy decode.

Faithful to the HF ``WhisperForConditionalGeneration`` compute graph
(pre-LN transformer, biasless k_proj, q scaled by head_dim**-0.5, GELU
conv frontend, learned decoder positions, logits tied to the token
embedding); parity is pinned against transformers on random tiny configs
in tests/test_asr.py. Single-utterance (batch 1) by design — transcription
runs once per cloning request (reference inference_commandline_hf.py:
144-152); the TTS decode engine is where batching matters.

Generation is a jitted ``lax.while_loop`` with a preallocated per-layer
KV cache (the same shape discipline as decode/engine.py, radically
simplified for batch 1 / greedy).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

PyTree = Any


@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    vocab_size: int = 51866              # large-v3-turbo family
    num_mel_bins: int = 128
    d_model: int = 1280
    encoder_layers: int = 32
    decoder_layers: int = 4
    encoder_attention_heads: int = 20
    decoder_attention_heads: int = 20
    encoder_ffn_dim: int = 5120
    decoder_ffn_dim: int = 5120
    max_source_positions: int = 1500
    max_target_positions: int = 448
    decoder_start_token_id: int = 50258  # <|startoftranscript|>
    eos_token_id: int = 50257            # <|endoftext|>
    eps: float = 1e-5


def tiny_whisper_config(**overrides) -> "WhisperConfig":
    kw = dict(vocab_size=200, num_mel_bins=16, d_model=32,
              encoder_layers=2, decoder_layers=2,
              encoder_attention_heads=4, decoder_attention_heads=4,
              encoder_ffn_dim=64, decoder_ffn_dim=64,
              max_source_positions=40, max_target_positions=24,
              decoder_start_token_id=3, eos_token_id=2)
    kw.update(overrides)
    return WhisperConfig(**kw)


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------


def _ln(x, p, eps):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.var(x, axis=-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * p["g"] + p["b"]


def _heads(x, h):
    t, d = x.shape
    return x.reshape(t, h, d // h).transpose(1, 0, 2)   # [H, T, hd]


def _merge(x):
    h, t, hd = x.shape
    return x.transpose(1, 0, 2).reshape(t, h * hd)


def _mha(p, q_x, kv_x, heads, causal=False):
    """k_proj has no bias (HF Whisper convention); q pre-scaled."""
    d = q_x.shape[-1]
    hd = d // heads
    q = _heads((q_x @ p["q_w"] + p["q_b"]) * (hd ** -0.5), heads)
    k = _heads(kv_x @ p["k_w"], heads)
    v = _heads(kv_x @ p["v_w"] + p["v_b"], heads)
    logits = jnp.einsum("hqd,hkd->hqk", q, k)
    if causal:
        tq, tk = q.shape[1], k.shape[1]
        mask = jnp.tril(jnp.ones((tq, tk), bool), k=tk - tq)
        logits = jnp.where(mask[None], logits, -jnp.inf)
    w = jax.nn.softmax(logits, axis=-1)
    out = _merge(jnp.einsum("hqk,hkd->hqd", w, v))
    return out @ p["o_w"] + p["o_b"]


def _mlp(p, x):
    return jax.nn.gelu(x @ p["fc1_w"] + p["fc1_b"],
                       approximate=False) @ p["fc2_w"] + p["fc2_b"]


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _conv1d(x, w, b, stride):
    """x [T, Cin], w [3, Cin, Cout] (pad 1) -> [T//stride, Cout]."""
    t = x.shape[0]
    xp = jnp.pad(x, ((1, 1), (0, 0)))
    t_out = t // stride
    acc = 0.0
    for k in range(3):
        acc = acc + xp[k:k + stride * t_out:stride] @ w[k]
    return acc + b


def encode(params: PyTree, cfg: WhisperConfig,
           mel: jnp.ndarray) -> jnp.ndarray:
    """mel [n_mels, 3000] -> encoder states [max_source_positions, D]."""
    enc = params["encoder"]
    x = mel.T.astype(jnp.float32)                      # [T, n_mels]
    x = jax.nn.gelu(_conv1d(x, enc["conv1"]["w"], enc["conv1"]["b"], 1),
                    approximate=False)
    x = jax.nn.gelu(_conv1d(x, enc["conv2"]["w"], enc["conv2"]["b"], 2),
                    approximate=False)
    x = x + enc["pos"]

    def body(h, lp):
        h = h + _mha(lp["attn"], _ln(h, lp["ln1"], cfg.eps),
                     _ln(h, lp["ln1"], cfg.eps), cfg.encoder_attention_heads)
        h = h + _mlp(lp["mlp"], _ln(h, lp["ln2"], cfg.eps))
        return h, None

    x, _ = jax.lax.scan(lambda h, lp: body(h, lp), x, enc["layers"])
    return _ln(x, enc["ln_post"], cfg.eps)


# ---------------------------------------------------------------------------
# decoder (full teacher-forced; parity/tests)
# ---------------------------------------------------------------------------


def decoder_logits(params: PyTree, cfg: WhisperConfig, ids: jnp.ndarray,
                   enc_out: jnp.ndarray) -> jnp.ndarray:
    """ids [T] -> logits [T, V] (full causal pass)."""
    dec = params["decoder"]
    t = ids.shape[0]
    h = dec["embed"][ids] + dec["pos"][:t]

    def body(h, lp):
        hn = _ln(h, lp["ln1"], cfg.eps)
        h = h + _mha(lp["self_attn"], hn, hn,
                     cfg.decoder_attention_heads, causal=True)
        h = h + _mha(lp["cross_attn"], _ln(h, lp["ln2"], cfg.eps), enc_out,
                     cfg.decoder_attention_heads)
        h = h + _mlp(lp["mlp"], _ln(h, lp["ln3"], cfg.eps))
        return h, None

    h, _ = jax.lax.scan(body, h, dec["layers"])
    h = _ln(h, dec["ln_post"], cfg.eps)
    return h @ dec["embed"].T


# ---------------------------------------------------------------------------
# jitted greedy generation (KV-cached while_loop)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("cfg", "max_new"))
def decode_with_stats(params: PyTree, cfg: WhisperConfig,
                      enc_out: jnp.ndarray, forced_ids: jnp.ndarray,
                      n_forced: jnp.ndarray, max_new: int,
                      temperature: jnp.ndarray,
                      rng: jax.Array) -> Tuple[jnp.ndarray, jnp.ndarray,
                                               jnp.ndarray]:
    """Continuation of ``forced_ids`` (padded [F]; ``n_forced`` valid) with
    the quality statistics the whisper package's ``transcribe()`` fallback
    ladder gates on (reference inference_commandline.py:160-182 inherits
    them from the pip package).

    ``temperature`` is a traced scalar: 0 -> argmax (greedy), > 0 ->
    categorical sample of softmax(logits/T) — ONE compiled program serves
    every rung of the fallback ladder. Returns (ids [F + max_new] padded
    with eos, length, sum_logprob) where sum_logprob accumulates the chosen
    token's log-softmax over the generated (non-forced) steps including the
    terminating eos, matching whisper's avg_logprob numerator.
    """
    dec = params["decoder"]
    heads = cfg.decoder_attention_heads
    d = cfg.d_model
    hd = d // heads
    n_layers = cfg.decoder_layers
    max_t = int(forced_ids.shape[0]) + max_new

    # cross K/V once per layer
    def cross_kv(lp):
        ca = lp["cross_attn"]
        return (_heads(enc_out @ ca["k_w"], heads),
                _heads(enc_out @ ca["v_w"] + ca["v_b"], heads))

    xk, xv = jax.vmap(cross_kv)(dec["layers"])

    tokens0 = jnp.full((max_t,), cfg.eos_token_id, jnp.int32)
    tokens0 = jax.lax.dynamic_update_slice(
        tokens0, forced_ids.astype(jnp.int32), (0,))
    ck = jnp.zeros((n_layers, heads, max_t, hd), jnp.float32)
    cv = jnp.zeros((n_layers, heads, max_t, hd), jnp.float32)

    def step(state):
        tokens, t, ck, cv, done, sum_lp = state
        tok = tokens[t - 1]
        h = dec["embed"][tok] + dec["pos"][t - 1]          # [D]
        h = h[None, :]                                     # [1, D]

        def layer(carry, inp):
            h, li = carry
            lp, xk_l, xv_l = inp
            hn = _ln(h, lp["ln1"], cfg.eps)
            sa = lp["self_attn"]
            q = _heads((hn @ sa["q_w"] + sa["q_b"]) * (hd ** -0.5), heads)
            k1 = _heads(hn @ sa["k_w"], heads)              # [H, 1, hd]
            v1 = _heads(hn @ sa["v_w"] + sa["v_b"], heads)
            ck_l = jax.lax.dynamic_update_slice(
                ck[li], k1, (0, t - 1, 0))
            cv_l = jax.lax.dynamic_update_slice(
                cv[li], v1, (0, t - 1, 0))
            logits = jnp.einsum("hqd,hkd->hqk", q, ck_l)
            mask = jnp.arange(max_t)[None, None, :] < t
            logits = jnp.where(mask, logits, -jnp.inf)
            w = jax.nn.softmax(logits, axis=-1)
            att = _merge(jnp.einsum("hqk,hkd->hqd", w, cv_l))
            h = h + (att @ sa["o_w"] + sa["o_b"])

            ca = lp["cross_attn"]
            hn2 = _ln(h, lp["ln2"], cfg.eps)
            q2 = _heads((hn2 @ ca["q_w"] + ca["q_b"]) * (hd ** -0.5), heads)
            w2 = jax.nn.softmax(
                jnp.einsum("hqd,hkd->hqk", q2, xk_l), axis=-1)
            att2 = _merge(jnp.einsum("hqk,hkd->hqd", w2, xv_l))
            h = h + (att2 @ ca["o_w"] + ca["o_b"])
            h = h + _mlp(lp["mlp"], _ln(h, lp["ln3"], cfg.eps))
            return (h, li + 1), (ck_l, cv_l)

        (h, _), (ck_new, cv_new) = jax.lax.scan(
            layer, (h, 0), (dec["layers"], xk, xv))
        h = _ln(h, dec["ln_post"], cfg.eps)
        logits = (h @ dec["embed"].T)[0]
        greedy = jnp.argmax(logits).astype(jnp.int32)
        t_safe = jnp.maximum(temperature, 1e-6)
        sampled = jax.random.categorical(
            jax.random.fold_in(rng, t), logits / t_safe).astype(jnp.int32)
        nxt = jnp.where(temperature > 0, sampled, greedy)
        # inside the forced prefix, the "prediction" is the forced token
        nxt = jnp.where(t < n_forced, tokens[t], nxt)
        nxt = jnp.where(done, cfg.eos_token_id, nxt)
        logp = jax.nn.log_softmax(logits)[nxt]
        sum_lp = sum_lp + jnp.where((t >= n_forced) & ~done, logp, 0.0)
        tokens = tokens.at[t].set(
            jnp.where(t < n_forced, tokens[t], nxt))
        done = done | ((t >= n_forced) & (nxt == cfg.eos_token_id))
        return tokens, t + 1, ck_new, cv_new, done, sum_lp

    def cond(state):
        _, t, _, _, done, _ = state
        return (~done) & (t < max_t)

    tokens, t, _, _, _, sum_lp = jax.lax.while_loop(
        cond, step, (tokens0, jnp.int32(1), ck, cv, jnp.bool_(False),
                     jnp.float32(0.0)))
    return tokens, t, sum_lp


def greedy_decode(params: PyTree, cfg: WhisperConfig, enc_out: jnp.ndarray,
                  forced_ids: jnp.ndarray, n_forced: jnp.ndarray,
                  max_new: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy continuation of ``forced_ids`` (temperature-0 wrapper of
    :func:`decode_with_stats`). Returns (ids [F + max_new] padded with eos,
    length)."""
    ids, t, _ = decode_with_stats(
        params, cfg, enc_out, forced_ids, n_forced, max_new,
        jnp.float32(0.0), jax.random.PRNGKey(0))
    return ids, t


def init_params(rng: jax.Array, cfg: WhisperConfig) -> PyTree:
    """Random init with HF-matching shapes (tests/converter golden)."""
    ks = iter(jax.random.split(rng, 128))

    def w(*shape, s=0.02):
        return jax.random.normal(next(ks), shape, jnp.float32) * s

    def attn(d):
        return {"q_w": w(d, d), "q_b": w(d), "k_w": w(d, d),
                "v_w": w(d, d), "v_b": w(d), "o_w": w(d, d), "o_b": w(d)}

    def lnp(d):
        return {"g": jnp.ones((d,), jnp.float32),
                "b": jnp.zeros((d,), jnp.float32)}

    d = cfg.d_model

    def enc_layer(_):
        return {"ln1": lnp(d), "attn": attn(d), "ln2": lnp(d),
                "mlp": {"fc1_w": w(d, cfg.encoder_ffn_dim),
                        "fc1_b": w(cfg.encoder_ffn_dim),
                        "fc2_w": w(cfg.encoder_ffn_dim, d), "fc2_b": w(d)}}

    def dec_layer(_):
        return {"ln1": lnp(d), "self_attn": attn(d),
                "ln2": lnp(d), "cross_attn": attn(d), "ln3": lnp(d),
                "mlp": {"fc1_w": w(d, cfg.decoder_ffn_dim),
                        "fc1_b": w(cfg.decoder_ffn_dim),
                        "fc2_w": w(cfg.decoder_ffn_dim, d), "fc2_b": w(d)}}

    def stack(fn, n):
        trees = [fn(i) for i in range(n)]
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)

    # sinusoidal encoder positions, HF formula
    pos = np.arange(cfg.max_source_positions)[:, None]
    dim = np.arange(d // 2)[None, :]
    inv = np.exp(-np.log(10000.0) / (d // 2 - 1) * dim)
    sin = np.sin(pos * inv)
    cos = np.cos(pos * inv)
    enc_pos = jnp.asarray(np.concatenate([sin, cos], axis=1), jnp.float32)

    return {
        "encoder": {
            "conv1": {"w": w(3, cfg.num_mel_bins, d), "b": w(d)},
            "conv2": {"w": w(3, d, d), "b": w(d)},
            "pos": enc_pos,
            "layers": stack(enc_layer, cfg.encoder_layers),
            "ln_post": lnp(d),
        },
        "decoder": {
            "embed": w(cfg.vocab_size, d),
            "pos": w(cfg.max_target_positions, d),
            "layers": stack(dec_layer, cfg.decoder_layers),
            "ln_post": lnp(d),
        },
    }
