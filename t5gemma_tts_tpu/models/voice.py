"""T5GemmaVoice: the TTS audio-token model (backbone + audio head).

Re-derivation of the reference ``T5GemmaVoiceModel`` (reference:
models/t5gemma.py:266-833) as pure functions:

- audio embedding table of ``audio_vocab_size + n_special`` rows feeding the
  decoder (reference :387-395),
- a 2-layer GELU prediction head producing audio-token logits (reference
  :397-406; exact-erf GELU, matching ``nn.GELU()``),
- the training forward: BOS(empty)-shifted decoder inputs with EOS appended
  (reference :626-664), PM position ids on both stacks, dense causal+pad
  masks, per-token CE with eog class weighting, ``y_sep`` ignore-index and
  optional no-loss-on-prefix masking (reference :758-825).

Everything is batched, fixed-shape, and jit-safe: the decoder-input shift and
EOS insertion are mask arithmetic instead of the reference's per-sample Python
loops.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import VoiceConfig
from ..ops import chunked_ce
from ..ops import masks as mask_ops
from ..ops import rope as rope_ops
from . import t5gemma

PyTree = Any


class VoiceOutputs(NamedTuple):
    loss: jnp.ndarray
    mean_ce: jnp.ndarray
    perplexity: jnp.ndarray
    top10acc: jnp.ndarray
    effective_ntokens: jnp.ndarray


def init_params(rng: jax.Array, cfg: VoiceConfig) -> PyTree:
    dtype = jnp.dtype(cfg.dtype)
    k_enc, k_dec, k_emb, k_h1, k_h2 = jax.random.split(rng, 5)
    d = cfg.backbone.hidden_size
    va = cfg.audio_embedding_vocab
    return {
        "encoder": t5gemma.init_stack(
            k_enc, cfg.backbone.encoder, is_decoder=False, with_embed=True,
            dtype=dtype,
        ),
        "decoder": t5gemma.init_stack(
            k_dec, cfg.backbone.decoder, is_decoder=True, with_embed=False,
            dtype=dtype, cross_hidden=cfg.backbone.cross_attention_hidden_size,
        ),
        "audio_embed": (jax.random.normal(k_emb, (va, d), jnp.float32) * 0.02).astype(dtype),
        "head": {
            "w1": (jax.random.normal(k_h1, (d, d), jnp.float32) * 0.02).astype(dtype),
            "b1": jnp.zeros((d,), dtype),
            "w2": (jax.random.normal(k_h2, (d, va), jnp.float32) * 0.02).astype(dtype),
            "b2": jnp.zeros((va,), dtype),
        },
    }


def predict_head(head: Dict[str, jnp.ndarray], hidden: jnp.ndarray) -> jnp.ndarray:
    """2-layer head with exact (erf) GELU -> audio-token logits."""
    from ..ops.quant import q_matmul as _mm

    h = _mm(hidden, head["w1"]) + head["b1"]
    h = jax.nn.gelu(h, approximate=False)
    return _mm(h, head["w2"]) + head["b2"]


def embed_audio(params: PyTree, tokens: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(params["audio_embed"], tokens, axis=0)


def encode_text(
    params: PyTree,
    cfg: VoiceConfig,
    x: jnp.ndarray,        # [B, Tx] text token ids
    x_lens: jnp.ndarray,   # [B]
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Run the text encoder; returns (memory [B,Tx,D], enc PM positions)."""
    dims = cfg.backbone.encoder
    tx = x.shape[1]
    if cfg.use_pm_rope:
        enc_pos = rope_ops.progress_position_ids(x_lens, tx, cfg.progress_scale)
    else:
        enc_pos = jnp.broadcast_to(
            jnp.arange(tx, dtype=jnp.float32)[None], (x.shape[0], tx)
        )
    memory = t5gemma.encoder_forward(
        params["encoder"], dims,
        input_ids=x,
        full_bias=mask_ops.encoder_self_bias(x_lens, tx),
        sliding_bias=mask_ops.encoder_sliding_bias(x_lens, tx, dims.sliding_window),
        position_ids=enc_pos,
        remat=cfg.gradient_checkpointing,
    )
    return memory, enc_pos


def prepare_decoder_io(
    cfg: VoiceConfig, y: jnp.ndarray, y_lens: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched BOS-shift + EOS-append (reference models/t5gemma.py:626-664).

    y: [B, T] codec tokens (right-padded); returns
      targets    [B, T+1]: y tokens, EOS at index y_lens[b], pad beyond
      dec_input  [B, T+1]: empty_token, then targets shifted right
      new_y_lens [B]     : y_lens + 1
    """
    s = cfg.special
    eos_token = cfg.eog_inference
    b, t = y.shape
    pos = jnp.arange(t + 1)[None, :]
    y_ext = jnp.pad(y, ((0, 0), (0, 1)), constant_values=s.pad)
    targets = jnp.where(
        pos < y_lens[:, None], y_ext,
        jnp.where(pos == y_lens[:, None], eos_token, s.pad),
    )
    shifted = jnp.concatenate(
        [jnp.full((b, 1), s.empty, targets.dtype), targets[:, :-1]], axis=1
    )
    new_y_lens = y_lens + 1
    # beyond each row's length, inputs are pad tokens (embedded but masked)
    dec_input = jnp.where(pos < new_y_lens[:, None], shifted, s.pad)
    return targets, dec_input, new_y_lens


def forward(
    params: PyTree,
    cfg: VoiceConfig,
    batch: Dict[str, jnp.ndarray],
) -> VoiceOutputs:
    """Training forward + loss (reference models/t5gemma.py:666-833).

    batch: x [B,Tx] int32, x_lens [B], y [B,Ty] int32, y_lens [B],
           y_sep_position [B] (0 when no prefix / no_loss_on_prefix off).
    """
    x, x_lens = batch["x"], batch["x_lens"]
    y, y_lens = batch["y"], batch["y_lens"]
    dims = cfg.backbone.decoder

    memory, enc_pos = encode_text(params, cfg, x, x_lens)

    targets, dec_input, new_y_lens = prepare_decoder_io(cfg, y, y_lens)
    t_dec = dec_input.shape[1]

    if cfg.use_pm_rope:
        dec_pos = rope_ops.progress_position_ids(
            new_y_lens, t_dec, cfg.progress_scale
        )
        pm_dec, pm_enc = dec_pos, enc_pos
    else:
        dec_pos = jnp.broadcast_to(
            jnp.arange(t_dec, dtype=jnp.float32)[None], (y.shape[0], t_dec)
        )
        pm_dec = pm_enc = None

    embedded = embed_audio(params, dec_input).astype(memory.dtype)
    cross_k, cross_v = t5gemma.build_cross_kv(
        params["decoder"], dims, memory, pm_enc
    )
    hidden, _ = t5gemma.decoder_forward(
        params["decoder"], dims,
        inputs_embeds=embedded,
        self_full_bias=mask_ops.decoder_self_bias(new_y_lens, t_dec),
        self_sliding_bias=mask_ops.decoder_sliding_bias(
            new_y_lens, t_dec, dims.sliding_window
        ),
        cross_bias=mask_ops.cross_bias(x_lens, t_dec, x.shape[1]),
        position_ids=dec_pos,
        pm_decoder_positions=pm_dec,
        cross_k=cross_k, cross_v=cross_v,
        remat=cfg.gradient_checkpointing,
    )
    if 0 < cfg.ce_vocab_chunk < cfg.audio_embedding_vocab:
        # chunked-vocab CE: never materializes the [B, T+1, Va] logits
        # (the full-FT activation wall at Va = 65541; ops/chunked_ce.py)
        nll, hit = chunked_ce.head_nll_top10(
            cfg.ce_vocab_chunk, params["head"], hidden, targets)
        return loss_from_nll(cfg, nll, hit, targets, new_y_lens,
                             batch.get("y_sep_position"))
    logits = predict_head(params["head"], hidden)  # [B, T+1, Va]
    return token_loss(cfg, logits, targets, new_y_lens,
                      batch.get("y_sep_position"))


def token_loss(
    cfg: VoiceConfig,
    logits: jnp.ndarray,       # [B, T, Va]
    targets: jnp.ndarray,      # [B, T]
    new_y_lens: jnp.ndarray,   # [B]
    sep_positions: Optional[jnp.ndarray],  # [B] or None
) -> VoiceOutputs:
    """CE + metrics, matching reference models/t5gemma.py:758-825:

    - positions counted: sep_position <= pos < new_y_lens (the trim at :766-775)
    - y_sep targets excluded from CE (ignore_index, :792-797) but still
      counted in ``effective_ntokens`` and top-10 accuracy, as the reference
      does;
    - loss = weighted-mean CE * counted-token-count (:819).
    """
    s = cfg.special
    b, t, va = logits.shape
    pos = jnp.arange(t)[None, :]
    counted = pos < new_y_lens[:, None]
    if cfg.no_loss_on_prefix and sep_positions is not None:
        counted = counted & (pos >= sep_positions[:, None])

    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[:, :, None], axis=-1)[..., 0]
    top10 = jax.lax.top_k(logits.astype(jnp.float32), min(10, va))[1]
    hit = jnp.any(top10 == targets[:, :, None], axis=-1)
    return _assemble_outputs(cfg, nll, hit, targets, counted)


def loss_from_nll(
    cfg: VoiceConfig,
    nll: jnp.ndarray,          # [B, T] f32 per-token -log p(target)
    top10_hit: jnp.ndarray,    # [B, T] bool
    targets: jnp.ndarray,      # [B, T]
    new_y_lens: jnp.ndarray,   # [B]
    sep_positions: Optional[jnp.ndarray],  # [B] or None
) -> VoiceOutputs:
    """token_loss aggregation from per-token nll/top10 (the chunked-CE path;
    same masking/weighting semantics, reference models/t5gemma.py:758-825)."""
    t = targets.shape[1]
    pos = jnp.arange(t)[None, :]
    counted = pos < new_y_lens[:, None]
    if cfg.no_loss_on_prefix and sep_positions is not None:
        counted = counted & (pos >= sep_positions[:, None])
    return _assemble_outputs(cfg, nll, top10_hit, targets, counted)


def _assemble_outputs(cfg, nll, hit, targets, counted) -> VoiceOutputs:
    s = cfg.special
    ce_mask = counted & (targets != s.y_sep)
    if cfg.eog_weight != 1.0:
        w = jnp.where(targets == s.eog, cfg.eog_weight, 1.0)
    else:
        w = jnp.ones_like(nll)
    w = w * ce_mask.astype(jnp.float32)
    wsum = jnp.maximum(w.sum(), 1e-8)
    mean_ce = (nll * w).sum() / wsum

    ntokens = counted.sum()
    loss = mean_ce * ntokens.astype(jnp.float32)
    correct = hit & counted
    return VoiceOutputs(
        loss=loss,
        mean_ce=mean_ce,
        perplexity=jnp.exp(mean_ce),
        top10acc=correct.sum(),
        effective_ntokens=ntokens,
    )
