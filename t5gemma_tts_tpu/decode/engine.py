"""Jit-compiled autoregressive audio-token decode engine.

TPU-native replacement for the reference's Python generation loop
(reference: models/t5gemma.py:835-1129 ``inference_tts``): one XLA program
does text encoding, cross-KV precompute, prompt prefill into a pre-allocated
HBM KV cache, and a ``lax.while_loop`` that per step runs the decoder on one
token, applies the sampling guards, draws a token, and early-exits when every
row has emitted EOG.  Differences from the reference by design:

- **batched**: every piece of loop state (prev token, silence counter,
  current length, done flag) is a [B] vector; the reference asserts
  batch_size == 1 (models/t5gemma.py:865);
- **no host round-trips**: the reference calls ``int(token.item())`` per step
  (models/t5gemma.py:1020); here the whole loop is traced, so the only
  host<->device traffic is the final token buffer;
- **static shapes**: text length, prompt length and the generation buffer are
  bucketed; ``est_total``/budgets are dynamic per-row scalars;
- **segmentable**: ``prefill`` + ``run_segment`` expose the same loop in
  bounded slices for streaming synthesis (tokens surface every N steps and
  feed the streaming vocoder while generation continues).

Stop-rule semantics are carried over exactly (same guard order and values,
reference models/t5gemma.py:971-1055):
  1. first generated token can never be EOG (-1e9), tokens 0..sr//5 suppress
     EOG at -10000;
  2. consecutive-silence logit penalty (multiply/divide by the overshoot);
  3. forced stop when the sampled token or the argmax of the *adjusted*
     logits is EOG;
  4. text-guard token budget and target-duration budget
     (``target_total - prompt_offset + sr * extra_cutoff``).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..config import DecodeConfig, VoiceConfig
from ..models import t5gemma, voice
from ..ops import masks as mask_ops
from ..ops import paged_attn
from ..ops import rope as rope_ops
from ..ops import sampling

PyTree = Any


def resolve_kv_mode(cfg: VoiceConfig, dcfg: DecodeConfig,
                    prompt_len: int, gen_len: int) -> str:
    """Concrete KV-cache strategy for this decode trace.

    "auto" picks the paged Pallas cache on TPU whenever the whole buffer fits
    inside the sliding window (so sliding == full and the kernel's
    lengths-only masking is exact); the dense cache otherwise/elsewhere.
    """
    dims = cfg.backbone.decoder
    ps = t5gemma.PAGE_SIZE
    total = t5gemma._pad_to(prompt_len, ps) + t5gemma._pad_to(gen_len, ps)
    mode = dcfg.kv_cache
    if mode == "auto":
        fits = total <= dims.sliding_window
        return "paged" if (jax.default_backend() == "tpu" and fits) else "dense"
    if mode in ("paged", "paged_f8", "paged_i8"):
        if total > dims.sliding_window:
            raise ValueError(
                f"kv_cache={mode!r} needs prompt+gen ({total}) <= "
                f"sliding_window ({dims.sliding_window}); use dense")
        return mode
    if mode != "dense":
        raise ValueError(f"unknown kv_cache mode {mode!r}")
    return mode


def decode_budgets(cfg: VoiceConfig, x_lens, prompt_lens, target_totals):
    """Per-row (est_total, time_budget, text_budget) — the single source of
    the stop-budget formulas shared by the sequential (_make_body),
    speculative (decode_tokens_speculative), and continuous
    (decode/continuous.py) loops. prompt_lens excludes BOS."""
    prompt_offset = prompt_lens + 1                          # reference :921
    est_total = jnp.maximum(target_totals + 1, prompt_offset)
    time_budget = (target_totals - prompt_offset
                   + jnp.int32(int(cfg.encodec_sr) * cfg.extra_cutoff))
    if cfg.text_guard_frames_per_token > 0:
        text_budget = jnp.maximum(1, x_lens) * cfg.text_guard_frames_per_token
    else:
        text_budget = jnp.full_like(x_lens, jnp.iinfo(jnp.int32).max // 2)
    return est_total, time_budget, text_budget


def apply_stop_rules(cfg: VoiceConfig, token, argmax_tok, step,
                     text_budget, time_budget, max_steps: int):
    """Force-stop guard (reference :988-1048 order): EOG sampled or argmax,
    text budget, duration budget, buffer exhaustion. ``step`` may be a
    scalar (sequential/speculative) or a per-row vector (continuous)."""
    eog = cfg.eog_inference
    force = (token == eog) | (argmax_tok == eog)
    force = force | (step > text_budget) | (step > time_budget)
    force = force | (step >= max_steps - 1)
    return jnp.where(force, eog, token)


def silence_counter_update(dcfg: DecodeConfig, token, prev_token, consec):
    """Consecutive-silence run-length bookkeeping (reference :999-1011)."""
    if dcfg.silence_tokens:
        silence = jnp.asarray(dcfg.silence_tokens, jnp.int32)
        is_sil = jnp.any(token[:, None] == silence[None, :], axis=1)
        return jnp.where(is_sil & (token == prev_token), consec + 1, 0)
    return jnp.zeros_like(consec)


class DecodeOutputs(NamedTuple):
    tokens: jnp.ndarray     # [B, max_steps] generated tokens (incl. final EOG)
    gen_lens: jnp.ndarray   # [B] number of generated tokens incl. EOG
    steps: jnp.ndarray      # scalar: loop iterations executed


class _LoopState(NamedTuple):
    cache: t5gemma.DecoderCache
    last_hidden: jnp.ndarray       # [B, 1, D]
    tokens: jnp.ndarray            # [B, max_steps]
    step: jnp.ndarray              # scalar int32 == cur_num_gen
    current_length: jnp.ndarray    # [B] absolute length incl. BOS
    prev_token: jnp.ndarray        # [B]
    consec_silence: jnp.ndarray    # [B]
    done: jnp.ndarray              # [B] bool
    gen_lens: jnp.ndarray          # [B]


def _adjust_logits(
    cfg: VoiceConfig,
    dcfg: DecodeConfig,
    logits: jnp.ndarray,          # [B, Va] float32
    step: jnp.ndarray,            # scalar
    prev_token: jnp.ndarray,      # [B]
    consec_silence: jnp.ndarray,  # [B]
) -> jnp.ndarray:
    """EOG suppression + silence-repetition penalty on raw logits
    (pre-temperature), exactly as reference models/t5gemma.py:986-1011."""
    eog = cfg.eog_inference
    b = logits.shape[0]
    eog_col = logits[:, eog]
    # step == 0: hard suppression; step <= sr//5: soft suppression
    eog_col = jnp.where(step <= int(cfg.encodec_sr) // 5, -10000.0, eog_col)
    eog_col = jnp.where(step == 0, -1e9, eog_col)
    logits = logits.at[:, eog].set(eog_col)

    if dcfg.stop_repetition > 0 and dcfg.silence_tokens:
        silence = jnp.asarray(dcfg.silence_tokens)
        is_silence = jnp.any(prev_token[:, None] == silence[None, :], axis=1)
        active = is_silence & (consec_silence > dcfg.stop_repetition)
        factor = (consec_silence - (dcfg.stop_repetition - 1)).astype(jnp.float32)
        prev_logit = jnp.take_along_axis(logits, prev_token[:, None], axis=1)[:, 0]
        penalized = jnp.where(prev_logit < 0, prev_logit * factor,
                              prev_logit / jnp.maximum(factor, 1.0))
        new_prev = jnp.where(active, penalized, prev_logit)
        logits = logits.at[jnp.arange(b), prev_token].set(new_prev)
    return logits


# ---------------------------------------------------------------------------
# prefill
# ---------------------------------------------------------------------------


def prefill(
    params: PyTree,
    cfg: VoiceConfig,
    dcfg: DecodeConfig,
    x: jnp.ndarray,             # [B, Tx] text ids (prefix + x_sep + target...)
    x_lens: jnp.ndarray,        # [B]
    prompt: jnp.ndarray,        # [B, P] codec prompt tokens (incl. y_sep)
    prompt_lens: jnp.ndarray,   # [B] frames in each prompt (0 = no reference)
    target_totals: jnp.ndarray, # [B] tgt_y_lens: prompt + sr * target_secs
    cache_slack: int = 0,       # extra KV slots past max_frames (multi-token
                                # verify passes write k-token blocks whose
                                # tail must never clamp into valid slots)
) -> _LoopState:
    """Encode text, precompute cross-KV, and prefill the prompt into the KV
    cache; returns the loop state at step 0."""
    s = cfg.special
    dims = cfg.backbone.decoder
    b, p_max = prompt.shape
    max_steps = dcfg.max_frames + cache_slack
    t_max = p_max + 1 + max_steps  # BOS + prompt + generation buffer
    compute_dtype = jnp.dtype(cfg.dtype)

    # ---- encode text ------------------------------------------------------
    memory, enc_pos = voice.encode_text(params, cfg, x, x_lens)
    pm_enc = enc_pos if cfg.use_pm_rope else None
    cross_k, cross_v = t5gemma.build_cross_kv(params["decoder"], dims, memory, pm_enc)

    # ---- prompt prep ------------------------------------------------------
    bos = jnp.full((b, 1), s.empty, prompt.dtype)
    cated = jnp.concatenate([bos, prompt], axis=1)          # [B, P+1]
    cated_lens = prompt_lens + 1

    # est_total per row (reference :925-933): target_total + 1, >= current len
    est_total = jnp.maximum(target_totals + 1, cated_lens)

    # PM positions for prefill (reference :945-948): arange/(est_total-1)*scale;
    # with PM-RoPE off, self-attention rope uses plain absolute indices
    base = jnp.arange(p_max + 1, dtype=jnp.float32)[None, :]
    if cfg.use_pm_rope:
        denom = jnp.maximum(1, est_total - 1).astype(jnp.float32)[:, None]
        prefill_pos = base / denom * cfg.progress_scale
    else:
        prefill_pos = jnp.broadcast_to(base, (b, p_max + 1))

    embedded = voice.embed_audio(params, cated).astype(compute_dtype)

    kv_mode = resolve_kv_mode(cfg, dcfg, p_max + 1, max_steps)
    # prefill biases: causal over the key extent (for the dense cache the
    # extent is the whole buffer — junk slots beyond each row's prompt are
    # overwritten before they ever become attendable; for the paged cache
    # causality already limits keys to this call's own [W, W] block)
    t_keys = t_max if kv_mode == "dense" else p_max + 1
    q_idx = jnp.arange(p_max + 1)[:, None]
    k_idx = jnp.arange(t_keys)[None, :]
    causal = (k_idx <= q_idx)[None, None]
    full_bias = jnp.where(causal, 0.0, mask_ops.NEG_INF).astype(jnp.float32)
    slid = causal & (q_idx - dims.sliding_window < k_idx)[None, None]
    sliding_bias = jnp.where(slid, 0.0, mask_ops.NEG_INF).astype(jnp.float32)
    full_bias = jnp.broadcast_to(full_bias, (b, 1, p_max + 1, t_keys))
    sliding_bias = jnp.broadcast_to(sliding_bias, (b, 1, p_max + 1, t_keys))
    cross_b = mask_ops.cross_bias(x_lens, p_max + 1, x.shape[1])

    if kv_mode == "dense":
        cache = t5gemma.init_cache(dims, b, t_max, x.shape[1],
                                   dtype=compute_dtype)
        hidden, cache = t5gemma.decoder_forward(
            params["decoder"], dims,
            inputs_embeds=embedded,
            self_full_bias=full_bias,
            self_sliding_bias=sliding_bias,
            cross_bias=cross_b,
            position_ids=prefill_pos,
            pm_decoder_positions=prefill_pos if cfg.use_pm_rope else None,
            cross_k=cross_k, cross_v=cross_v,
            cache=cache,
        )
    else:
        store = paged_attn.KV_STORE_DTYPES[
            {"paged_f8": "f8", "paged_i8": "i8"}.get(kv_mode, "bf16")]
        cache = t5gemma.init_paged_cache(dims, b, p_max + 1, max_steps,
                                         x.shape[1], store_dtype=store)
        hidden, cache = t5gemma.paged_prefill(
            params["decoder"], dims,
            inputs_embeds=embedded,
            self_full_bias=full_bias,
            self_sliding_bias=sliding_bias,
            cross_bias=cross_b,
            position_ids=prefill_pos,
            pm_decoder_positions=prefill_pos if cfg.use_pm_rope else None,
            cross_k=cross_k, cross_v=cross_v,
            cache=cache,
        )
    # last valid hidden per row: index cated_lens - 1
    last_hidden = jnp.take_along_axis(
        hidden, (cated_lens - 1)[:, None, None], axis=1
    )  # [B, 1, D]

    return _LoopState(
        cache=cache,
        last_hidden=last_hidden,
        tokens=jnp.full((b, max_steps), s.pad, jnp.int32),
        step=jnp.int32(0),
        current_length=cated_lens.astype(jnp.int32),
        prev_token=jnp.full((b,), -1, jnp.int32),
        consec_silence=jnp.zeros((b,), jnp.int32),
        done=jnp.zeros((b,), bool),
        gen_lens=jnp.zeros((b,), jnp.int32),
    )


# ---------------------------------------------------------------------------
# the per-step body (shared by full decode and streaming segments)
# ---------------------------------------------------------------------------


def _candidate_sample(cfg: VoiceConfig, dcfg: DecodeConfig, logits, step,
                      prev_token, consec_silence, step_rng=None,
                      row_keys=None):
    """Top-(k+2) candidate fast path shared by the windowed loop (scalar
    ``step`` + one ``step_rng``) and continuous batching (``step`` [B] +
    per-row ``row_keys``, already folded with each row's own step).

    One vocab-wide pass: raw top-(k+2) candidates; every adjustment only
    lowers at most two tokens (EOG + repeated silence), so the adjusted
    top-k lives inside this set — filtering here equals the reference's
    adjust-then-top_k order (see ops/sampling.py::sample_from_candidates).
    """
    eog = cfg.eog_inference
    vocab = cfg.audio_embedding_vocab
    sr_fifth = int(cfg.encodec_sr) // 5
    silence = jnp.asarray(dcfg.silence_tokens, jnp.int32) \
        if dcfg.silence_tokens else None

    kk = min(dcfg.top_k + 2, vocab)
    if dcfg.approx_top_k:
        vals, idx = jax.lax.approx_max_k(
            logits.astype(jnp.float32), kk, recall_target=0.99)
    else:
        vals, idx = jax.lax.top_k(logits, kk)
    vals = vals.astype(jnp.float32)
    step_arr = jnp.asarray(step)
    early = step_arr <= sr_fifth
    first = step_arr == 0
    if step_arr.ndim:                       # per-row clocks -> [B, 1]
        early, first = early[:, None], first[:, None]
    is_eog = idx == eog
    vals = jnp.where(is_eog & early, -10000.0, vals)
    vals = jnp.where(is_eog & first, -1e9, vals)
    if dcfg.stop_repetition > 0 and dcfg.silence_tokens:
        prev_is_sil = jnp.any(
            prev_token[:, None] == silence[None, :], axis=1
        )
        active = prev_is_sil & (consec_silence > dcfg.stop_repetition)
        factor = (consec_silence
                  - (dcfg.stop_repetition - 1)).astype(jnp.float32)
        at_prev = idx == prev_token[:, None]
        pen = jnp.where(vals < 0, vals * factor[:, None],
                        vals / jnp.maximum(factor, 1.0)[:, None])
        vals = jnp.where(at_prev & active[:, None], pen, vals)

    b_idx = jnp.arange(vals.shape[0])
    argmax_tok = idx[b_idx, jnp.argmax(vals, axis=-1)]
    token = sampling.sample_from_candidates(
        step_rng, vals, idx, top_k=dcfg.top_k, top_p=dcfg.top_p,
        temperature=dcfg.temperature, row_keys=row_keys,
    )
    return token, argmax_tok


def sample_step_token_rows(
    cfg: VoiceConfig,
    dcfg: DecodeConfig,
    logits: jnp.ndarray,          # [B, Va]
    steps: jnp.ndarray,           # [B] per-row clocks
    prev_token: jnp.ndarray,      # [B]
    consec_silence: jnp.ndarray,  # [B]
    raw_keys: jnp.ndarray,        # [B, 2] per-slot raw uint32 keys
):
    """Per-row-clock guarded sampling (continuous batching).

    The filtering math is row-independent, so it runs BATCHED (the naive
    per-row vmap of :func:`sample_step_token` measured a 1.4 ms/step tax
    at 16 slots — tools/probe_continuous_parts.py); only the key fold and
    the categorical draw are per-row. Each row's result is bit-identical
    to a batch-1 :func:`sample_step_token` call with that row's key and
    step (pinned by tests/test_continuous.py).
    """
    if not (dcfg.top_k and dcfg.top_k > 0) or (0.0 < dcfg.min_p < 1.0):
        # exact full-vocab path: _adjust_logits takes a scalar step, so
        # keep the per-row vmap for this (non-default) config
        def one(lg, st, pv, cs, key):
            tok, am = sample_step_token(
                cfg, dcfg, lg[None], st, pv[None], cs[None], key)
            return tok[0], am[0]

        return jax.vmap(one)(logits, steps, prev_token, consec_silence,
                             raw_keys)
    row_keys = jax.vmap(jax.random.fold_in)(raw_keys, steps)
    return _candidate_sample(cfg, dcfg, logits, steps, prev_token,
                             consec_silence, row_keys=row_keys)


def sample_step_token(
    cfg: VoiceConfig,
    dcfg: DecodeConfig,
    logits: jnp.ndarray,          # [B, Va]
    step,                         # scalar int
    prev_token: jnp.ndarray,      # [B]
    consec_silence: jnp.ndarray,  # [B]
    rng: jax.Array,               # base rng; folded with the ABSOLUTE step
):
    """One decode step's guarded sampling -> (token [B], argmax_tok [B]).

    Shared by the sequential loop and the speculative verifier: the rng is
    folded with the absolute step index, so any path that evaluates the same
    logits at the same step draws the identical token — this is what makes
    speculative decoding bit-identical to the sequential loop.
    """
    # min_p bypasses top-k/top-p in the reference and can keep more than
    # k+2 survivors, so it routes through the exact full-vocab path; the
    # candidate fast path covers the standard top-k decode.
    if dcfg.top_k and dcfg.top_k > 0 and not (0.0 < dcfg.min_p < 1.0):
        token, argmax_tok = _candidate_sample(
            cfg, dcfg, logits, step, prev_token, consec_silence,
            step_rng=jax.random.fold_in(rng, step))
    else:
        step_rng = jax.random.fold_in(rng, step)
        adjusted = _adjust_logits(cfg, dcfg, logits.astype(jnp.float32),
                                  step, prev_token, consec_silence)
        token = sampling.sample(
            step_rng, adjusted, top_k=dcfg.top_k, top_p=dcfg.top_p,
            min_p=dcfg.min_p, temperature=dcfg.temperature,
        ).astype(jnp.int32)
        argmax_tok = sampling.greedy(adjusted)
    return token, argmax_tok


def _make_body(params, cfg: VoiceConfig, dcfg: DecodeConfig,
               x_lens, prompt_lens, target_totals, rng):
    s = cfg.special
    eog = cfg.eog_inference
    dims = cfg.backbone.decoder
    compute_dtype = jnp.dtype(cfg.dtype)
    max_steps = dcfg.max_frames
    sr = int(cfg.encodec_sr)

    prompt_offset = prompt_lens + 1                          # reference :921
    est_total, time_budget, text_budget = decode_budgets(
        cfg, x_lens, prompt_lens, target_totals)

    def body(st: _LoopState) -> _LoopState:
        paged = isinstance(st.cache, t5gemma.PagedDecoderCache)

        logits = voice.predict_head(params["head"], st.last_hidden)[:, 0]
        token, argmax_tok = sample_step_token(
            cfg, dcfg, logits, st.step, st.prev_token, st.consec_silence, rng)
        token = apply_stop_rules(cfg, token, argmax_tok, st.step,
                                 text_budget, time_budget, max_steps)

        newly_active = ~st.done
        write_tok = jnp.where(newly_active, token, s.pad)
        tokens = st.tokens.at[:, st.step].set(write_tok)
        now_done = st.done | (newly_active & (token == eog))
        gen_lens = jnp.where(
            newly_active & (token == eog), st.step + 1, st.gen_lens
        )

        consec = silence_counter_update(dcfg, token, st.prev_token,
                                        st.consec_silence)
        prev_token = token

        # ---- decoder step for still-active rows (computed for all) --------
        emb = voice.embed_audio(params, token[:, None]).astype(compute_dtype)
        if cfg.use_pm_rope:
            pos = rope_ops.decode_step_position(
                st.current_length, est_total, cfg.progress_scale
            )[:, None]  # [B, 1]
        else:
            # absolute integer position of the new token (HF default path)
            pos = st.current_length.astype(jnp.float32)[:, None]
        if paged:
            hidden, cache = t5gemma.paged_decode_step(
                params["decoder"], dims,
                inputs_embeds=emb,
                position_ids=pos,
                pm_decoder_positions=pos if cfg.use_pm_rope else None,
                cache=st.cache,
                step=st.step,
                prompt_lengths=prompt_offset,
                enc_lengths=x_lens,
            )
        else:
            t_max = st.cache.self_k.shape[3]
            t_enc = st.cache.cross_k.shape[3]
            step_full = mask_ops.step_self_bias(st.current_length, t_max,
                                                window=None)
            step_slid = mask_ops.step_self_bias(
                st.current_length, t_max, window=dims.sliding_window
            )
            hidden, cache = t5gemma.decoder_forward(
                params["decoder"], dims,
                inputs_embeds=emb,
                self_full_bias=step_full,
                self_sliding_bias=step_slid,
                cross_bias=mask_ops.cross_bias(x_lens, 1, t_enc),
                position_ids=pos,
                pm_decoder_positions=pos if cfg.use_pm_rope else None,
                cross_k=st.cache.cross_k, cross_v=st.cache.cross_v,
                cache=st.cache,
                cache_pos=st.current_length,
            )
        current_length = jnp.where(now_done, st.current_length,
                                   st.current_length + 1)
        return _LoopState(
            cache=cache,
            last_hidden=hidden,
            tokens=tokens,
            step=st.step + 1,
            current_length=current_length,
            prev_token=prev_token,
            consec_silence=consec,
            done=now_done,
            gen_lens=gen_lens,
        )

    return body


# ---------------------------------------------------------------------------
# full decode + streaming segments
# ---------------------------------------------------------------------------


def decode_tokens(
    params: PyTree,
    cfg: VoiceConfig,
    dcfg: DecodeConfig,
    x: jnp.ndarray,
    x_lens: jnp.ndarray,
    prompt: jnp.ndarray,
    prompt_lens: jnp.ndarray,
    target_totals: jnp.ndarray,
    rng: jax.Array,
) -> DecodeOutputs:
    """Full batched synthesis of audio tokens. Pure function of its inputs;
    wrap with :func:`jitted_decoder` for the compiled/bucketed entry point."""
    state = prefill(params, cfg, dcfg, x, x_lens, prompt, prompt_lens,
                    target_totals)
    body = _make_body(params, cfg, dcfg, x_lens, prompt_lens, target_totals,
                      rng)
    max_steps = dcfg.max_frames

    def cond(st: _LoopState):
        return (st.step < max_steps) & ~jnp.all(st.done)

    final = jax.lax.while_loop(cond, body, state)
    gen_lens = jnp.where(final.done, final.gen_lens, final.step)
    return DecodeOutputs(tokens=final.tokens, gen_lens=gen_lens,
                         steps=final.step)


def run_segment(
    params: PyTree,
    cfg: VoiceConfig,
    dcfg: DecodeConfig,
    state: _LoopState,
    x_lens: jnp.ndarray,
    prompt_lens: jnp.ndarray,
    target_totals: jnp.ndarray,
    rng: jax.Array,
    until: jnp.ndarray,  # scalar: run while step < until (and < max_frames)
) -> _LoopState:
    """Advance the decode loop to ``until`` steps; identical semantics to the
    corresponding slice of :func:`decode_tokens` (token-exactness is tested).
    Used for streaming synthesis: tokens surface per segment and feed the
    streaming vocoder while later segments still generate."""
    body = _make_body(params, cfg, dcfg, x_lens, prompt_lens, target_totals,
                      rng)
    max_steps = dcfg.max_frames

    def cond(st: _LoopState):
        return (st.step < until) & (st.step < max_steps) & ~jnp.all(st.done)

    return jax.lax.while_loop(cond, body, state)


@functools.lru_cache(maxsize=32)
def _compiled(cfg: VoiceConfig, dcfg: DecodeConfig):
    return jax.jit(
        functools.partial(decode_tokens, cfg=cfg, dcfg=dcfg),
        static_argnames=(),
    )


def jitted_decoder(cfg: VoiceConfig, dcfg: DecodeConfig):
    """Compiled entry point; recompiles only on new (config, shape) buckets."""
    fn = _compiled(cfg, dcfg)

    def run(params, x, x_lens, prompt, prompt_lens, target_totals, rng):
        return fn(params, x=x, x_lens=x_lens, prompt=prompt,
                  prompt_lens=prompt_lens, target_totals=target_totals,
                  rng=rng)

    return run


@functools.lru_cache(maxsize=32)
def jitted_segment_fns(cfg: VoiceConfig, dcfg: DecodeConfig):
    """(prefill_fn, segment_fn) compiled pair for streaming decode."""
    pf = jax.jit(functools.partial(prefill, cfg=cfg, dcfg=dcfg))
    sf = jax.jit(functools.partial(run_segment, cfg=cfg, dcfg=dcfg))
    return pf, sf
