"""Speculative multi-token decoding: draft k tokens, verify in ONE pass.

The AR decode step is HBM-bandwidth-bound — the decoder weights stream
through the chip once per token (reference hot loop: models/t5gemma.py:
1057-1115). A verify pass over k+1 tokens streams them once for k+1
positions, so every accepted draft token is nearly free. This implements
the multi-token-prediction + speculative-verification recipe for codec TTS
(PAPERS.md: arXiv 2410.13839) TPU-natively:

- **Exactness by construction.** The verifier samples every position with
  the engine's own ``sample_step_token``, whose rng is folded with the
  ABSOLUTE step index. A token sampled at step s from THE SAME LOGITS is
  therefore bit-identical whether it was produced by the sequential loop or
  inside a verify pass — draft quality changes only SPEED, never the output
  distribution (tested: traces are array-equal to ``engine.decode_tokens``
  for any draft, at any temperature, on shape-deterministic platforms/f32).
  Caveat: on TPU bf16 the (k+1)-token matmuls can differ from the 1-token
  pass in the last ulp; a near-tie crossing a top-k/argmax boundary then
  yields a different — equally valid — sample (bench.py measures this as
  trace agreement rather than asserting identity). A second TPU-only
  divergence source: the sequential paged engine defaults to the FUSED
  attention kernel (T5G_FUSED_ATTN=2) while the verify pass uses the
  unfused paged_flash_parts + XLA merge chain — different reduction
  orders, same last-ulp effect. To isolate it, compare traces with
  T5G_FUSED_ATTN=0 so both loops run the unfused kernels (the CPU
  array-equality tests already run in that regime).
- **Scalar advance.** All rows advance by the minimum accepted count across
  active rows, keeping the engine's scalar-step rng schedule; targets drawn
  beyond that are discarded and re-drawn identically next pass. Speculation
  is therefore a small-batch/latency lever (at batch 1 the full per-row
  acceptance is realized), matching its standard serving role.
- **Draft sources.** ``mtp_draft_fn`` uses trainable multi-token-prediction
  heads (one small MLP per lookahead position, greedy draft);
  ``trace_draft_fn`` replays a given token trace (oracle for tests and for
  measuring the speedup ceiling at a controlled acceptance rate).

KV-cache coverage: dense, paged, paged_f8 run on the unfused chain
(``t5gemma.paged_decode_multi``'s segment kernels + exact flash merge);
paged AND paged_i8 additionally run the verify pass through the
megakernel chain path (``megakernel.decode_stack(chain=k+1)``) whenever
the decode weights are fused int8/int4 — one launch per pass, about the
cost of one fused sequential step (VERDICT r4 next #4). paged_i8 is
megakernel-ONLY (the unfused segment kernels have no int8 scale-plane
support) and on TPU additionally needs batch % 8 == 0 (the staged scale
slab's sublane constraint, ops/megakernel.supports).

Exactness caveat on the megakernel chain: the fused verify groups the
flash merge differently from the sequential decomposition (chain prefix
as a dense tail block vs flushed slab lanes), so logits agree only to
summation order; with int8-quantized weights a true near-tie can sample
a different — equally valid — token. The emitted distribution is
preserved (the same caveat class as TPU bf16 matmul shape dependence in
the module notes above); the unfused paths keep strict per-platform
array-equality and the tests hold the mk chain to overwhelming
agreement instead.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..config import DecodeConfig, VoiceConfig
from ..models import t5gemma, voice
from ..ops import masks as mask_ops
from ..ops import rope as rope_ops
from . import engine

PyTree = Any

# draft_fn(last_hidden [B,1,D], cur_token [B], step scalar) -> [B, k] int32
DraftFn = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]


# ---------------------------------------------------------------------------
# draft sources
# ---------------------------------------------------------------------------


def init_mtp_heads(rng: jax.Array, cfg: VoiceConfig, k: int,
                   dtype=None) -> PyTree:
    """k lookahead heads; head j guesses the token j+1 steps ahead of the
    hidden state (trained with mtp_loss alongside or after the main model)."""
    d = cfg.backbone.decoder.hidden_size
    v = cfg.audio_embedding_vocab
    dtype = jnp.dtype(dtype or cfg.dtype)
    keys = jax.random.split(rng, 2 * k)
    heads = []
    for j in range(k):
        heads.append({
            "w1": (jax.random.normal(keys[2 * j], (d, d), jnp.float32)
                   * d ** -0.5).astype(dtype),
            "w2": (jax.random.normal(keys[2 * j + 1], (d, v), jnp.float32)
                   * d ** -0.5).astype(dtype),
        })
    return heads


def mtp_logits(heads: PyTree, hidden: jnp.ndarray) -> jnp.ndarray:
    """hidden [B, D] -> [B, k, V] lookahead logits (GELU MLP per head)."""
    outs = [jax.nn.gelu(hidden @ h["w1"], approximate=True) @ h["w2"]
            for h in heads]
    return jnp.stack(outs, axis=1).astype(jnp.float32)


def mtp_loss(heads: PyTree, hidden: jnp.ndarray, targets: jnp.ndarray,
             mask: jnp.ndarray) -> jnp.ndarray:
    """Training objective for the draft heads.

    hidden [B, T, D] (decoder states, stop-gradient recommended), targets
    [B, T] next-token labels, mask [B, T] valid positions. Head j is trained
    to predict targets shifted j+1 ahead.
    """
    total = jnp.float32(0.0)
    count = jnp.float32(0.0)
    k = len(heads)
    for j in range(k):
        sh = j + 1
        h = hidden[:, :-sh]
        t = targets[:, sh:]
        m = (mask[:, sh:] & mask[:, :-sh]).astype(jnp.float32)
        logits = jax.nn.gelu(h @ heads[j]["w1"], approximate=True) \
            @ heads[j]["w2"]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, t[..., None], axis=-1)[..., 0]
        total = total + jnp.sum(nll * m)
        count = count + jnp.sum(m)
    return total / jnp.maximum(count, 1.0)


def mtp_draft_fn(heads: PyTree) -> DraftFn:
    def draft(last_hidden, cur_token, step):
        del cur_token, step
        logits = mtp_logits(heads, last_hidden[:, 0])
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    return draft


def trace_draft_fn(trace: jnp.ndarray, k: int) -> DraftFn:
    """Oracle draft replaying ``trace`` [B, T]: position step+1+j proposes
    trace[:, step+1+j]. Corrupt the trace beforehand to dial acceptance."""
    b, t = trace.shape
    padded = jnp.pad(trace, ((0, 0), (0, k + 1)))

    def draft(last_hidden, cur_token, step):
        del last_hidden, cur_token
        idx = step + 1 + jnp.arange(k, dtype=jnp.int32)[None, :]
        idx = jnp.minimum(idx, t + k)
        return jnp.take_along_axis(padded, jnp.broadcast_to(idx, (b, k)),
                                   axis=1).astype(jnp.int32)

    return draft


# ---------------------------------------------------------------------------
# speculative loop
# ---------------------------------------------------------------------------


class SpecOutputs(NamedTuple):
    tokens: jnp.ndarray
    gen_lens: jnp.ndarray
    steps: jnp.ndarray       # generated tokens when the loop exited
    passes: jnp.ndarray      # decoder passes executed (speedup = steps/passes)


class _SpecState(NamedTuple):
    cache: t5gemma.DecoderCache
    last_hidden: jnp.ndarray
    tokens: jnp.ndarray
    step: jnp.ndarray
    current_length: jnp.ndarray
    prev_token: jnp.ndarray
    consec_silence: jnp.ndarray
    done: jnp.ndarray
    gen_lens: jnp.ndarray
    passes: jnp.ndarray
    # paged mode: (pending_k, pending_v, flush_start) — the previous pass's
    # chain K/V awaiting its step-indexed flush; () in dense mode
    aux: Any = ()


def decode_tokens_speculative(
    params: PyTree,
    cfg: VoiceConfig,
    dcfg: DecodeConfig,
    x: jnp.ndarray,
    x_lens: jnp.ndarray,
    prompt: jnp.ndarray,
    prompt_lens: jnp.ndarray,
    target_totals: jnp.ndarray,
    rng: jax.Array,
    draft_fn: DraftFn,
    k: int,
) -> SpecOutputs:
    """Speculative counterpart of ``engine.decode_tokens``.

    Emits a token stream ARRAY-EQUAL to the sequential engine's for the same
    inputs/rng; the draft only controls how many decoder passes that takes.
    Supports both KV-cache layouts: dense (per-row block writes) and paged
    (step-indexed multi-token pending flush via
    ``t5gemma.paged_decode_multi`` — NEXT_STEPS perf #2).
    """
    kv_mode = engine.resolve_kv_mode(cfg, dcfg, prompt.shape[1] + 1,
                                     dcfg.max_frames + k)
    dcfg = dataclasses.replace(dcfg, kv_cache=kv_mode)
    # paged_i8 runs the verify pass through the megakernel chain ONLY;
    # t5gemma.paged_decode_multi raises at trace time if the weights are
    # not fused-quantized or the TPU batch gate fails
    paged = kv_mode in ("paged", "paged_f8", "paged_i8")
    s = cfg.special
    eog = cfg.eog_inference
    dims = cfg.backbone.decoder
    compute_dtype = jnp.dtype(cfg.dtype)
    max_steps = dcfg.max_frames
    sr = int(cfg.encodec_sr)

    # cache_slack=k: a verify pass writes a (k+1)-token block whose tail may
    # extend past max_frames; slack keeps the dynamic_update_slice from
    # clamping back onto valid slots
    st0 = engine.prefill(params, cfg, dcfg, x, x_lens, prompt, prompt_lens,
                         target_totals, cache_slack=k)
    if paged:
        b0 = x.shape[0]
        aux0 = (
            jnp.zeros((dims.num_layers, b0, k + 1, dims.num_kv_heads,
                       dims.head_dim), jnp.bfloat16),
            jnp.zeros((dims.num_layers, b0, k + 1, dims.num_kv_heads,
                       dims.head_dim), jnp.bfloat16),
            jnp.int32(0),
        )
    else:
        aux0 = ()
    state = _SpecState(*st0, passes=jnp.int32(0), aux=aux0)

    prompt_offset = prompt_lens + 1
    est_total, time_budget, text_budget = engine.decode_budgets(
        cfg, x_lens, prompt_lens, target_totals)
    t_enc = x.shape[1]

    def guarded_token(logits, step, prev, consec, done):
        """sample + the engine body's force-stop rules at absolute ``step``."""
        token, argmax_tok = engine.sample_step_token(
            cfg, dcfg, logits, step, prev, consec, rng)
        return engine.apply_stop_rules(cfg, token, argmax_tok, step,
                                       text_budget, time_budget, max_steps)

    def chain_update(token, prev, consec, done):
        """prev-token / silence-counter / done bookkeeping for one emitted
        token (identical to the sequential body)."""
        newly = ~done
        now_done = done | (newly & (token == eog))
        consec = engine.silence_counter_update(dcfg, token, prev, consec)
        return token, consec, now_done

    def body(st: _SpecState) -> _SpecState:
        b = x.shape[0]

        # ---- current token (identical to the sequential body) -------------
        logits = voice.predict_head(params["head"], st.last_hidden)[:, 0]
        token = guarded_token(logits, st.step, st.prev_token,
                              st.consec_silence, st.done)
        newly_active = ~st.done
        tokens = st.tokens.at[:, st.step].set(
            jnp.where(newly_active, token, s.pad))
        gen_lens = jnp.where(newly_active & (token == eog), st.step + 1,
                             st.gen_lens)
        prev, consec, done = chain_update(
            token, st.prev_token, st.consec_silence, st.done)
        done0 = done

        # ---- draft + one (k+1)-token verify pass ---------------------------
        drafts = draft_fn(st.last_hidden, token, st.step)        # [B, k]
        seq = jnp.concatenate([token[:, None], drafts], axis=1)  # [B, k+1]
        emb = voice.embed_audio(params, seq).astype(compute_dtype)
        offs = jnp.arange(k + 1, dtype=jnp.int32)[None, :]
        abs_pos = st.current_length[:, None] + offs              # [B, k+1]
        if cfg.use_pm_rope:
            pos = rope_ops.decode_step_position(
                abs_pos, est_total[:, None], cfg.progress_scale)
        else:
            pos = abs_pos.astype(jnp.float32)
        if paged:
            pend_k, pend_v, flush_start = st.aux
            hidden, cache, chain_k, chain_v = t5gemma.paged_decode_multi(
                params["decoder"], dims,
                inputs_embeds=emb,
                position_ids=pos,
                pm_decoder_positions=pos if cfg.use_pm_rope else None,
                cache=st.cache,
                pending_k=pend_k, pending_v=pend_v,
                flush_start=flush_start,
                step=st.step,
                prompt_lengths=prompt_offset,
                enc_lengths=x_lens,
            )
            new_aux = (chain_k, chain_v, st.step)
        else:
            t_max = st.cache.self_k.shape[3]
            kk = jnp.arange(t_max)[None, None, :]
            ok_full = kk <= abs_pos[:, :, None]
            ok_slid = ok_full & (abs_pos[:, :, None] - dims.sliding_window < kk)
            bias_full = jnp.where(ok_full, 0.0, mask_ops.NEG_INF
                                  ).astype(jnp.float32)[:, None]
            bias_slid = jnp.where(ok_slid, 0.0, mask_ops.NEG_INF
                                  ).astype(jnp.float32)[:, None]
            hidden, cache = t5gemma.decoder_forward(
                params["decoder"], dims,
                inputs_embeds=emb,
                self_full_bias=bias_full,
                self_sliding_bias=bias_slid,
                cross_bias=mask_ops.cross_bias(x_lens, k + 1, t_enc),
                position_ids=pos,
                pm_decoder_positions=pos if cfg.use_pm_rope else None,
                cross_k=st.cache.cross_k, cross_v=st.cache.cross_v,
                cache=st.cache,
                cache_pos=st.current_length,
            )
            new_aux = ()

        # ---- evaluate targets along the draft chain ------------------------
        all_logits = voice.predict_head(params["head"], hidden)  # [B,k+1,V]
        emit = newly_active       # row still producing at chain position i
        n_acc = jnp.zeros((b,), jnp.int32)   # accepted drafts per row
        chain = []                           # per-i (token, prev, consec, done)
        for i in range(k):
            step_i = st.step + 1 + i
            t_i = guarded_token(all_logits[:, i], step_i, prev, consec, done)
            chain.append((t_i, prev, consec, done))
            match = (t_i == drafts[:, i]) & emit & ~done
            n_acc = n_acc + match.astype(jnp.int32)
            emit = match
            prev, consec, done = chain_update(t_i, prev, consec, done)

        # scalar advance: minimum acceptance over still-active rows (done
        # rows don't constrain; batch-1 realizes full per-row acceptance)
        m = jnp.min(jnp.where(done0, jnp.int32(k), n_acc))
        m = jnp.minimum(m, jnp.int32(max_steps) - 1 - st.step - 1)
        m = jnp.maximum(m, 0)

        # write the m accepted targets; roll the bookkeeping chain to i == m
        gl = gen_lens
        toks = tokens
        # chain state entering position 0 == state right after the current
        # token; rolled forward below only for the accepted positions
        cur_prev, cur_consec, cur_done = chain[0][1], chain[0][2], chain[0][3]
        for i in range(k):
            t_i, p_i, c_i, d_i = chain[i]
            use = jnp.int32(i) < m
            write = use & ~d_i
            toks = toks.at[:, st.step + 1 + i].set(
                jnp.where(write, t_i, toks[:, st.step + 1 + i]))
            gl = jnp.where(write & (t_i == eog), st.step + 2 + i, gl)
            nxt = chain_update(t_i, p_i, c_i, d_i)
            cur_prev = jnp.where(use, nxt[0], cur_prev)
            cur_consec = jnp.where(use, nxt[1], cur_consec)
            cur_done = jnp.where(use, nxt[2], cur_done)

        # current_length: +1 per processed position while the row stayed
        # active and the token was not EOG (sequential-engine semantics)
        adv = jnp.where(done0, 0, 1)
        run_done = done0
        for i in range(k):
            t_i, _, _, d_i = chain[i]
            use = (jnp.int32(i) < m) & ~d_i & ~run_done
            adv = adv + jnp.where(use & (t_i != eog), 1, 0)
            run_done = run_done | (use & (t_i == eog))
        current_length = st.current_length + adv

        last_hidden = jnp.take_along_axis(
            hidden, jnp.broadcast_to(m, (b,))[:, None, None], axis=1)

        return _SpecState(
            cache=cache,
            last_hidden=last_hidden.astype(compute_dtype),
            tokens=toks,
            step=st.step + 1 + m,
            current_length=current_length,
            prev_token=cur_prev,
            consec_silence=cur_consec,
            done=cur_done,
            gen_lens=gl,
            passes=st.passes + 1,
            aux=new_aux,
        )

    def cond(st: _SpecState):
        return (st.step < max_steps) & ~jnp.all(st.done)

    final = jax.lax.while_loop(cond, body, state)
    gen_lens = jnp.where(final.done, final.gen_lens, final.step)
    # prefill's cache_slack widens the token buffer; the emitted stream
    # never exceeds max_frames (m is clamped), so slice to the engine's shape
    return SpecOutputs(tokens=final.tokens[:, :max_steps], gen_lens=gen_lens,
                       steps=final.step, passes=final.passes)


@functools.lru_cache(maxsize=16)
def _compiled(cfg: VoiceConfig, dcfg: DecodeConfig, k: int):
    return jax.jit(
        functools.partial(decode_tokens_speculative, cfg=cfg, dcfg=dcfg, k=k),
        static_argnames=("draft_fn",),
    )


def jitted_speculative_decoder(cfg: VoiceConfig, dcfg: DecodeConfig, k: int):
    fn = _compiled(cfg, dcfg, k)

    def run(params, x, x_lens, prompt, prompt_lens, target_totals, rng,
            draft_fn):
        return fn(params, x=x, x_lens=x_lens, prompt=prompt,
                  prompt_lens=prompt_lens, target_totals=target_totals,
                  rng=rng, draft_fn=draft_fn)

    return run
