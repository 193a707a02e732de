"""Continuous batching: requests join a resident decode batch mid-flight.

The batching server (inference/server.py) groups requests per collection
window — a request arriving 10 ms after a batch launched waits for the
whole batch. Here a FIXED batch of B slots decodes continuously in bounded
segments; between segments finished rows are harvested and new requests
prefill into free slots, so the batch axis stays full under streaming
load. The reference has nothing comparable (batch-1 Gradio); this is the
vLLM-style serving shape, built TPU-natively:

- **Per-row step clocks.** The synchronized engine's scalar ``step``
  becomes a per-row vector; stop budgets, token writes, and PM positions
  all run off each row's own clock.
- **Per-slot RNG.** Each slot carries its own PRNG key, folded with the
  row's ABSOLUTE step (vmapped over rows), so a request's token stream is
  bit-identical no matter when it joined or what shares the batch —
  batch-position independence is pinned by tests.
- **Per-row-clock PAGED cache (default on TPU).** The windowed engine's
  paged identity-slab cache generalizes to per-row clocks: each row's
  pending K/V block scatters at its OWN slot and the flash kernels read
  each row's own generation length (models/t5gemma.py paged_decode_step
  ``gen_lengths``/``flush_positions``). This closes the continuous-vs-
  windowed throughput gap the dense fallback used to cost (VERDICT r2
  next-round #2). ``resolve_cache_mode`` picks: explicit dcfg.kv_cache
  wins; "auto" = paged on TPU when the buckets fit the sliding window,
  dense otherwise (the dense path remains for oversized buckets).
- **Admission = batch-1 prefill + row scatter.** engine.prefill runs on
  the new request alone (same text/prompt/frame buckets as the resident
  state) and its row is scattered into the slot: one compiled admit
  program per bucket config.

All shapes are fixed at construction (text/prompt/frame buckets), so the
segment, admit, and harvest programs compile once each.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import DecodeConfig, VoiceConfig
from ..models import t5gemma, voice
from ..ops import masks as mask_ops
from ..ops import rope as rope_ops
from . import engine

PyTree = Any


class SlotState(NamedTuple):
    """Resident decode batch (dense KV cache), B slots."""

    cache: t5gemma.DecoderCache
    last_hidden: jnp.ndarray        # [B, 1, D]
    tokens: jnp.ndarray             # [B, max_frames]
    steps: jnp.ndarray              # [B] per-row generated count
    current_length: jnp.ndarray     # [B] absolute length incl. BOS
    prev_token: jnp.ndarray         # [B]
    consec_silence: jnp.ndarray     # [B]
    active: jnp.ndarray             # [B] bool — slot holds a live request
    done: jnp.ndarray               # [B] bool — row finished (awaiting harvest)
    gen_lens: jnp.ndarray           # [B]
    rngs: jnp.ndarray               # [B, 2] uint32 per-slot PRNG keys
    x_lens: jnp.ndarray             # [B] per-row encoder lengths
    prompt_lens: jnp.ndarray        # [B] (excl. BOS)
    target_totals: jnp.ndarray      # [B]


def _raw_key(rng: jax.Array) -> jnp.ndarray:
    """Normalize a PRNG key to its raw [2] uint32 data (slot storage)."""
    if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key):
        rng = jax.random.key_data(rng)
    return jnp.asarray(rng, jnp.uint32)


def resolve_cache_mode(cfg: VoiceConfig, dcfg: DecodeConfig,
                       prompt_len: int) -> str:
    """Continuous-mode cache choice: explicit dcfg.kv_cache wins; "auto" is
    paged on TPU when the buckets fit the sliding window, dense otherwise."""
    dims = cfg.backbone.decoder
    total = (t5gemma._pad_to(prompt_len + 1, t5gemma.PAGE_SIZE)
             + t5gemma._pad_to(dcfg.max_frames, t5gemma.PAGE_SIZE))
    fits = total <= dims.sliding_window
    mode = dcfg.kv_cache
    if mode in ("paged", "paged_f8", "paged_i8"):
        if not fits:
            raise ValueError(
                f"continuous kv_cache={mode!r} needs prompt+gen ({total}) "
                f"<= sliding_window ({dims.sliding_window}); use 'dense'")
        return mode
    if mode == "auto" and jax.default_backend() == "tpu" and fits:
        return "paged"
    return "dense"


def init_slots(cfg: VoiceConfig, dcfg: DecodeConfig, batch: int,
               text_len: int, prompt_len: int) -> SlotState:
    """Empty resident state for the given bucket shapes."""
    from ..ops import paged_attn

    dims = cfg.backbone.decoder
    t_max = prompt_len + 1 + dcfg.max_frames
    compute_dtype = jnp.dtype(cfg.dtype)
    mode = resolve_cache_mode(cfg, dcfg, prompt_len)
    if mode != "dense":
        store = paged_attn.KV_STORE_DTYPES[
            {"paged_f8": "f8", "paged_i8": "i8"}.get(mode, "bf16")]
        cache = t5gemma.init_paged_cache(
            dims, batch, prompt_len + 1, dcfg.max_frames, text_len,
            store_dtype=store)
        return _empty_slots(cfg, dcfg, batch, cache, compute_dtype)
    return _empty_slots(
        cfg, dcfg, batch,
        t5gemma.init_cache(dims, batch, t_max, text_len,
                           dtype=compute_dtype),
        compute_dtype)


def _empty_slots(cfg, dcfg, batch, cache, compute_dtype) -> SlotState:
    dims = cfg.backbone.decoder
    return SlotState(
        cache=cache,
        last_hidden=jnp.zeros((batch, 1, dims.hidden_size), compute_dtype),
        tokens=jnp.full((batch, dcfg.max_frames), cfg.special.pad, jnp.int32),
        steps=jnp.zeros((batch,), jnp.int32),
        current_length=jnp.ones((batch,), jnp.int32),
        prev_token=jnp.full((batch,), -1, jnp.int32),
        consec_silence=jnp.zeros((batch,), jnp.int32),
        active=jnp.zeros((batch,), bool),
        done=jnp.zeros((batch,), bool),
        gen_lens=jnp.zeros((batch,), jnp.int32),
        rngs=jnp.zeros((batch, 2), jnp.uint32),
        x_lens=jnp.ones((batch,), jnp.int32),
        prompt_lens=jnp.zeros((batch,), jnp.int32),
        target_totals=jnp.ones((batch,), jnp.int32),
    )


def _admit_kv_mode(state: SlotState, dcfg: DecodeConfig) -> DecodeConfig:
    """Pin dcfg.kv_cache to the flavor the resident state was built with."""
    paged = isinstance(state.cache, t5gemma.PagedDecoderCache)
    if paged:
        kv_mode = {jnp.dtype(jnp.int8): "paged_i8"}.get(
            jnp.dtype(state.cache.gen_k.dtype), "paged")
        if state.cache.gen_k.dtype == jnp.float8_e4m3fn:
            kv_mode = "paged_f8"
        return dataclasses.replace(dcfg, kv_cache=kv_mode)
    return dataclasses.replace(dcfg, kv_cache="dense")


def admit(
    params: PyTree,
    cfg: VoiceConfig,
    dcfg: DecodeConfig,
    state: SlotState,
    slot: jnp.ndarray,              # scalar int32
    x: jnp.ndarray,                 # [tx] text ids (padded to the bucket)
    x_len: jnp.ndarray,             # scalar
    prompt: jnp.ndarray,            # [p_max]
    prompt_len: jnp.ndarray,        # scalar
    target_total: jnp.ndarray,      # scalar
    rng: jax.Array,                 # this request's own key
) -> SlotState:
    """Prefill ONE request and install it into ``slot``."""
    dcfg = _admit_kv_mode(state, dcfg)
    st1 = engine.prefill(params, cfg, dcfg, x[None], x_len[None],
                         prompt[None], prompt_len[None], target_total[None])
    return install_row(cfg, state, st1, slot, x_len, prompt_len,
                       target_total, rng)


def install_row(
    cfg: VoiceConfig,
    state: SlotState,
    st1: Any,                       # engine prefill state (batch 1)
    slot: jnp.ndarray,
    x_len: jnp.ndarray,
    prompt_len: jnp.ndarray,
    target_total: jnp.ndarray,
    rng: jax.Array,
) -> SlotState:
    """Scatter a batch-1 prefill result into resident ``slot``.

    Split out of :func:`admit` so it can compile as its OWN program: the
    combined prefill+scatter program failed terminal remote-compile at 128
    slots (HTTP 500, tpu_compile_helper exit 1 — NEXT_STEPS r3), while the
    two halves compile fine; the prefill half is also shared across slot
    counts."""
    paged = isinstance(state.cache, t5gemma.PagedDecoderCache)

    def put_row(buf, row, axis):
        # row has a leading length-1 batch dim at ``axis``
        start = [0] * buf.ndim
        start[axis] = slot
        return jax.lax.dynamic_update_slice(buf, row.astype(buf.dtype),
                                            tuple(start))

    if paged:
        dims = cfg.backbone.decoder
        n_layers = dims.num_layers
        batch = state.tokens.shape[0]
        rows = jnp.arange(n_layers) * batch + slot

        def put_slab(res, one):
            # res [Hkv, L*B, ...], one [Hkv, L*1, ...] (batch-1 prefill)
            if res is None:
                return None
            return res.at[:, rows].set(one.astype(res.dtype))

        c1 = st1.cache
        cache = state.cache._replace(
            prompt_k=put_slab(state.cache.prompt_k, c1.prompt_k),
            prompt_v=put_slab(state.cache.prompt_v, c1.prompt_v),
            cross_k=put_slab(state.cache.cross_k, c1.cross_k),
            cross_v=put_slab(state.cache.cross_v, c1.cross_v),
            prompt_k_scale=put_slab(state.cache.prompt_k_scale,
                                    c1.prompt_k_scale),
            prompt_v_scale=put_slab(state.cache.prompt_v_scale,
                                    c1.prompt_v_scale),
            cross_k_scale=put_slab(state.cache.cross_k_scale,
                                   c1.cross_k_scale),
            cross_v_scale=put_slab(state.cache.cross_v_scale,
                                   c1.cross_v_scale),
            pending_k=state.cache.pending_k.at[:, slot].set(
                c1.pending_k[:, 0].astype(state.cache.pending_k.dtype)),
            pending_v=state.cache.pending_v.at[:, slot].set(
                c1.pending_v[:, 0].astype(state.cache.pending_v.dtype)),
        )
    else:
        cache = t5gemma.DecoderCache(
            self_k=put_row(state.cache.self_k, st1.cache.self_k, 1),
            self_v=put_row(state.cache.self_v, st1.cache.self_v, 1),
            cross_k=put_row(state.cache.cross_k, st1.cache.cross_k, 1),
            cross_v=put_row(state.cache.cross_v, st1.cache.cross_v, 1),
        )

    def set1(vec, val, dtype=None):
        return vec.at[slot].set(val.astype(dtype or vec.dtype))

    return SlotState(
        cache=cache,
        last_hidden=put_row(state.last_hidden, st1.last_hidden, 0),
        tokens=put_row(state.tokens, st1.tokens, 0),
        steps=state.steps.at[slot].set(0),
        current_length=set1(state.current_length, st1.current_length[0]),
        prev_token=state.prev_token.at[slot].set(-1),
        consec_silence=state.consec_silence.at[slot].set(0),
        active=state.active.at[slot].set(True),
        done=state.done.at[slot].set(False),
        gen_lens=state.gen_lens.at[slot].set(0),
        rngs=put_row(state.rngs, _raw_key(rng)[None], 0),
        x_lens=set1(state.x_lens, x_len),
        prompt_lens=set1(state.prompt_lens, prompt_len),
        target_totals=set1(state.target_totals, target_total),
    )


def _sample_rows(cfg: VoiceConfig, dcfg: DecodeConfig, logits, steps,
                 prev_token, consec_silence, rngs):
    """Per-row guarded sampling: each row folds ITS OWN key with ITS OWN
    step, so a slot's stream is independent of everything else. The
    filtering math runs batched (engine.sample_step_token_rows); only the
    key fold + categorical draw are per-row."""
    return engine.sample_step_token_rows(cfg, dcfg, logits, steps,
                                         prev_token, consec_silence, rngs)


class SegmentFns(NamedTuple):
    admit: Any      # (state, slot, x, x_len, prompt, prompt_len, tgt, rng)
    segment: Any    # (state, n_steps scalar) -> state


def make_fns(cfg: VoiceConfig, dcfg: DecodeConfig) -> SegmentFns:
    """Jitted admit + segment programs (compiled per bucket config). The
    cache flavor (per-row-clock paged vs dense) is carried by the state the
    caller built with init_slots; body branches on it at trace time."""
    s = cfg.special
    eog = cfg.eog_inference
    dims = cfg.backbone.decoder
    compute_dtype = jnp.dtype(cfg.dtype)
    max_steps = dcfg.max_frames
    sr = int(cfg.encodec_sr)

    def body(params, st: SlotState) -> SlotState:
        b = st.tokens.shape[0]
        est_total, time_budget, text_budget = engine.decode_budgets(
            cfg, st.x_lens, st.prompt_lens, st.target_totals)

        logits = voice.predict_head(params["head"], st.last_hidden)[:, 0]
        token, argmax_tok = _sample_rows(
            cfg, dcfg, logits, st.steps, st.prev_token, st.consec_silence,
            st.rngs)
        token = engine.apply_stop_rules(cfg, token, argmax_tok, st.steps,
                                        text_budget, time_budget, max_steps)

        live = st.active & ~st.done
        write_tok = jnp.where(live, token, s.pad)
        tokens = st.tokens.at[jnp.arange(b), st.steps].set(
            jnp.where(live, write_tok, st.tokens[jnp.arange(b), st.steps]))
        now_done = st.done | (live & (token == eog))
        gen_lens = jnp.where(live & (token == eog), st.steps + 1, st.gen_lens)

        consec = engine.silence_counter_update(dcfg, token, st.prev_token,
                                               st.consec_silence)

        emb = voice.embed_audio(params, token[:, None]).astype(compute_dtype)
        if cfg.use_pm_rope:
            pos = rope_ops.decode_step_position(
                st.current_length, est_total, cfg.progress_scale)[:, None]
        else:
            pos = st.current_length.astype(jnp.float32)[:, None]
        if isinstance(st.cache, t5gemma.PagedDecoderCache):
            # per-row-clock paged step: each row flushes at its own slot
            # and attends over its own generation length
            hidden, cache = t5gemma.paged_decode_step(
                params["decoder"], dims,
                inputs_embeds=emb,
                position_ids=pos,
                pm_decoder_positions=pos if cfg.use_pm_rope else None,
                cache=st.cache,
                step=jnp.int32(0),  # unused with per-row clocks
                prompt_lengths=st.prompt_lens + 1,
                enc_lengths=st.x_lens,
                gen_lengths=st.steps,
                flush_positions=jnp.maximum(st.steps - 1, 0),
            )
        else:
            t_max = st.cache.self_k.shape[3]
            t_enc = st.cache.cross_k.shape[3]
            step_full = mask_ops.step_self_bias(st.current_length, t_max,
                                                window=None)
            step_slid = mask_ops.step_self_bias(
                st.current_length, t_max, window=dims.sliding_window)
            hidden, cache = t5gemma.decoder_forward(
                params["decoder"], dims,
                inputs_embeds=emb,
                self_full_bias=step_full,
                self_sliding_bias=step_slid,
                cross_bias=mask_ops.cross_bias(st.x_lens, 1, t_enc),
                position_ids=pos,
                pm_decoder_positions=pos if cfg.use_pm_rope else None,
                cross_k=st.cache.cross_k, cross_v=st.cache.cross_v,
                cache=st.cache,
                cache_pos=st.current_length,
            )
        return st._replace(
            cache=cache,
            last_hidden=hidden,
            tokens=tokens,
            steps=jnp.where(live, st.steps + 1, st.steps),
            current_length=jnp.where(live & ~now_done,
                                     st.current_length + 1,
                                     st.current_length),
            prev_token=jnp.where(live, token, st.prev_token),
            consec_silence=jnp.where(live, consec, st.consec_silence),
            done=now_done,
            gen_lens=gen_lens,
        )

    def segment(params, state: SlotState, n_steps: jnp.ndarray) -> SlotState:
        def cond(carry):
            k, st = carry
            return (k < n_steps) & jnp.any(st.active & ~st.done)

        def step(carry):
            k, st = carry
            return k + 1, body(params, st)

        _, out = jax.lax.while_loop(cond, step, (jnp.int32(0), state))
        return out

    # Admission runs as TWO chained programs — batch-1 prefill, then a
    # scatter-only install with the resident state donated. The single
    # fused admit program failed terminal remote-compile at 128 slots
    # (HTTP 500, tpu_compile_helper exit 1); the split halves compile at
    # every slot count, and the prefill program is shared with the
    # streaming engine (engine.jitted_segment_fns).
    inst = jax.jit(functools.partial(install_row, cfg), donate_argnums=(0,))

    def admit_fn(params, state, slot, x, x_len, prompt, prompt_len,
                 tgt, rng):
        d2 = _admit_kv_mode(state, dcfg)
        pf, _ = engine.jitted_segment_fns(cfg, d2)
        st1 = pf(params, x=x[None], x_lens=x_len[None], prompt=prompt[None],
                 prompt_lens=prompt_len[None], target_totals=tgt[None])
        return inst(state, st1, slot, x_len, prompt_len, tgt, rng)

    return SegmentFns(
        admit=admit_fn,
        segment=jax.jit(segment, donate_argnums=(1,)),
    )


def harvest(state: SlotState) -> Tuple[SlotState, List[Tuple[int, Any]]]:
    """Host-side: collect finished rows -> [(slot, tokens np)], free slots."""
    import numpy as np

    active = np.asarray(state.active)
    done = np.asarray(state.done)
    ready = np.nonzero(active & done)[0]
    out = []
    if len(ready):
        toks = np.asarray(state.tokens[ready])
        lens = np.asarray(state.gen_lens[ready])
        for row, t, n in zip(ready, toks, lens):
            out.append((int(row), t[: int(n)]))
        state = state._replace(
            active=state.active.at[jnp.asarray(ready)].set(False))
    return state, out
