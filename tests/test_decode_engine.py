"""Decode-engine tests: the jitted while_loop+KV-cache path must reproduce a
slow no-cache full-recompute greedy decode, and honor the stop rules."""

import numpy as np
import jax
import jax.numpy as jnp

from t5gemma_tts_tpu.config import DecodeConfig, tiny_voice_config
from t5gemma_tts_tpu.decode import engine
from t5gemma_tts_tpu.models import t5gemma, voice
from t5gemma_tts_tpu.ops import masks as mask_ops


def _setup(b=2, tx=6, p_max=4, seed=0):
    cfg = tiny_voice_config(extra_cutoff=0.0)
    params = voice.init_params(jax.random.PRNGKey(seed), cfg)
    rng = np.random.default_rng(seed)
    x = rng.integers(3, cfg.text_vocab_size, (b, tx)).astype(np.int32)
    x_lens = np.array([tx, tx - 2], np.int32)[:b]
    prompt = rng.integers(0, cfg.audio_vocab_size, (b, p_max)).astype(np.int32)
    prompt_lens = np.array([3, 1], np.int32)[:b]
    for i in range(b):
        prompt[i, prompt_lens[i]:] = cfg.special.pad
    return cfg, params, x, x_lens, prompt, prompt_lens


def _greedy_oracle(cfg, dcfg, params, x, x_lens, prompt, prompt_lens,
                   target_totals):
    """Slow reference decode: recompute the full decoder stack each step,
    no KV cache, argmax sampling (top_k=1)."""
    s = cfg.special
    eog = cfg.eog_inference
    dims = cfg.backbone.decoder
    b = x.shape[0]
    memory, enc_pos = voice.encode_text(
        params, cfg, jnp.asarray(x), jnp.asarray(x_lens)
    )
    cross_k, cross_v = t5gemma.build_cross_kv(
        params["decoder"], dims, memory, enc_pos
    )
    est_total = np.maximum(target_totals + 1, prompt_lens + 1)
    seqs = [[s.empty] + list(prompt[i, :prompt_lens[i]]) for i in range(b)]
    gen = [[] for _ in range(b)]
    done = [False] * b
    sr = int(cfg.encodec_sr)
    for step in range(dcfg.max_frames):
        if all(done):
            break
        t = max(len(q) for q in seqs)
        lens = np.array([len(q) for q in seqs], np.int32)
        ids = np.full((b, t), s.pad, np.int32)
        for i, q in enumerate(seqs):
            ids[i, :len(q)] = q
        if cfg.use_pm_rope:
            pos = (
                np.arange(t, dtype=np.float32)[None]
                / np.maximum(1, est_total - 1)[:, None]
                * cfg.progress_scale
            )
            # clamp generated-region positions like the engine's step path
            clamped = np.minimum(pos, cfg.progress_scale)
            for i in range(b):
                pos[i, prompt_lens[i] + 1:] = clamped[i, prompt_lens[i] + 1:]
        else:
            pos = np.broadcast_to(
                np.arange(t, dtype=np.float32)[None], (b, t)
            ).copy()
        emb = voice.embed_audio(params, jnp.asarray(ids))
        hidden, _ = t5gemma.decoder_forward(
            params["decoder"], dims,
            inputs_embeds=emb,
            self_full_bias=mask_ops.decoder_self_bias(jnp.asarray(lens), t),
            self_sliding_bias=mask_ops.decoder_sliding_bias(
                jnp.asarray(lens), t, dims.sliding_window
            ),
            cross_bias=mask_ops.cross_bias(jnp.asarray(x_lens), t, x.shape[1]),
            position_ids=jnp.asarray(pos),
            pm_decoder_positions=jnp.asarray(pos) if cfg.use_pm_rope else None,
            cross_k=cross_k, cross_v=cross_v,
        )
        last = np.asarray(
            jnp.take_along_axis(hidden, jnp.asarray(lens - 1)[:, None, None], 1)
        )[:, 0]
        logits = np.asarray(
            voice.predict_head(params["head"], jnp.asarray(last))
        ).astype(np.float64)
        for i in range(b):
            if done[i]:
                continue
            row = logits[i].copy()
            if step <= sr // 5:
                row[eog] = -10000.0
            if step == 0:
                row[eog] = -1e9
            tok = int(np.argmax(row))
            budget = target_totals[i] - (prompt_lens[i] + 1) + int(
                sr * cfg.extra_cutoff
            )
            force = tok == eog or step > budget or step >= dcfg.max_frames - 1
            if force:
                tok = eog
            gen[i].append(tok)
            if tok == eog:
                done[i] = True
            else:
                seqs[i].append(tok)
    return gen


def test_cached_decode_matches_greedy_oracle():
    cfg, params, x, x_lens, prompt, prompt_lens = _setup()
    target_totals = prompt_lens + np.array([8, 5], np.int32)
    dcfg = DecodeConfig(top_k=1, top_p=1.0, temperature=1.0, max_frames=16)
    out = engine.decode_tokens(
        params, cfg, dcfg,
        jnp.asarray(x), jnp.asarray(x_lens),
        jnp.asarray(prompt), jnp.asarray(prompt_lens),
        jnp.asarray(target_totals), jax.random.PRNGKey(1),
    )
    oracle = _greedy_oracle(cfg, dcfg, params, x, x_lens, prompt,
                            prompt_lens, target_totals)
    toks = np.asarray(out.tokens)
    lens = np.asarray(out.gen_lens)
    for i in range(x.shape[0]):
        got = list(toks[i, :lens[i]])
        assert got == oracle[i], f"row {i}: {got} != {oracle[i]}"
        assert got[-1] == cfg.eog_inference


def test_cached_decode_matches_oracle_pm_rope_off():
    cfg = tiny_voice_config(extra_cutoff=0.0, use_pm_rope=False)
    params = voice.init_params(jax.random.PRNGKey(7), cfg)
    rng = np.random.default_rng(7)
    b, tx, p_max = 2, 6, 4
    x = rng.integers(3, cfg.text_vocab_size, (b, tx)).astype(np.int32)
    x_lens = np.array([tx, tx - 2], np.int32)
    prompt = rng.integers(0, cfg.audio_vocab_size, (b, p_max)).astype(np.int32)
    prompt_lens = np.array([3, 1], np.int32)
    for i in range(b):
        prompt[i, prompt_lens[i]:] = cfg.special.pad
    target_totals = prompt_lens + np.array([7, 5], np.int32)
    dcfg = DecodeConfig(top_k=1, top_p=1.0, temperature=1.0, max_frames=16)
    out = engine.decode_tokens(
        params, cfg, dcfg,
        jnp.asarray(x), jnp.asarray(x_lens),
        jnp.asarray(prompt), jnp.asarray(prompt_lens),
        jnp.asarray(target_totals), jax.random.PRNGKey(1),
    )
    oracle = _greedy_oracle(cfg, dcfg, params, x, x_lens, prompt,
                            prompt_lens, target_totals)
    toks = np.asarray(out.tokens)
    lens = np.asarray(out.gen_lens)
    for i in range(b):
        got = list(toks[i, :lens[i]])
        assert got == oracle[i], f"row {i}: {got} != {oracle[i]}"


def test_decode_is_deterministic_and_jittable():
    cfg, params, x, x_lens, prompt, prompt_lens = _setup(seed=3)
    target_totals = prompt_lens + np.array([10, 6], np.int32)
    dcfg = DecodeConfig(top_k=8, top_p=0.9, temperature=0.8, max_frames=20)
    run = engine.jitted_decoder(cfg, dcfg)
    args = (
        jnp.asarray(x), jnp.asarray(x_lens), jnp.asarray(prompt),
        jnp.asarray(prompt_lens), jnp.asarray(target_totals),
    )
    o1 = run(params, *args, jax.random.PRNGKey(7))
    o2 = run(params, *args, jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(o1.tokens), np.asarray(o2.tokens))
    np.testing.assert_array_equal(np.asarray(o1.gen_lens), np.asarray(o2.gen_lens))
    # every row terminates with EOG within the buffer
    lens = np.asarray(o1.gen_lens)
    toks = np.asarray(o1.tokens)
    for i in range(toks.shape[0]):
        assert 0 < lens[i] <= dcfg.max_frames
        assert toks[i, lens[i] - 1] == cfg.eog_inference


def test_first_token_never_eog():
    cfg, params, x, x_lens, prompt, prompt_lens = _setup(seed=5)
    target_totals = prompt_lens + np.array([4, 4], np.int32)
    dcfg = DecodeConfig(top_k=1, temperature=1.0, max_frames=8)
    out = engine.decode_tokens(
        params, cfg, dcfg,
        jnp.asarray(x), jnp.asarray(x_lens),
        jnp.asarray(prompt), jnp.asarray(prompt_lens),
        jnp.asarray(target_totals), jax.random.PRNGKey(0),
    )
    toks = np.asarray(out.tokens)
    assert (toks[:, 0] != cfg.eog_inference).all()


def test_fused_params_match_unfused():
    """fuse_for_decode (qkv/gate_up concat) must not change greedy traces."""
    cfg, params, x, x_lens, prompt, prompt_lens = _setup(seed=11)
    target_totals = prompt_lens + np.array([8, 6], np.int32)
    dcfg = DecodeConfig(top_k=1, top_p=1.0, temperature=1.0, max_frames=16)
    args = (jnp.asarray(x), jnp.asarray(x_lens), jnp.asarray(prompt),
            jnp.asarray(prompt_lens), jnp.asarray(target_totals),
            jax.random.PRNGKey(0))
    out_a = engine.decode_tokens(params, cfg, dcfg, *args)
    fused = t5gemma.fuse_for_decode(params)
    out_b = engine.decode_tokens(fused, cfg, dcfg, *args)
    np.testing.assert_array_equal(np.asarray(out_a.tokens),
                                  np.asarray(out_b.tokens))


def test_randomized_oracle_sweep():
    """Randomized shapes/prompts/seeds: cached engine == no-cache oracle."""
    rng = np.random.default_rng(123)
    for trial in range(3):
        cfg = tiny_voice_config(extra_cutoff=0.0)
        params = voice.init_params(jax.random.PRNGKey(100 + trial), cfg)
        b = int(rng.integers(1, 4))
        tx = int(rng.integers(3, 9))
        p_max = int(rng.integers(2, 6))
        x = rng.integers(3, cfg.text_vocab_size, (b, tx)).astype(np.int32)
        x_lens = rng.integers(2, tx + 1, b).astype(np.int32)
        prompt = rng.integers(0, cfg.audio_vocab_size, (b, p_max)).astype(np.int32)
        prompt_lens = rng.integers(0, p_max + 1, b).astype(np.int32)
        for i in range(b):
            prompt[i, prompt_lens[i]:] = cfg.special.pad
        target_totals = (prompt_lens
                         + rng.integers(3, 10, b)).astype(np.int32)
        dcfg = DecodeConfig(top_k=1, top_p=1.0, temperature=1.0, max_frames=20)
        out = engine.decode_tokens(
            params, cfg, dcfg,
            jnp.asarray(x), jnp.asarray(x_lens),
            jnp.asarray(prompt), jnp.asarray(prompt_lens),
            jnp.asarray(target_totals), jax.random.PRNGKey(trial),
        )
        oracle = _greedy_oracle(cfg, dcfg, params, x, x_lens, prompt,
                                prompt_lens, target_totals)
        toks = np.asarray(out.tokens)
        lens = np.asarray(out.gen_lens)
        for i in range(b):
            got = list(toks[i, :lens[i]])
            assert got == oracle[i], (
                f"trial {trial} row {i} (p={prompt_lens[i]}, "
                f"tt={target_totals[i]}): {got} != {oracle[i]}"
            )



def test_segmented_decode_matches_full():
    """prefill + run_segment slices == one-shot decode_tokens."""
    cfg, params, x, x_lens, prompt, prompt_lens = _setup(seed=9)
    target_totals = prompt_lens + np.array([10, 7], np.int32)
    dcfg = DecodeConfig(top_k=4, top_p=0.9, temperature=0.8, max_frames=20)
    rng = jax.random.PRNGKey(5)
    args = (jnp.asarray(x), jnp.asarray(x_lens), jnp.asarray(prompt),
            jnp.asarray(prompt_lens), jnp.asarray(target_totals))

    full = engine.decode_tokens(params, cfg, dcfg, *args, rng)

    state = engine.prefill(params, cfg, dcfg, *args)
    for until in (5, 11, 20):
        state = engine.run_segment(
            params, cfg, dcfg, state, jnp.asarray(x_lens),
            jnp.asarray(prompt_lens), jnp.asarray(target_totals), rng,
            jnp.int32(until),
        )
    np.testing.assert_array_equal(np.asarray(full.tokens),
                                  np.asarray(state.tokens))
    gen_lens = np.where(np.asarray(state.done), np.asarray(state.gen_lens),
                        int(state.step))
    np.testing.assert_array_equal(np.asarray(full.gen_lens), gen_lens)
