"""Candidate-set sampling vs exact full-vocab path: survivor-set equality.

The decode engine filters within the raw top-(k+2) candidates after applying
the stop-rule adjustments; the claim (see engine body) is that this equals
the reference's adjust-then-filter over the full vocabulary. Verify on random
logits, including EOG suppression and the silence-repetition penalty.
"""

import numpy as np
import jax
import jax.numpy as jnp

from t5gemma_tts_tpu.config import DecodeConfig, tiny_voice_config
from t5gemma_tts_tpu.decode.engine import _adjust_logits
from t5gemma_tts_tpu.ops import sampling
from t5gemma_tts_tpu.ops.masks import NEG_INF


def _candidate_survivors(cfg, dcfg, logits, step, prev_token, consec):
    """Mirror the engine's candidate block; returns (survivor_sets, argmax)."""
    eog = cfg.eog_inference
    sr_fifth = int(cfg.encodec_sr) // 5
    kk = min(dcfg.top_k + 2, logits.shape[-1])
    vals, idx = jax.lax.top_k(logits, kk)
    vals = vals.astype(jnp.float32)
    is_eog = idx == eog
    vals = jnp.where(is_eog & (step <= sr_fifth), -10000.0, vals)
    vals = jnp.where(is_eog & (step == 0), -1e9, vals)
    if dcfg.stop_repetition > 0 and dcfg.silence_tokens:
        silence_arr = jnp.asarray(dcfg.silence_tokens)
        prev_is_sil = jnp.any(prev_token[:, None] == silence_arr[None, :], axis=1)
        active = prev_is_sil & (consec > dcfg.stop_repetition)
        factor = (consec - (dcfg.stop_repetition - 1)).astype(jnp.float32)
        at_prev = idx == prev_token[:, None]
        pen = jnp.where(vals < 0, vals * factor[:, None],
                        vals / jnp.maximum(factor, 1.0)[:, None])
        vals = jnp.where(at_prev & active[:, None], pen, vals)

    b_idx = jnp.arange(vals.shape[0])
    argmax_tok = np.asarray(idx[b_idx, jnp.argmax(vals, axis=-1)])

    # replicate sample_from_candidates' filtering, collect survivor ids
    v = vals / dcfg.temperature
    order = jnp.argsort(v, axis=-1)[..., ::-1]
    v = jnp.take_along_axis(v, order, axis=-1)
    ids = jnp.take_along_axis(idx, order, axis=-1)
    kept = jnp.where(v < v[..., dcfg.top_k - 1:dcfg.top_k], NEG_INF, v)
    if dcfg.top_p < 1.0:
        cum = jnp.cumsum(jax.nn.softmax(kept, axis=-1), axis=-1)
        rm = cum > dcfg.top_p
        rm = jnp.concatenate([jnp.zeros_like(rm[..., :1]), rm[..., :-1]], -1)
        kept = jnp.where(rm, NEG_INF, kept)
    out = []
    for b in range(logits.shape[0]):
        surv = set(np.asarray(ids[b])[np.asarray(kept[b]) > NEG_INF / 2].tolist())
        out.append(surv)
    return out, argmax_tok


def test_candidate_filter_matches_exact_path():
    cfg = tiny_voice_config()
    rng = np.random.default_rng(0)
    v = cfg.audio_embedding_vocab
    for trial in range(8):
        dcfg = DecodeConfig(
            top_k=int(rng.integers(2, 12)),
            top_p=float(rng.choice([1.0, 0.9, 0.7])),
            temperature=float(rng.choice([1.0, 0.8])),
            stop_repetition=3,
            silence_tokens=(5, 9),
        )
        logits = jnp.asarray(rng.normal(size=(3, v)).astype(np.float32) * 2)
        step = jnp.int32(int(rng.integers(0, 20)))
        prev = jnp.asarray(rng.choice([5, 9, 17], size=3).astype(np.int32))
        consec = jnp.asarray(rng.integers(0, 8, size=3).astype(np.int32))

        # exact path: full-vocab adjust then filter
        adjusted = _adjust_logits(cfg, dcfg, logits, step, prev, consec)
        exact = sampling.filter_logits(
            adjusted / dcfg.temperature, top_k=dcfg.top_k, top_p=dcfg.top_p
        )
        exact_sets = [
            set(np.flatnonzero(np.asarray(exact[b]) > NEG_INF / 2).tolist())
            for b in range(3)
        ]
        exact_argmax = np.asarray(jnp.argmax(adjusted, axis=-1))

        cand_sets, cand_argmax = _candidate_survivors(
            cfg, dcfg, logits, step, prev, consec
        )
        for b in range(3):
            assert cand_sets[b] == exact_sets[b], (
                f"trial {trial} row {b}: {cand_sets[b]} != {exact_sets[b]}"
            )
        np.testing.assert_array_equal(cand_argmax, exact_argmax)


def test_rows_sampler_bit_identical_to_batch1():
    """sample_step_token_rows (continuous batching: batched filtering,
    per-row keys/clocks) must produce EXACTLY what a batch-1
    sample_step_token call with that row's key and step produces."""
    from t5gemma_tts_tpu.decode.engine import (
        sample_step_token, sample_step_token_rows,
    )

    cfg = tiny_voice_config()
    rng = np.random.default_rng(7)
    v = cfg.audio_embedding_vocab
    dcfg = DecodeConfig(top_k=8, top_p=0.9, temperature=0.8,
                        stop_repetition=3, silence_tokens=(5, 9),
                        approx_top_k=False)
    b = 5
    logits = jnp.asarray(rng.normal(size=(b, v)).astype(np.float32) * 2)
    steps = jnp.asarray(rng.integers(0, 25, size=b).astype(np.int32))
    prev = jnp.asarray(rng.choice([5, 9, 17], size=b).astype(np.int32))
    consec = jnp.asarray(rng.integers(0, 8, size=b).astype(np.int32))
    raw_keys = jnp.asarray(
        rng.integers(0, 2**32, size=(b, 2), dtype=np.uint32))

    tok, am = sample_step_token_rows(cfg, dcfg, logits, steps, prev,
                                     consec, raw_keys)
    for r in range(b):
        t1, a1 = sample_step_token(
            cfg, dcfg, logits[r:r + 1], steps[r], prev[r:r + 1],
            consec[r:r + 1], raw_keys[r])
        assert int(tok[r]) == int(t1[0]), f"row {r} token mismatch"
        assert int(am[r]) == int(a1[0]), f"row {r} argmax mismatch"
