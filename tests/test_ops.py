"""Unit tests for mask / rope / sampling primitives against numpy oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from t5gemma_tts_tpu.ops import masks, rope, sampling


# ---------------------------------------------------------------------------
# masks
# ---------------------------------------------------------------------------


def test_pad_mask():
    lens = jnp.array([3, 1, 5])
    m = masks.pad_mask(lens, 5)
    exp = np.array(
        [
            [0, 0, 0, 1, 1],
            [0, 1, 1, 1, 1],
            [0, 0, 0, 0, 0],
        ],
        dtype=bool,
    )
    np.testing.assert_array_equal(np.asarray(m), exp)


def test_decoder_self_bias_causal_and_pad():
    lens = jnp.array([3])
    b = np.asarray(masks.decoder_self_bias(lens, 4))[0, 0]
    allowed = b == 0.0
    exp = np.array(
        [
            [1, 0, 0, 0],
            [1, 1, 0, 0],
            [1, 1, 1, 0],
            [1, 1, 1, 0],  # key col 3 is padding
        ],
        dtype=bool,
    )
    np.testing.assert_array_equal(allowed, exp)


def test_sliding_biases():
    lens = jnp.array([6])
    w = 2
    enc = np.asarray(masks.encoder_sliding_bias(lens, 6, w))[0, 0] == 0.0
    dec = np.asarray(masks.decoder_sliding_bias(lens, 6, w))[0, 0] == 0.0
    q = np.arange(6)[:, None]
    k = np.arange(6)[None, :]
    np.testing.assert_array_equal(enc, (np.abs(q - k) < w))
    np.testing.assert_array_equal(dec, (k <= q) & (q - w < k))


def test_step_self_bias():
    pos = jnp.array([2, 5])
    b = np.asarray(masks.step_self_bias(pos, 8, window=3))
    assert b.shape == (2, 1, 1, 8)
    row0 = b[0, 0, 0] == 0.0
    # q=2, window=3: keys {0,1,2}
    np.testing.assert_array_equal(row0, np.array([1, 1, 1, 0, 0, 0, 0, 0], bool))
    row1 = b[1, 0, 0] == 0.0
    # q=5, window=3: keys {3,4,5}
    np.testing.assert_array_equal(row1, np.array([0, 0, 0, 1, 1, 1, 0, 0], bool))


# ---------------------------------------------------------------------------
# rope / PM positions
# ---------------------------------------------------------------------------


def test_progress_position_ids_matches_reference_formula():
    # reference models/t5gemma.py:609-624: pos/(clamp(len,2)-1)*scale, masked
    lens = jnp.array([5, 1, 2])
    scale = 2000.0
    ids = np.asarray(rope.progress_position_ids(lens, 5, scale))
    exp0 = np.arange(5) / 4.0 * scale
    np.testing.assert_allclose(ids[0], exp0, rtol=1e-6)
    # len=1: denominator clamped to 1 (=2-1), but positions >= len zeroed
    np.testing.assert_allclose(ids[1], np.zeros(5))
    np.testing.assert_allclose(ids[2], [0.0, scale, 0, 0, 0], rtol=1e-6)


def test_rope_float_positions_match_integer_grid():
    # float positions at integer values must reproduce integer RoPE
    hd, theta = 16, 10000.0
    pos_f = jnp.array([[0.0, 1.0, 2.0]])
    pos_i = jnp.array([[0, 1, 2]])
    cf, sf = rope.rope_cos_sin(pos_f, hd, theta)
    ci, si = rope.rope_cos_sin(pos_i, hd, theta)
    np.testing.assert_allclose(np.asarray(cf), np.asarray(ci), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sf), np.asarray(si), atol=1e-6)


def test_apply_rope_norm_preserving():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 4, 6, 16)).astype(np.float32))
    pos = jnp.asarray(rng.uniform(0, 2000, size=(2, 6)).astype(np.float32))
    cos, sin = rope.rope_cos_sin(pos, 16, 10000.0)
    y = rope.apply_rope(x, cos, sin)
    # rotation preserves the norm of each (pair) subspace
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(y), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1),
        rtol=1e-4,
    )


def test_decode_step_position_clamped():
    v = rope.decode_step_position(jnp.array([10]), jnp.array([5]), 2000.0)
    assert float(v[0]) == 2000.0
    v = rope.decode_step_position(jnp.array([2]), jnp.array([5]), 2000.0)
    np.testing.assert_allclose(float(v[0]), 2.0 / 4.0 * 2000.0)


# ---------------------------------------------------------------------------
# sampling — numpy oracle implementing the reference spec
# ---------------------------------------------------------------------------


def _softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def oracle_filter(logits, top_k=0, top_p=1.0, min_p=0.0, mtk=1):
    """Independent numpy oracle of reference models/utils.py:53-111."""
    logits = logits.copy().astype(np.float64)
    NEG = -np.inf
    if 0.0 < min_p < 1.0:
        probs = _softmax(logits)
        remove = probs < min_p
        if np.all(remove.sum(-1) < logits.shape[-1]):
            logits[remove] = NEG
            top_k, top_p = 0, 1.0
    if top_k and top_k > 0:
        k = min(max(top_k, mtk), logits.shape[-1])
        thresh = np.sort(logits, axis=-1)[..., -k][..., None]
        logits[logits < thresh] = NEG
    if top_p < 1.0:
        order = np.argsort(-logits, axis=-1, kind="stable")
        srt = np.take_along_axis(logits, order, -1)
        cum = np.cumsum(_softmax(srt), -1)
        rm = cum > top_p
        if mtk > 1:
            rm[..., :mtk] = False
        rm[..., 1:] = rm[..., :-1].copy()
        rm[..., 0] = False
        remove = np.zeros_like(rm)
        np.put_along_axis(remove, order, rm, -1)
        logits[remove] = NEG
    return logits


def _survivors(x):
    return np.asarray(x) > masks.NEG_INF / 2


@pytest.mark.parametrize(
    "top_k,top_p,min_p",
    [
        (0, 1.0, 0.0),
        (5, 1.0, 0.0),
        (30, 0.9, 0.0),
        (0, 0.5, 0.0),
        (0, 1.0, 0.05),
        (10, 0.8, 0.02),
        (3, 0.99, 0.0),
    ],
)
def test_filter_logits_matches_oracle(top_k, top_p, min_p):
    rng = np.random.default_rng(42)
    logits = rng.normal(size=(4, 97)).astype(np.float32) * 3
    got = sampling.filter_logits(jnp.asarray(logits), top_k, top_p, min_p)
    exp = oracle_filter(logits, top_k, top_p, min_p)
    np.testing.assert_array_equal(_survivors(got), np.isfinite(exp))
    # surviving logits unchanged
    surv = np.isfinite(exp)
    np.testing.assert_allclose(np.asarray(got)[surv], logits[surv], rtol=1e-6)


@pytest.mark.parametrize("top_p", [1.0, 0.9])
def test_fast_path_matches_exact(top_p):
    rng = np.random.default_rng(7)
    logits = jnp.asarray(rng.normal(size=(3, 211)).astype(np.float32) * 4)
    key = jax.random.PRNGKey(0)
    temp = 0.8
    exact = sampling.filter_logits(logits / temp, top_k=12, top_p=top_p)
    # fast path must sample only from the exact survivor set
    draws = []
    for i in range(64):
        tok = sampling.sample_topk_fast(
            jax.random.fold_in(key, i), logits, top_k=12,
            top_p=top_p, temperature=temp,
        )
        draws.append(np.asarray(tok))
    surv = _survivors(exact)
    for d in draws:
        for b in range(3):
            assert surv[b, d[b]], f"sampled non-survivor token {d[b]} in row {b}"


def test_sample_distribution_roughly_matches():
    # with top_k=2 over a peaked distribution, check empirical frequencies
    logits = jnp.asarray(np.array([[2.0, 1.0, -5.0, -5.0]], np.float32))
    key = jax.random.PRNGKey(3)
    toks = jax.vmap(
        lambda k: sampling.sample(k, logits, top_k=2, top_p=1.0, temperature=1.0)
    )(jax.random.split(key, 2000))
    toks = np.asarray(toks).ravel()
    assert set(np.unique(toks)) <= {0, 1}
    p0 = (toks == 0).mean()
    exp_p0 = np.exp(2.0) / (np.exp(2.0) + np.exp(1.0))
    assert abs(p0 - exp_p0) < 0.05


def test_greedy():
    logits = jnp.asarray(np.array([[0.1, 5.0, -1.0], [9.0, 0.0, 0.0]], np.float32))
    np.testing.assert_array_equal(np.asarray(sampling.greedy(logits)), [1, 0])
