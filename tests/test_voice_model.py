"""Voice-model tests: decoder-input prep and loss vs torch CE oracle."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from t5gemma_tts_tpu.config import tiny_voice_config
from t5gemma_tts_tpu.models import voice


def test_prepare_decoder_io():
    cfg = tiny_voice_config()
    s = cfg.special
    y = jnp.asarray(np.array([[5, 6, 7, s.pad], [9, s.pad, s.pad, s.pad]], np.int32))
    y_lens = jnp.asarray(np.array([3, 1], np.int32))
    targets, dec_in, new_lens = voice.prepare_decoder_io(cfg, y, y_lens)
    eos = cfg.eog_inference
    np.testing.assert_array_equal(np.asarray(new_lens), [4, 2])
    np.testing.assert_array_equal(
        np.asarray(targets),
        [[5, 6, 7, eos, s.pad], [9, eos, s.pad, s.pad, s.pad]],
    )
    np.testing.assert_array_equal(
        np.asarray(dec_in),
        [[s.empty, 5, 6, 7, s.pad], [s.empty, 9, s.pad, s.pad, s.pad]],
    )


def test_token_loss_matches_torch_cross_entropy():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    cfg = tiny_voice_config(eog_weight=3.0)
    s = cfg.special
    va = cfg.audio_embedding_vocab
    rng = np.random.default_rng(0)
    b, t = 2, 7
    logits = rng.normal(size=(b, t, va)).astype(np.float32)
    targets = rng.integers(0, cfg.audio_vocab_size, size=(b, t)).astype(np.int32)
    targets[0, 2] = s.y_sep          # ignored in CE, counted in ntokens
    targets[0, 5] = s.eog            # weighted
    new_lens = np.array([6, 4], np.int32)
    sep_pos = np.array([2, 0], np.int32)

    out = voice.token_loss(
        cfg, jnp.asarray(logits), jnp.asarray(targets),
        jnp.asarray(new_lens), jnp.asarray(sep_pos),
    )

    # torch oracle following reference models/t5gemma.py:758-825
    w = torch.ones(va)
    w[s.eog] = 3.0
    pieces_l, pieces_t = [], []
    for i in range(b):
        pieces_l.append(torch.tensor(logits[i, sep_pos[i]:new_lens[i]]))
        pieces_t.append(torch.tensor(targets[i, sep_pos[i]:new_lens[i]], dtype=torch.long))
    cat_l = torch.cat(pieces_l)
    cat_t = torch.cat(pieces_t)
    ref_mean = F.cross_entropy(cat_l, cat_t, weight=w, ignore_index=s.y_sep)
    ntok = cat_t.numel()
    ref_loss = ref_mean.item() * ntok

    np.testing.assert_allclose(float(out.mean_ce), ref_mean.item(), rtol=1e-5)
    np.testing.assert_allclose(float(out.loss), ref_loss, rtol=1e-5)
    assert int(out.effective_ntokens) == ntok
    topk = torch.topk(cat_l, 10, dim=-1).indices
    ref_top10 = (topk == cat_t[:, None]).any(-1).sum().item()
    assert int(out.top10acc) == ref_top10


def test_forward_smoke_and_grads():
    cfg = tiny_voice_config()
    params = voice.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    b, tx, ty = 2, 6, 10
    batch = {
        "x": jnp.asarray(rng.integers(3, cfg.text_vocab_size, (b, tx)).astype(np.int32)),
        "x_lens": jnp.asarray(np.array([6, 4], np.int32)),
        "y": jnp.asarray(rng.integers(0, cfg.audio_vocab_size, (b, ty)).astype(np.int32)),
        "y_lens": jnp.asarray(np.array([10, 7], np.int32)),
        "y_sep_position": jnp.asarray(np.array([3, 0], np.int32)),
    }

    def loss_fn(p):
        return voice.forward(p, cfg, batch).loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    gnorm = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(x.astype(jnp.float32) ** 2)), grads, 0.0
    )
    assert np.isfinite(gnorm) and gnorm > 0


def test_forward_padding_invariance():
    """Extra padding must not change the loss (fixed-shape bucketing safety)."""
    cfg = tiny_voice_config()
    params = voice.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    b, tx, ty = 1, 5, 8
    x = rng.integers(3, cfg.text_vocab_size, (b, tx)).astype(np.int32)
    y = rng.integers(0, cfg.audio_vocab_size, (b, ty)).astype(np.int32)
    base = {
        "x": jnp.asarray(x),
        "x_lens": jnp.asarray(np.array([5], np.int32)),
        "y": jnp.asarray(y),
        "y_lens": jnp.asarray(np.array([8], np.int32)),
        "y_sep_position": jnp.asarray(np.array([0], np.int32)),
    }
    padded = {
        "x": jnp.asarray(np.pad(x, ((0, 0), (0, 3)))),
        "x_lens": base["x_lens"],
        "y": jnp.asarray(np.pad(y, ((0, 0), (0, 4)), constant_values=cfg.special.pad)),
        "y_lens": base["y_lens"],
        "y_sep_position": base["y_sep_position"],
    }
    l1 = voice.forward(params, cfg, base)
    l2 = voice.forward(params, cfg, padded)
    np.testing.assert_allclose(float(l1.loss), float(l2.loss), rtol=1e-5)
    assert int(l1.effective_ntokens) == int(l2.effective_ntokens)


def test_chunked_ce_matches_dense():
    """ops/chunked_ce must reproduce the dense token_loss path exactly
    (values AND gradients) on tiny shapes — VERDICT r5 prerequisite for
    switching the training loss to blockwise logsumexp. chunk=16 on
    va=133 exercises partial final blocks and multi-block accumulation."""
    cfg_dense = tiny_voice_config(eog_weight=3.0, ce_vocab_chunk=0)
    cfg_chunk = tiny_voice_config(eog_weight=3.0, ce_vocab_chunk=16)
    params = voice.init_params(jax.random.PRNGKey(3), cfg_dense)
    rng = np.random.default_rng(7)
    b, tx, ty = 2, 6, 10
    s = cfg_dense.special
    y = rng.integers(0, cfg_dense.audio_vocab_size, (b, ty)).astype(np.int32)
    y[0, 4] = s.y_sep
    y[1, 2] = s.eog
    batch = {
        "x": jnp.asarray(rng.integers(3, cfg_dense.text_vocab_size,
                                      (b, tx)).astype(np.int32)),
        "x_lens": jnp.asarray(np.array([6, 4], np.int32)),
        "y": jnp.asarray(y),
        "y_lens": jnp.asarray(np.array([10, 7], np.int32)),
        "y_sep_position": jnp.asarray(np.array([3, 0], np.int32)),
    }

    def outs(cfg):
        def loss_fn(p):
            o = voice.forward(p, cfg, batch)
            return o.loss, o
        (loss, o), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return o, grads

    o_d, g_d = outs(cfg_dense)
    o_c, g_c = outs(cfg_chunk)

    np.testing.assert_allclose(float(o_c.loss), float(o_d.loss), rtol=2e-6)
    np.testing.assert_allclose(float(o_c.mean_ce), float(o_d.mean_ce),
                               rtol=2e-6)
    assert int(o_c.top10acc) == int(o_d.top10acc)
    assert int(o_c.effective_ntokens) == int(o_d.effective_ntokens)

    flat_d = jax.tree_util.tree_leaves_with_path(g_d)
    flat_c = jax.tree_util.tree_leaves_with_path(g_c)
    for (pd, ld), (pc, lc) in zip(flat_d, flat_c):
        assert pd == pc
        np.testing.assert_allclose(
            np.asarray(lc), np.asarray(ld), rtol=5e-5, atol=5e-7,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(pd)}")


def test_chunked_ce_single_block_degenerates():
    """chunk >= va must equal the dense path too (one block)."""
    cfg_dense = tiny_voice_config(ce_vocab_chunk=0)
    cfg_one = tiny_voice_config(
        ce_vocab_chunk=cfg_dense.audio_embedding_vocab - 1)
    params = voice.init_params(jax.random.PRNGKey(0), cfg_dense)
    rng = np.random.default_rng(1)
    b, tx, ty = 2, 5, 8
    batch = {
        "x": jnp.asarray(rng.integers(3, cfg_dense.text_vocab_size,
                                      (b, tx)).astype(np.int32)),
        "x_lens": jnp.asarray(np.array([5, 3], np.int32)),
        "y": jnp.asarray(rng.integers(0, cfg_dense.audio_vocab_size,
                                      (b, ty)).astype(np.int32)),
        "y_lens": jnp.asarray(np.array([8, 5], np.int32)),
        "y_sep_position": jnp.asarray(np.array([0, 0], np.int32)),
    }
    o_d = voice.forward(params, cfg_dense, batch)
    o_c = voice.forward(params, cfg_one, batch)
    np.testing.assert_allclose(float(o_c.loss), float(o_d.loss), rtol=2e-6)
    assert int(o_c.top10acc) == int(o_d.top10acc)
