"""Int8 quantized-matmul tests: kernel vs dequantized reference, decode path
with quantized decoder params."""

import numpy as np
import jax
import jax.numpy as jnp

from t5gemma_tts_tpu.config import DecodeConfig, tiny_voice_config
from t5gemma_tts_tpu.models import voice
from t5gemma_tts_tpu.ops import quant


def test_quantize_roundtrip_error_small():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(128, 300)).astype(np.float32) * 0.05)
    qw = quant.quantize_weight(w)
    deq = quant.dequantize(qw)
    err = np.abs(np.asarray(deq) - np.asarray(w)).max()
    colmax = np.abs(np.asarray(w)).max(0).min()
    assert err <= np.abs(np.asarray(w)).max() / 127.0 + 1e-6
    assert qw.values.shape[-1] % quant.N_TILE == 0
    assert qw.n == 300


def test_q_matmul_matches_dequantized_reference():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(5, 128)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(128, 384)).astype(np.float32) * 0.1)
    qw = quant.quantize_weight(w)
    got = np.asarray(quant.q_matmul(x, qw))
    ref = np.asarray(x.astype(jnp.bfloat16) @ quant.dequantize(qw).astype(jnp.bfloat16))
    assert got.shape == (5, 384)
    np.testing.assert_allclose(got, ref, rtol=3e-2, atol=3e-2)
    # relative error vs the unquantized matmul stays small
    exact = np.asarray(x @ w)
    rel = np.abs(got - exact).mean() / (np.abs(exact).mean() + 1e-9)
    assert rel < 0.02


def test_w8a8_pallas_core_exact_vs_numpy():
    """The Pallas W8A8 kernel on pre-quantized inputs is EXACT: int32
    accumulation with a deterministic f32 rescale, checked against a numpy
    oracle to 1 ULP."""
    rng = np.random.default_rng(3)
    for m_pad, k, n_pad in [(32, 128, 512), (64, 256, 512), (32, 384, 1024)]:
        x8 = rng.integers(-127, 128, (m_pad, k)).astype(np.int8)
        w8 = rng.integers(-127, 128, (k, n_pad)).astype(np.int8)
        sx = rng.uniform(1e-3, 1e-1, (m_pad, 1)).astype(np.float32)
        sw = rng.uniform(1e-3, 1e-1, (n_pad,)).astype(np.float32)
        got = np.asarray(quant._w8a8_core(
            jnp.asarray(x8), jnp.asarray(sx), jnp.asarray(w8),
            jnp.asarray(sw), jnp.float32, interpret=True))
        acc = x8.astype(np.int64) @ w8.astype(np.int64)  # exact
        ref = (acc.astype(np.float64) * sx * sw[None, :])
        np.testing.assert_allclose(got, ref, rtol=3e-7)


def test_w8a8_pallas_matches_xla_path():
    """End-to-end (quantize + matmul + rescale) the Pallas and XLA W8A8 paths
    agree to quantization-noise level: eager-vs-jit activation rounding can
    flip an int8 at exact .5 boundaries and XLA may reassociate the scale
    multiplies, so bit-equality between the two lowerings is not a contract —
    agreement within a couple of quanta is."""
    rng = np.random.default_rng(4)
    for m, k, n in [(1, 128, 512), (5, 256, 512), (64, 128, 1024),
                    (33, 384, 640)]:
        x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32) * 0.1)
        qw = quant.quantize_weight(w)
        ref = np.asarray(quant._w8a8_2d_xla(x, qw))
        got = np.asarray(quant._w8a8_2d_pallas(x, qw, interpret=True))
        assert got.shape == ref.shape
        # tolerance: 2 output quanta (max row scale x max channel scale x 2)
        quantum = (np.asarray(jnp.max(jnp.abs(x), axis=-1)) / 127.0).max() \
            * np.asarray(qw.scale).max()
        np.testing.assert_allclose(got, ref, atol=2.5 * quantum, rtol=3e-7)


def test_q_matmul_passthrough_for_plain_arrays():
    x = jnp.ones((2, 4))
    w = jnp.ones((4, 3))
    np.testing.assert_allclose(np.asarray(quant.q_matmul(x, w)),
                               np.asarray(x @ w))


def test_q_matmul_3d_activations():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 7, 128)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(128, 256)).astype(np.float32) * 0.1)
    qw = quant.quantize_weight(w)
    got = quant.q_matmul(x, qw)
    assert got.shape == (2, 7, 256)


def test_quantized_decode_runs_and_tracks_bf16():
    from t5gemma_tts_tpu.decode import engine

    cfg = tiny_voice_config(extra_cutoff=0.0)
    params = voice.init_params(jax.random.PRNGKey(0), cfg)
    qparams = quant.quantize_params_for_decode(params)
    # decoder projections quantized, encoder untouched
    assert isinstance(qparams["decoder"]["layers"]["self_attn"]["q"],
                      quant.QuantWeight)
    assert not isinstance(qparams["encoder"]["layers"]["self_attn"]["q"],
                          quant.QuantWeight)
    assert isinstance(qparams["head"]["w2"], quant.QuantWeight)

    rng = np.random.default_rng(0)
    b = 2
    x = jnp.asarray(rng.integers(3, cfg.text_vocab_size, (b, 6)).astype(np.int32))
    x_lens = jnp.full((b,), 6, jnp.int32)
    prompt = jnp.full((b, 4), cfg.special.pad, jnp.int32)
    prompt_lens = jnp.zeros((b,), jnp.int32)
    targets = jnp.full((b,), 10, jnp.int32)
    dcfg = DecodeConfig(top_k=1, temperature=1.0, max_frames=14)

    out_q = engine.decode_tokens(qparams, cfg, dcfg, x, x_lens, prompt,
                                 prompt_lens, targets, jax.random.PRNGKey(0))
    out_f = engine.decode_tokens(params, cfg, dcfg, x, x_lens, prompt,
                                 prompt_lens, targets, jax.random.PRNGKey(0))
    lens_q = np.asarray(out_q.gen_lens)
    assert (lens_q > 0).all()
    toks_q = np.asarray(out_q.tokens)
    assert np.isin(cfg.eog_inference, toks_q)
    # greedy traces from a random tiny model are noisy under quantization;
    # just require both to produce the same sequence lengths' ballpark
    assert abs(int(lens_q.sum()) - int(np.asarray(out_f.gen_lens).sum())) <= 20


def test_int4_pack_unpack_roundtrip():
    from t5gemma_tts_tpu.ops.quant import (
        dequantize_int4, quantize_weight_int4, unpack_int4,
    )

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(256, 96)).astype(np.float32))
    qw = quantize_weight_int4(w, group=64, n_tile=32)
    # nibbles decode to exactly the quantized levels
    w8 = unpack_int4(qw.packed)
    assert int(jnp.max(w8)) <= 7 and int(jnp.min(w8)) >= -7
    deq = dequantize_int4(qw)
    assert deq.shape == w.shape
    # group-wise absmax quantization: error bounded by scale/2 per element
    g = 64
    scale_full = jnp.repeat(qw.scale[:, : w.shape[1]], g, axis=0)
    assert float(jnp.max(jnp.abs(deq - w) / jnp.maximum(scale_full, 1e-9))) <= 0.5 + 1e-3


def test_w4a8_matmul_error_vs_w8a8():
    """Pin the honest W4-vs-W8 error relationship on Gaussian weights:
    absmax/7 quantization of a ~N(0, s) group steps at ~0.43 sigma, i.e.
    ~12%% relative weight error vs int8's ~1%% (real trained weights carry
    the same element-wise error; end-quality on the released checkpoint is
    the open question the latency mode documents)."""
    from t5gemma_tts_tpu.ops.quant import (
        q4_matmul, q_matmul, quantize_weight, quantize_weight_int4,
    )

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(8, 256)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(256, 160)).astype(np.float32)) * 0.05
    ref = np.asarray(x @ w)

    def rel(a):
        return float(np.linalg.norm(np.asarray(a) - ref) / np.linalg.norm(ref))

    e8 = rel(q_matmul(x, quantize_weight(w)))
    e4 = rel(q4_matmul(x, quantize_weight_int4(w, group=128, n_tile=32)))
    assert e4 < 0.16, e4           # ~12% on Gaussian weights (see docstring)
    assert 5 * e8 < e4 < 20 * e8   # ordered as the quantization math predicts


def test_lanes4_pack_dequant_exact_levels():
    """lanes4 packing (megakernel int4): nibble decode is exact, channel
    pairing is (c, c + T/2) tile-local for l4n / global for l4k."""
    from t5gemma_tts_tpu.ops.quant import (
        dequantize_lanes4, quantize_weight_lanes4,
    )

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(128, 300)).astype(np.float32) * 0.05)
    for km in (False, True):
        qw = quantize_weight_lanes4(w, k_major=km)
        deq = np.asarray(dequantize_lanes4(qw))
        assert deq.shape == (128, 300)
        s = np.asarray(qw.scale)[:300]
        err = np.abs(deq - np.asarray(w)) / np.maximum(s[None, :], 1e-9)
        assert err.max() <= 0.5 + 1e-3     # absmax/7 levels, exact decode


def test_lanes4_matmul_matches_dequantized_reference():
    from t5gemma_tts_tpu.ops.quant import (
        dequantize_lanes4, q_matmul, quantize_weight_lanes4,
    )

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(5, 256)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(256, 640)).astype(np.float32) * 0.1)
    for km in (False, True):
        qw = quantize_weight_lanes4(w, k_major=km)
        got = np.asarray(q_matmul(x, qw))
        ref = np.asarray(x) @ np.asarray(dequantize_lanes4(qw))
        assert got.shape == (5, 640)
        rel = np.abs(got - ref).mean() / (np.abs(ref).mean() + 1e-9)
        assert rel < 0.02, rel             # activation-quant noise only


def test_w4_decode_runs_and_stops():
    """End-to-end tiny decode with weight_bits=4 params (megakernel off-CPU
    falls back through q_matmul's exact lanes4 dispatch)."""
    from t5gemma_tts_tpu.decode import engine
    from t5gemma_tts_tpu.models.t5gemma import fuse_for_decode
    from t5gemma_tts_tpu.ops.quant import Lanes4Weight

    cfg = tiny_voice_config(extra_cutoff=0.0)
    params = voice.init_params(jax.random.PRNGKey(0), cfg)
    params = fuse_for_decode(params)
    qparams = quant.quantize_params_for_decode(params, weight_bits=4)
    lay = qparams["decoder"]["layers"]
    assert isinstance(lay["self_attn"]["qkv"], Lanes4Weight)
    assert isinstance(lay["mlp"]["down"], Lanes4Weight)
    assert lay["self_attn"]["qkv"].layout == "l4n"
    assert lay["mlp"]["down"].layout == "l4k"
    # the prediction head's big matmul is lanes4 too (round 4: the last
    # int8 stream in the b1 step, served by _w4a8_2d_pallas on TPU)
    assert isinstance(qparams["head"]["w2"], quant.Lanes4Weight)
    assert qparams["head"]["w2"].layout == "l4n"
    # other non-megakernel matmuls stay int8
    assert isinstance(qparams["head"]["w1"], quant.QuantWeight)

    rng = np.random.default_rng(0)
    b = 2
    x = jnp.asarray(rng.integers(3, cfg.text_vocab_size, (b, 6)).astype(np.int32))
    x_lens = jnp.full((b,), 6, jnp.int32)
    prompt = jnp.full((b, 4), cfg.special.pad, jnp.int32)
    prompt_lens = jnp.zeros((b,), jnp.int32)
    targets = jnp.full((b,), 10, jnp.int32)
    dcfg = DecodeConfig(top_k=1, temperature=1.0, max_frames=14)
    out = engine.decode_tokens(qparams, cfg, dcfg, x, x_lens, prompt,
                               prompt_lens, targets, jax.random.PRNGKey(0))
    lens = np.asarray(out.gen_lens)
    assert (lens > 0).all()
    assert np.isin(cfg.eog_inference, np.asarray(out.tokens))


def test_w4_model_ce_perturbation_bounded():
    """Model-level quality proxy on the tiny backbone: the full forward's
    mean CE under int4 weights stays finite and within a modest band of the
    bf16 CE (and int8 within a tighter one). Element-level int4-vs-int8
    error ratios are pinned above; released-weight validation is
    environment-blocked — this guards against the end-to-end stack
    amplifying the quantization error pathologically."""
    from t5gemma_tts_tpu.models.t5gemma import fuse_for_decode
    from t5gemma_tts_tpu.models import voice as voice_mod

    cfg = tiny_voice_config()
    params = voice_mod.init_params(jax.random.PRNGKey(3), cfg)
    params = fuse_for_decode(params)
    p8 = quant.quantize_params_for_decode(params, weight_bits=8)
    p4 = quant.quantize_params_for_decode(params, weight_bits=4)

    rng = np.random.default_rng(0)
    b = 2
    batch = {
        "x": jnp.asarray(rng.integers(3, cfg.text_vocab_size, (b, 6)),
                         jnp.int32),
        "x_lens": jnp.full((b,), 6, jnp.int32),
        "y": jnp.asarray(rng.integers(0, cfg.audio_vocab_size, (b, 8)),
                         jnp.int32),
        "y_lens": jnp.full((b,), 8, jnp.int32),
        "y_sep_position": jnp.zeros((b,), jnp.int32),
    }
    ce_ref = float(voice_mod.forward(params, cfg, batch).mean_ce)

    def drift(p):
        ce = float(voice_mod.forward(p, cfg, batch).mean_ce)
        assert np.isfinite(ce)
        return abs(ce - ce_ref) / max(abs(ce_ref), 1e-9)

    d8, d4 = drift(p8), drift(p4)
    assert d8 < 0.05, d8            # int8: ~1% weight error barely moves CE
    assert d4 < 0.30, d4            # int4: coarser but bounded, not exploded


def test_w4a8_pallas_matches_xla_fallback():
    """The standalone l4n Pallas kernel (in-dot nibble decode, two int8
    dots per tile) must reproduce _w4a8_2d_xla's math: identical int32
    accumulations, f32 rescale (1-ULP-class float differences only)."""
    from t5gemma_tts_tpu.ops.quant import (
        _w4a8_2d_pallas, _w4a8_2d_xla, quantize_weight_lanes4,
    )

    rng = np.random.default_rng(2)
    for m, k, n in ((1, 128, 300), (5, 256, 640), (33, 128, 512)):
        x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32) * 0.1)
        qw = quantize_weight_lanes4(w, k_major=False)
        ref = np.asarray(_w4a8_2d_xla(x, qw))
        got = np.asarray(_w4a8_2d_pallas(x, qw, interpret=True))
        assert got.shape[0] == m
        np.testing.assert_allclose(got[:, : qw.n], ref[:, : qw.n],
                                   rtol=2e-5, atol=2e-5)


def test_w4_head_decode_matches_int8_head_shapes():
    """w4 params with the lanes4 head decode end-to-end on the tiny
    config (q_matmul's exact lanes4 dispatch covers the head off-TPU)."""
    from t5gemma_tts_tpu.models import voice as voice_mod
    from t5gemma_tts_tpu.models.t5gemma import fuse_for_decode

    cfg = tiny_voice_config()
    params = voice_mod.init_params(jax.random.PRNGKey(1), cfg)
    params = fuse_for_decode(params)
    p4 = quant.quantize_params_for_decode(params, weight_bits=4)
    h = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 1, cfg.backbone.decoder.hidden_size)).astype(np.float32))
    logits4 = voice_mod.predict_head(p4["head"], h)
    assert logits4.shape == (2, 1, cfg.audio_vocab_size + 5)
    # int4 head logits stay within a bounded band of the bf16 head's
    p0 = fuse_for_decode(voice_mod.init_params(jax.random.PRNGKey(1), cfg))
    ref = voice_mod.predict_head(p0["head"], h)
    rel = float(jnp.linalg.norm(logits4 - ref) / jnp.linalg.norm(ref))
    assert rel < 0.2, rel


def test_head_bits_fallback_keeps_head_int8():
    """quantize_params_for_decode(weight_bits=4, head_bits=8): the layer
    weights go lanes4 but the prediction head stays int8 — the documented
    int4-head quality fallback (tools/stress_int4_head.py rule)."""
    import jax

    from t5gemma_tts_tpu.config import tiny_voice_config
    from t5gemma_tts_tpu.models import t5gemma, voice
    from t5gemma_tts_tpu.ops.quant import (
        Lanes4Weight, QuantWeight, quantize_params_for_decode,
    )

    cfg = tiny_voice_config()
    params = voice.init_params(jax.random.PRNGKey(0), cfg)
    params = t5gemma.fuse_for_decode(params)
    q = quantize_params_for_decode(params, weight_bits=4, head_bits=8,
                                   streaming_tiled=True)
    assert isinstance(q["decoder"]["layers"]["self_attn"]["qkv"],
                      Lanes4Weight)
    assert isinstance(q["head"]["w2"], QuantWeight)
    q4 = quantize_params_for_decode(params, weight_bits=4,
                                    streaming_tiled=True)
    assert isinstance(q4["head"]["w2"], Lanes4Weight)
