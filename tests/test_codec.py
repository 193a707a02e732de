"""Codec tests: FSQ exactness, overlap-add/ISTFT oracles, vocoder shapes."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from t5gemma_tts_tpu.codec import fsq, vocos
from t5gemma_tts_tpu.codec.fsq import FSQConfig
from t5gemma_tts_tpu.codec.model import (
    XCodec2Config, decode_code, init_decoder_params, tiny_codec_config,
)
from t5gemma_tts_tpu.codec.vocos import VocosConfig


# ---------------------------------------------------------------------------
# FSQ
# ---------------------------------------------------------------------------


def test_fsq_index_roundtrip_exhaustive():
    cfg = FSQConfig(levels=(4, 4, 4), dim=8)
    idx = jnp.arange(cfg.codebook_size)
    codes = fsq.indices_to_codes(cfg, idx)
    back = fsq.codes_to_indices(cfg, codes)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(idx))
    # all codes normalized to [-1, 1] and distinct
    c = np.asarray(codes)
    assert c.min() >= -1.0 and c.max() <= 1.0
    assert len({tuple(row) for row in c.round(6)}) == cfg.codebook_size


def test_fsq_xcodec2_vocab_is_65536():
    cfg = FSQConfig()  # levels (4,)*8
    assert cfg.codebook_size == 65536


def test_fsq_quantize_hits_grid():
    cfg = FSQConfig(levels=(4, 4, 4, 4), dim=16)
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(32, 4)).astype(np.float32) * 3)
    q = np.asarray(fsq.quantize(cfg, z))
    grid = np.array([-1.0, -0.5, 0.0, 0.5])
    for col in range(4):
        assert np.all(np.isin(q[:, col].round(6), grid.round(6)))


def test_fsq_encode_decode_consistency():
    cfg = FSQConfig(levels=(4, 4, 4), dim=12)
    params = fsq.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 5, 12)).astype(np.float32))
    out, idx = fsq.encode(params, cfg, x)
    dec = fsq.decode(params, cfg, idx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(dec), rtol=1e-5, atol=1e-6)
    assert idx.shape == (2, 5)
    assert int(idx.max()) < cfg.codebook_size


def test_fsq_straight_through_gradient():
    cfg = FSQConfig(levels=(4, 4), dim=4)

    def f(z):
        return jnp.sum(fsq.quantize(cfg, z) ** 2)

    g = jax.grad(f)(jnp.asarray([[1.5, -2.0]], jnp.float32))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0  # STE passes gradient through


# ---------------------------------------------------------------------------
# overlap-add / ISTFT
# ---------------------------------------------------------------------------


def _naive_ola(frames, hop):
    b, t, n = frames.shape
    out = np.zeros((b, (t - 1) * hop + n), frames.dtype)
    for i in range(t):
        out[:, i * hop:i * hop + n] += frames[:, i]
    return out


@pytest.mark.parametrize("hop,n_fft", [(10, 32), (8, 32), (7, 20), (882, 2048)])
def test_overlap_add_matches_naive(hop, n_fft):
    rng = np.random.default_rng(0)
    frames = rng.normal(size=(2, 9, n_fft)).astype(np.float32)
    got = np.asarray(vocos.overlap_add(jnp.asarray(frames), hop))
    np.testing.assert_allclose(got, _naive_ola(frames, hop), rtol=1e-5, atol=1e-5)


def test_istft_matches_torch():
    torch = pytest.importorskip("torch")
    cfg = VocosConfig(n_fft=64, hop_length=16)
    rng = np.random.default_rng(2)
    t = 12
    half = cfg.n_fft // 2 + 1
    re = rng.normal(size=(1, t, half)).astype(np.float32)
    im = rng.normal(size=(1, t, half)).astype(np.float32)

    got = np.asarray(vocos.istft_same(jnp.asarray(re), jnp.asarray(im), cfg))

    spec = torch.complex(torch.tensor(re), torch.tensor(im)).transpose(1, 2)
    window = torch.hann_window(cfg.n_fft)
    ref = torch.istft(spec, cfg.n_fft, hop_length=cfg.hop_length,
                      win_length=cfg.n_fft, window=window, center=True).numpy()
    # torch center=True trims n_fft//2 per side; Vocos "same" trims
    # (n_fft - hop)//2, leaving hop//2 extra samples at each edge.
    off = cfg.hop_length // 2
    assert got.shape[1] == t * cfg.hop_length
    assert ref.shape[1] == (t - 1) * cfg.hop_length
    np.testing.assert_allclose(
        got[:, off:off + ref.shape[1]], ref, rtol=1e-4, atol=1e-4
    )


# ---------------------------------------------------------------------------
# vocoder / decode_code
# ---------------------------------------------------------------------------


def test_head_clips_magnitude_not_exponent():
    """Vocos ISTFTHead semantics: mag = clip(exp(x), 100). A log-magnitude
    of 10 (exp ~ 22026) must act exactly like magnitude 100."""
    import jax
    cfg = VocosConfig(n_fft=64, hop_length=16)
    rng = np.random.default_rng(0)
    dim = 8
    params = {"head": {
        "w": jnp.zeros((dim, cfg.n_fft + 2), jnp.float32),
        "b": jnp.asarray(rng.normal(0, 0.1, cfg.n_fft + 2), jnp.float32),
    }}
    # force one bin's log-magnitude to 10 -> raw exp() = 22026
    params["head"]["b"] = params["head"]["b"].at[3].set(10.0)
    x = jnp.asarray(rng.normal(0, 1, (1, 12, dim)), jnp.float32)
    got = np.asarray(vocos.head(params, x, cfg))
    # reference behavior: the same input with that bin's MAGNITUDE at 100
    params_ref = dict(params)
    params_ref["head"] = dict(params["head"])
    params_ref["head"]["b"] = params["head"]["b"].at[3].set(np.log(100.0))
    want = np.asarray(vocos.head(params_ref, x, cfg))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_decode_code_shapes_and_jit():
    cfg = tiny_codec_config()
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    codes = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.fsq.codebook_size, (2, 20))
    )
    wav = jax.jit(lambda p, c: decode_code(p, cfg, c))(params, codes)
    assert wav.shape == (2, 20 * cfg.vocos.hop_length)
    assert np.isfinite(np.asarray(wav)).all()


def test_decode_code_deterministic_per_token():
    """Same token sequence -> identical waveform (pure function)."""
    cfg = tiny_codec_config()
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    codes = jnp.asarray([[5, 9, 1, 33, 2, 7, 7, 0]])
    w1 = decode_code(params, cfg, codes)
    w2 = decode_code(params, cfg, codes)
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))


def test_convnext_block_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    dim, inter, t = 8, 16, 11
    cfg = VocosConfig(input_dim=dim, dim=dim, intermediate_dim=inter,
                      num_layers=1, n_fft=16, hop_length=4)
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, t, dim)).astype(np.float32)

    # torch ConvNeXt block (per Vocos): dwconv -> LN -> pw1 -> GELU -> pw2
    dw = nn.Conv1d(dim, dim, 7, padding=3, groups=dim)
    ln = nn.LayerNorm(dim, eps=1e-6)
    pw1, pw2 = nn.Linear(dim, inter), nn.Linear(inter, dim)
    gamma = torch.full((dim,), 0.3)
    with torch.no_grad():
        xt = torch.tensor(x).transpose(1, 2)
        h = dw(xt).transpose(1, 2)
        h = ln(h)
        h = pw2(torch.nn.functional.gelu(pw1(h)))
        ref = (torch.tensor(x) + gamma * h).numpy()

    p = {
        "dwconv": {
            "w": jnp.asarray(
                dw.weight.detach().numpy().transpose(2, 1, 0)  # [K,1,C]
            ),
            "b": jnp.asarray(dw.bias.detach().numpy()),
        },
        "norm": {"w": jnp.asarray(ln.weight.detach().numpy()),
                 "b": jnp.asarray(ln.bias.detach().numpy())},
        "pw1": {"w": jnp.asarray(pw1.weight.detach().numpy().T),
                "b": jnp.asarray(pw1.bias.detach().numpy())},
        "pw2": {"w": jnp.asarray(pw2.weight.detach().numpy().T),
                "b": jnp.asarray(pw2.bias.detach().numpy())},
        "gamma": jnp.asarray(gamma.numpy()),
    }
    got = np.asarray(vocos.convnext_block(p, jnp.asarray(x), cfg))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_bucketed_decode_equals_unpadded():
    """AudioTokenizer.decode pads codes to a length bucket; the masked
    vocoder must make that exactly equal to the unpadded decode (regression:
    pad tokens used to pollute the audio tail through conv context)."""
    from t5gemma_tts_tpu.codec.audio_tokenizer import AudioTokenizer

    cfg = tiny_codec_config()
    params = init_decoder_params(jax.random.PRNGKey(3), cfg)
    tok = AudioTokenizer(params, cfg)
    rng = np.random.default_rng(3)
    t = 77  # forces padding to the 128 bucket
    codes = rng.integers(0, cfg.fsq.codebook_size, (1, t))
    bucketed = tok.decode(codes[:, None, :])[0, 0]
    exact = np.asarray(decode_code(params, cfg, jnp.asarray(codes)))[0]
    np.testing.assert_allclose(bucketed, exact, rtol=1e-5, atol=1e-6)
