"""Standalone ZeRO-1 save/restore roundtrip, run as a SUBPROCESS by
tests/test_parallel.py::test_zero1_save_restore_roundtrip.

Why a subprocess (root cause, round 5): in a warm-persistent-cache pytest
worker this exact scenario intermittently hard-ABORTS inside native XLA:CPU
while executing a pjit program right around the fresh compile + cache write
of the big dp4xtp2 train_step executable (jax 0.9; faulthandler shows the
main thread in pxla.py ExecuteReplicated.__call__). The trigger matrix,
measured on this box with byte-identical cache contents:

  xdist worker + repo-disk warm cache, train_step entries absent -> abort
  same cache bytes served from tmpfs (xdist)                     -> pass
  same repo-disk cache dir, no xdist                             -> pass
  persistent cache disabled (xdist)                              -> pass

i.e. an upstream jax/XLA-CPU race tied to the persistent-cache load/write
path under specific process/disk timing — NOT orbax, NOT this test's
logic, NOT cumulative in-process compiles (it reproduces with the test run
solo). A fresh process with the persistent cache disabled sidesteps the
race deterministically; test_train_cli_e2e.py set the precedent.

Exit code 0 = all assertions passed.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["T5GEMMA_TTS_COMPILE_CACHE"] = "off"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402

# env vars alone are not enough on this box (a preloaded accelerator
# plugin can still win); force the platform through the config API the way
# tests/conftest.py does.
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

from t5gemma_tts_tpu import parallel  # noqa: E402
from t5gemma_tts_tpu.config import tiny_voice_config  # noqa: E402
from t5gemma_tts_tpu.models import voice  # noqa: E402
from t5gemma_tts_tpu.train import checkpoint as ckpt  # noqa: E402
from t5gemma_tts_tpu.train import optim, train_step  # noqa: E402


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


def main(exp_dir: str) -> None:
    """ZeRO-1 end-to-end on a dp>=2 mesh: run steps with dp-sharded moments
    (pinned in-program by opt_state_shardings), save a bundle DURING async
    stepping (the round-2 deadlock mode), restore, and continue — values
    identical to an uninterrupted run. VERDICT r2 next-round #4."""
    cfg = tiny_voice_config()
    ocfg = optim.ScaledAdamConfig(clipping_scale=None)
    params = voice.init_params(jax.random.PRNGKey(0), cfg)
    mesh = parallel.make_mesh(dp=4, tp=2)
    sp = parallel.shard_params(params, mesh)
    lr = jnp.float32(0.01)

    opt_sh = parallel.opt_state_shardings(
        train_step.init_state(sp, ocfg).opt, sp, mesh)
    step = train_step.compile_train_step(cfg, ocfg, donate=False,
                                         opt_shardings=opt_sh)

    def uses_data_axis(spec):
        flat = []
        for e in tuple(spec):
            flat.extend(e if isinstance(e, tuple) else (e,))
        return parallel.mesh.DATA_AXIS in flat

    s = train_step.init_state(sp, ocfg)
    s = s._replace(opt=parallel.shard_opt_state(s.opt, sp, mesh))
    for i in range(2):
        s, _ = step(s, _batch(cfg, seed=i), lr)
    # save while step 2's program may still be in flight (no sync before)
    ckpt.save_bundle(exp_dir, s, {"step": 2})

    # moments are STILL dp-sharded after jitted steps (the in-program pin;
    # advisor r2 finding #1)
    sharded = [x for x in jax.tree_util.tree_leaves(s.opt.exp_avg_sq)
               if x.ndim and uses_data_axis(x.sharding.spec)]
    assert sharded, "ZeRO-1 moment sharding was lost across jitted steps"

    s_after, _ = step(s, _batch(cfg, seed=2), lr)

    template = train_step.init_state(sp, ocfg)
    restored, progress = ckpt.restore_bundle(exp_dir, template)
    assert progress["step"] == 2
    restored = restored._replace(
        params=parallel.shard_params(restored.params, mesh),
        opt=parallel.shard_opt_state(restored.opt, restored.params, mesh))
    r_after, _ = step(restored, _batch(cfg, seed=2), lr)

    for a, b in zip(jax.tree_util.tree_leaves(s_after.params),
                    jax.tree_util.tree_leaves(r_after.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    print("zero1 roundtrip OK")


if __name__ == "__main__":
    main(sys.argv[1])
