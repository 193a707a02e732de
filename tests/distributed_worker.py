"""Worker process for the REAL 2-process jax.distributed test.

Run as ``python tests/distributed_worker.py <process_id> <port>``. Two of
these form a 2-process x 2-device CPU cluster (4 global devices); each runs
the SAME SPMD train step over a dp=4 mesh, feeding its batch rows through
``parallel.shard_batch``'s process-local path where local != global — the
configuration the reference exercises daily as torchrun+NCCL multi-process
(reference: main.py:92-96) and which single-process tests cannot reach.

Prints one line: ``RESULT loss=<f> grad_norm=<f> checksum=<f>`` computed as
replicated scalars (every process must print identical values, and they must
match a single-device run of the same global batch).
"""

import os
import sys


def main() -> int:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=2"
        ).strip()
    pid, port = int(sys.argv[1]), sys.argv[2]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2,
        process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4 and jax.local_device_count() == 2

    import numpy as np
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from t5gemma_tts_tpu import parallel
    from t5gemma_tts_tpu.config import tiny_voice_config
    from t5gemma_tts_tpu.models import voice
    from t5gemma_tts_tpu.train import optim, train_step

    cfg = tiny_voice_config()
    ocfg = optim.ScaledAdamConfig(clipping_scale=None)
    params = voice.init_params(jax.random.PRNGKey(0), cfg)

    # identical GLOBAL batch on every process (same seed); shard_batch hands
    # JAX only this process's rows
    rng = np.random.default_rng(0)
    n_micro, b, tx, ty = 2, 4, 6, 10
    batch = {
        "x": rng.integers(3, cfg.text_vocab_size,
                          (n_micro, b, tx)).astype(np.int32),
        "x_lens": rng.integers(2, tx + 1, (n_micro, b)).astype(np.int32),
        "y": rng.integers(0, cfg.audio_vocab_size,
                          (n_micro, b, ty)).astype(np.int32),
        "y_lens": rng.integers(2, ty + 1, (n_micro, b)).astype(np.int32),
        "y_sep_position": np.zeros((n_micro, b), np.int32),
    }

    mesh = parallel.make_mesh()          # dp=4 over the 4 global devices
    sp = parallel.shard_params(params, mesh)
    sb = parallel.shard_batch(batch, mesh, axis=1)   # process-local path
    # local != global: this process's rows are a strict subset
    for leaf in jax.tree_util.tree_leaves(sb):
        assert not leaf.is_fully_addressable

    step = train_step.compile_train_step(cfg, ocfg, donate=False)
    state = train_step.init_state(sp, ocfg)
    new_state, metrics = step(state, sb, jnp.float32(0.01))

    @jax.jit
    def checksum(tree):
        return sum(jnp.sum(jnp.abs(x.astype(jnp.float32)))
                   for x in jax.tree_util.tree_leaves(tree))

    def scalar(x):
        return float(jax.device_get(x.addressable_shards[0].data))

    print(f"RESULT loss={scalar(metrics.loss):.6f} "
          f"grad_norm={scalar(metrics.grad_norm):.6f} "
          f"checksum={scalar(checksum(new_state.params)):.4f}", flush=True)
    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
