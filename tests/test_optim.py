"""ScaledAdam/Eden tests: parity vs the reference torch implementation (when
the reference snapshot is mounted), plus behavioral checks."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from t5gemma_tts_tpu.train import optim

REFERENCE = "/root/reference"


def test_eden_formula():
    # closed-form values (reference steps/optim.py:825-840)
    lr = optim.eden_lr(0.035, batch=0, epoch=1, lr_batches=3000.0,
                       lr_epochs=4.0, warmup_batches=100.0)
    exp = 0.035 * ((0 + 3000**2) / 3000**2) ** -0.25 * \
        ((1 + 16) / 16) ** -0.25 * 0.5
    np.testing.assert_allclose(float(lr), exp, rtol=1e-5)
    lr2 = optim.eden_lr(0.035, batch=200, epoch=1, lr_batches=3000.0,
                        lr_epochs=4.0, warmup_batches=100.0)
    exp2 = 0.035 * ((200**2 + 3000**2) / 3000**2) ** -0.25 * \
        ((1 + 16) / 16) ** -0.25
    np.testing.assert_allclose(float(lr2), exp2, rtol=1e-5)


def test_linear_schedule():
    lr = optim.linear_warmup_decay_lr(1e-4, 50, 1000, 100.0)
    np.testing.assert_allclose(float(lr), 5e-5, rtol=1e-6)
    lr = optim.linear_warmup_decay_lr(1e-4, 550, 1000, 100.0)
    np.testing.assert_allclose(float(lr), 1e-4 * 450 / 900, rtol=1e-5)


def test_scaled_adam_reduces_loss():
    cfg = optim.ScaledAdamConfig(clipping_scale=None)
    rng = np.random.default_rng(0)
    w_true = rng.normal(size=(8, 4)).astype(np.float32)
    params = {"layers": {"w": jnp.asarray(rng.normal(size=(2, 8, 4)) * 0.1,
                                          jnp.float32)},
              "bias": jnp.zeros((4,), jnp.float32)}
    state = optim.init(params, cfg)
    x = jnp.asarray(rng.normal(size=(64, 8)).astype(np.float32))
    y = x @ jnp.asarray(w_true)

    def loss_fn(p):
        pred = x @ (p["layers"]["w"][0] + p["layers"]["w"][1]) + p["bias"]
        return jnp.mean((pred - y) ** 2)

    @jax.jit
    def step(params, state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, state = optim.update(grads, state, params, jnp.float32(0.05), cfg)
        return params, state, loss

    losses = []
    for _ in range(200):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5


@pytest.mark.skipif(not os.path.isdir(REFERENCE),
                    reason="reference snapshot not mounted")
@pytest.mark.parametrize("clipping", [None, 2.0])
def test_scaled_adam_parity_with_reference(clipping):
    """Feed identical gradient sequences to the reference torch ScaledAdam
    and this implementation; parameters must track each other closely."""
    import sys

    torch = pytest.importorskip("torch")
    sys.path.insert(0, REFERENCE)
    try:
        from steps.optim import ScaledAdam as TorchScaledAdam
    finally:
        sys.path.remove(REFERENCE)

    rng = np.random.default_rng(42)
    shapes = {"a": (6, 5), "b": (7,), "c": ()}
    init_vals = {k: rng.normal(size=s).astype(np.float32) * 0.5
                 for k, s in shapes.items()}

    tparams = {k: torch.nn.Parameter(torch.tensor(v))
               for k, v in init_vals.items()}
    period = 8
    topt = TorchScaledAdam(
        list(tparams.values()), lr=0.03, betas=(0.9, 0.95),
        clipping_scale=clipping, clipping_update_period=period,
        parameters_names=[list(tparams.keys())],
        show_dominant_parameters=False,
    )

    cfg = optim.ScaledAdamConfig(
        betas=(0.9, 0.95), clipping_scale=clipping,
        clipping_update_period=period,
    )
    jparams = {k: jnp.asarray(v) for k, v in init_vals.items()}
    jstate = optim.init(jparams, cfg)

    n_steps = 20
    for step in range(n_steps):
        grads = {k: rng.normal(size=s).astype(np.float32)
                 for k, s in shapes.items()}
        for k, p in tparams.items():
            p.grad = torch.tensor(grads[k])
        topt.step()
        topt.zero_grad()
        jparams, jstate = optim.update(
            {k: jnp.asarray(v) for k, v in grads.items()},
            jstate, jparams, jnp.float32(0.03), cfg,
        )

    for k in shapes:
        ref = tparams[k].detach().numpy()
        got = np.asarray(jparams[k])
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5,
                                   err_msg=f"param {k} diverged")


@pytest.mark.skipif(not os.path.isdir(REFERENCE),
                    reason="reference snapshot not mounted")
def test_eve_parity_with_reference():
    import sys

    torch = pytest.importorskip("torch")
    sys.path.insert(0, REFERENCE)
    try:
        from steps.optim import Eve as TorchEve
    finally:
        sys.path.remove(REFERENCE)

    rng = np.random.default_rng(1)
    shapes = {"a": (6, 5), "b": (7,)}
    init_vals = {k: rng.normal(size=s).astype(np.float32)
                 for k, s in shapes.items()}
    tparams = {k: torch.nn.Parameter(torch.tensor(v))
               for k, v in init_vals.items()}
    topt = TorchEve(list(tparams.values()), lr=3e-3, betas=(0.9, 0.98),
                    weight_decay=1e-3, target_rms=0.1)
    cfg = optim.EveConfig()
    jparams = {k: jnp.asarray(v) for k, v in init_vals.items()}
    jstate = optim.eve_init(jparams)
    for _ in range(12):
        grads = {k: rng.normal(size=s).astype(np.float32)
                 for k, s in shapes.items()}
        for k, p in tparams.items():
            p.grad = torch.tensor(grads[k])
        topt.step(); topt.zero_grad()
        jparams, jstate = optim.eve_update(
            {k: jnp.asarray(v) for k, v in grads.items()},
            jstate, jparams, jnp.float32(3e-3), cfg,
        )
    for k in shapes:
        np.testing.assert_allclose(np.asarray(jparams[k]),
                                   tparams[k].detach().numpy(),
                                   rtol=2e-4, atol=2e-5)


def test_dominant_parameter_report_names_culprit():
    """The diagnostic must rank the tensor with the (rms-scaled) dominant
    gradient first (reference steps/optim.py:445-508 logs the same)."""
    import jax
    import jax.numpy as jnp
    from t5gemma_tts_tpu.train import optim

    params = {
        "a": jnp.ones((4, 8)) * 0.1,
        "b": jnp.ones((4, 8)) * 0.1,
        "c": jnp.ones((2,)) * 0.1,
    }
    cfg = optim.ScaledAdamConfig()
    state = optim.init(params, cfg)
    grads = {
        "a": jnp.ones((4, 8)) * 1e-3,
        "b": jnp.ones((4, 8)) * 10.0,   # dominant
        "c": jnp.ones((2,)) * 1e-3,
    }
    report = optim.dominant_parameter_report(grads, state, params, top_k=3)
    assert report[0]["name"].strip("[]'\"") == "b"
    assert report[0]["proportion"] > 0.99
    assert abs(sum(r["proportion"] for r in report) - 1.0) < 1e-6
