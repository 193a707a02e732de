"""The jitted SPMD training step: grad-accum scan, NaN guard, ScaledAdam.

One compiled program replaces the reference's per-rank Python loop
(reference: steps/trainer.py:178-580):

- gradient accumulation is a ``lax.scan`` over the leading micro-batch axis
  (the reference re-splits batches in Python and coordinates with
  all_reduce(MAX/MIN), trainer.py:248-299);
- the synchronized NaN skip (trainer.py:314-327) is a ``jnp.where`` select on
  a finite-gradients flag — under SPMD the flag is identical on all devices
  by construction, so no collective choreography is needed;
- metric reduction (trainer.py:370-397) falls out of the sharded loss
  computation.

Donation: the train state is donated, so parameters and optimizer state are
updated in place in HBM.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import VoiceConfig
from ..models import voice
from . import optim

PyTree = Any


class TrainState(NamedTuple):
    params: PyTree
    opt: Any                   # ScaledAdamState | AdamWState
    step: jnp.ndarray          # completed optimizer steps
    nan_skips: jnp.ndarray     # count of skipped (non-finite) steps


def opt_init(params: PyTree, ocfg) -> Any:
    if isinstance(ocfg, optim.AdamWConfig):
        return optim.adamw_init(params)
    return optim.init(params, ocfg)


def opt_update(grads, opt_state, params, lr, ocfg):
    if isinstance(ocfg, optim.AdamWConfig):
        return optim.adamw_update(grads, opt_state, params, lr, ocfg)
    return optim.update(grads, opt_state, params, lr, ocfg)


def init_state(params: PyTree, ocfg) -> TrainState:
    return TrainState(
        params=params,
        opt=opt_init(params, ocfg),
        step=jnp.int32(0),
        nan_skips=jnp.int32(0),
    )


class StepMetrics(NamedTuple):
    loss: jnp.ndarray
    mean_ce: jnp.ndarray
    perplexity: jnp.ndarray
    top10acc: jnp.ndarray
    ntokens: jnp.ndarray
    grad_norm: jnp.ndarray
    nan_step: jnp.ndarray
    lr: jnp.ndarray


def _loss_fn(params, cfg: VoiceConfig, micro_batch) -> Tuple[jnp.ndarray, Any]:
    out = voice.forward(params, cfg, micro_batch)
    # normalize by token count so accumulation over micros averages per token
    loss = out.loss / jnp.maximum(out.effective_ntokens.astype(jnp.float32), 1.0)
    return loss, out


def make_train_step(cfg: VoiceConfig, ocfg: optim.ScaledAdamConfig,
                    opt_shardings=None):
    """Returns a jittable fn(state, batch, lr) -> (state, metrics).

    ``batch`` leaves have shape [n_micro, per_micro, ...]; the scan
    accumulates token-weighted grads across the micro axis.

    ``opt_shardings`` (parallel.opt_state_shardings) pins the updated
    optimizer state's placement INSIDE the compiled program — ZeRO-1's
    dp-sharded moments stay dp-sharded across steps instead of being
    re-placed at GSPMD's discretion.
    """

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                   lr: jnp.ndarray) -> Tuple[TrainState, StepMetrics]:
        grad_fn = jax.value_and_grad(_loss_fn, has_aux=True)

        def micro(carry, mb):
            acc_grads, acc = carry
            (loss, out), grads = grad_fn(state.params, cfg, mb)
            ntok = out.effective_ntokens.astype(jnp.float32)
            acc_grads = jax.tree_util.tree_map(
                lambda a, g: a + g.astype(jnp.float32) * ntok, acc_grads, grads
            )
            acc = {
                "loss_sum": acc["loss_sum"] + out.loss,
                "ce_sum": acc["ce_sum"] + out.mean_ce * ntok,
                "top10": acc["top10"] + out.top10acc,
                "ntok": acc["ntok"] + ntok,
            }
            return (acc_grads, acc), None

        zero_grads = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), state.params
        )
        zero_acc = {
            "loss_sum": jnp.float32(0), "ce_sum": jnp.float32(0),
            "top10": jnp.int32(0), "ntok": jnp.float32(0),
        }
        (grads, acc), _ = jax.lax.scan(micro, (zero_grads, zero_acc), batch)

        ntok = jnp.maximum(acc["ntok"], 1.0)
        grads = jax.tree_util.tree_map(lambda g: g / ntok, grads)

        gsq = sum(
            jnp.sum(g * g) for g in jax.tree_util.tree_leaves(grads)
        )
        grad_norm = jnp.sqrt(gsq)
        finite = jnp.isfinite(grad_norm)

        safe_grads = jax.tree_util.tree_map(
            lambda g: jnp.where(finite, g, 0.0), grads
        )
        new_params, new_opt = opt_update(
            safe_grads, state.opt, state.params, lr, ocfg
        )
        # NaN guard: keep old params/opt when the step was non-finite
        # (reference steps/trainer.py:314-327, synchronized skip)
        new_params = jax.tree_util.tree_map(
            lambda n, o: jnp.where(finite, n, o), new_params, state.params
        )
        new_opt = jax.tree_util.tree_map(
            lambda n, o: jnp.where(finite, n, o), new_opt, state.opt
        )
        if opt_shardings is not None:
            new_opt = jax.lax.with_sharding_constraint(new_opt, opt_shardings)

        metrics = StepMetrics(
            loss=acc["loss_sum"] / ntok,
            mean_ce=acc["ce_sum"] / ntok,
            perplexity=jnp.exp(acc["ce_sum"] / ntok),
            top10acc=acc["top10"].astype(jnp.float32) / ntok,
            ntokens=acc["ntok"],
            grad_norm=grad_norm,
            nan_step=(~finite).astype(jnp.int32),
            lr=lr,
        )
        new_state = TrainState(
            params=new_params,
            opt=new_opt,
            step=state.step + 1,
            nan_skips=state.nan_skips + (~finite).astype(jnp.int32),
        )
        return new_state, metrics

    return train_step


def make_eval_step(cfg: VoiceConfig):
    def eval_step(params, batch) -> StepMetrics:
        out = voice.forward(params, cfg, batch)
        ntok = jnp.maximum(out.effective_ntokens.astype(jnp.float32), 1.0)
        return StepMetrics(
            loss=out.loss / ntok,
            mean_ce=out.mean_ce,
            perplexity=out.perplexity,
            top10acc=out.top10acc.astype(jnp.float32) / ntok,
            ntokens=out.effective_ntokens.astype(jnp.float32),
            grad_norm=jnp.float32(0),
            nan_step=jnp.int32(0),
            lr=jnp.float32(0),
        )

    return eval_step


def make_lora_train_step(cfg: VoiceConfig, ocfg: optim.ScaledAdamConfig,
                         lcfg, opt_shardings=None):
    """LoRA fine-tune step: optimizer over adapters only; base frozen
    (reference models/t5gemma.py:543-599)."""
    from . import lora as lora_mod

    def train_step(adapters, opt_state, base_params, batch, lr):
        def loss_fn(ads, mb):
            # factored wrap (x@W + (x@A)@B), NOT merged apply: merging
            # materializes a full effective tree + a full-tree cotangent
            # (measured 30 GB for a 2b-2b step — OOM on one chip)
            eff = lora_mod.wrap(base_params, ads, lcfg)
            out = voice.forward(eff, cfg, mb)
            return out.loss / jnp.maximum(
                out.effective_ntokens.astype(jnp.float32), 1.0
            ), out

        def micro(carry, mb):
            acc_grads, acc = carry
            (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                adapters, mb
            )
            ntok = out.effective_ntokens.astype(jnp.float32)
            acc_grads = jax.tree_util.tree_map(
                lambda a, g: a + g.astype(jnp.float32) * ntok, acc_grads, grads
            )
            acc = {
                "loss_sum": acc["loss_sum"] + out.loss,
                "ce_sum": acc["ce_sum"] + out.mean_ce * ntok,
                "top10": acc["top10"] + out.top10acc,
                "ntok": acc["ntok"] + ntok,
            }
            return (acc_grads, acc), None

        zeros = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), adapters
        )
        zero_acc = {
            "loss_sum": jnp.float32(0), "ce_sum": jnp.float32(0),
            "top10": jnp.int32(0), "ntok": jnp.float32(0),
        }
        (grads, acc), _ = jax.lax.scan(micro, (zeros, zero_acc), batch)
        ntok = jnp.maximum(acc["ntok"], 1.0)
        grads = jax.tree_util.tree_map(lambda g: g / ntok, grads)

        gsq = sum(jnp.sum(g * g) for g in jax.tree_util.tree_leaves(grads))
        grad_norm = jnp.sqrt(gsq)
        finite = jnp.isfinite(grad_norm)
        # NaN guard identical to the full path: the reference skips NaN
        # micro-batches for LoRA runs too (reference steps/trainer.py:314-327)
        safe_grads = jax.tree_util.tree_map(
            lambda g: jnp.where(finite, g, 0.0), grads
        )
        new_adapters, new_opt = opt_update(
            safe_grads, opt_state, adapters, lr, ocfg
        )
        new_adapters = jax.tree_util.tree_map(
            lambda n, o: jnp.where(finite, n, o), new_adapters, adapters
        )
        new_opt = jax.tree_util.tree_map(
            lambda n, o: jnp.where(finite, n, o), new_opt, opt_state
        )
        if opt_shardings is not None:
            new_opt = jax.lax.with_sharding_constraint(new_opt, opt_shardings)
        metrics = StepMetrics(
            loss=acc["loss_sum"] / ntok,
            mean_ce=acc["ce_sum"] / ntok,
            perplexity=jnp.exp(acc["ce_sum"] / ntok),
            top10acc=acc["top10"].astype(jnp.float32) / ntok,
            ntokens=acc["ntok"],
            grad_norm=grad_norm,
            nan_step=(~finite).astype(jnp.int32),
            lr=lr,
        )
        return new_adapters, new_opt, metrics

    return train_step


def compile_train_step(cfg: VoiceConfig, ocfg: optim.ScaledAdamConfig,
                       donate: bool = True, opt_shardings=None):
    """jit the train step. Sharding is carried by the inputs: place params
    with parallel.shard_params and batches with parallel.shard_batch (on the
    [n_micro, B, ...] batch the data axis is dim 1); jit propagates those
    shardings through the whole program and inserts the ICI collectives.
    ``opt_shardings`` additionally pins the ZeRO-1 moment placement (see
    make_train_step)."""
    step_fn = make_train_step(cfg, ocfg, opt_shardings=opt_shardings)
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
