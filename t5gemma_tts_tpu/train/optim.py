"""ScaledAdam optimizer + Eden schedule, TPU-native (optax-style).

Re-derivation of the icefall optimizer the reference trains with (reference:
steps/optim.py:161-693 ``ScaledAdam``, :792-840 ``Eden``; instantiated with
betas=(0.9, 0.95), clipping_scale=2.0 at steps/trainer.py:1293-1317):

- parameter-rms-scaled updates: step size proportional to each tensor's rms,
  recomputed every ``size_update_period`` steps;
- a learned per-tensor scale (gradient-descent on the log-scale via the
  (p * grad).sum() ring buffer), clamped by param_min_rms/param_max_rms;
- median-based adaptive gradient clipping: the clipping threshold is
  ``clipping_scale`` x the median of the last ``clipping_update_period``
  model-norm measurements (norms of rms-scaled gradients);
- a single ``delta`` momentum buffer combining all update types.

Where the torch version batches same-shaped tensors to cut kernel launches
(steps/optim.py:64-158), here the layer-stacked parameter layout gives the
same effect for free: each [L, ...] leaf is one batched update, and XLA fuses
across leaves anyway. The reference's data-dependent Python branches
(periodic rms refresh, clip-threshold refresh) become ``jnp.where`` selects
on the traced step counter, so the whole update jits into the train step.

Everything is a pure function: ``init`` builds the state pytree, ``update``
maps (grads, state, params, lr) -> (new_params, new_state).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

PyTree = Any


@dataclass(frozen=True)
class ScaledAdamConfig:
    betas: Tuple[float, float] = (0.9, 0.95)
    clipping_scale: Optional[float] = 2.0
    scalar_lr_scale: float = 0.1
    eps: float = 1e-8
    param_min_rms: float = 1e-5
    param_max_rms: float = 3.0
    scalar_max: float = 10.0
    size_update_period: int = 4
    clipping_update_period: int = 600


class ScaledAdamState(NamedTuple):
    step: jnp.ndarray              # scalar int32
    delta: PyTree                  # momentum of updates, like params
    exp_avg_sq: PyTree             # like params
    param_rms: PyTree              # per-tensor rms, batch dims kept
    scale_exp_avg_sq: PyTree       # like param_rms
    scale_grads: PyTree            # [size_update_period, *param_rms.shape]
    model_norms: jnp.ndarray       # [clipping_update_period] ring buffer
    norm_threshold: jnp.ndarray    # scalar f32 (clipping threshold)


def _is_stacked(path) -> bool:
    """Leaves under a 'layers'/'blocks' key carry a leading stack axis that
    plays the role of the torch BatchedOptimizer's batch dim."""
    return any(
        getattr(k, "key", None) in ("layers", "blocks") for k in path
    )


def _reduce_dims(leaf: jnp.ndarray, stacked: bool):
    start = 1 if (stacked and leaf.ndim >= 1) else 0
    return tuple(range(start, leaf.ndim))


def _rms(p: jnp.ndarray, stacked: bool) -> jnp.ndarray:
    dims = _reduce_dims(p, stacked)
    return jnp.sqrt(jnp.mean(p.astype(jnp.float32) ** 2, axis=dims,
                             keepdims=True))


def _is_scalarish(p: jnp.ndarray, stacked: bool) -> bool:
    """numel-per-real-tensor == 1 (reference treats these with plain Adam)."""
    if stacked:
        return int(jnp.size(p)) == (p.shape[0] if p.ndim else 1)
    return int(jnp.size(p)) == 1


def init(params: PyTree, cfg: ScaledAdamConfig) -> ScaledAdamState:
    paths = jax.tree_util.tree_map_with_path(lambda p, _: _is_stacked(p), params)
    f32 = lambda x: jnp.zeros_like(x, jnp.float32)  # noqa: E731

    def rms_like(p, stacked):
        return _rms(p.astype(jnp.float32), stacked)

    param_rms = jax.tree_util.tree_map_with_path(
        lambda path, p: rms_like(p, _is_stacked(path)), params
    )
    return ScaledAdamState(
        step=jnp.int32(0),
        delta=jax.tree_util.tree_map(f32, params),
        exp_avg_sq=jax.tree_util.tree_map(f32, params),
        param_rms=param_rms,
        scale_exp_avg_sq=jax.tree_util.tree_map(lambda r: jnp.zeros_like(r),
                                                param_rms),
        scale_grads=jax.tree_util.tree_map(
            lambda r: jnp.zeros((cfg.size_update_period, *r.shape), jnp.float32),
            param_rms,
        ),
        model_norms=jnp.zeros((cfg.clipping_update_period,), jnp.float32),
        norm_threshold=jnp.float32(0.0),
    )


def update(
    grads: PyTree,
    state: ScaledAdamState,
    params: PyTree,
    lr: jnp.ndarray,
    cfg: ScaledAdamConfig,
) -> Tuple[PyTree, ScaledAdamState]:
    beta1, beta2 = cfg.betas
    step = state.step
    period = cfg.size_update_period

    leaves_p, treedef = jax.tree_util.tree_flatten(params)
    paths = [p for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]]
    stacked = [_is_stacked(p) for p in paths]
    leaves_g = treedef.flatten_up_to(grads)
    leaves_g = [g.astype(jnp.float32) for g in leaves_g]
    leaves_p32 = [p.astype(jnp.float32) for p in leaves_p]
    rms_list = treedef.flatten_up_to(state.param_rms)

    # ---- adaptive clipping (reference steps/optim.py:347-443) -------------
    if cfg.clipping_scale is not None:
        tot_sumsq = jnp.float32(0.0)
        for g, r, p, st in zip(leaves_g, rms_list, leaves_p32, stacked):
            if _is_scalarish(p, st):
                tot_sumsq += jnp.sum(g * g)
            else:
                tot_sumsq += jnp.sum((g * r) ** 2)
        tot_norm = jnp.sqrt(tot_sumsq)

        cup = cfg.clipping_update_period
        model_norms = state.model_norms.at[step % cup].set(tot_norm)
        # refresh threshold when step % cup == 0 (and step > 0)
        sorted_norms = jnp.sort(model_norms)
        median = sorted_norms[(cup // 4) * 2]
        refresh = (step % cup == 0) & (step > 0)
        norm_threshold = jnp.where(refresh, cfg.clipping_scale * median,
                                   state.norm_threshold)
        clip = jnp.where(
            step < cup, 1.0,
            jnp.minimum(1.0, norm_threshold / (tot_norm + 1e-20)),
        )
        leaves_g = [g * clip for g in leaves_g]
    else:
        model_norms = state.model_norms
        norm_threshold = state.norm_threshold

    # ---- per-tensor updates ------------------------------------------------
    delta_list = treedef.flatten_up_to(state.delta)
    eas_list = treedef.flatten_up_to(state.exp_avg_sq)
    seas_list = treedef.flatten_up_to(state.scale_exp_avg_sq)
    sg_list = treedef.flatten_up_to(state.scale_grads)

    new_p, new_delta, new_eas, new_rms, new_seas, new_sg = [], [], [], [], [], []
    is_rms_step = (step % period) == (period - 1)

    for p, g, delta, eas, rms, seas, sgrads, st in zip(
        leaves_p32, leaves_g, delta_list, eas_list, rms_list, seas_list,
        sg_list, stacked,
    ):
        delta = beta1 * delta
        if _is_scalarish(p, st):
            # plain Adam for scalars (reference :672-693)
            eas = beta2 * eas + (1 - beta2) * g * g
            bias2 = 1 - beta2 ** (step.astype(jnp.float32) + 1)
            denom = jnp.sqrt(eas / bias2) + cfg.eps
            delta = delta - lr * cfg.scalar_lr_scale * (1 - beta1) * g / denom
            p2 = jnp.clip(p, -cfg.scalar_max, cfg.scalar_max) + delta
            new_p.append(p2)
            new_delta.append(delta)
            new_eas.append(eas)
            new_rms.append(rms)
            new_seas.append(seas)
            new_sg.append(sgrads)
            continue

        dims = _reduce_dims(p, st)
        # record scale grad in ring buffer
        sgrads = sgrads.at[step % period].set(
            jnp.sum(p * g, axis=dims, keepdims=True)
        )

        # periodic rms + learned-scale update (reference :528-628)
        fresh_rms = jnp.sqrt(jnp.mean(p * p, axis=dims, keepdims=True))
        rms2 = jnp.where(is_rms_step, fresh_rms, rms)

        beta2c = beta2 ** period
        seas_new = beta2c * seas + (1 - beta2c) * jnp.mean(sgrads ** 2, axis=0)
        size_step = ((step + 1) // period).astype(jnp.float32)
        bias2 = 1 - beta2c ** size_step
        size_lr = lr * cfg.scalar_lr_scale
        scale_step = (
            -size_lr * jnp.sqrt(jnp.maximum(bias2, 0.0))
            * jnp.sum(sgrads, axis=0)
            / (jnp.sqrt(seas_new) + cfg.eps)
        )
        scale_step = jnp.where(rms2 < cfg.param_min_rms, 0.0, scale_step)
        scale_step = jnp.where(rms2 > cfg.param_max_rms,
                               -size_lr * period, scale_step)
        do_size = is_rms_step & (step > 0)
        seas = jnp.where(do_size, seas_new, seas)
        delta = delta + jnp.where(do_size, (1 - beta1) * p * scale_step, 0.0)

        # main rms-scaled Adam step (reference :629-670)
        eas = beta2 * eas + (1 - beta2) * g * g
        bias2m = 1 - beta2 ** (step.astype(jnp.float32) + 1)
        eas_used = jnp.where(bias2m < 0.99, eas / jnp.maximum(bias2m, 1e-8), eas)
        denom = jnp.sqrt(eas_used) + cfg.eps
        alpha = -lr * (1 - beta1) * jnp.maximum(rms2, cfg.param_min_rms)
        delta = delta + alpha * (g / denom)
        new_p.append(p + delta)
        new_delta.append(delta)
        new_eas.append(eas)
        new_rms.append(rms2)
        new_seas.append(seas)
        new_sg.append(sgrads)

    cast = [np_.astype(orig.dtype) for np_, orig in zip(new_p, leaves_p)]
    return (
        jax.tree_util.tree_unflatten(treedef, cast),
        ScaledAdamState(
            step=step + 1,
            delta=jax.tree_util.tree_unflatten(treedef, new_delta),
            exp_avg_sq=jax.tree_util.tree_unflatten(treedef, new_eas),
            param_rms=jax.tree_util.tree_unflatten(treedef, new_rms),
            scale_exp_avg_sq=jax.tree_util.tree_unflatten(treedef, new_seas),
            scale_grads=jax.tree_util.tree_unflatten(treedef, new_sg),
            model_norms=model_norms,
            norm_threshold=norm_threshold,
        ),
    )


# ---------------------------------------------------------------------------
# AdamW (the reference's simple path, steps/trainer.py:1320-1333)
# ---------------------------------------------------------------------------


class AdamWState(NamedTuple):
    step: jnp.ndarray
    mu: PyTree
    nu: PyTree


@dataclass(frozen=True)
class AdamWConfig:
    betas: Tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-8
    weight_decay: float = 1e-2
    grad_clip: float = 1.0  # reference --gradient_clip_val


def adamw_init(params: PyTree) -> AdamWState:
    z = lambda: jax.tree_util.tree_map(  # noqa: E731
        lambda p: jnp.zeros_like(p, jnp.float32), params)
    return AdamWState(step=jnp.int32(0), mu=z(), nu=z())


def adamw_update(grads: PyTree, state: AdamWState, params: PyTree,
                 lr: jnp.ndarray, cfg: AdamWConfig):
    b1, b2 = cfg.betas
    if cfg.grad_clip and cfg.grad_clip > 0:
        gsq = sum(jnp.sum(g.astype(jnp.float32) ** 2)
                  for g in jax.tree_util.tree_leaves(grads))
        gnorm = jnp.sqrt(gsq)
        scale = jnp.minimum(1.0, cfg.grad_clip / (gnorm + 1e-6))
        grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
    step = state.step + 1
    bc1 = 1 - b1 ** step.astype(jnp.float32)
    bc2 = 1 - b2 ** step.astype(jnp.float32)

    def upd(p, g, m, v):
        g = g.astype(jnp.float32)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        update = (m / bc1) / (jnp.sqrt(v / bc2) + cfg.eps)
        p32 = p.astype(jnp.float32)
        p32 = p32 - lr * (update + cfg.weight_decay * p32)
        return p32.astype(p.dtype), m, v

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(state.mu)
    flat_v = treedef.flatten_up_to(state.nu)
    out = [upd(p, g, m, v) for p, g, m, v in zip(flat_p, flat_g, flat_m, flat_v)]
    new_p = jax.tree_util.tree_unflatten(treedef, [o[0] for o in out])
    new_m = jax.tree_util.tree_unflatten(treedef, [o[1] for o in out])
    new_v = jax.tree_util.tree_unflatten(treedef, [o[2] for o in out])
    return new_p, AdamWState(step=step, mu=new_m, nu=new_v)


# ---------------------------------------------------------------------------
# Eve (reference baseline optimizer, steps/optim.py:869-1018): AdamW whose
# weight decay only applies while a tensor's rms exceeds target_rms
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class EveConfig:
    betas: Tuple[float, float] = (0.9, 0.98)
    eps: float = 1e-8
    weight_decay: float = 1e-3
    target_rms: float = 0.1


def eve_init(params: PyTree) -> AdamWState:
    return adamw_init(params)


def eve_update(grads: PyTree, state: AdamWState, params: PyTree,
               lr: jnp.ndarray, cfg: EveConfig):
    b1, b2 = cfg.betas
    step = state.step + 1
    bc1 = 1 - b1 ** step.astype(jnp.float32)
    bc2 = 1 - b2 ** step.astype(jnp.float32)

    def upd(p, g, m, v):
        g = g.astype(jnp.float32)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        denom = jnp.sqrt(v) * bc2 ** -0.5 + cfg.eps
        p32 = p.astype(jnp.float32)
        if int(jnp.size(p)) > 1:
            above = jnp.linalg.norm(p32.reshape(-1)) > (
                cfg.target_rms * jnp.size(p) ** 0.5
            )
            p32 = p32 * (1 - cfg.weight_decay * above.astype(jnp.float32))
        p32 = p32 - (lr / bc1) * m / denom
        return p32.astype(p.dtype), m, v

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(state.mu)
    flat_v = treedef.flatten_up_to(state.nu)
    out = [upd(p, g, m, v) for p, g, m, v in zip(flat_p, flat_g, flat_m, flat_v)]
    return (
        jax.tree_util.tree_unflatten(treedef, [o[0] for o in out]),
        AdamWState(
            step=step,
            mu=jax.tree_util.tree_unflatten(treedef, [o[1] for o in out]),
            nu=jax.tree_util.tree_unflatten(treedef, [o[2] for o in out]),
        ),
    )


# ---------------------------------------------------------------------------
# schedules
# ---------------------------------------------------------------------------


def eden_lr(base_lr: float, batch, epoch, lr_batches: float,
            lr_epochs: float, warmup_batches: float):
    """Eden schedule (reference steps/optim.py:792-840). All args may be
    traced scalars; the trainer maps epoch = step // pseudo_epoch_size + 1
    (reference steps/trainer.py:219-220)."""
    batch = jnp.asarray(batch, jnp.float32)
    epoch = jnp.asarray(epoch, jnp.float32)
    factor = (
        ((batch ** 2 + lr_batches ** 2) / lr_batches ** 2) ** -0.25
        * (((epoch ** 2 + lr_epochs ** 2) / lr_epochs ** 2) ** -0.25)
    )
    warmup = jnp.where(
        batch >= warmup_batches, 1.0, 0.5 + 0.5 * batch / max(warmup_batches, 1e-8)
    )
    return base_lr * factor * warmup


def linear_warmup_decay_lr(base_lr: float, step, total_steps: int,
                           warmup_steps: float):
    """AdamW path: linear warmup then linear decay
    (reference steps/trainer.py:1320-1333)."""
    step = jnp.asarray(step, jnp.float32)
    warm = step / jnp.maximum(warmup_steps, 1.0)
    decay = jnp.maximum(
        0.0, (total_steps - step) / jnp.maximum(total_steps - warmup_steps, 1.0)
    )
    return base_lr * jnp.where(step < warmup_steps, warm, decay)


def dominant_parameter_report(grads: PyTree, state: ScaledAdamState,
                              params: PyTree, top_k: int = 3):
    """Which tensors dominate the clipped quantity sum((grad*param_rms)^2)?

    Observability mirror of the reference's dominant-parameter diagnostic
    (reference steps/optim.py:445-508): when training misbehaves (NaN skip,
    exploding norm), this names the culprit tensor instead of leaving an
    anonymous global norm. Returns a list of dicts sorted by proportion,
    ``[{name, proportion, sumsq, grad_sumsq, rms_sq}, ...]``; host-side,
    for logging — do not call it inside the jitted step.
    """
    import numpy as np

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    paths = [p for p, _ in flat]
    leaves_p = [leaf for _, leaf in flat]
    treedef = jax.tree_util.tree_structure(params)
    leaves_g = treedef.flatten_up_to(grads)
    rms_list = treedef.flatten_up_to(state.param_rms)
    stacked = [_is_stacked(p) for p in paths]

    rows = []
    for path, p, g, r, st in zip(paths, leaves_p, leaves_g, rms_list, stacked):
        g = np.asarray(g, np.float32)
        if _is_scalarish(p, st):
            sumsq = float((g ** 2).sum())
            rms_sq = 1.0
        else:
            r = np.asarray(r, np.float32)
            sumsq = float(((g * r) ** 2).sum())
            rms_sq = float((r ** 2).mean())
        rows.append({
            "name": jax.tree_util.keystr(path),
            "sumsq": sumsq,
            "grad_sumsq": float((g ** 2).sum()),
            "rms_sq": rms_sq,
        })
    tot = max(sum(row["sumsq"] for row in rows), 1e-30)
    for row in rows:
        row["proportion"] = row["sumsq"] / tot
    rows.sort(key=lambda row: row["proportion"], reverse=True)
    return rows[:top_k]
