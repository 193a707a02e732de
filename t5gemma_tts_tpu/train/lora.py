"""LoRA fine-tuning: low-rank adapters over the backbone projections.

Functional counterpart of the reference's peft wrapping (reference:
models/t5gemma.py:552-599 ``_enable_lora``: r=16, alpha=32, dropout 0.05,
targets q/k/v/o/gate/up/down) — instead of monkey-patching modules, adapters
live in their own pytree and are *merged into effective weights inside the
jitted step*:

    W_eff = W + (alpha / r) * A @ B

with ``stop_gradient`` on W, so only A/B receive gradients and the optimizer
runs on the adapter tree alone. Merging costs one [L, d, r] x [L, r, f]
matmul per target per step — noise next to the forward pass — and keeps the
model code completely unchanged.

``merge()`` folds adapters into plain parameters for export (the reference's
``merge_and_unload``, scripts/export_t5gemma_voice_hf_lora.py:111).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Tuple

import jax
import jax.numpy as jnp

PyTree = Any

DEFAULT_TARGETS = ("q", "k", "v", "o", "gate", "up", "down")


@dataclass(frozen=True)
class LoraConfig:
    r: int = 16
    alpha: int = 32
    targets: Tuple[str, ...] = DEFAULT_TARGETS
    # adapt backbone attention + mlp only, like the reference peft config
    subtrees: Tuple[str, ...] = ("encoder", "decoder")

    @property
    def scale(self) -> float:
        return self.alpha / self.r


def _is_target(path, cfg: LoraConfig) -> bool:
    keys = [getattr(k, "key", None) for k in path]
    if not keys or keys[0] not in cfg.subtrees:
        return False
    if "layers" not in keys:
        return False
    return keys[-1] in cfg.targets and any(
        k in ("self_attn", "cross_attn", "mlp") for k in keys
    )


def init_adapters(rng: jax.Array, params: PyTree, cfg: LoraConfig) -> PyTree:
    """Adapter tree with A ~ N(0, 1/r) and B = 0 (standard LoRA init); leaf
    value None marks non-adapted parameters."""
    counter = [0]

    def make(path, leaf):
        if not _is_target(path, cfg) or leaf.ndim != 3:
            return None
        counter[0] += 1
        k = jax.random.fold_in(rng, counter[0])
        n_layers, d_in, d_out = leaf.shape
        a = jax.random.normal(k, (n_layers, d_in, cfg.r), jnp.float32) / cfg.r
        b = jnp.zeros((n_layers, cfg.r, d_out), jnp.float32)
        return {"a": a.astype(leaf.dtype), "b": b.astype(leaf.dtype)}

    return jax.tree_util.tree_map_with_path(
        make, params, is_leaf=lambda x: hasattr(x, "ndim")
    )


def _combine_trees(params: PyTree, adapters: PyTree, fn) -> PyTree:
    leaves, treedef = jax.tree_util.tree_flatten(params)
    ads = treedef.flatten_up_to(adapters)
    return jax.tree_util.tree_unflatten(
        treedef, [fn(p, a) for p, a in zip(leaves, ads)]
    )


@jax.tree_util.register_pytree_node_class
class LoraWeight:
    """A factored LoRA leaf: matmuls compute x@W + ((x@A)@B) * scale.

    Materializing merged weights (``apply``) costs a full effective-param
    tree in the forward AND a full-tree cotangent in the backward — measured
    30 GB for a 2b-2b LoRA step, an OOM on one 16 GB chip. The factored
    form keeps the base frozen in place; backward touches only the
    adapter-sized tensors, so the flagship LoRA-fine-tunes on a single v5e.
    ``ops.quant.q_matmul`` dispatches on this type."""

    def __init__(self, w, a, b, scale: float):
        self.w, self.a, self.b = w, a, b
        self.scale = scale

    @property
    def ndim(self):
        return self.w.ndim

    @property
    def shape(self):
        return self.w.shape

    def tree_flatten(self):
        return (self.w, self.a, self.b), self.scale

    @classmethod
    def tree_unflatten(cls, scale, leaves):
        return cls(*leaves, scale)


def wrap(params: PyTree, adapters: PyTree, cfg: LoraConfig) -> PyTree:
    """Params tree with adapted leaves replaced by factored LoraWeight
    nodes (the memory-lean counterpart of ``apply``)."""
    def combine(p, ad):
        if ad is None:
            return jax.lax.stop_gradient(p)
        return LoraWeight(jax.lax.stop_gradient(p), ad["a"], ad["b"],
                          cfg.scale)

    return _combine_trees(params, adapters, combine)


def apply(params: PyTree, adapters: PyTree, cfg: LoraConfig) -> PyTree:
    """Effective params: frozen base + scaled low-rank update."""
    def combine(p, ad):
        if ad is None:
            return jax.lax.stop_gradient(p)
        delta = jnp.einsum(
            "lir,lro->lio", ad["a"].astype(jnp.float32),
            ad["b"].astype(jnp.float32),
        ) * cfg.scale
        return jax.lax.stop_gradient(p) + delta.astype(p.dtype)

    return _combine_trees(params, adapters, combine)


def merge(params: PyTree, adapters: PyTree, cfg: LoraConfig) -> PyTree:
    """Fold adapters into plain weights (export path)."""
    def combine(p, ad):
        if ad is None:
            return p
        delta = jnp.einsum(
            "lir,lro->lio", ad["a"].astype(jnp.float32),
            ad["b"].astype(jnp.float32),
        ) * cfg.scale
        return (p.astype(jnp.float32) + delta).astype(p.dtype)

    return _combine_trees(params, adapters, combine)
