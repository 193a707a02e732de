"""Device mesh + sharding rules: SPMD replacement for the reference's DDP.

The reference parallelizes with torch DDP over NCCL only (reference:
steps/trainer.py:145-149, SURVEY.md §2.2). Here a single SPMD program runs
over a ``jax.sharding.Mesh`` with axes:

- ``data``: batch sharding (DDP equivalent); gradients are reduced by XLA
  collectives over ICI — no explicit all_reduce calls anywhere;
- ``model``: optional tensor parallelism. Attention heads and MLP hidden are
  sharded column/row-wise so each matmul pair needs a single reduce-scatter/
  all-gather pair, and the 256k-row text embedding + 65k audio head shard
  over their vocab axes.

The reference's explicit collectives (NaN-flag all_reduce, metric sums,
early-stop broadcasts — steps/trainer.py:314-397) disappear: under SPMD they
are replicated values of the single program.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PyTree = Any

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(dp: Optional[int] = None, tp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Mesh with axes (data, model). Defaults to all devices data-parallel."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp({dp}) * tp({tp}) != device count ({n})")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


# ---------------------------------------------------------------------------
# sharding rules
# ---------------------------------------------------------------------------


def _stack_spec(path, leaf) -> P:
    """PartitionSpec for one parameter leaf of the voice model pytree."""
    keys = [getattr(k, "key", None) for k in path]
    name = keys[-1]
    in_layers = "layers" in keys or "blocks" in keys

    if "self_attn" in keys or "cross_attn" in keys:
        # kernels are [L, in, out]; q/k/v shard the head (out) axis, o the
        # head (in) axis -> one collective pair per attention block
        if name in ("q", "k", "v"):
            return P(None, None, MODEL_AXIS)
        if name == "o":
            return P(None, MODEL_AXIS, None)
    if "mlp" in keys:
        if name in ("gate", "up"):
            return P(None, None, MODEL_AXIS)
        if name == "down":
            return P(None, MODEL_AXIS, None)
    if name == "embed" and not in_layers:
        return P(MODEL_AXIS, None)       # vocab-sharded text embedding
    if keys[-2:] == ["head", "w1"]:
        return P(None, MODEL_AXIS)
    if keys[-2:] == ["head", "w2"]:
        return P(MODEL_AXIS, None) if leaf.ndim == 2 else P()
    if name == "audio_embed":
        return P(MODEL_AXIS, None)
    # norms, biases, small tensors: replicated
    return P(*([None] * leaf.ndim)) if leaf.ndim else P()


def _respect_divisibility(spec: P, leaf, mesh: Mesh) -> P:
    """Replace shardings that don't divide the dimension with replication
    (e.g. the 65541-row audio vocab is not a multiple of typical tp sizes)."""
    out = []
    for dim, axis in enumerate(tuple(spec) + (None,) * (leaf.ndim - len(spec))):
        if axis is None:
            out.append(None)
        elif leaf.shape[dim] % mesh.shape[axis] == 0:
            out.append(axis)
        else:
            out.append(None)
    return P(*out)


def param_specs(params: PyTree, mesh: Optional[Mesh] = None) -> PyTree:
    specs = jax.tree_util.tree_map_with_path(_stack_spec, params)
    if mesh is None:
        return specs
    return jax.tree_util.tree_map(
        lambda s, x: _respect_divisibility(s, x, mesh), specs, params,
        is_leaf=lambda v: isinstance(v, P),
    )


def shard_params(params: PyTree, mesh: Mesh) -> PyTree:
    specs = param_specs(params, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def _zero_spec(spec: P, leaf, mesh: Mesh) -> P:
    """Extend a param spec with DATA-axis sharding on the first free,
    divisible dimension (ZeRO-1: optimizer moments split across dp)."""
    dp = mesh.shape[DATA_AXIS]
    if dp <= 1 or leaf.ndim == 0:
        return spec
    dims = list(tuple(spec) + (None,) * (leaf.ndim - len(spec)))
    for d, ax in enumerate(dims):
        if ax is None and leaf.shape[d] % dp == 0 and leaf.shape[d] >= dp:
            dims[d] = DATA_AXIS
            break
    return P(*dims)


_MOMENT_FIELDS = ("delta", "exp_avg_sq", "mu", "nu")


def opt_state_shardings(opt, params: PyTree, mesh: Mesh):
    """Same-structure tree of NamedShardings for an optimizer state under
    ZeRO-1: param-shaped moment trees get the dp-extended param specs
    (_zero_spec), everything else (scalars, per-tensor rms buffers) is
    replicated. Used both to place the state (shard_opt_state) and to PIN
    it inside the jitted step via with_sharding_constraint — without the
    pin, GSPMD may re-place the updated moments after the first step and
    silently lose the memory saving."""
    specs = param_specs(params, mesh)
    rep = NamedSharding(mesh, P())

    def shard_tree(tree):
        return jax.tree_util.tree_map(
            lambda x, s: NamedSharding(mesh, _zero_spec(s, x, mesh)),
            tree, specs,
        )

    fields = {}
    for name in opt._fields:
        val = getattr(opt, name)
        if name in _MOMENT_FIELDS:
            fields[name] = shard_tree(val)
        else:
            fields[name] = jax.tree_util.tree_map(lambda x: rep, val)
    return type(opt)(**fields)


def shard_opt_state(opt, params: PyTree, mesh: Mesh):
    """ZeRO-1 sharding of the optimizer state: the param-shaped moment
    trees (ScaledAdam delta/exp_avg_sq, AdamW mu/nu — f32, 2x the bf16
    params each) are sharded over the DATA axis on top of any
    tensor-parallel sharding, dividing optimizer memory by the dp size.
    XLA inserts the gathers/slices around the update (the reference has no
    equivalent; DDP replicates optimizer state per rank)."""
    shardings = opt_state_shardings(opt, params, mesh)
    fields = {
        name: jax.tree_util.tree_map(
            jax.device_put, getattr(opt, name), getattr(shardings, name))
        for name in _MOMENT_FIELDS if hasattr(opt, name)
    }
    return opt._replace(**fields) if fields else opt


def batch_spec(axis: int = 0) -> P:
    return P(*([None] * axis), DATA_AXIS)


def shard_batch(batch: PyTree, mesh: Mesh, axis: int = 0,
                via_process_local: bool = None) -> PyTree:
    """Shard the batch dimension (dim ``axis``; train batches are
    [n_micro, B, ...] so use axis=1 there).

    Multi-host (pod-slice) feeding: every process holds the same seeded
    sampler, materializes the identical GLOBAL numpy batch, and this
    function hands JAX only the rows this process's devices own
    (``jax.make_array_from_process_local_data``). That replaces the
    reference's per-rank DDP dataloader sharding (reference:
    trainer_utils.py:118, 411) without any cross-host data exchange —
    the only requirement is that all hosts see the same dataset files.

    ``via_process_local`` forces the multi-host assembly path (tests
    exercise it on a single host, where local == global).
    """
    import numpy as np

    if via_process_local is None:
        via_process_local = jax.process_count() > 1

    def put(x):
        dim = min(axis, x.ndim - 1)
        spec = P(*([None] * dim), DATA_AXIS)
        sharding = NamedSharding(mesh, spec)
        if not via_process_local:
            return jax.device_put(x, sharding)
        x = np.asarray(x)
        gshape = x.shape
        idx_map = sharding.addressable_devices_indices_map(gshape)
        spans = sorted({
            (sl[dim].start or 0,
             gshape[dim] if sl[dim].stop is None else sl[dim].stop)
            for sl in idx_map.values()
        })  # deduped: tensor-parallel siblings share the same data rows
        starts = [s for s, _ in spans]
        stops = [e for _, e in spans]
        lo, hi = min(starts), max(stops)
        # the [lo, hi) span must be exactly this process's rows: a mesh
        # whose data axis interleaves devices across processes would make
        # the span cover rows owned elsewhere and silently misassign them
        owned = sum(e - s for s, e in spans)
        if hi - lo != owned:
            raise ValueError(
                "shard_batch needs each process's batch rows to be "
                f"contiguous along the data axis; got slices {sorted(starts)}"
                f"->{sorted(stops)} spanning {hi - lo} rows but owning "
                f"{owned}. Build the mesh with process-contiguous device "
                "order (parallel.make_mesh does).")
        local = x[(slice(None),) * dim + (slice(lo, hi),)]
        return jax.make_array_from_process_local_data(sharding, local, gshape)

    return jax.tree_util.tree_map(put, batch)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_slot_state(state, mesh: Mesh):
    """dp-shard a continuous-batching ``SlotState`` over its slot axis.

    Multi-device continuous serving: the resident batch's B slots split
    over the DATA axis so each device decodes B/dp rows (the vLLM-style
    counterpart of the reference's single-GPU Gradio loop). Dense-cache
    states only: the paged cache folds batch into its ``L*B`` row axis
    (layer-major, so a contiguous dp split cuts at LAYER boundaries, not
    slot boundaries) — shard those over the MODEL axis via shard_params
    instead, keeping the state replicated.

    Leaf rules: ``DecoderCache`` slabs are [L, B, ...] (slots at dim 1);
    every other SlotState leaf carries slots at dim 0.
    """
    from ..models import t5gemma

    if not isinstance(state.cache, t5gemma.DecoderCache):
        raise ValueError(
            "shard_slot_state supports dense-cache SlotStates only: the "
            "paged cache's [Hkv, L*B, ...] slabs fold batch layer-major, "
            "so a data-axis split lands on layer boundaries. Use tensor "
            "parallelism (shard_params) with a replicated state instead.")
    dp = mesh.shape[DATA_AXIS]
    b = state.tokens.shape[0]
    if b % dp != 0:
        raise ValueError(f"slot count {b} not divisible by dp={dp}")

    cache = jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P(None, DATA_AXIS))), state.cache)
    rest = {
        f: jax.device_put(getattr(state, f),
                          NamedSharding(mesh, P(DATA_AXIS)))
        for f in state._fields if f != "cache"
    }
    return state._replace(cache=cache, **rest)
