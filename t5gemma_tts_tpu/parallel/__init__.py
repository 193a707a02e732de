from .mesh import (  # noqa: F401
    batch_spec, make_mesh, opt_state_shardings, param_specs, shard_batch,
    shard_opt_state, shard_params, shard_slot_state,
)
