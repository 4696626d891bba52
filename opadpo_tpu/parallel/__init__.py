from opadpo_tpu.parallel.mesh import (  # noqa: F401
    MeshConfig,
    make_mesh,
    batch_spec,
    replicated_spec,
)
from opadpo_tpu.parallel.sharding import (  # noqa: F401
    param_partition_specs,
    zero1_opt_state_specs,
    shard_pytree,
    shard_train_state_zero1,
)
