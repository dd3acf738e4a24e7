"""Device mesh + sharding (data + tensor parallelism over ICI)."""

from .collectives import (
    gather_across_hosts,
    is_primary_host,
    mean_across_hosts,
    sync_across_hosts,
)
from .mesh import (DATA_AXIS, MODEL_AXIS, data_sharding, eval_placement,
                   host_local_batch_size, local_eval_mesh, make_mesh,
                   replicated, shard_batch, shard_host_local)
from .partition import (count_sharded, partition_state, state_partition_specs,
                        unet_param_specs)
