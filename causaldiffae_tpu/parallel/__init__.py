"""Device mesh + sharding (data parallelism over ICI)."""

from .mesh import DATA_AXIS, MODEL_AXIS, data_sharding, host_local_batch_size, make_mesh, replicated, shard_batch
