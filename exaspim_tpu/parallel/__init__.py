"""Multi-chip parallelism: meshes, data-parallel training, spatial
sharding with ICI halo exchange."""

from exaspim_tpu.parallel.bm4d_sharded import bm4d_halo, bm4d_sharded
from exaspim_tpu.parallel.data_parallel import make_dp_train_step, shard_batch
from exaspim_tpu.parallel.mesh import make_mesh, replicated, sharded_along
from exaspim_tpu.parallel.multihost import initialize_multihost, is_primary
from exaspim_tpu.parallel.spatial import plan_shards, predict_sharded

__all__ = [
    "bm4d_halo",
    "bm4d_sharded",
    "initialize_multihost",
    "is_primary",
    "make_dp_train_step",
    "make_mesh",
    "plan_shards",
    "predict_sharded",
    "replicated",
    "shard_batch",
    "sharded_along",
]
