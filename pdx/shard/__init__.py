"""pdx.shard — device-mesh construction and sharded sufficient statistics."""

from pdx.shard.mesh import (
    make_mesh,
    sharded_gram_stats,
    shard_batch,
)

__all__ = ["make_mesh", "sharded_gram_stats", "shard_batch"]
