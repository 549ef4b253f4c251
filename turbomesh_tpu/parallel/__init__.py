"""Multi-chip parallelism: block-sharded elliptic smoothing over a device mesh."""

from .shard import ShardedSmoother

__all__ = ["ShardedSmoother"]
