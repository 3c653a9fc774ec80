"""Multi-chip / multi-host scaling (the reference's only parallelism is
goroutine fan-out, SURVEY.md §2 row 18; here it is mesh-sharded data
parallelism over the ciphertext batch axis with replicated keys)."""

from .mesh import (BATCH_AXIS, make_mesh, multihost_initialize,
                   replicate_keys, shard_batch, sharded_bootstrap)
