"""Device-mesh parallelism (dp x spatial) — a first-class component here
even though the reference has none beyond nn.DataParallel (SURVEY.md §5.8)."""

from diffmvs_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    shard_batch,
    replicate,
)
