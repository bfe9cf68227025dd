from awesome_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batched,
    replicate,
    fit_priors_sharded,
    fit_spatiotemporal_sharded,
)
