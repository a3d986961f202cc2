from tdwss.parallel.dp import (  # noqa: F401
    make_dp_train_step,
    make_mesh,
    shard_batch,
    stack_batches,
)
