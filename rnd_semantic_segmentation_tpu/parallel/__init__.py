from .mesh import (
    batch_sharding,
    initialize_distributed,
    make_mesh,
    process_is_primary,
    replicate_state,
    replicated,
    shard_batch,
)
