from .mesh import (
    make_mesh,
    data_sharding,
    replicated,
    shard_train_step,
    shard_predict_fn,
    spatial_forward_fn,
)
from .distributed import (
    initialize_distributed,
    global_mesh,
    process_slice,
    host_local_batch_to_global,
)
