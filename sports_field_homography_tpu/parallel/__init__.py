from .mesh import (
    make_mesh,
    data_sharding,
    replicated,
    shard_train_step,
    shard_predict_fn,
    spatial_forward_fn,
)
