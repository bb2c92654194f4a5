from .mesh import (DATA_AXIS, make_mesh, make_sharded_train_step,
                   shard_batch, replicate)  # noqa: F401
