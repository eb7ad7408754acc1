from .dp import (batch_axes, make_parallel_scanned_train_step,  # noqa: F401
                 make_parallel_train_step, replicate, shard_batch,
                 shard_batch_stack)
from .mesh import DCN_AXIS, make_hybrid_mesh, make_mesh  # noqa: F401
