from .dp import (make_parallel_scanned_train_step,  # noqa: F401
                 make_parallel_train_step, replicate, shard_batch,
                 shard_batch_stack)
from .mesh import make_mesh  # noqa: F401
