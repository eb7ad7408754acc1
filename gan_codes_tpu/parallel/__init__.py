from .dp import make_parallel_train_step, replicate, shard_batch  # noqa: F401
from .mesh import make_mesh  # noqa: F401
