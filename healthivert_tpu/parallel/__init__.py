from .mesh import make_mesh, pad_batch, shard_batch, replicate_state  # noqa: F401
from .distributed import ensure_initialized, process_batch_slice  # noqa: F401
