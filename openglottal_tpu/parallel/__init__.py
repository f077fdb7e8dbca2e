from openglottal_tpu.parallel.distributed import (  # noqa: F401
    initialize_distributed,
    is_primary,
    process_index,
)
from openglottal_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    replicate,
)
