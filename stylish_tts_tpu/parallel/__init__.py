from .mesh import (  # noqa: F401
    make_mesh,
    replicate,
    shard_batch,
    make_parallel_train_step,
    make_parallel_eval_step,
)
from .multihost import (  # noqa: F401
    global_batch_from_local,
    initialize_distributed,
    is_main_process,
)
