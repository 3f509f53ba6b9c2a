from mmrs_tpu.parallel.mesh import make_mesh, shard_rows, replicate  # noqa: F401
from mmrs_tpu.parallel.topk import sharded_cosine_topk  # noqa: F401
from mmrs_tpu.parallel.dedup import sharded_first_match  # noqa: F401
from mmrs_tpu.parallel.multihost import (  # noqa: F401
    distributed_init,
    make_hybrid_mesh,
    process_local_rows,
)
