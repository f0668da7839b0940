from kiss_icp_tpu.parallel.batch import (  # noqa: F401
    BatchedOdometry,
    batched_state_sharding,
    init_batched_state,
    make_batched_chunked_step,
    make_batched_step,
    make_mesh,
)
from kiss_icp_tpu.parallel.pod import PodOdometry, make_pod_mesh  # noqa: F401
from kiss_icp_tpu.parallel.sharded_engine import ShardedKissICP  # noqa: F401
