from kiss_icp_tpu.parallel.batch import (  # noqa: F401
    batched_state_sharding,
    init_batched_state,
    make_batched_step,
    make_mesh,
)
