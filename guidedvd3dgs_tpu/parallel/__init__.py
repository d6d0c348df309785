from guidedvd3dgs_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    replicated,
    batch_sharding,
)
from guidedvd3dgs_tpu.parallel.data_parallel import (  # noqa: F401
    stack_cameras,
    train_step_dp,
    make_dp_train_step,
)
