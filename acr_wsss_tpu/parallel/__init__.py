from acr_wsss_tpu.parallel.mesh import (  # noqa: F401
    make_data_mesh_for_batch,
    make_mesh,
)
from acr_wsss_tpu.parallel.pipeline import (  # noqa: F401
    make_train_step_pp,
    param_shardings_pp,
)
from acr_wsss_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    fsdp_shardings,
    param_shardings,
    replicated,
)
