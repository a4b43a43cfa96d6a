from acr_wsss_tpu.parallel.mesh import make_mesh  # noqa: F401
from acr_wsss_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    param_shardings,
    replicated,
)
