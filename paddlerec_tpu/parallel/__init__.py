from paddlerec_tpu.parallel.mesh import create_mesh, mesh_from_config
from paddlerec_tpu.parallel.sharding import (
    param_shardings,
    batch_sharding,
    replicated_sharding,
)
