from eelunet_tpu.parallel.mesh import (
    create_mesh,
    batch_sharding,
    replicated_sharding,
    param_shardings,
)

__all__ = ["create_mesh", "batch_sharding", "replicated_sharding", "param_shardings"]
