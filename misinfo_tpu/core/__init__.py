from misinfo_tpu.core.config import (  # noqa: F401
    ForensicsConfig,
    ModelPaths,
    Thresholds,
    MeshConfig,
    PrecisionConfig,
)
from misinfo_tpu.core.mesh import make_mesh, data_sharding, replicated  # noqa: F401
