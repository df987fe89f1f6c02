from primestereomatch_tpu.parallel.mesh import (  # noqa: F401
    MeshPlan,
    factor_devices,
    make_mesh,
)
from primestereomatch_tpu.parallel.sharded import (  # noqa: F401
    halo_exchange_rows,
    make_sharded_gif,
    make_sharded_sgbm,
)
