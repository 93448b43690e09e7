from .halo import (  # noqa: F401
    halo_exchange_2d,
    halo_exchange_cols,
    halo_exchange_rows,
)
from .sharded import (  # noqa: F401
    DATA_AXIS,
    X_AXIS,
    Y_AXIS,
    ShardedCanny,
    make_mesh,
)
