from tpuimage.runtime.mesh import (  # noqa: F401
    make_mesh, batch_sharding, shard_batch, pad_to_multiple,
    run_data_parallel, halo_exchange, spatial_map,
)
from tpuimage.runtime.profiling import (  # noqa: F401
    Throughput, trace_annotation, sync,
)
