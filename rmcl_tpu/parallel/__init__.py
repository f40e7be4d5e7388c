from rmcl_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, batch_sharding, replicated_sharding, shard_batch,
    host_local_to_global, global_to_host_local)
