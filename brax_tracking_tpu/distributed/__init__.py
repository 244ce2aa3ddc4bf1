"""Device-mesh construction, sharding rules, multihost discipline."""

from brax_tracking_tpu.distributed.mesh import (  # noqa: F401
    TrainMesh,
    assert_is_replicated,
    make_train_mesh,
    synchronize_hosts,
)
