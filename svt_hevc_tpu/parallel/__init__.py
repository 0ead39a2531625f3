"""Multi-chip parallelism: device-mesh sharding of the encoder frontend
(gop x tile axes, shard_map halo exchange). See parallel.mesh."""

from .mesh import (HALO, frontend_step, gop_encode_step,  # noqa: F401
                   make_mesh, sharded_hme)
