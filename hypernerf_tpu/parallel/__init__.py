"""Device mesh / sharding helpers."""

from hypernerf_tpu.parallel.mesh import create_mesh, replicate, shard_batch
