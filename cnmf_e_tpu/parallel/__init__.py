"""Device-mesh parallelism: sharding layouts and the distributed step.

Replaces the reference's parfor-over-patches + blocked-HDF5 data plane
(SURVEY.md section 2.9) with a ``(patch, frame)`` ``jax.sharding.Mesh``:
pixel rows shard over 'patch', frames over 'frame'; XLA SPMD inserts the
halo exchanges (stencils) and psums (Gram contractions) that the reference
implemented as file reads and driver-side weighted averages.
"""

from cnmf_e_tpu.parallel.mesh import (make_mesh, movie_sharding,
                                      footprint_sharding, trace_sharding,
                                      replicated)

__all__ = ["make_mesh", "movie_sharding", "footprint_sharding",
           "trace_sharding", "replicated"]
