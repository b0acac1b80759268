"""Parallel layer: device mesh over the genome-site axis.

The reference's two parallelism mechanisms (OpenMP site loop, GNU-parallel
chromosome fan-out; SURVEY §2.4) map onto one 1-D ``jax.sharding.Mesh``:
per-site/per-profile kernels are data-parallel over shards, and the only
cross-shard coupling is the all-reduce of Lynch-fit sufficient statistics
(XLA inserts the psum from the sharded-sum objective). ``per_shard_fit``
reproduces the reference scripts' independent per-chromosome fits.
"""

from sid_tpu.parallel.mesh import make_site_mesh, shard_profiles  # noqa: F401
