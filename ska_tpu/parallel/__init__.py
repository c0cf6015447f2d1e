"""Multi-device (mesh) build and merge.

The reference parallelizes with rayon threads on one node only
(src/merge_ska_dict.rs:264-326; README tells users to shard builds by hand
and `ska merge` the outputs). Here samples are sharded data-parallel over a
jax.sharding.Mesh and the global dictionary merge runs as all-gather +
replicated sort + segmented scatter, with the output row space (key space)
sharded across devices.
"""

from .build import build_mesh, distributed_build, dryrun_step  # noqa: F401
