"""Multi-device (mesh) build and merge.

The reference parallelizes with rayon threads on one node only
(src/merge_ska_dict.rs:264-326; README tells users to shard builds by hand
and `ska merge` the outputs). Here samples are sharded data-parallel over a
jax.sharding.Mesh and the global dictionary merge is a key-range
repartitioned sample sort: local per-sample pipelines, quantile splitter
selection, all_to_all exchange by key range, and per-device bucket merges,
with the output row space (key space) sharded across devices.
"""

from .build import (  # noqa: F401
    build_mesh,
    distributed_build,
    distributed_build_multi,
    distributed_merged_build,
    dryrun_step,
)
from .multihost import init_multihost, is_primary  # noqa: F401
