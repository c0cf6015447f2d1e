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


def use_distributed() -> bool:
    """Shared mesh-path policy: SKA_DISTRIBUTED=1 forces on with >1
    device (e.g. the virtual CPU mesh), =0 forces off, default auto =
    on for multi-chip accelerator backends (same gate api.build uses)."""
    import os

    flag = os.environ.get("SKA_DISTRIBUTED", "auto")
    if flag == "0":
        return False
    if flag == "auto" and os.environ.get("SKA_PLATFORM") == "cpu":
        # pinned host mode can never be a multi-chip accelerator backend;
        # deciding from the env keeps host-native commands jax-free
        return False
    from ..jaxinit import jax

    n_dev = len(jax.devices())
    plat = jax.devices()[0].platform
    return flag == "1" and n_dev > 1 or (
        flag == "auto" and n_dev > 1 and plat != "cpu"
    )
