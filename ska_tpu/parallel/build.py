"""Mesh-sharded build: per-device sample extraction + collective merge.

Pipeline inside one jitted step (shard_map over a 'samples' mesh axis):

1. each device extracts windows for its shard of samples (vmap of the
   extraction kernel) and forms (key, sample, base-set) triples
2. `all_gather` over the samples axis exchanges the triples (ICI)
3. a replicated lexicographic sort + segment-boundary scan computes the
   merged row space
4. each device scatters the middle-base column values for its row range:
   the output variants matrix is sharded by rows (key space)

This replaces the reference's rayon binary-tree hashmap merge
(merge_ska_dict.rs:354-417) with collectives, and is the path
`__graft_entry__.dryrun_multichip` exercises.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import extract as X
from ..ops import keys as K

U64 = jnp.uint64
_SENT = np.uint64(0xFFFFFFFFFFFFFFFF)


def build_mesh(n_devices=None, devices=None):
    if devices is None:
        devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.array(devices), axis_names=("samples",))


def _extract_one(seq, valid, rec_last, k, rc, W):
    res = X.extract_windows(seq, valid, rec_last, k, rc, W)
    mid = res["mid"]
    sets = (
        jnp.left_shift(jnp.uint8(1), mid)
        | jnp.where(res["pal"], jnp.left_shift(jnp.uint8(1), mid ^ 2), 0)
    ).astype(jnp.uint8)
    return res["key"], sets, res["emit"]


def _shard_step(seqs, valid, rec_last, k, rc, W, n_dev, n_samples):
    """Runs on each device with a local shard of samples."""
    s_loc, L = seqs.shape
    dev = jax.lax.axis_index("samples")

    keys, sets, emit = jax.vmap(
        lambda s, v, r: _extract_one(s, v, r, k, rc, W)
    )(seqs, valid, rec_last)

    # local flatten with global sample ids
    sample_ids = (dev * s_loc + jnp.arange(s_loc, dtype=jnp.int32))[:, None]
    sample_ids = jnp.broadcast_to(sample_ids, (s_loc, L)).reshape(-1)
    keys = keys.reshape(s_loc * L, W)
    sets = sets.reshape(-1)
    emit = emit.reshape(-1)
    keys = jnp.where(emit[:, None], keys, jnp.full_like(keys, _SENT))
    sets = jnp.where(emit, sets, 0)

    # exchange triples over ICI
    gkeys = jax.lax.all_gather(keys, "samples", tiled=True)
    gsets = jax.lax.all_gather(sets, "samples", tiled=True)
    gsid = jax.lax.all_gather(sample_ids, "samples", tiled=True)
    gemit = jax.lax.all_gather(emit, "samples", tiled=True)

    # replicated merge: lexicographic sort + segment boundaries
    N = gkeys.shape[0]
    ops = tuple(gkeys[:, i] for i in range(W)) + (gsid, gsets, gemit)
    res = jax.lax.sort(ops, num_keys=W + 1)
    skeys = jnp.stack(res[:W], axis=-1)
    ssid, ssets, semit = res[W], res[W + 1], res[W + 2]

    first = jnp.concatenate(
        [jnp.ones(1, bool), jnp.any(skeys[1:] != skeys[:-1], axis=-1)]
    )
    rows = jnp.cumsum(first.astype(jnp.int32)) - 1
    nem = jnp.sum(semit.astype(jnp.int32))
    n_rows = jnp.where(nem > 0, rows[jnp.clip(nem - 1, 0, N - 1)] + 1, 0)

    # output shard: this device owns row range [dev*rchunk, (dev+1)*rchunk)
    rchunk = (N + n_dev - 1) // n_dev
    row0 = dev * rchunk
    local_rows = rows - row0
    in_range = (local_rows >= 0) & (local_rows < rchunk) & semit
    lr = jnp.where(in_range, local_rows, rchunk)  # rchunk = dump row
    ascii_vals = _set_to_ascii(ssets)
    variants = jnp.full((rchunk + 1, n_samples), ord("-"), jnp.uint8)
    variants = variants.at[lr, ssid].set(jnp.where(in_range, ascii_vals, ord("-")))
    variants = variants[:rchunk]

    ukeys = jnp.zeros((rchunk + 1, W), U64)
    for w in range(W):
        ukeys = ukeys.at[:, w].set(
            jnp.zeros(rchunk + 1, U64).at[lr].max(jnp.where(in_range, skeys[:, w], 0))
        )
    ukeys = ukeys[:rchunk]
    counts = (
        jnp.zeros(rchunk + 1, jnp.int32).at[lr].add(in_range.astype(jnp.int32))[:rchunk]
    )
    return ukeys, variants, counts, n_rows[None]  # per-device copy of the count


def _set_to_ascii(sets):
    from ..encoding import SET_TO_ASCII

    return jnp.asarray(SET_TO_ASCII)[sets]


@partial(
    jax.jit, static_argnames=("k", "rc", "W", "mesh_holder")
)
def _jit_build(seqs, valid, rec_last, k, rc, W, mesh_holder):
    mesh = mesh_holder.mesh
    n_dev = mesh.devices.size
    n_samples = seqs.shape[0]
    fn = jax.shard_map(
        partial(
            _shard_step, k=k, rc=rc, W=W, n_dev=n_dev, n_samples=n_samples
        ),
        mesh=mesh,
        in_specs=(P("samples"), P("samples"), P("samples")),
        out_specs=(P("samples"), P("samples"), P("samples"), P("samples")),
    )
    return fn(seqs, valid, rec_last)


class _MeshHolder:
    """Hashable wrapper so the mesh can be a static jit arg."""

    def __init__(self, mesh):
        self.mesh = mesh

    def __hash__(self):
        return hash(tuple(d.id for d in self.mesh.devices.flat))

    def __eq__(self, other):
        return isinstance(other, _MeshHolder) and hash(self) == hash(other)


def distributed_build(seqs_np, valid_np, rec_last_np, k, rc, mesh):
    """seqs_np: (n_samples, L) uint8, n_samples divisible by mesh size.

    Returns (keys (R, W), variants (R, n_samples) uint8, counts (R,)) on
    host, truncated to the real merged row count.
    """
    W = K.width_for_k(k)
    holder = _MeshHolder(mesh)
    sharding = NamedSharding(mesh, P("samples"))
    seqs = jax.device_put(jnp.asarray(seqs_np), sharding)
    valid = jax.device_put(jnp.asarray(valid_np), sharding)
    rec_last = jax.device_put(jnp.asarray(rec_last_np), sharding)
    ukeys, variants, counts, n_rows = _jit_build(seqs, valid, rec_last, k, rc, W, holder)
    n_rows = int(np.asarray(n_rows)[0])
    return (
        np.asarray(ukeys)[:n_rows],
        np.asarray(variants)[:n_rows],
        np.asarray(counts)[:n_rows].astype(np.int64),
        n_rows,
    )


def dryrun_step(n_devices: int, k: int = 17, L: int = 512, per_dev_samples: int = 2):
    """One tiny mesh-sharded build step (used by __graft_entry__)."""
    mesh = build_mesh(n_devices)
    n_samples = n_devices * per_dev_samples
    rng = np.random.default_rng(0)
    seqs = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(n_samples, L))
    valid = np.ones((n_samples, L), bool)
    rec_last = np.zeros((n_samples, L), bool)
    rec_last[:, -1] = True
    keys, variants, counts, n_rows = distributed_build(seqs, valid, rec_last, k, True, mesh)
    assert n_rows > 0
    return n_rows
