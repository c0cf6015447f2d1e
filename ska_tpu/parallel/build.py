"""Mesh-sharded build: per-device sample pipelines + key-range-repartitioned
distributed merge (sample sort / PSRS over the device mesh).

Replaces the reference's rayon binary-tree hashmap merge
(merge_ska_dict.rs:354-417) with collectives, and is the path
`__graft_entry__.dryrun_multichip` exercises. One jitted step
(shard_map over a 'samples' mesh axis):

1. each device runs the FULL per-sample pipeline for its shard of
   samples (vmap of ops.pipeline.sample_pipeline: extraction, FASTQ
   quality gates, min-count rank filter, per-sample sort + segmented
   IUPAC union) — identical semantics to the serial path
2. each device sorts its local (key, sample, set) triples by key
3. splitter selection: R regularly-spaced key samples per device are
   all-gathered (tiny), sorted replicated, and D-1 quantile pivots
   chosen — the classic parallel-sample-sort recipe, which bounds every
   key-range bucket by ~2x the even share
4. triples are exchanged by key range with `all_to_all`: device j
   receives exactly the triples whose keys fall in its bucket. XLA:CPU
   (the virtual-mesh test backend) has no ragged-all-to-all, so chunks
   are padded to a static per-pair capacity; a send-side overflow flag
   is returned and the host escalates the capacity (recompiling) in the
   rare skewed case — correctness never depends on the capacity guess.
5. each device merges ONLY its own bucket: one local sort by key, row
   assignment, and a scatter into its (rows x n_samples) shard of the
   variants matrix. Device order == key-range order, so concatenating
   the per-device row blocks yields the globally sorted array.

Per-device memory is O(total/D): nothing replicated scales with the
total k-mer count (the round-1 design all-gathered every triple and
sorted the full set on every device).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import keys as K
from ..ops import pipeline as PIPE

U64 = jnp.uint64
_SENT = np.uint64(0xFFFFFFFFFFFFFFFF)
_R_SAMP = 128  # splitter samples per device


def build_mesh(n_devices=None, devices=None):
    if devices is None:
        devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.array(devices), axis_names=("samples",))


def _shard_step(
    seqs, valid, qual_ok, rec_last,
    k, rc, W, n_dev, n_samples, is_reads, use_mq, min_count, C_pair,
):
    """Runs on each device with a local shard of samples."""
    s_loc, L = seqs.shape
    dev = jax.lax.axis_index("samples")

    # 1. per-sample pipelines (count filter + qual + per-sample union),
    #    exactly the serial semantics (ska_dict.rs:76-113 + bloom_filter.rs)
    sp, union, is_end, _n = PIPE.batched_pipeline.__wrapped__(
        seqs, valid, qual_ok, rec_last, k, rc, W, is_reads, use_mq, min_count
    )
    N = s_loc * L
    sp = sp.reshape(N, W)
    keyv = K.shr(sp, 4)  # drop the in-sort set bits
    live = is_end.reshape(N) & jnp.any(sp != U64(_SENT), axis=-1)
    keyv = jnp.where(live[:, None], keyv, jnp.full_like(keyv, _SENT))
    sid = (dev.astype(jnp.int32) * s_loc + jnp.arange(s_loc, dtype=jnp.int32))[:, None]
    sid = jnp.broadcast_to(sid, (s_loc, L)).reshape(N)
    setv = jnp.where(live, union.reshape(N), 0)

    # 2. local sort by key (sentinels last; real keys have the top 4 bits
    #    of the hi limb clear, so all-ones never collides with a key)
    skeys, _, (ssid, sset) = K.sort_with(keyv, (sid, setv))
    nv = jnp.sum(live.astype(jnp.int32))

    # 3. splitters: R regular samples of the local sorted keys, gathered
    #    and sorted replicated (D*R elements — tiny), pivots at the
    #    D-quantiles
    r = jnp.arange(_R_SAMP, dtype=jnp.int64)
    # 64-bit index math: r * nv wraps int32 once a device holds more than
    # ~2^31/128 live triples — routine at genome scale — and wrapped
    # splitter indices degenerate every bucket (capacity escalation /
    # OOM), so this must not rely on the overflow flag for correctness
    samp_idx = jnp.clip((r * nv.astype(jnp.int64)) // _R_SAMP, 0, N - 1).astype(
        jnp.int32 if N < 2**31 else jnp.int64
    )
    samp = skeys[samp_idx]
    gs = jax.lax.all_gather(samp, "samples", tiled=True)  # (D*R, W)
    gss = jnp.stack(
        jax.lax.sort(tuple(gs[:, i] for i in range(W)), num_keys=W), axis=-1
    )
    pivots = gss[_R_SAMP :: _R_SAMP][: n_dev - 1]  # (D-1, W), static slice

    # bucket boundaries in the local sorted keys: lower bound, so keys
    # equal to a pivot land in the same bucket on every device
    if n_dev > 1:
        bnd = jnp.minimum(K.searchsorted(skeys, pivots), nv)
        o = jnp.concatenate([jnp.zeros(1, jnp.int32), bnd, nv[None]])
    else:
        o = jnp.concatenate([jnp.zeros(1, jnp.int32), nv[None]])
    o = jax.lax.cummax(o)  # monotonic even for degenerate pivots
    cnt = o[1:] - o[:-1]  # (D,) triples for each destination
    overflow = jnp.any(cnt > C_pair)

    # 4. pad + slice per-destination chunks, exchange by key range
    pk = jnp.concatenate([skeys, jnp.full((C_pair, W), _SENT, U64)], axis=0)
    psid = jnp.concatenate([ssid, jnp.zeros(C_pair, ssid.dtype)])
    pset = jnp.concatenate([sset, jnp.zeros(C_pair, sset.dtype)])
    t = jnp.arange(C_pair, dtype=jnp.int32)
    parts_k, parts_s, parts_t = [], [], []
    for j in range(n_dev):
        m = t < cnt[j]
        kj = jax.lax.dynamic_slice_in_dim(pk, o[j], C_pair, axis=0)
        sj = jax.lax.dynamic_slice_in_dim(psid, o[j], C_pair, axis=0)
        tj = jax.lax.dynamic_slice_in_dim(pset, o[j], C_pair, axis=0)
        parts_k.append(jnp.where(m[:, None], kj, U64(_SENT)))
        parts_s.append(jnp.where(m, sj, 0))
        parts_t.append(jnp.where(m, tj, 0))
    send_k = jnp.stack(parts_k)  # (D, C_pair, W)
    send_s = jnp.stack(parts_s)
    send_t = jnp.stack(parts_t)
    if n_dev > 1:
        recv_k = jax.lax.all_to_all(send_k, "samples", 0, 0)
        recv_s = jax.lax.all_to_all(send_s, "samples", 0, 0)
        recv_t = jax.lax.all_to_all(send_t, "samples", 0, 0)
    else:
        recv_k, recv_s, recv_t = send_k, send_s, send_t

    # 5. merge this device's bucket only: sort received triples by key,
    #    assign rows, scatter middle-base columns
    M = n_dev * C_pair
    mk, _, (msid, mset) = K.sort_with(
        recv_k.reshape(M, W), (recv_s.reshape(M), recv_t.reshape(M))
    )
    mlive = jnp.any(mk != U64(_SENT), axis=-1)
    firstk = jnp.concatenate(
        [jnp.ones(1, bool), jnp.any(mk[1:] != mk[:-1], axis=-1)]
    )
    newrow = firstk & mlive
    rows = jnp.cumsum(newrow.astype(jnp.int32)) - 1
    n_rows = jnp.sum(newrow.astype(jnp.int32))

    from ..encoding import SET_TO_ASCII

    ascii_vals = jnp.asarray(SET_TO_ASCII)[mset]
    gap = jnp.uint8(ord("-"))
    # flat scatter position: int32 wraps once M * n_samples exceeds 2^31
    # (large-sample mesh builds), silently dropping rows — both factors
    # are static, so widen exactly when needed
    idt = jnp.int32 if M * n_samples + 1 < 2**31 else jnp.int64
    pos = jnp.where(
        mlive, rows.astype(idt) * idt(n_samples) + msid.astype(idt),
        idt(M * n_samples),
    )
    variants = (
        jnp.full(M * n_samples + 1, gap, jnp.uint8)
        .at[pos]
        .set(jnp.where(mlive, ascii_vals, gap))[: M * n_samples]
        .reshape(M, n_samples)
    )
    krows = jnp.where(newrow, rows, M)
    ukeys = (
        jnp.zeros((M + 1, W), U64)
        .at[krows]
        .set(jnp.where(newrow[:, None], mk, U64(0)))[:M]
    )
    counts = (
        jnp.zeros(M + 1, jnp.int32)
        .at[jnp.where(mlive, rows, M)]
        .add(mlive.astype(jnp.int32))[:M]
    )
    return ukeys, variants, counts, n_rows[None], overflow[None]


@partial(
    jax.jit,
    static_argnames=(
        "k", "rc", "W", "is_reads", "use_mq", "min_count", "C_pair", "mesh_holder",
    ),
)
def _jit_build(
    seqs, valid, qual_ok, rec_last,
    k, rc, W, is_reads, use_mq, min_count, C_pair, mesh_holder,
):
    mesh = mesh_holder.mesh
    n_dev = mesh.devices.size
    n_samples = seqs.shape[0]
    fn = jax.shard_map(
        partial(
            _shard_step,
            k=k, rc=rc, W=W, n_dev=n_dev, n_samples=n_samples,
            is_reads=is_reads, use_mq=use_mq, min_count=min_count,
            C_pair=C_pair,
        ),
        mesh=mesh,
        in_specs=(P("samples"), P("samples"), P("samples"), P("samples")),
        out_specs=(
            P("samples"), P("samples"), P("samples"), P("samples"), P("samples"),
        ),
    )
    return fn(seqs, valid, qual_ok, rec_last)


class _MeshHolder:
    """Hashable wrapper so the mesh can be a static jit arg."""

    def __init__(self, mesh):
        self.mesh = mesh

    def __hash__(self):
        return hash(tuple(d.id for d in self.mesh.devices.flat))

    def __eq__(self, other):
        return isinstance(other, _MeshHolder) and hash(self) == hash(other)


def _pow2(n: int) -> int:
    b = 256
    while b < n:
        b *= 2
    return b


def distributed_merged_build(
    seqs_np, valid_np, qual_np, rec_last_np, k, rc, mesh,
    is_reads=False, use_mid_qual=False, min_count=0,
):
    """Full distributed build+merge of (n_samples, L) uint8 sequences.

    Any sample count (rows are padded to a mesh multiple with all-invalid
    samples; their all-'-' columns are stripped before returning) and the
    full FASTQ surface (quality masks, min-count filter) are supported.
    Returns (keys (R, W), variants (R, n_samples) uint8, counts (R,),
    n_rows) on host, globally sorted by key.
    """
    W = K.width_for_k(k)
    D = mesh.devices.size
    S_in, L = seqs_np.shape
    S_pad = -(-S_in // D) * D
    if S_pad != S_in:
        padrow = ((0, S_pad - S_in), (0, 0))
        seqs_np = np.pad(np.asarray(seqs_np), padrow)
        valid_np = np.pad(np.asarray(valid_np), padrow)
        qual_np = np.pad(np.asarray(qual_np), padrow)
        rec_last_np = np.pad(np.asarray(rec_last_np), padrow)

    holder = _MeshHolder(mesh)
    sharding = NamedSharding(mesh, P("samples"))

    def _put(x_np):
        # make_array_from_callback materializes only the addressable
        # shards, so this works unchanged on a multi-process (pod-slice)
        # mesh where plain device_put of a host array cannot
        x_np = np.asarray(x_np)
        return jax.make_array_from_callback(
            x_np.shape, sharding, lambda idx: x_np[idx]
        )

    seqs = _put(seqs_np)
    valid = _put(valid_np)
    qual_ok = _put(qual_np)
    rec_last = _put(rec_last_np)

    def _fetch(x):
        # on a multi-process mesh the output shards are not all
        # addressable locally; gather them to every process (host 0
        # writes outputs, but identical arrays everywhere keep the
        # call site process-agnostic)
        if jax.process_count() == 1:
            return np.asarray(x)
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))

    N_loc = (S_pad // D) * L
    # even share is N_loc/D per (src, dst) pair; PSRS splitters bound the
    # realized bucket at ~2x, so 2x capacity avoids escalation in practice
    C_pair = min(_pow2(max(2 * N_loc // D, 1)), _pow2(N_loc))
    while True:
        ukeys, variants, counts, n_rows, overflow = _jit_build(
            seqs, valid, qual_ok, rec_last,
            k, rc, W, bool(is_reads), bool(use_mid_qual), int(min_count),
            int(C_pair), holder,
        )
        if not bool(_fetch(overflow).any()):
            break
        if C_pair >= N_loc:  # cnt <= nv <= N_loc: cannot overflow here
            break
        import logging

        logging.getLogger("ska_tpu").info(
            "distributed merge: bucket overflow at capacity %d, doubling", C_pair
        )
        C_pair = min(C_pair * 2, _pow2(N_loc))

    # host assembly: device blocks are consecutive key ranges
    M = D * C_pair
    ukeys = _fetch(ukeys)
    variants = _fetch(variants)
    counts = _fetch(counts)
    nr = _fetch(n_rows)
    parts_k, parts_v, parts_c = [], [], []
    for d in range(D):
        n = int(nr[d])
        parts_k.append(ukeys[d * M : d * M + n])
        parts_v.append(variants[d * M : d * M + n])
        parts_c.append(counts[d * M : d * M + n])
    keys = np.concatenate(parts_k, axis=0)
    var = np.concatenate(parts_v, axis=0)[:, :S_in]
    cnts = np.concatenate(parts_c, axis=0).astype(np.int64)
    return keys, var, cnts, len(keys)


def distributed_build(seqs_np, valid_np, rec_last_np, k, rc, mesh):
    """FASTA-only convenience wrapper (no quality/count filtering)."""
    qual = np.ones_like(np.asarray(valid_np), dtype=bool)
    return distributed_merged_build(
        seqs_np, valid_np, qual, rec_last_np, k, rc, mesh
    )


def dryrun_step(n_devices: int, k: int = 17, L: int = 512, per_dev_samples: int = 2):
    """Tiny mesh-sharded build steps (used by __graft_entry__).

    Exercises the full distributed pipeline on three configs: FASTA at
    k=17 with a sample count that does NOT divide the mesh (padding
    path), FASTQ with the min-count rank filter, and W=2 two-limb keys
    (k=41) — i.e. local build, splitter selection, all_to_all key-range
    exchange, and the bucket merge, under every key/filter variant.
    """
    mesh = build_mesh(n_devices)
    n_samples = n_devices * per_dev_samples - 1 if n_devices > 1 else per_dev_samples
    rng = np.random.default_rng(0)
    seqs = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(n_samples, L))
    valid = np.ones((n_samples, L), bool)
    rec_last = np.zeros((n_samples, L), bool)
    rec_last[:, -1] = True
    keys, variants, counts, n_rows = distributed_build(seqs, valid, rec_last, k, True, mesh)
    assert n_rows > 0
    assert variants.shape == (n_rows, n_samples)

    # FASTQ + min-count: two identical reads per sample so every k-mer
    # passes the min_count=2 rank filter
    seqs2 = seqs.copy()
    seqs2[:, L // 2 :] = seqs[:, : L - L // 2]
    rl2 = np.zeros((n_samples, L), bool)
    rl2[:, L // 2 - 1] = True
    rl2[:, -1] = True
    qual = np.ones((n_samples, L), bool)
    _, _, _, n2 = distributed_merged_build(
        seqs2, valid, qual, rl2, k, True, mesh,
        is_reads=True, use_mid_qual=True, min_count=2,
    )
    assert n2 > 0

    # W=2 two-limb keys
    *_, n3 = distributed_build(seqs, valid, rec_last, 41, True, mesh)
    assert n3 > 0
    return n_rows
