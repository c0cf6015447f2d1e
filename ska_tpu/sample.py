"""Per-sample split k-mer dictionary build.

Equivalent of reference SkaDict (src/ska_dict.rs:333-378): one sample's
FASTA/FASTQ input becomes a sorted packed-key array plus a 4-bit
middle-base-set column, produced on device by
extract -> (count filter for reads) -> sort -> segmented union.
"""

from dataclasses import dataclass
from functools import lru_cache
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .constants import QUAL_MIDDLE, QUAL_NOFILTER, QUAL_STRICT, check_k
from .io import fastx
from .ops import extract as X
from .ops import keys as K
from .ops import segment as S


@dataclass
class QualOpts:
    """FASTQ filtering options (reference src/lib.rs:533-540)."""

    min_count: int = 0
    min_qual: int = 0
    qual_filter: int = QUAL_STRICT


@dataclass
class SampleDict:
    """One sample's sorted key array + middle-base sets."""

    name: str
    k: int
    rc: bool
    keys: np.ndarray  # (n, W) uint64, sorted ascending
    sets: np.ndarray  # (n,) uint8 4-bit base sets

    @property
    def ksize(self) -> int:
        return len(self.sets)


def _bucket(n: int) -> int:
    """Pad lengths to power-of-two buckets to bound jit recompilation."""
    b = 1024
    while b < n:
        b *= 2
    return b


def _subsample_reads(ff: fastx.FastxFile, proportion_reads, start_index=0):
    """Keep every step-th record, step = round(1/proportion)
    (reference src/ska_dict.rs:125-141). start_index continues the counter
    across the file pair? No: the reference resets iter_reads per file."""
    if proportion_reads is None:
        return ff
    # Rust f64::round = half away from zero (ska_dict.rs:128)
    step = int(np.floor(1.0 / proportion_reads + 0.5))
    if step <= 1:
        return ff
    out = fastx.FastxFile(is_fastq=ff.is_fastq)
    for i in range(len(ff.seqs)):
        if i % step == 0:
            out.ids.append(ff.ids[i])
            out.seqs.append(ff.seqs[i])
            out.quals.append(ff.quals[i])
    return out


def _masks(batch: fastx.SeqBatch, qual: QualOpts, is_reads: bool):
    """Base validity and middle-quality masks (host precompute)."""
    seq = batch.seq
    base_ok = ((seq & 0xF) != 14) & (seq != 0)
    if batch.has_qual:
        qual_ok = (batch.qual.astype(np.int16) - 33) > qual.min_qual
    else:
        qual_ok = np.ones(len(seq), dtype=bool)
    if is_reads and batch.has_qual and qual.qual_filter == QUAL_STRICT:
        valid = base_ok & qual_ok
    else:
        valid = base_ok
    return valid, qual_ok


def build_sample(
    name: str,
    k: int,
    files: Tuple[str, Optional[str]],
    rc: bool,
    qual: QualOpts,
    proportion_reads: Optional[float] = None,
) -> SampleDict:
    """Build one sample's dictionary from FASTA or paired FASTQ input.

    Mirrors SkaDict::new (ska_dict.rs:333-378): format detected by peeking
    the first record of the first file; both files share the format flag;
    raises if no split k-mers were found.
    """
    check_k(k)
    is_reads = fastx.peek_format(files[0]) == "fastq"

    parts = [fastx.read_fastx(files[0])]
    if files[1] is not None:
        parts.append(fastx.read_fastx(files[1]))

    seqs: List[bytes] = []
    quals: List[Optional[bytes]] = []
    for ff in parts:
        ff = _subsample_reads(ff, proportion_reads)
        seqs.extend(ff.seqs)
        quals.extend(ff.quals)

    batch = fastx.build_batch(seqs, quals)
    keys_np, sets_np = dict_from_batch(batch, k, rc, qual, is_reads)
    if len(keys_np) == 0:
        raise ValueError(f"{files[0]} has no valid sequence")
    return SampleDict(name=name, k=k, rc=rc, keys=keys_np, sets=sets_np)


def dict_from_batch(
    batch: fastx.SeqBatch, k: int, rc: bool, qual: QualOpts, is_reads: bool
):
    """Device pipeline: one fused jit dispatch (ops/pipeline.py), host unpack."""
    from .ops import pipeline as P

    W = K.width_for_k(k)
    L = len(batch.seq)
    Lp = _bucket(L + k + 1)

    valid, qual_ok = _masks(batch, qual, is_reads)
    seq = np.zeros(Lp, np.uint8)
    seq[:L] = batch.seq
    v = np.zeros(Lp, bool)
    v[:L] = valid
    qo = np.zeros(Lp, bool)
    qo[:L] = qual_ok
    rl = np.zeros(Lp, bool)
    rl[:L] = batch.rec_last

    use_mid_qual = bool(
        is_reads and batch.has_qual and qual.qual_filter in (QUAL_MIDDLE, QUAL_STRICT)
    )
    sp, union, is_end, n = P.sample_pipeline(
        jnp.asarray(seq),
        jnp.asarray(v),
        jnp.asarray(qo),
        jnp.asarray(rl),
        k,
        rc,
        W,
        is_reads,
        use_mid_qual,
        int(qual.min_count),
    )
    keys_np, sets_np = P.unpack_host(sp, union, is_end, W)
    assert len(keys_np) == int(n)
    return keys_np, sets_np
