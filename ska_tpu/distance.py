"""`ska distance`: pairwise SNP distances as one MXU Gram matmul.

The reference walks every site per sample pair (merge_ska_array.rs:587-632,
rayon over columns :416-438). Per-site contributions depend only on the
*pair of 16 base-set classes* (gap, A, C, ..., N), so all pair statistics
are linear functionals of the class co-occurrence counts
G[i*16+a, j*16+b] = #sites(sample i class a, sample j class b) —
computed exactly as an int8 one-hot Gram matrix on the MXU.
"""

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .encoding import ASCII_TO_SET, BASE_PROB, SET_TO_ASCII

_CHUNK = 16384


@dataclass
class VariantDist:
    distance: float
    mismatch_prop: float
    match_count: int
    mismatch_count: int

    def __str__(self):
        # reference Display: "{:.2}\t{:.5}\t{}\t{}" (merge_ska_array.rs:57-65)
        return (
            f"{self.distance:.2f}\t{self.mismatch_prop:.5f}"
            f"\t{self.match_count}\t{self.mismatch_count}"
        )


def _class_tables(filt_ambig: bool):
    """16x16 f64 coefficient tables for distance / match / mismatch."""
    probs = BASE_PROB[SET_TO_ASCII]  # (16, 4), class 0 = '-' (zero vector)
    overlap = probs @ probs.T  # (16, 16)
    nz = np.arange(16) > 0
    both = np.outer(nz, nz)
    one_gap = np.outer(~nz, nz) | np.outer(nz, ~nz)

    if filt_ambig:
        unamb = np.isin(np.arange(16), [1, 2, 4, 8])
        bu = np.outer(unamb, unamb)
        dist = (bu & (np.arange(16)[:, None] != np.arange(16)[None, :])).astype(np.float64)
        match = bu.astype(np.float64)
    else:
        dist = np.where(both, 1.0 - overlap, 0.0)
        match = (both & (overlap > 0.0)).astype(np.float64)
    mism = one_gap.astype(np.float64)
    return dist, match, mism


@partial(jax.jit, static_argnames=("n",))
def _gram_chunk(classes_chunk, n: int):
    """classes_chunk: (C, n) int32 in [0, 16). Returns (n*16, n*16) int32 Gram."""
    C = classes_chunk.shape[0]
    onehot = jax.nn.one_hot(classes_chunk, 16, dtype=jnp.int8)  # (C, n, 16)
    X = onehot.reshape(C, n * 16)
    return jax.lax.dot_general(
        X, X, (((0,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )


def class_gram(variants: np.ndarray) -> np.ndarray:
    """Exact int64 co-occurrence Gram over 16 classes. variants: (S, n) uint8.

    Chunk sizes are fixed powers of two and tails are padded with class 0
    ('-', zero weight in every coefficient table) so jit shapes never
    depend on the dataset — a fresh XLA compile costs ~20s via the remote
    compiler, so shape stability matters more than minimal padding.
    """
    S, n = variants.shape
    classes = ASCII_TO_SET[variants].astype(np.int32)
    # bound one-hot scratch (int8) to ~256MB and int32 accumulators
    chunk = max(_CHUNK, min(1 << 24, (1 << 28) // max(16 * n, 1)))
    chunk = 1 << int(np.floor(np.log2(chunk)))
    G = np.zeros((n * 16, n * 16), dtype=np.int64)
    n_chunks = -(-S // chunk)
    bar = None
    if n_chunks > 1:  # merge_ska_array.rs:421 distance progress analog
        from .progress import Bar

        bar = Bar(n_chunks, "site chunks")
    for s0 in range(0, S, chunk):
        c = classes[s0 : s0 + chunk]
        if len(c) != chunk:
            pad = np.zeros((chunk - len(c), n), np.int32)  # class 0 = '-'
            c = np.concatenate([c, pad])
        G += np.asarray(_gram_chunk(jnp.asarray(c), n), dtype=np.int64)
        if bar:
            bar.update()
    if bar:
        bar.finish()
    return G


def pairwise_stats(variants: np.ndarray, constant: float, filt_ambig: bool):
    """Upper-triangle list-of-lists of VariantDist, same layout as the
    reference distance() (merge_ska_array.rs:416-438)."""
    n = variants.shape[1]
    G = class_gram(variants).reshape(n, 16, n, 16).astype(np.float64)
    dist_c, match_c, mism_c = _class_tables(filt_ambig)

    D = np.einsum("iajb,ab->ij", G, dist_c)
    M = np.einsum("iajb,ab->ij", G, match_c)
    X = np.einsum("iajb,ab->ij", G, mism_c)

    out = []
    for i in range(n):
        row = []
        for j in range(i + 1, n):
            matches = constant + M[i, j]
            mism = X[i, j]
            denom = matches + mism
            prop = (mism / denom) if denom != 0.0 else 0.0
            row.append(
                VariantDist(
                    distance=float(D[i, j]),
                    mismatch_prop=float(prop),
                    match_count=int(matches),
                    mismatch_count=int(mism),
                )
            )
        out.append(row)
    return out
