"""Positioning of variant groups on a reference genome
(reference src/skalo/positioning.rs)."""

import gzip
from collections import Counter
from typing import Dict, List, Tuple

from .kmer_utils import encode_str, rev_compl_str


def extract_genomic_kmers(file_path, k: int):
    """positioning.rs:16-95: k-mers with <= 3 positions; single-sequence
    reference only; positions stored as (start + k)."""
    opener = gzip.open if str(file_path).endswith(".gz") else open
    with opener(file_path, "rt") as f:
        text = f.read()

    genome_seq = b""
    genome_name = ""
    count = 0
    for block in text.split(">"):
        if not block.strip():
            continue
        count += 1
        if count > 1:
            raise SystemExit(
                "\nError: more than one sequence detected in the reference genome file.\n"
            )
        lines = block.split("\n")
        genome_name = lines[0].split()[0]
        genome_seq = "".join(lines[1:]).replace(" ", "").upper().encode()

    # Vectorized: positioning.rs:16-95 keeps the first <=3 positions of
    # every k-mer (its overflow-delete branch is dead code — the push is
    # guarded by len<3), so the map is {kmer: first <=3 positions} —
    # built here with one bulk encode + np.unique instead of a 4M-step
    # python loop.
    import numpy as np

    from .kmer_utils import to_obj_ints

    kmer_map: Dict[int, List[int]] = {}
    if len(genome_seq) >= k:
        s = np.frombuffer(genome_seq, dtype=np.uint8)
        L = len(s)
        n_win = L - k + 1
        codes = ((s >> 1) & 3).astype(np.uint64)
        invalid = ((s & 0xF) == 14).astype(np.int32)
        bad = np.cumsum(invalid)
        ok = (bad[k - 1 :] - np.concatenate([[0], bad[: n_win - 1]])) == 0

        hi = np.zeros(n_win, np.uint64) if k > 32 else None
        lo = np.zeros(n_win, np.uint64)
        for i in range(k):
            c = codes[i : i + n_win]
            if hi is not None:
                hi = (hi << np.uint64(2)) | (lo >> np.uint64(62))
            lo = (lo << np.uint64(2)) | c
        pos = np.arange(n_win, dtype=np.int64)[ok] + k  # stored as n + k
        if hi is None:
            enc = lo[ok]
            order = np.argsort(enc, kind="stable")
            enc_s, pos_s = enc[order], pos[order]
            first = np.ones(len(enc_s), bool)
            first[1:] = enc_s[1:] != enc_s[:-1]
        else:
            hi, lo = hi[ok], lo[ok]
            order = np.lexsort((lo, hi))
            hi_s, lo_s, pos_s = hi[order], lo[order], pos[order]
            first = np.ones(len(lo_s), bool)
            first[1:] = (hi_s[1:] != hi_s[:-1]) | (lo_s[1:] != lo_s[:-1])
        starts = np.flatnonzero(first)
        counts = np.empty(len(starts), np.int64)
        if len(starts):
            counts[:-1] = np.diff(starts)
            counts[-1] = len(pos_s) - starts[-1]
        # positioning.rs:80-88: the push is guarded by len<3, so the
        # delete-on-overflow branch is dead code — every k-mer keeps its
        # first <=3 positions (genome order; our stable sorts preserve it).
        counts = np.minimum(counts, 3)
        keep_grp = np.ones(len(starts), bool)
        if hi is None:
            kmer_map = _KmerMap(enc_s[first], None, starts, counts, keep_grp, pos_s)
        else:
            kmer_map = _KmerMap(lo_s[first], hi_s[first], starts, counts, keep_grp, pos_s)

    return kmer_map, genome_seq, genome_name


class _KmerMap:
    """dict-like {kmer int: [positions]} over sorted unique-kmer arrays.

    Lookups are few (one per candidate-variant window) while the map holds
    millions of genome k-mers, so binary search beats materializing a
    python dict (which costs ~35s at 4Mb)."""

    def __init__(self, lo, hi, starts, counts, keep, pos_s):
        self._lo = lo
        self._hi = hi
        self._starts = starts
        self._counts = counts
        self._keep = keep
        self._pos = pos_s

    def __len__(self):
        return int(self._keep.sum())

    def get(self, enc, default=()):
        import numpy as np

        if self._hi is None:
            i = np.searchsorted(self._lo, np.uint64(enc))
            if i >= len(self._lo) or int(self._lo[i]) != enc:
                return default
        else:
            h, l = enc >> 64, enc & 0xFFFFFFFFFFFFFFFF
            i = np.searchsorted(self._hi, np.uint64(h), side="left")
            j = np.searchsorted(self._hi, np.uint64(h), side="right")
            sub = self._lo[i:j]
            k = np.searchsorted(sub, np.uint64(l))
            if k >= len(sub) or int(sub[k]) != l:
                return default
            i = i + k
        if not self._keep[i]:
            return default
        st = int(self._starts[i])
        return self._pos[st : st + int(self._counts[i])].tolist()


def most_frequent_position(numbers):
    """positioning.rs:217-255: (0,0) on tie or count < 10."""
    counts = Counter(numbers)
    max_count = 0
    max_element = None
    tie = False
    for num, count in counts.items():
        if count > max_count:
            max_element = num
            max_count = count
            tie = False
        elif count == max_count:
            tie = True
    if tie:
        return (0, 0)
    if max_element is not None:
        if max_count < 10:
            return (0, 0)
        return (max_element, max_count)
    return (0, 0)


def _window_votes(codes8, k_graph: int, km: "_KmerMap"):
    """All (stored_position - window_pos) votes for one sequence's 2-bit
    code array, batch: horner window encode + one searchsorted against
    the k-mer map."""
    import numpy as np

    L = len(codes8)
    if L < k_graph or len(km._lo) == 0:
        return []
    codes = codes8.astype(np.uint64)
    n_win = L - k_graph + 1
    enc = np.zeros(n_win, np.uint64)
    for i in range(k_graph):
        enc = (enc << np.uint64(2)) | codes[i : i + n_win]
    idx = np.searchsorted(km._lo, enc)
    idx_c = np.minimum(idx, len(km._lo) - 1)
    hit = (km._lo[idx_c] == enc) & km._keep[idx_c]
    widx = np.nonzero(hit)[0]
    gi = idx_c[widx]
    cnts = km._counts[gi]
    starts = km._starts[gi]
    reps = np.repeat(np.arange(len(widx)), cnts)
    flat_pos = km._pos[np.repeat(starts, cnts) + _ragged_arange(cnts)]
    votes = (flat_pos - widx[reps]) & 0xFFFFFFFF
    return votes.tolist()


def _ragged_arange(counts):
    """[0..c0-1, 0..c1-1, ...] for an int array of counts."""
    import numpy as np

    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, np.int64)
    ends = np.cumsum(counts)
    out = np.arange(total, dtype=np.int64)
    out -= np.repeat(ends - counts, counts)
    return out


def scan_variants(vec_variants, k_graph: int, kmer_map):
    """positioning.rs:129-214: vote (position - offset) over fwd and rc."""
    fwd_votes: List[int] = []
    rev_votes: List[int] = []
    fast = isinstance(kmer_map, _KmerMap) and kmer_map._hi is None and k_graph <= 32
    for variant in vec_variants:
        seq = variant.sequence
        if fast:
            from .kmer_utils import LazySeq

            if isinstance(seq, LazySeq):
                codes = seq.codes()
            else:
                import numpy as np

                codes = (
                    (np.frombuffer(seq.encode(), dtype=np.uint8) >> 1) & 3
                ).astype(np.uint8)
            fwd_votes.extend(_window_votes(codes, k_graph, kmer_map))
            # rc codes: complement = code ^ 2, reversed
            rev_votes.extend(_window_votes((codes ^ 2)[::-1], k_graph, kmer_map))
            continue
        rc_seq = rev_compl_str(seq)
        for pos in range(len(seq) - k_graph + 1):
            enc = encode_str(seq[pos : pos + k_graph])
            for position in kmer_map.get(enc, ()):
                fwd_votes.append((position - pos) & 0xFFFFFFFF)
        for pos in range(len(rc_seq) - k_graph + 1):
            enc = encode_str(rc_seq[pos : pos + k_graph])
            for position in kmer_map.get(enc, ()):
                rev_votes.append((position - pos) & 0xFFFFFFFF)

    fwd = most_frequent_position(fwd_votes) if fwd_votes else None
    if fwd is not None and fwd[1] == 0:
        fwd = None
    rev = most_frequent_position(rev_votes) if rev_votes else None
    if rev is not None and rev[1] == 0:
        rev = None

    if fwd and rev:
        if fwd[1] == rev[1]:
            return (False, 0, "none")
        if fwd[1] > rev[1]:
            return (True, fwd[0], "for")
        return (True, rev[0], "rc")
    if fwd:
        return (True, fwd[0], "for")
    if rev:
        return (True, rev[0], "rc")
    return (False, 0, "none")
