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

    kmer_map: Dict[int, List[int]] = {}
    overflow = set()
    if len(genome_seq) >= k:
        s = genome_seq.decode()
        for n in range(len(s) - k + 1):
            kmer = s[n : n + k]
            if any((ord(c) & 0xF) == 14 for c in kmer):  # N check (valid_base)
                continue
            enc = encode_str(kmer)
            if enc in overflow:
                continue
            positions = kmer_map.setdefault(enc, [])
            if len(positions) < 3:
                positions.append(n + k)
            if len(positions) > 3:
                del kmer_map[enc]
                overflow.add(enc)

    return kmer_map, genome_seq, genome_name


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


def scan_variants(vec_variants, k_graph: int, kmer_map):
    """positioning.rs:129-214: vote (position - offset) over fwd and rc."""
    fwd_votes: List[int] = []
    rev_votes: List[int] = []
    for variant in vec_variants:
        seq = variant.sequence
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
