"""Shared test helpers (column-set alignment comparison, like the
reference's var_hash in tests/common/mod.rs:166-189)."""


def var_hash(aln_text):
    if isinstance(aln_text, bytes):
        aln_text = aln_text.decode()
    samples = [line for i, line in enumerate(aln_text.splitlines()) if i % 2 == 1]
    cols = set()
    for i in range(len(samples[0]) if samples else 0):
        cols.add(tuple(s[i] for s in samples))
    return cols


def aln_lengths(aln_text):
    if isinstance(aln_text, bytes):
        aln_text = aln_text.decode()
    return [len(line) for i, line in enumerate(aln_text.splitlines()) if i % 2 == 1]
