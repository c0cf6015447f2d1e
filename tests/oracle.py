"""Brute-force split k-mer oracle used to validate the device kernels.

Implements the reference semantics (src/ska_dict/split_kmer.rs) in the
most literal sequential way: roll through the sequence, skip invalid
bases, rebuild after breaks. Slow but obviously correct.
"""

QUAL_NOFILTER, QUAL_MIDDLE, QUAL_STRICT = 0, 1, 2


def encode(c):
    return (c >> 1) & 3


def valid_base(c):
    return (c & 0xF) != 14


def rc_packed(x, n):
    out = 0
    for _ in range(n):
        out = (out << 2) | ((x & 3) ^ 2)
        x >>= 2
    return out


def split_kmers(seq, k, rc=True, qual=None, min_qual=0, qual_filter=QUAL_NOFILTER):
    """Yield (start, canonical_key_int, middle_code, is_rc, is_palindrome)
    for one record, reproducing build/roll emission rules exactly."""
    L = len(seq)
    h = (k - 1) // 2

    def ok(i):
        if not valid_base(seq[i]):
            return False
        if qual is not None and qual_filter == QUAL_STRICT:
            if not (qual[i] - 33 > min_qual):
                return False
        return True

    out = []
    idx = 0
    # build: requires idx + k < L (strict), skipping invalid bases
    def build(idx):
        while True:
            if idx + k >= L:
                return None
            i = 0
            while i < k:
                if ok(idx + i):
                    i += 1
                else:
                    idx += i + 1
                    if idx + k >= L:
                        return None
                    i = 0
            return idx

    s = build(0)
    if s is None:
        return out
    out.append(s)
    pos = s + k - 1  # index of last base
    while True:
        pos += 1
        if pos >= L:
            break
        if ok(pos):
            out.append(pos - k + 1)
        else:
            s = build(pos + 1)
            if s is None:
                break
            out.append(s)
            pos = s + k - 1

    res = []
    for s in out:
        fwd = 0
        for i in range(k):
            if i == h:
                continue
            fwd = (fwd << 2) | encode(seq[s + i])
        mid = encode(seq[s + h])
        if rc:
            r = rc_packed(fwd, k - 1)
            pal = r == fwd
            if fwd > r:
                res.append((s, r, mid ^ 2, True, pal))
            else:
                res.append((s, fwd, mid, False, pal))
        else:
            res.append((s, fwd, mid, False, False))
    return res


def whole_kmers(seq, k, rc=True):
    """Canonical whole k-mers for emitted windows, as (start, key)."""
    out = []
    for (s, _key, _mid, _isrc, _pal) in split_kmers(seq, k, rc=rc):
        w = 0
        for i in range(k):
            w = (w << 2) | encode(seq[s + i])
        if rc:
            w = min(w, rc_packed(w, k))
        out.append((s, w))
    return out


def sample_dict(records, k, rc=True):
    """FASTA-style dict build: IUPAC union with palindrome W/S/N rule."""
    d = {}
    for seq in records:
        for (_s, key, mid, _isrc, pal) in split_kmers(seq, k, rc=rc):
            add = (1 << mid) | ((1 << (mid ^ 2)) if pal else 0)
            d[key] = d.get(key, 0) | add
    return d
