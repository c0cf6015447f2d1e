"""Python-int k-mer helpers for skalo (2-bit codes A=0 C=1 T=2 G=3)."""

_DECODE = "ACTG"
_ENCODE = {c: i for i, c in enumerate(_DECODE)}
_ENCODE.update({c.lower(): i for i, c in enumerate(_DECODE)})

# degenerate middle-base expansion (input.rs:32-51); list order is the
# deterministic replacement for the reference's HashMap iteration
DEGENERATE = {
    "A": ["A"],
    "T": ["T"],
    "G": ["G"],
    "C": ["C"],
    "M": ["A", "C"],
    "S": ["C", "G"],
    "W": ["A", "T"],
    "R": ["A", "G"],
    "Y": ["C", "T"],
    "K": ["G", "T"],
    "B": ["C", "G", "T"],
    "D": ["A", "G", "T"],
    "H": ["A", "C", "T"],
    "V": ["A", "C", "G"],
    "N": ["A", "C", "G", "T"],
}


def encode_str(s: str) -> int:
    v = 0
    for c in s:
        v = (v << 2) | ((ord(c) >> 1) & 3)
    return v


def decode_int(v: int, k: int) -> str:
    out = []
    for i in range(k):
        out.append(_DECODE[(v >> (2 * (k - 1 - i))) & 3])
    return "".join(out)


def rev_comp_int(v: int, k: int) -> int:
    out = 0
    for _ in range(k):
        out = (out << 2) | ((v & 3) ^ 2)
        v >>= 2
    return out


def combine_kmers(k1: int, k2: int) -> int:
    """(k1 << 2) | (k2 & 3) (bit_encoding.rs:133-144)."""
    return (k1 << 2) | (k2 & 3)


def last_nucl(v: int) -> str:
    return _DECODE[v & 3]


def rev_compl_str(seq: str) -> str:
    comp = {"A": "T", "C": "G", "T": "A", "G": "C"}
    return "".join(comp[c] for c in reversed(seq))


def popcount(mask: int) -> int:
    return bin(mask).count("1")
