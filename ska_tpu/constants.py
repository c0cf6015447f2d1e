"""CLI defaults, mirroring the reference's `pub const` block (src/cli.rs:8-35)."""

DEFAULT_KMER = 31
DEFAULT_PROPORTION_READS = None
DEFAULT_STRAND = False  # single_strand default; rc = not single_strand
DEFAULT_MINFREQ = 0.9
DEFAULT_AMBIGMISSING = False
DEFAULT_REPEATMASK = False
DEFAULT_AMBIGMASK = False
DEFAULT_CONSTGAPS = False
DEFAULT_MINCOUNT = 5
DEFAULT_MINQUAL = 20
DEFAULT_QUALFILTER = "strict"
DEFAULT_MISSING_SKALO = 0.1
DEFAULT_MAX_PATHDEPTH = 4
DEFAULT_MAX_INDEL_KMERS = 2

# Quality filter modes (reference src/lib.rs:512-520)
QUAL_NOFILTER = 0
QUAL_MIDDLE = 1
QUAL_STRICT = 2

QUAL_FILTER_NAMES = {
    "no-filter": QUAL_NOFILTER,
    "middle": QUAL_MIDDLE,
    "strict": QUAL_STRICT,
}

# Site filter modes (reference src/cli.rs:128-138)
FILTER_NOFILTER = "no-filter"
FILTER_NOCONST = "no-const"
FILTER_NOAMBIG = "no-ambig"
FILTER_NOAMBIGORCONST = "no-ambig-or-const"


def host_native_enabled() -> bool:
    """Gate for the native host-mode engines (csrc/host_build.cpp):
    SKA_NATIVE_BUILD=1 forces on, =0 forces off, default auto = on only
    under explicit host operation (SKA_PLATFORM=cpu), so the JAX
    pipelines keep their CPU-backend test coverage."""
    import os

    flag = os.environ.get("SKA_NATIVE_BUILD", "auto")
    if flag == "0":
        return False
    return flag == "1" or os.environ.get("SKA_PLATFORM") == "cpu"


def check_k(k: int) -> int:
    """k must be odd and 5..=63 (reference src/cli.rs:38-47)."""
    if not (5 <= k <= 63) or k % 2 == 0:
        raise ValueError("K-mer must be an odd number between 5 and 63 (inclusive)")
    return k
