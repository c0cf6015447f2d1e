"""FASTQ input: count filter, quality modes, cov model
(reference tests/fastq_input.rs and coverage.rs unit tests)."""

import io

import numpy as np
import pytest

from ska_tpu.api import align, build, map_mode
from ska_tpu.coverage import CoverageHistogram, INIT_C, INIT_W0
from ska_tpu.sample import QualOpts
from ska_tpu.constants import QUAL_MIDDLE, QUAL_NOFILTER, QUAL_STRICT

from helpers import var_hash


def _fq_files(ref_in, prefix):
    return [
        (
            f"{prefix}_1",
            f"{ref_in}/{prefix}_1_fwd.fastq.gz",
            f"{ref_in}/{prefix}_1_rev.fastq.gz",
        ),
        (
            f"{prefix}_2",
            f"{ref_in}/{prefix}_2_fwd.fastq.gz",
            f"{ref_in}/{prefix}_2_rev.fastq.gz",
        ),
    ]


def _align_out(arr, **kw):
    fh = io.BytesIO()
    align(arr, fh, **kw)
    return fh.getvalue().decode()


def test_align_fastq_matches_fasta(ref_in):
    # fastq_input.rs:13-55
    q = QualOpts(min_count=2, min_qual=2, qual_filter=QUAL_STRICT)
    fq = build(_fq_files(ref_in, "test"), 9, True, q)
    fa = build(
        [("test_1", f"{ref_in}/test_1.fa", None), ("test_2", f"{ref_in}/test_2.fa", None)],
        9,
        True,
        QualOpts(),
    )
    assert var_hash(_align_out(fq)) == var_hash(_align_out(fa))


@pytest.mark.parametrize(
    "k,prefix,c1_expect,c3_expect",
    [
        (7, "test_count", {("C", "W")}, {("C", "T")}),
        (63, "test_long", {("G", "M")}, {("G", "A")}),
    ],
)
def test_count_check(ref_in, k, prefix, c1_expect, c3_expect):
    # fastq_input.rs:60-110 (k=7) and :114-193 (k=63, u128)
    q1 = QualOpts(min_count=1, min_qual=20, qual_filter=QUAL_STRICT)
    arr = build(_fq_files(ref_in, prefix), k, True, q1)
    assert var_hash(_align_out(arr)) == c1_expect

    q3 = QualOpts(min_count=3, min_qual=20, qual_filter=QUAL_STRICT)
    arr = build(_fq_files(ref_in, prefix), k, True, q3)
    assert var_hash(_align_out(arr)) == c3_expect

    if k == 63:
        q2 = QualOpts(min_count=2, min_qual=20, qual_filter=QUAL_STRICT)
        arr = build(_fq_files(ref_in, prefix), k, True, q2)
        _align_out(arr)  # just must succeed (fastq_input.rs:168-191)


def test_map_fastq_matches_fasta(ref_in):
    # fastq_input.rs:196-276
    q = QualOpts(min_count=1, min_qual=2, qual_filter=QUAL_STRICT)
    fq = build(_fq_files(ref_in, "test"), 9, True, q)
    fa = build(
        [("test_1", f"{ref_in}/test_1.fa", None), ("test_2", f"{ref_in}/test_2.fa", None)],
        9,
        True,
        QualOpts(),
    )
    outs = []
    for arr in (fq, fa):
        fh = io.BytesIO()
        map_mode(arr, f"{ref_in}/test_ref.fa", fh, "aln")
        outs.append(fh.getvalue())
    # sample names differ (test_1 vs test_1_1); compare sequence lines
    for l1, l2 in zip(outs[0].splitlines()[1::2], outs[1].splitlines()[1::2]):
        assert l1 == l2


def test_error_and_quality_fastq(ref_in):
    # fastq_input.rs:279-470
    q = QualOpts(min_count=3, min_qual=2, qual_filter=QUAL_STRICT)
    all_hash = var_hash(
        _align_out(build(_fq_files(ref_in, "test"), 9, True, q))
    )

    # no quality filtering
    q = QualOpts(min_count=5, min_qual=20, qual_filter=QUAL_NOFILTER)
    got = var_hash(_align_out(build(_fq_files(ref_in, "test_quality"), 9, True, q)))
    assert got == all_hash

    # middle-base-only quality filter
    q = QualOpts(min_count=5, min_qual=5, qual_filter=QUAL_MIDDLE)
    got = var_hash(_align_out(build(_fq_files(ref_in, "test_quality_base"), 9, True, q)))
    assert got == all_hash

    # with errors: the C,T variant k-mer is filtered by count
    err_hash = set(all_hash)
    err_hash.discard(("C", "T"))
    q = QualOpts(min_count=5, min_qual=2, qual_filter=QUAL_STRICT)
    got = var_hash(_align_out(build(_fq_files(ref_in, "test_error"), 9, True, q)))
    assert got == err_hash

    # low quality scores remove it too
    q = QualOpts(min_count=5, min_qual=30, qual_filter=QUAL_STRICT)
    got = var_hash(_align_out(build(_fq_files(ref_in, "test_quality"), 9, True, q)))
    assert got == err_hash

    # low qual in flanking region, strict
    q = QualOpts(min_count=5, min_qual=5, qual_filter=QUAL_STRICT)
    got = var_hash(_align_out(build(_fq_files(ref_in, "test_quality_base"), 9, True, q)))
    assert got == err_hash

    # low qual at middle base, default strict min_qual 20
    q = QualOpts(min_count=5, min_qual=20, qual_filter=QUAL_STRICT)
    got = var_hash(_align_out(build(_fq_files(ref_in, "test_quality_base"), 9, True, q)))
    assert got == err_hash


def test_cov_runs(ref_in, capsys):
    # fastq_input.rs:474-510
    cov = CoverageHistogram(
        f"{ref_in}/test_1_fwd.fastq.gz", f"{ref_in}/test_1_rev.fastq.gz", 9, True
    )
    assert cov.counts.sum() > 0

    cov33 = CoverageHistogram(
        f"{ref_in}/test_long_1_fwd.fastq.gz", f"{ref_in}/test_long_1_rev.fastq.gz", 33, True
    )
    assert cov33.counts.sum() > 0

    with pytest.raises(ValueError):
        CoverageHistogram(f"{ref_in}/test_1.fa", f"{ref_in}/test_2.fa", 9, True)


def test_fit_histogram_unit():
    # coverage.rs:365-413: hardcoded histogram expects cutoff 9
    example_counts = [
        44633459, 950672, 104410, 44137, 24170, 21232, 21699, 24145, 30696, 39210,
        49878, 63683, 77690, 95147, 112416, 130307, 146531, 160932, 175130, 185113,
        193149, 197468, 199189, 198235, 192150, 185565, 176362, 165455, 152487,
        139495, 127036, 112803, 103080, 90425, 80637, 70960, 62698, 54949, 46744,
        41240, 35591, 30025, 25856, 22105, 19405, 16668, 14780, 12620, 11074, 9807,
        8517, 7731, 7112, 6846, 6126, 5696, 5233, 4779, 4288, 3873, 3519, 3406,
        2994, 2859, 2650, 2394, 2376, 2260, 2233, 2050, 1859, 1863, 1792, 1777,
        1773, 1738, 1648,
    ]
    cov = CoverageHistogram.__new__(CoverageHistogram)
    cov.k = 31
    cov.rc = True
    cov.counts = np.array(example_counts, dtype=np.int64)
    cov.w0, cov.c = INIT_W0, INIT_C
    cov.cutoff = 0
    cov.verbose = False
    cov.fitted = False
    assert cov.fit_histogram() == 9
    out = io.StringIO()
    cov.plot_hist(out)
    lines = out.getvalue().splitlines()
    assert lines[0] == "Count\tK_mers\tMixture_density\tComponent"
    assert lines[1].startswith("1\t44633459\t")
    assert lines[8].endswith("Error") and lines[9].endswith("Coverage")


def test_mixed_fastq_fasta_pair_keeps_fasta_kmers(tmp_path):
    """A file pair may mix a FASTQ with a quality-less mate (FASTA): the
    reference applies quality PER RECORD and passes records without
    scores unconditionally (split_kmer.rs:66-71), so under the strict
    filter the mate's k-mers must survive — a zero-filled quality batch
    would silently drop every one of them."""
    from ska_tpu.sample import build_sample

    rng = np.random.default_rng(7)
    bases = np.frombuffer(b"ACGT", np.uint8)
    sa = rng.choice(bases, 400).tobytes()
    sb = rng.choice(bases, 400).tobytes()
    fq = tmp_path / "a.fastq"
    fq.write_bytes(b"@r1\n" + sa + b"\n+\n" + b"I" * 400 + b"\n")
    fa = tmp_path / "b.fa"
    fa.write_bytes(b">c1\n" + sb + b"\n")

    q = QualOpts(min_count=1, min_qual=20, qual_filter=QUAL_STRICT)
    both = build_sample("s", 17, (str(fq), str(fa)), True, q, None)
    fa_alone = build_sample("s", 17, (str(fa), None), True, q, None)

    keys_both = {tuple(row) for row in both.keys}
    keys_fa = {tuple(row) for row in fa_alone.keys}
    assert keys_fa and keys_fa <= keys_both


def test_mixture_boundary_iterates_dont_crash():
    """The reference's soft bound is INCLUSIVE (0.0..=1.0,
    coverage.rs:316): a BFGS line-search probe landing exactly on
    w0 == 0 or 1 evaluates ln(0)/x/0, which Rust degrades to -inf/inf
    and the optimizer walks away from — python must not raise there."""
    import math

    from ska_tpu.coverage import _grad_ll, _log_likelihood

    counts = np.array([100.0, 80.0, 60.0, 500.0, 700.0, 300.0])
    for w0 in (0.0, 1.0):
        ll = _log_likelihood(np.array([w0, 20.0]), counts)
        assert not math.isnan(ll)  # finite or -inf, never an exception
        g = _grad_ll(np.array([w0, 20.0]), counts)
        assert g.shape == (2,)  # inf/nan entries allowed, raising is not


def test_chunked_build_matches_single_dispatch(monkeypatch):
    """Forcing a tiny per-dispatch cap must not change the sample dict:
    FASTA contigs split mid-record (k-1 overlap slices) and FASTQ reads
    with the min-count filter (per-whole-k-mer counts summed across
    chunks) both reproduce the one-shot pipeline exactly."""
    import numpy as np

    from ska_tpu.io import fastx
    from ska_tpu.sample import QualOpts, dict_from_batch

    rng = np.random.default_rng(23)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)

    for k in (17, 41):
        # FASTA: one long contig + a short one, with some Ns
        contig = rng.choice(bases, size=9000)
        contig[rng.choice(9000, 40, replace=False)] = ord("N")
        batch = fastx.build_batch([contig.tobytes(), contig[:500].tobytes()])
        want = dict_from_batch(batch, k, True, QualOpts(), False)
        monkeypatch.setenv("SKA_MAX_CHUNK_BASES", "2048")
        got = dict_from_batch(batch, k, True, QualOpts(), False)
        monkeypatch.delenv("SKA_MAX_CHUNK_BASES")
        np.testing.assert_array_equal(got[0], want[0]), k
        np.testing.assert_array_equal(got[1], want[1])

    # FASTQ with min_count 2 and 3 + quality gates
    for min_count in (0, 2, 3):
        reads, quals = [], []
        pool = [rng.choice(bases, size=80) for _ in range(6)]
        for _ in range(60):
            r = pool[rng.integers(0, 6)]
            reads.append(r.tobytes())
            # mostly high quality with occasional low bases, so strict
            # filtering prunes some windows without killing them all
            qa = rng.integers(60, 75, size=80, dtype=np.uint8)
            low = rng.random(80) < 0.02
            qa[low] = 40
            quals.append(qa.tobytes())
        batch = fastx.build_batch(reads, quals)
        q = QualOpts(min_count=min_count, min_qual=20, qual_filter=2)
        want = dict_from_batch(batch, 17, True, q, True)
        monkeypatch.setenv("SKA_MAX_CHUNK_BASES", "1024")
        got = dict_from_batch(batch, 17, True, q, True)
        monkeypatch.delenv("SKA_MAX_CHUNK_BASES")
        assert len(want[0]) > 0
        np.testing.assert_array_equal(got[0], want[0]), min_count
        np.testing.assert_array_equal(got[1], want[1])


def test_api_build_with_chunked_samples(tmp_path, monkeypatch):
    """api.build routes oversized samples through the chunked per-sample
    path and still produces the exact multi-sample array."""
    import numpy as np

    from ska_tpu.api import build
    from ska_tpu.sample import QualOpts

    rng = np.random.default_rng(31)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    files = []
    for i, size in enumerate((5000, 900, 5100)):
        g = rng.choice(bases, size=size)
        p = tmp_path / f"c{i}.fa"
        with open(p, "wb") as f:
            f.write(b">c%d\n" % i + g.tobytes() + b"\n")
        files.append((f"c{i}", str(p), None))

    want = build(files, 31, True, QualOpts())
    monkeypatch.setenv("SKA_MAX_CHUNK_BASES", "2048")
    got = build(files, 31, True, QualOpts())

    assert got.names == want.names
    np.testing.assert_array_equal(got.keys, want.keys)
    np.testing.assert_array_equal(got.variants, want.variants)
    np.testing.assert_array_equal(got.counts, want.counts)


def test_cov_chunked_matches_single_dispatch(ref_in, monkeypatch):
    """A tiny forced chunk cap must not change the cov histogram."""
    want = CoverageHistogram(
        f"{ref_in}/test_1_fwd.fastq.gz", f"{ref_in}/test_1_rev.fastq.gz", 9, True
    ).counts
    monkeypatch.setenv("SKA_MAX_CHUNK_BASES", "1024")
    got = CoverageHistogram(
        f"{ref_in}/test_1_fwd.fastq.gz", f"{ref_in}/test_1_rev.fastq.gz", 9, True
    ).counts
    np.testing.assert_array_equal(got, want)


def test_chunked_boundary_on_record_final_window(monkeypatch):
    """A record whose final (roll-only) window starts exactly at a chunk
    boundary must still be emitted: the boundary nudges forward so the
    emission rule can see the previous base's validity."""
    import numpy as np

    from ska_tpu.io import fastx
    from ska_tpu.sample import QualOpts, dict_from_batch

    k, cap = 9, 64
    step = cap - (k - 1)  # 56
    rng = np.random.default_rng(2)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    rec = rng.choice(bases, size=step + k)  # final window starts at `step`
    batch = fastx.build_batch([rec.tobytes()])
    want = dict_from_batch(batch, k, True, QualOpts(), False)
    monkeypatch.setenv("SKA_MAX_CHUNK_BASES", str(cap))
    got = dict_from_batch(batch, k, True, QualOpts(), False)
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])


def test_merged_batch_cap_and_guard(monkeypatch):
    """The merged pipeline's variants scatter is an (S*Lp, S) buffer —
    an S^2*Lp term. _auto_max_batch caps it at 1GB / int32 index space
    (32 x 4Mb genomes measured an OverflowError at trace time before the
    cap), and _merged_impl raises a clear error when an explicit
    SKA_MAX_BATCH pushes past it."""
    import jax.numpy as jnp

    from ska_tpu.ops import pipeline as P
    from ska_tpu.sample import _auto_max_batch

    monkeypatch.delenv("SKA_MAX_BATCH", raising=False)
    assert _auto_max_batch(1 << 19) == 32   # 128-sample stress config
    assert _auto_max_batch(1 << 22) == 16   # 4Mb genomes: S^2*Lp = 2^30
    assert _auto_max_batch(1 << 23) == 8
    assert _auto_max_batch(1 << 26) == 2    # base 2^27 budget dominates
    monkeypatch.setenv("SKA_MAX_BATCH", "32")
    assert _auto_max_batch(1 << 22) == 32   # explicit override wins

    S, L = 8192, 512  # S^2*L = 2^35 > 2^31: must refuse, not overflow
    seqs = jnp.zeros((S, L), jnp.uint8)
    ones = jnp.ones((S, L), bool)
    rl = jnp.zeros((S, L), bool)
    with pytest.raises(ValueError, match="SKA_MAX_BATCH"):
        P.merged_build_pipeline(seqs, ones, ones, rl, 31, True, 1,
                                False, False, 0)


def test_cov_native_hist_matches_device(ref_in, monkeypatch):
    """The native counting map (ska_host_cov_hist) must produce the
    exact histogram of the device sort/segment pipeline."""
    import numpy as np

    dev = CoverageHistogram(
        f"{ref_in}/test_1_fwd.fastq.gz", f"{ref_in}/test_1_rev.fastq.gz",
        9, True,
    ).counts
    monkeypatch.setenv("SKA_NATIVE_BUILD", "1")
    nat = CoverageHistogram(
        f"{ref_in}/test_1_fwd.fastq.gz", f"{ref_in}/test_1_rev.fastq.gz",
        9, True,
    ).counts
    assert np.array_equal(np.asarray(dev), np.asarray(nat))
    # and at a two-limb k
    dev33 = CoverageHistogram(
        f"{ref_in}/test_long_1_fwd.fastq.gz",
        f"{ref_in}/test_long_1_rev.fastq.gz", 33, True,
    ).counts
    monkeypatch.setenv("SKA_NATIVE_BUILD", "1")
    nat33 = CoverageHistogram(
        f"{ref_in}/test_long_1_fwd.fastq.gz",
        f"{ref_in}/test_long_1_rev.fastq.gz", 33, True,
    ).counts
    assert np.array_equal(np.asarray(dev33), np.asarray(nat33))
