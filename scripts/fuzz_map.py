"""Randomized differential fuzz for `ska map`: the C++ AlnWriter
(csrc/skanative.cpp aln_write) and the Python state machine
(ska_tpu/ref.py _pseudoalignment_one) must produce byte-identical
pseudoalignments on random inputs, and the VCF built on top must
satisfy the reference's structural contract (ska_ref.rs:672-752).

Goes beyond tests/test_native.py's two fixed fixtures: random
multi-chromosome references with N runs and planted repeat motifs
(repeat-mask spans, idx_check chrom walking), random sample mutations
(SNPs/indels/N patches), both key widths, ambig masking on/off.

Usage: python scripts/fuzz_map.py [seed] [time_budget_seconds]
"""
import io
import os
import pathlib
import sys
import tempfile
import time

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from ska_tpu.api import build
from ska_tpu.io import native  # noqa: F401 — the differential is vacuous
from ska_tpu.ref import RefSka  # (python vs python) if native isn't loadable
from ska_tpu.sample import QualOpts

assert native.aln_write is not None

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
rng = np.random.default_rng(int(sys.argv[1]) if len(sys.argv) > 1 else 0)
t_end = time.time() + float(sys.argv[2] if len(sys.argv) > 2 else 600)


def make_ref(rng):
    """1-3 chromosomes, optional N runs and a repeated motif."""
    chroms = []
    for _ in range(int(rng.integers(1, 4))):
        L = int(rng.integers(80, 1200))
        g = rng.choice(BASES, size=L)
        if rng.random() < 0.5:  # N run (invalid bases split k-mer windows)
            p = int(rng.integers(0, max(1, L - 12)))
            g[p : p + int(rng.integers(1, 12))] = ord("N")
        if rng.random() < 0.6:  # repeated motif -> repeat-mask spans
            m = rng.choice(BASES, size=int(rng.integers(15, 70)))
            for _ in range(int(rng.integers(2, 4))):
                p = int(rng.integers(0, max(1, L - len(m))))
                g[p : p + len(m)] = m
        chroms.append(g)
    return chroms


def mutate(rng, chroms):
    out = []
    for g in chroms:
        g = g.copy()
        n_snps = int(rng.integers(0, max(2, len(g) // 40)))
        if n_snps:
            pos = rng.choice(len(g), size=n_snps, replace=False)
            keep = g[pos] != ord("N")
            pos = pos[keep]
            g[pos] = BASES[
                (np.searchsorted(BASES, g[pos]) + rng.integers(1, 4, len(pos))) % 4
            ]
        if rng.random() < 0.3:  # N patch (missing data)
            p = int(rng.integers(0, max(1, len(g) - 20)))
            g[p : p + int(rng.integers(1, 20))] = ord("N")
        if rng.random() < 0.3 and len(g) > 40:  # small indel
            p = int(rng.integers(10, len(g) - 15))
            ilen = int(rng.integers(1, 9))
            if rng.random() < 0.5:
                g = np.concatenate([g[:p], g[p + ilen :]])
            else:
                g = np.concatenate([g[:p], rng.choice(BASES, size=ilen), g[p:]])
        out.append(g)
    return out


def write_fa(path, chroms, prefix):
    with open(path, "w") as f:
        for i, g in enumerate(chroms):
            f.write(f">{prefix}{i}\n{g.tobytes().decode()}\n")


def check_vcf(text, chroms, n_samples):
    """Structural contract of the reference VCF (ska_ref.rs:672-752)."""
    lines = text.splitlines()
    assert lines[0] == "##fileformat=VCFv4.4", lines[0]
    contigs = [l.split("ID=")[1].rstrip(">") for l in lines if l.startswith("##contig")]
    assert len(contigs) == len(chroms)
    header = next(l for l in lines if l.startswith("#CHROM"))
    assert len(header.split("\t")) == 9 + n_samples
    by_name = dict(zip(contigs, chroms))
    for l in lines:
        if l.startswith("#"):
            continue
        f = l.split("\t")
        chrom, pos, ref_allele, alts = f[0], int(f[1]), f[3], f[4].split(",")
        # REF must be the actual reference base at POS (1-based)
        base = by_name[chrom][pos - 1]
        expect = chr(base) if chr(base) in "ACGT" else "N"
        assert ref_allele == expect, (chrom, pos, ref_allele, expect)
        gts = f[9:]
        n_alts = 0 if alts == ["."] else len(alts)
        for gt in gts:
            assert gt == "." or (gt.isdigit() and int(gt) <= n_alts), (gt, alts)
        # every ALT index is used by some sample (first-occurrence ordering)
        used = {int(g) for g in gts if g.isdigit() and int(g) > 0}
        assert used == set(range(1, n_alts + 1)), (alts, gts)


n = 0
skipped = 0
scratch = pathlib.Path(tempfile.mkdtemp(prefix=f"fuzz_map_{os.getpid()}_"))
while time.time() < t_end:
    for f in scratch.iterdir():  # also covers skipped scenarios' files
        f.unlink()
    n += 1
    k = int(rng.choice([7, 9, 17, 31, 33, 41, 63]))
    ref_chroms = make_ref(rng)
    n_samples = int(rng.integers(1, 5))
    files = []
    for s in range(n_samples):
        p = scratch / f"s{n}_{s}.fa"
        write_fa(p, mutate(rng, ref_chroms), f"s{s}c")
        files.append((f"s{s}", str(p), None))
    ref_fa = scratch / f"ref{n}.fa"
    write_fa(ref_fa, ref_chroms, "chr")
    ambig = bool(rng.random() < 0.5)
    repeat = bool(rng.random() < 0.5)
    try:
        arr = build(files, k, rc=bool(rng.random() < 0.9), qual=QualOpts())
        r = RefSka(arr.k, str(ref_fa), arr.rc, ambig_mask=ambig, repeat_mask=repeat)
    except SystemExit:
        skipped += 1  # all-N genome etc: no valid sequence
        continue
    except ValueError as e:
        if "no valid sequence" in str(e):
            skipped += 1  # genome shorter than k / all-N (reference panics too)
            continue
        raise
    r.map(arr)
    if r.mapped_variants is None or len(r.mapped_variants) == 0:
        skipped += 1
        continue
    got_native = r.pseudoalignment()
    got_py = [
        r._pseudoalignment_one(r.mapped_variants[:, i])
        for i in range(r.mapped_variants.shape[1])
    ]
    assert [bytes(a) for a in got_native] == [bytes(a) for a in got_py], (
        f"scenario {n}: native != python pseudoalignment (k={k}, "
        f"ambig={ambig}, repeat={repeat})"
    )
    buf = io.StringIO()
    r.write_vcf(buf)
    check_vcf(buf.getvalue(), ref_chroms, n_samples)
    if n % 10 == 0:
        print(f"... {n} scenarios ({skipped} skipped)", flush=True)

import shutil

shutil.rmtree(scratch, ignore_errors=True)
print(f"DONE {n} scenarios, native==python + VCF contract held ({skipped} skipped)")
