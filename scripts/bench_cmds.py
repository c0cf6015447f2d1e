#!/usr/bin/env python3
"""Command-level benchmarks at bacterial scale (synthetic genomes).

Generates a 4 Mb reference plus N mutated samples, then times the real
CLI entry points (build / align / map aln / map vcf / distance) end to
end, including IO. Run on the TPU host: `python scripts/bench_cmds.py`.
"""

import argparse
import subprocess
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def make_genomes(d: Path, n_samples: int, length: int, seed=0, snp_rate=0.001):
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    ref = rng.choice(bases, size=length)
    ref_f = d / "ref.fa"
    with open(ref_f, "wb") as f:
        f.write(b">ref chr1\n")
        f.write(ref.tobytes() + b"\n")
    sample_files = []
    for i in range(n_samples):
        g = ref.copy()
        n_mut = int(length * snp_rate)
        pos = rng.choice(length, size=n_mut, replace=False)
        g[pos] = bases[(np.searchsorted(bases, g[pos]) + rng.integers(1, 4, n_mut)) % 4]
        p = d / f"sample_{i}.fa"
        with open(p, "wb") as f:
            f.write(b">sample_%d\n" % i)
            f.write(g.tobytes() + b"\n")
        sample_files.append(p)
    return ref_f, sample_files


def run(cmd, **kw):
    t0 = time.perf_counter()
    r = subprocess.run(
        [sys.executable, str(REPO / "ska.py")] + [str(c) for c in cmd],
        check=True,
        capture_output=True,
        **kw,
    )
    return time.perf_counter() - t0, r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=4, help="samples")
    ap.add_argument("-L", type=int, default=4_000_000, help="genome length")
    ap.add_argument("-k", type=int, default=31)
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as td:
        d = Path(td)
        print(f"generating {args.n} x {args.L/1e6:.1f} Mb genomes ...")
        ref_f, samples = make_genomes(d, args.n, args.L)

        t, _ = run(["build", "-o", d / "all", "-k", args.k] + samples)
        kmers_per_s = args.n * (args.L - args.k + 1) / t
        print(f"build  {args.n} samples: {t:7.2f}s  ({kmers_per_s/1e6:8.1f} M windows/s incl IO)")

        t, _ = run(["align", d / "all.skf", "-o", d / "out.aln"])
        print(f"align              : {t:7.2f}s")

        t, _ = run(["map", ref_f, d / "all.skf", "-o", d / "out_map.aln"])
        print(f"map (aln)          : {t:7.2f}s")

        t, _ = run(["map", ref_f, d / "all.skf", "-f", "vcf", "-o", d / "out.vcf"])
        print(f"map (vcf)          : {t:7.2f}s")

        t, _ = run(["distance", d / "all.skf", "-o", d / "dists.tsv"])
        print(f"distance           : {t:7.2f}s")


if __name__ == "__main__":
    main()
