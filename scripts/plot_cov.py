#!/usr/bin/env python3
"""Plot the output table of `ska cov` (count histogram + mixture fit).

Companion to the reference's scripts/plot_cov.py, reimplemented: reads
the Count / K_mers / Mixture_density / Component table from stdin or a
file and writes a two-panel PNG (normalized histogram + fitted density,
with the inferred cutoff marked).
"""

import argparse
import sys


def main():
    ap = argparse.ArgumentParser(prog="plot_cov", description="Plot `ska cov` output")
    ap.add_argument("histfile", help="table from `ska cov` (use - for stdin)")
    ap.add_argument("--output", default="coverage_histogram", help="output prefix")
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fh = sys.stdin if args.histfile == "-" else open(args.histfile)
    counts, kmers, dens = [], [], []
    cutoff = 0
    header = fh.readline()
    assert header.startswith("Count"), "expected `ska cov` table"
    for line in fh:
        idx, count, density, comp = line.rstrip("\n").split("\t")
        counts.append(int(idx))
        kmers.append(int(count))
        dens.append(float(density))
        if comp == "Coverage" and cutoff == 0:
            cutoff = int(idx)

    kmax = max(kmers[1:]) if len(kmers) > 1 else max(kmers)
    fig, (ax1, ax2) = plt.subplots(2, figsize=(11, 11), dpi=160)
    fig.suptitle("Coverage histogram fit")

    ax1.bar(counts, [k / max(kmers) for k in kmers], color="steelblue")
    ax1.set_ylim(0, (kmax / max(kmers)) * 1.1)
    ax1.axvline(cutoff, color="crimson", ls="--", label=f"cutoff = {cutoff}")
    ax1.set_xlabel("K-mer count")
    ax1.set_ylabel("Frequency (normalized)")
    ax1.legend()

    ax2.plot(counts, dens, color="darkorange")
    ax2.axvline(cutoff, color="crimson", ls="--")
    ax2.set_yscale("log")
    ax2.set_xlabel("K-mer count")
    ax2.set_ylabel("Mixture density")

    fig.tight_layout()
    fig.savefig(f"{args.output}.png")
    print(f"wrote {args.output}.png")


if __name__ == "__main__":
    main()
