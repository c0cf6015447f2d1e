#!/usr/bin/env python3
"""Single-linkage clustering of `ska distance` output.

Companion to the reference's scripts/cluster_dists.py, reimplemented
without external dependencies: reads the long-form distance table,
links sample pairs whose SNP distance <= --snps (and optionally
mismatch proportion <= --mismatches), and writes a CSV of connected
components (clusters sorted by size).
"""

import argparse
import sys
from collections import defaultdict


def main():
    ap = argparse.ArgumentParser(prog="cluster_dists")
    ap.add_argument("distfile", help="output of `ska distance` (use - for stdin)")
    ap.add_argument("--snps", type=float, default=20.0, help="SNP distance threshold")
    ap.add_argument(
        "--mismatches",
        type=float,
        default=None,
        help="optional max mismatch proportion",
    )
    ap.add_argument("--output", default="clusters.csv", help="output CSV")
    args = ap.parse_args()

    fh = sys.stdin if args.distfile == "-" else open(args.distfile)
    header = fh.readline()
    assert header.startswith("Sample1\tSample2"), "expected `ska distance` table"

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    for line in fh:
        f = line.rstrip("\n").split("\t")
        s1, s2, dist, mism = f[0], f[1], float(f[2]), float(f[3])
        find(s1)
        find(s2)
        if dist <= args.snps and (args.mismatches is None or mism <= args.mismatches):
            union(s1, s2)

    comps = defaultdict(list)
    for s in parent:
        comps[find(s)].append(s)
    clusters = sorted(comps.values(), key=lambda c: (-len(c), sorted(c)[0]))

    with open(args.output, "w") as out:
        out.write("Taxon,Cluster\n")
        for i, members in enumerate(clusters, start=1):
            for m in sorted(members):
                out.write(f"{m},{i}\n")
    print(f"wrote {args.output} ({len(clusters)} clusters)")


if __name__ == "__main__":
    main()
