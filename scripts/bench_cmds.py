#!/usr/bin/env python3
"""Command-level benchmarks at bacterial scale (synthetic genomes).

Generates a 4 Mb reference plus N mutated samples, then times the real
CLI entry points (build / align / map aln / map vcf / distance) end to
end, including IO. Run on the TPU host: `python scripts/bench_cmds.py`.
"""

import argparse
import json
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


def run(cmd, timeout=None, env=None, **kw):
    t0 = time.perf_counter()
    full_env = None
    if env:
        import os
        full_env = dict(os.environ)
        full_env.update(env)
    r = subprocess.run(
        [sys.executable, str(REPO / "ska.py")] + [str(c) for c in cmd],
        check=True,
        capture_output=True,
        timeout=timeout,
        env=full_env,
        **kw,
    )
    return time.perf_counter() - t0, r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=4, help="samples")
    ap.add_argument("-L", type=int, default=4_000_000, help="genome length")
    ap.add_argument("-k", type=int, default=31)
    ap.add_argument("--json", default=None, metavar="PATH",
                    help="also write the table as a JSON record")
    ap.add_argument("--cmd-timeout", type=float, default=None,
                    help="per-command wall cap in seconds (relay outages "
                         "stall single device dispatches for minutes)")
    args = ap.parse_args()

    rows = []  # (name, seconds) in run order

    def bench(name, cmd):
        # The axon relay stalls single device dispatches for minutes at
        # constant ~4s CPU, or fails outright with backend-init errors
        # (BASELINE.md); both are link weather, not code. Fall back to
        # host mode so the artifact still carries a number, attributed
        # per row.
        try:
            t, _ = run(cmd, timeout=args.cmd_timeout)
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError) as e:
            why = ("timeout" if isinstance(e, subprocess.TimeoutExpired)
                   else f"exit {e.returncode}")
            print(f"{name:<19}: device run failed ({why}); retrying host-mode")
            try:
                t, _ = run(cmd, timeout=args.cmd_timeout,
                           env={"SKA_PLATFORM": "cpu"})
            except subprocess.TimeoutExpired:
                print(f"{name:<19}: TIMEOUT on host too")
                rows.append({"cmd": name, "seconds": None, "error": "timeout"})
                return None
            except subprocess.CalledProcessError as e2:
                tail = (e2.stderr or b"")[-300:].decode("utf-8", "replace")
                print(f"{name:<19}: FAILED on host too: {tail}")
                rows.append({"cmd": name, "seconds": None,
                             "error": f"exit {e2.returncode}: {tail}"})
                return None
            print(f"{name:<19}: {t:7.2f}s (host mode)")
            rows.append({"cmd": name, "seconds": round(t, 2),
                         "platform": "cpu",
                         "note": f"device run failed ({why}, likely relay "
                                 "weather); host-mode fallback"})
            return t
        print(f"{name:<19}: {t:7.2f}s")
        rows.append({"cmd": name, "seconds": round(t, 2)})
        return t

    with tempfile.TemporaryDirectory() as td:
        d = Path(td)
        print(f"generating {args.n} x {args.L/1e6:.1f} Mb genomes ...")
        ref_f, samples = make_genomes(d, args.n, args.L)

        t = bench("build", ["build", "-o", d / "all", "-k", args.k] + samples)
        if t is None:
            print("build timed out; downstream commands need all.skf - aborting")
        else:
            kmers_per_s = args.n * (args.L - args.k + 1) / t
            print(f"    ({kmers_per_s/1e6:8.1f} M windows/s incl IO)")
            rows[-1]["windows_per_sec"] = round(kmers_per_s)

            bench("align", ["align", d / "all.skf", "-o", d / "out.aln"])
            bench("map_aln", ["map", ref_f, d / "all.skf", "-o", d / "out_map.aln"])
            bench("map_vcf",
                  ["map", ref_f, d / "all.skf", "-f", "vcf", "-o", d / "out.vcf"])
            bench("distance", ["distance", d / "all.skf", "-o", d / "dists.tsv"])
            bench("lo", ["lo", "-r", ref_f, d / "all.skf", d / "lo_out"])

    if args.json:
        # the backend the subprocesses computed on (a CPU-pinned smoke run
        # must not read as TPU numbers); resolved the same way ska.py does
        try:
            plat = subprocess.run(
                [sys.executable, "-c",
                 "import ska_tpu, jax; print(jax.devices()[0].platform)"],
                capture_output=True, text=True, timeout=420, cwd=str(REPO),
            ).stdout.strip() or "unknown"
        except Exception:  # noqa: BLE001
            plat = "unknown"
        rec = {
            "platform": plat,
            "config": {"n_samples": args.n, "genome_len": args.L, "k": args.k,
                       "snp_rate": 0.001},
            "methodology": (
                "end-to-end `ska.py <cmd>` subprocess wall time incl. IO and "
                "interpreter startup on synthetic mutated genomes "
                "(scripts/bench_cmds.py); single run per command on the "
                "1-core TPU host, so +/-50% page-fault weather applies "
                "(BASELINE.md)"),
            "unit": "seconds",
            "results": rows,
        }
        with open(args.json, "w") as f:
            json.dump(rec, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
