"""Randomized differential fuzz: serial vs distributed vs chunked builds
must agree exactly on random inputs.

Usage: python scripts/fuzz_build_paths.py [seed] [seconds]
Runs on a virtual 8-device CPU mesh. Keep the config space narrow per
invocation (vary the seed across runs instead) — every new (k, shapes,
flags) combination compiles a fresh XLA program and unbounded variety
turns the run compile-bound."""
import os, sys, time
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
from ska_tpu.api import build
from ska_tpu.sample import QualOpts

rng = np.random.default_rng(int(sys.argv[1]) if len(sys.argv) > 1 else 0)
bases = np.frombuffer(b"ACGT", dtype=np.uint8)
t_end = time.time() + float(sys.argv[2] if len(sys.argv) > 2 else 600)
it = 0
import tempfile, pathlib
while time.time() < t_end and it < 40:
    it += 1
    k = int(rng.choice([17, 41]))
    n_samples = int(rng.integers(2, 7))
    fmt = rng.choice(["fasta", "fastq"])
    with tempfile.TemporaryDirectory() as td:
        d = pathlib.Path(td)
        files = []
        for i in range(n_samples):
            if fmt == "fasta":
                n_rec = int(rng.integers(1, 4))
                p = d / f"s{i}.fa"
                with open(p, "wb") as f:
                    for r in range(n_rec):
                        L = int(rng.integers(k, 400))
                        g = rng.choice(bases, size=L)
                        g[rng.random(L) < 0.03] = ord("N")
                        f.write(b">r%d\n" % r + g.tobytes() + b"\n")
                files.append((f"s{i}", str(p), None))
            else:
                n_reads = int(rng.integers(4, 25))
                RL = int(rng.integers(max(k, 30), 90))
                pool = [rng.choice(bases, size=RL) for _ in range(3)]
                p = d / f"s{i}.fq"
                with open(p, "wb") as f:
                    for r in range(n_reads):
                        g = pool[rng.integers(0, 3)]
                        q = rng.integers(55, 74, size=RL, dtype=np.uint8)
                        q[rng.random(RL) < 0.05] = 40
                        f.write(b"@r%d\n" % r + g.tobytes() + b"\n+\n" + q.tobytes() + b"\n")
                files.append((f"s{i}", str(p), None))
        qual = QualOpts(
            min_count=int(rng.choice([0, 2, 3])),
            min_qual=20,
            qual_filter=int(rng.choice([0, 2])),
        )
        # single-strand (rc=False) has its own canonicalization path;
        # exercise it through every build mode too
        rc = bool(rng.random() < 0.75)
        try:
            os.environ["SKA_DISTRIBUTED"] = "0"
            os.environ.pop("SKA_MAX_CHUNK_BASES", None)
            ref = build(files, k, rc, qual)
        except ValueError as e:
            if "no valid sequence" in str(e):
                continue
            raise
        for mode, env in (("dist", {"SKA_DISTRIBUTED": "1"}),
                          ("chunk", {"SKA_DISTRIBUTED": "0", "SKA_MAX_CHUNK_BASES": "512"}),
                          ("dist+chunk", {"SKA_DISTRIBUTED": "1", "SKA_MAX_CHUNK_BASES": "512"})):
            os.environ.update(env)
            # the ref build succeeded, so a "no valid sequence" here IS a
            # divergence between the paths — let it propagate
            got = build(files, k, rc, qual)
            assert got.names == ref.names, (it, mode, k, fmt)
            np.testing.assert_array_equal(got.keys, ref.keys, err_msg=f"{it} {mode} k={k} {fmt} {qual}")
            np.testing.assert_array_equal(got.variants, ref.variants, err_msg=f"{it} {mode} k={k} {fmt} {qual}")
            np.testing.assert_array_equal(got.counts, ref.counts, err_msg=f"{it} {mode} k={k} {fmt} {qual}")
    if it % 10 == 0:
        print(f"iter {it} ok", flush=True)
print(f"DONE {it} scenarios, all paths agree")
