#!/usr/bin/env python3
"""Benchmark: split k-mers/sec/chip for the `ska build` inner pipeline.

Runs the full device build step (window extraction -> canonical min(fwd,rc)
-> sort -> segmented IUPAC union) on synthetic bacterial-scale genomes on
the default JAX device (real TPU chip under the driver), and prints one
JSON line.

vs_baseline compares against the reference's estimated single-core
throughput. The repository publishes no numbers (BASELINE.md) and this
image has no Rust toolchain to measure the reference binary, so the
baseline constant below is an estimate of ska.rust's hot loop
(roll_fwd + hashmap insert, ~10M split k-mers/sec/core); replace with a
measured value when a toolchain is available.
"""

import json
import sys
import time

import numpy as np

REF_BASELINE_KMERS_PER_SEC = 10_000_000  # estimated; see module docstring


def main():
    import jax
    import jax.numpy as jnp

    from ska_tpu.ops import keys as K
    from ska_tpu.ops import pipeline as P

    k = 31
    W = K.width_for_k(k)
    L = 1 << 22  # 4M bases per genome (bacterial scale)
    S = 8  # genomes per dispatch

    rng = np.random.default_rng(1)
    seqs = jnp.asarray(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(S, L)))
    valid = jnp.ones((S, L), bool)
    qual_ok = jnp.ones((S, L), bool)
    rec_last = jnp.zeros((S, L), bool).at[:, L - 1].set(True)

    def step():
        sp, union, is_end, n = P.batched_pipeline(
            seqs, valid, qual_ok, rec_last, k, True, W, False, False, 0
        )
        # scalar readback forces completion (block_until_ready is not
        # reliable through the axon relay)
        return int(np.asarray(n)[0])

    step()  # warm up / compile
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        n = step()
    dt = time.perf_counter() - t0
    assert n > 0

    windows = S * (L - k + 1)
    kmers_per_sec = windows * iters / dt
    print(
        json.dumps(
            {
                "metric": "split k-mers/sec/chip (ska build extract+sort+union, k=31)",
                "value": round(kmers_per_sec),
                "unit": "kmers/s",
                "vs_baseline": round(kmers_per_sec / REF_BASELINE_KMERS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
