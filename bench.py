#!/usr/bin/env python3
"""Benchmark: split k-mers/sec/chip for the `ska build` inner pipeline.

Runs the full device build step (window extraction -> canonical min(fwd,rc)
-> sort -> segmented IUPAC union) on synthetic bacterial-scale genomes on
the default JAX device (real TPU chip under the driver), and prints one
JSON line.

vs_baseline divides by a MEASURED single-core reference throughput: the
image has no Rust toolchain, so csrc/ref_baseline.cpp reproduces the
reference's hot path (split_kmer.rs:159-217 rolling extraction +
ska_dict.rs:76-113 swisstable/ahash-class hashmap insert with IUPAC
merge) and is compiled+timed on this host right before the device run.
If the proxy cannot be built the historical 10M/s estimate is used and
flagged in the output.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

REF_ESTIMATE_KMERS_PER_SEC = 10_000_000  # fallback only


def measure_reference_proxy(k=31):
    """Build + run csrc/ref_baseline.cpp; returns (kmers/s, 'measured')
    or (estimate, 'estimated') if anything fails."""
    here = os.path.dirname(os.path.abspath(__file__))
    exe = os.path.join(here, "csrc", "ref_baseline")
    src = os.path.join(here, "csrc", "ref_baseline.cpp")
    try:
        if not os.path.exists(exe) or os.path.getmtime(src) > os.path.getmtime(exe):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-std=c++17", "-o", exe, src],
                check=True, capture_output=True,
            )
        best = 0.0
        for _ in range(3):  # best-of-3: the shared host has noisy load
            out = subprocess.run(
                [exe, str(k), str(4 << 20), "2"],
                check=True, capture_output=True, text=True, timeout=300,
            ).stdout.split()
            best = max(best, float(out[2]))
        return best, "measured"
    except Exception as e:  # noqa: BLE001 - any failure falls back
        print(f"baseline proxy failed ({e}); using estimate", file=sys.stderr)
        return float(REF_ESTIMATE_KMERS_PER_SEC), "estimated"


def main():
    import jax
    import jax.numpy as jnp

    from ska_tpu.ops import keys as K
    from ska_tpu.ops import pipeline as P

    k = 31
    W = K.width_for_k(k)
    # SKA_BENCH_* overrides exist for smoke-testing the harness itself
    # (e.g. on CPU); the defaults are the measured TPU configuration.
    L = int(os.environ.get("SKA_BENCH_L", 1 << 22))  # 4M bases per genome
    S = int(os.environ.get("SKA_BENCH_S", 32))  # genomes per dispatch
    # (batch sweep 2026-08-17: 8->195M, 16->213M, 32->238M, 64->242M
    #  kmers/s; 32 is the knee)

    ref_rate, ref_kind = measure_reference_proxy(k)

    rng = np.random.default_rng(1)
    seqs = jnp.asarray(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(S, L)))
    valid = jnp.ones((S, L), bool)
    qual_ok = jnp.ones((S, L), bool)
    rec_last = jnp.zeros((S, L), bool).at[:, L - 1].set(True)

    def step():
        sp, union, is_end, n = P.batched_pipeline(
            seqs, valid, qual_ok, rec_last, k, True, W, False, False, 0
        )
        return n

    # scalar readback forces completion (block_until_ready is not
    # reliable through the axon relay)
    import threading

    # Warmup watchdog: the axon relay has outage windows where a single
    # dispatch (even the compile) stalls for many minutes. The warmup
    # runs in a daemon thread with a generous timeout and a few retries,
    # so an outage at bench time degrades to a late number or a clean
    # nonzero exit instead of an indefinite hang with no JSON at all.
    def _warmup_once(timeout_s):
        box, err = [], []

        def run():
            try:
                box.append(int(np.asarray(step())[0]))
            except BaseException as e:  # report crash vs stall correctly
                err.append(e)

        th = threading.Thread(target=run, daemon=True)
        th.start()
        th.join(timeout_s)
        return box, err, th

    warm_ok = False
    for attempt in range(3):
        box, err, th = _warmup_once(600)
        if err:
            # deterministic code failure, not link weather — don't retry
            print(f"warmup failed: {err[0]!r}", file=sys.stderr)
            sys.exit(4)
        if box:
            # completed; n==0 only happens with degenerate SKA_BENCH_*
            # smoke overrides (e.g. L < k) — a config error, not a stall
            if box[0] <= 0:
                print("warmup produced 0 k-mers (check SKA_BENCH_* sizes)", file=sys.stderr)
                sys.exit(4)
            warm_ok = True
            break
        print(
            f"warmup attempt {attempt + 1} stalled >600s (relay outage?); "
            "waiting for it to drain before retrying",
            file=sys.stderr,
        )
        # the stalled dispatch still owns the device stream; give it a
        # chance to drain before queueing another
        th.join(300)
    if not warm_ok:
        print("device unreachable: warmup never completed", file=sys.stderr)
        sys.exit(3)
    iters = 5
    # best-of-3 timed batches: the relay's latency swings wildly between
    # runs (BASELINE.md methodology notes) and can stall a single batch
    # for minutes at constant device throughput — the best batch is the
    # code's cost, the others are link weather. The device sync runs in
    # a worker thread so a stalled batch can be abandoned once one batch
    # has completed: a SIGALRM handler would never fire here, because
    # CPython only runs signal handlers between bytecodes and the stall
    # blocks inside jaxlib's C++ wait.
    dt = float("inf")
    for batch in range(3):
        t0 = time.perf_counter()
        # queue all dispatches, then force completion once:
        # per-iteration readbacks would add one relay round-trip
        # (~30-100ms) per step
        ns = [step() for _ in range(iters)]
        box = []
        th = threading.Thread(
            target=lambda: box.append(int(np.asarray(ns[-1])[0])), daemon=True
        )
        th.start()
        # dispatches execute in order; syncing on the last covers all.
        # The first batch gets a long-but-finite wait: if the relay dies
        # right after warmup, an unbounded join would hang forever with
        # no JSON at all.
        th.join(120 if dt < float("inf") else 900)
        if th.is_alive():
            if dt == float("inf"):
                print("device lost after warmup: first batch stalled >900s",
                      file=sys.stderr)
                sys.exit(3)
            print(f"batch {batch} stalled >120s; keeping best so far",
                  file=sys.stderr)
            break
        dt = min(dt, time.perf_counter() - t0)
        assert box and box[0] > 0 and all(x.shape == ns[-1].shape for x in ns)

    windows = S * (L - k + 1)
    kmers_per_sec = windows * iters / dt
    print(
        json.dumps(
            {
                "metric": "split k-mers/sec/chip (ska build extract+sort+union, k=31)",
                "value": round(kmers_per_sec),
                "unit": "kmers/s",
                "vs_baseline": round(kmers_per_sec / ref_rate, 3),
                "baseline_kmers_per_sec": round(ref_rate),
                "baseline_kind": ref_kind,
                "vs_estimate": round(kmers_per_sec / REF_ESTIMATE_KMERS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
