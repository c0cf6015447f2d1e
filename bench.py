#!/usr/bin/env python3
"""Benchmark: split k-mers/sec/chip for the `ska build` inner pipeline.

Runs the full device build step (window extraction -> canonical min(fwd,rc)
-> sort -> segmented IUPAC union) on synthetic bacterial-scale genomes on
the default JAX device (real TPU chip under the driver), and prints the
headline JSON line AS SOON AS it is measured, then (budget permitting)
runs the command-level suite and prints a final JSON line with the
cmds_json artifact name attached — both lines parse identically, so an
external timeout during the (long) command suite can no longer erase the
already-measured headline. Measures both key widths: W=1 (k=31, the
headline) and W=2 (k=63, two-limb keys) so a two-limb regression is
driver-visible.

vs_baseline divides by a MEASURED single-core reference throughput: the
image has no Rust toolchain, so csrc/ref_baseline.cpp reproduces the
reference's hot path (split_kmer.rs:159-217 rolling extraction +
ska_dict.rs:76-113 swisstable/ahash-class hashmap insert with IUPAC
merge) and is compiled+timed on this host right before the device run.
If the proxy cannot be built the historical 10M/s estimate is used and
flagged in the output.

Reliability: the TPU sits behind the axon relay, which has outage windows
(backend init raises UNAVAILABLE, or a single dispatch stalls for many
minutes). The device work therefore runs in a CHILD process supervised by
this parent: a stalled child is killed and retried with backoff inside a
total budget (SKA_BENCH_BUDGET_S, default 2400s), and if the device never
comes up the parent still prints a structured, parseable JSON failure
record ({"value": null, "error": ..., "phase": ...}) instead of a raw
traceback. A fresh child per attempt also sidesteps jax's caching of a
failed backend and any stuck jaxlib C++ wait threads.
"""

import json
import os
import subprocess
import sys
import tempfile
import time

REF_ESTIMATE_KMERS_PER_SEC = 10_000_000  # fallback only

HERE = os.path.dirname(os.path.abspath(__file__))


def measure_reference_proxy(k=31):
    """Build + run csrc/ref_baseline.cpp; returns (kmers/s, 'measured')
    or (estimate, 'estimated') if anything fails."""
    exe = os.path.join(HERE, "csrc", "ref_baseline")
    src = os.path.join(HERE, "csrc", "ref_baseline.cpp")
    src2 = os.path.join(HERE, "csrc", "skanative.cpp")
    try:
        if not os.path.exists(exe) or max(
            os.path.getmtime(src), os.path.getmtime(src2)
        ) > os.path.getmtime(exe):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-std=c++17", "-o", exe, src, src2],
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


# ---------------------------------------------------------------------------
# Child: owns the device. Writes phase breadcrumbs to the status file and the
# final JSON result to the result file. Exit codes: 0 ok (possibly with W=2
# fields null), 3 device unreachable (retryable), 4 deterministic failure.
# ---------------------------------------------------------------------------

def _child(status_path, result_path):
    import threading

    import numpy as np

    def set_phase(phase, error=None):
        rec = {"phase": phase, "t": time.time()}
        if error is not None:
            rec["error"] = error
        tmp = status_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rec, f)
        os.replace(tmp, status_path)

    def watchdog(fn, timeout_s):
        """Run fn in a daemon thread; returns (value_list, err_list, thread).

        A stalled jaxlib C++ wait cannot be interrupted by signals
        (CPython only runs handlers between bytecodes), so the only safe
        recovery is to abandon the thread — and, at the parent level,
        the whole process. The thread is returned so callers can drain
        (join a little longer) before re-dispatching on the same stream.
        """
        box, err = [], []

        def run():
            try:
                box.append(fn())
            except BaseException as e:  # report crash vs stall correctly
                err.append(e)

        th = threading.Thread(target=run, daemon=True)
        th.start()
        th.join(timeout_s)
        return box, err, th

    # -- phase: init -------------------------------------------------------
    set_phase("init")

    def bring_up():
        # ska_tpu.jaxinit applies SKA_PLATFORM / x64 / compile-cache
        # config; it must run before anything touches the backend
        from ska_tpu.jaxinit import jax, jnp

        devs = jax.devices()
        x = jax.device_put(jnp.arange(8, dtype=jnp.int32))
        return (str(devs[0]), int(np.asarray(x.sum())))

    box, err, th = watchdog(bring_up, float(os.environ.get("SKA_BENCH_INIT_S", 420)))
    if th.is_alive():
        set_phase("init", "backend bring-up stalled (relay outage?)")
        os._exit(3)  # abandon the stuck C++ wait thread
    if err:
        msg = f"{type(err[0]).__name__}: {err[0]}"
        set_phase("init", msg)
        # backend-unavailable is link weather -> retryable
        sys.exit(3 if "nable to initialize backend" in str(err[0]) else 4)
    if box[0][1] != 28:
        set_phase("init", f"device arithmetic wrong: sum(arange(8)) = {box[0][1]}")
        sys.exit(4)

    from ska_tpu.jaxinit import jnp
    from ska_tpu.ops import keys as K
    from ska_tpu.ops import pipeline as P

    # SKA_BENCH_* overrides exist for smoke-testing the harness itself
    # (e.g. on CPU); the defaults are the measured TPU configuration.
    L = int(os.environ.get("SKA_BENCH_L", 1 << 22))  # 4M bases per genome
    S = int(os.environ.get("SKA_BENCH_S", 32))  # genomes per dispatch
    # (batch sweep 2026-08-17: 8->195M, 16->213M, 32->238M, 64->242M
    #  kmers/s; 32 is the knee)

    rng = np.random.default_rng(1)
    seqs = jnp.asarray(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(S, L)))
    valid = jnp.ones((S, L), bool)
    qual_ok = jnp.ones((S, L), bool)
    rec_last = jnp.zeros((S, L), bool).at[:, L - 1].set(True)

    def make_step(k):
        W = K.width_for_k(k)

        def step():
            sp, union, is_end, n = P.batched_pipeline(
                seqs, valid, qual_ok, rec_last, k, True, W, False, False, 0
            )
            return n

        return step

    def measure(k, tag, batches=3, iters=5):
        """Warmup + best-of-N timed batches. Returns kmers/s or None if the
        device stalls mid-way (the relay can die between phases)."""
        step = make_step(k)
        set_phase(f"warmup:{tag}")
        for attempt in range(2):
            # scalar readback forces completion (block_until_ready is not
            # reliable through the axon relay)
            box, err, th = watchdog(lambda: int(np.asarray(step())[0]), 600)
            if err:
                set_phase(f"warmup:{tag}", f"{type(err[0]).__name__}: {err[0]}")
                sys.exit(4)  # deterministic code failure, not link weather
            if box:
                if box[0] <= 0:
                    set_phase(f"warmup:{tag}",
                              "warmup produced 0 k-mers (check SKA_BENCH_* sizes)")
                    sys.exit(4)
                break
            print(f"[{tag}] warmup attempt {attempt + 1} stalled >600s",
                  file=sys.stderr)
            # drain before re-dispatching: the abandoned dispatch still
            # owns the device stream, so an immediate retry would just
            # queue behind it even if the relay has recovered
            th.join(300)
        else:
            return None

        # best-of-N timed batches: the relay's latency swings wildly
        # between runs (BASELINE.md methodology notes) and can stall a
        # single batch for minutes at constant device throughput — the
        # best batch is the code's cost, the others are link weather.
        set_phase(f"timed:{tag}")
        dt = float("inf")
        for batch in range(batches):
            t0 = time.perf_counter()
            # queue all dispatches, then force completion once:
            # per-iteration readbacks would add one relay round-trip
            # (~30-100ms) per step
            ns = [step() for _ in range(iters)]
            box, err, th = watchdog(
                lambda: int(np.asarray(ns[-1])[0]),
                120 if dt < float("inf") else 900,
            )
            if err:
                set_phase(f"timed:{tag}", f"{type(err[0]).__name__}: {err[0]}")
                sys.exit(4)
            if th.is_alive():
                print(f"[{tag}] batch {batch} stalled; keeping best so far",
                      file=sys.stderr)
                break
            dt = min(dt, time.perf_counter() - t0)
            assert box and box[0] > 0
        if dt == float("inf"):
            return None
        windows = S * (L - k + 1)
        return windows * iters / dt

    k1, k2 = 31, 63

    def write_result(r1, r2, oracle_ok=None, oracle_note=None):
        tmp = result_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"w1_kmers_per_sec": r1, "w2_kmers_per_sec": r2,
                       "S": S, "L": L, "k1": k1, "k2": k2,
                       "oracle_ok": oracle_ok, "oracle_note": oracle_note}, f)
        os.replace(tmp, result_path)

    def run_oracle():
        """On-chip correctness certificate (driver-verified, not
        self-reported): build the k=9 reference fixtures and `ska map`
        them on the DEFAULT backend (the real chip under the driver),
        byte-comparing stdout to the reference golden
        (tests/test_results_correct/map_aln_k9.stdout, produced by
        reference tests/map.rs:33-43). Returns (ok, note)."""
        fixtures = os.environ.get(
            "SKA_ORACLE_FIXTURES", "/root/reference/tests")
        fin = os.path.join(fixtures, "test_files_in")
        golden = os.path.join(
            fixtures, "test_results_correct", "map_aln_k9.stdout")
        if not os.path.exists(golden):
            return None, f"fixtures unavailable at {fixtures}"
        try:
            with tempfile.TemporaryDirectory() as otd:
                skf = os.path.join(otd, "merged_k9")
                subprocess.run(
                    [sys.executable, os.path.join(HERE, "ska.py"), "build",
                     "-o", skf, "-k", "9",
                     os.path.join(fin, "test_1.fa"),
                     os.path.join(fin, "test_2.fa")],
                    check=True, capture_output=True, timeout=420, cwd=HERE,
                )
                out = subprocess.run(
                    [sys.executable, os.path.join(HERE, "ska.py"), "map",
                     os.path.join(fin, "test_ref.fa"), skf + ".skf"],
                    check=True, capture_output=True, timeout=420, cwd=HERE,
                ).stdout
            with open(golden, "rb") as f:
                want = f.read()
            if out == want:
                return True, "build k=9 + map byte-equal to map_aln_k9.stdout"
            return False, (f"map output differs from golden "
                           f"({len(out)} vs {len(want)} bytes)")
        except subprocess.TimeoutExpired:
            return None, "oracle CLI run stalled (relay weather)"
        except subprocess.CalledProcessError as e:
            tail = (e.stderr or b"")[-300:].decode("utf-8", "replace")
            # backend-init failures are link weather (same classifier as
            # the child's bring-up), not a correctness verdict — only a
            # command that RAN and produced wrong/failed output may
            # report oracle_ok=false
            if "nable to initialize backend" in tail or "UNAVAILABLE" in tail:
                return None, f"oracle backend unavailable: {tail[-120:]}"
            return False, f"oracle CLI failed: {tail[-200:]}"

    r1 = measure(k1, "w1")
    if r1 is None:
        set_phase("timed:w1", "device lost: W=1 measurement never completed")
        sys.exit(3)
    # Secure the headline immediately: W=2 is best-effort, and if the
    # relay (or the parent's attempt timeout) kills this child mid-W=2,
    # the parent ships whatever result file exists rather than
    # re-paying the whole attempt.
    write_result(r1, None)
    r2 = measure(k2, "w2", batches=2)
    write_result(r1, r2)
    set_phase("oracle")
    ok, note = run_oracle()
    if ok is None:
        # infra verdicts (relay stall / backend-unavailable) get ONE
        # retry after a pause — the throughput results are already
        # persisted, so a second stall costs nothing but this child's
        # remaining attempt time
        time.sleep(60)
        ok, note = run_oracle()
    write_result(r1, r2, ok, note)
    set_phase("done")
    sys.exit(0)


def device_preflight(timeout_s):
    """Cheap dead-relay detector: one tiny op on the default backend in a
    subprocess. A healthy relay answers in ~2 s (cached) to ~40 s (first
    compile); the r5 outage mode stalls even this for many minutes. On
    failure the parent degrades to ONE shortened device attempt and then
    ships the host-only command table instead of burning the whole budget
    on doomed 1500 s attempts that each end in a kill."""
    try:
        subprocess.run(
            [sys.executable, "-c",
             "from ska_tpu.jaxinit import jax; import numpy as np; "
             "x = jax.numpy.ones((8,)); print(int(np.asarray(x.sum())))"],
            check=True, capture_output=True, timeout=timeout_s, cwd=HERE)
        return True
    except Exception:  # noqa: BLE001 - any failure means "treat as down"
        return False


def run_cmd_bench(remaining_budget_s, host_only=False):
    """Command-level wall times as a per-round artifact (VERDICT r2 #6).

    After a healthy device run, regenerate the scripts/bench_cmds.py table
    (build/align/map/vcf/distance/lo at the 4x4Mb config) as
    BENCH_CMDS_r{N}.json so CLI-level perf claims are driver-visible each
    round. Never jeopardises the headline: it runs AFTER the headline JSON
    line has been printed (r4 lost its whole perf record to the reverse
    order), its output goes to a log file rather than the driver-captured
    tail (so a mid-suite kill leaves the headline as the tail's last
    parseable line), it is capped by the leftover budget, and any failure
    just returns None. Returns the artifact filename or None.
    """
    if os.environ.get("SKA_BENCH_CMDS", "1") == "0":
        return None
    budget = min(float(os.environ.get("SKA_BENCH_CMDS_BUDGET_S", 1500)),
                 remaining_budget_s - 60)
    if budget < 300:
        print(f"cmd bench skipped: only {budget:.0f}s budget left",
              file=sys.stderr)
        return None
    # round number: the driver writes BENCH_r{N}.json after this run, so
    # the current round is one past the newest existing record
    n = 1
    for f in os.listdir(HERE):
        if f.startswith("BENCH_r") and f.endswith(".json"):
            try:
                n = max(n, int(f[7:-5].lstrip("0") or 0) + 1)
            except ValueError:
                pass
    out_name = f"BENCH_CMDS_r{n:02d}.json"
    # bench_cmds.py rewrites the JSON after every command, so a budget
    # kill still leaves the rows measured so far on disk. Progress lines
    # go to a log file, NOT this process's stderr: everything printed
    # after the headline JSON line competes with it for the driver's
    # bounded tail capture.
    log_path = os.path.join(tempfile.gettempdir(), f"bench_cmds_r{n:02d}.log")
    try:
        with open(log_path, "ab") as logf:
            subprocess.run(
                [sys.executable, os.path.join(HERE, "scripts", "bench_cmds.py"),
                 "--json", os.path.join(HERE, out_name),
                 "--cmd-timeout", str(max(150.0, budget / 10)),
                 "--budget", str(budget)]
                + (["--host-only"] if host_only else []),
                timeout=budget, check=True, cwd=HERE,
                stdout=logf, stderr=subprocess.STDOUT,
            )
    except Exception as e:  # noqa: BLE001 - artifact is best-effort
        print(f"cmd bench failed: {e} (log: {log_path})", file=sys.stderr)
        return os.path.exists(os.path.join(HERE, out_name)) and out_name or None
    return out_name


# ---------------------------------------------------------------------------
# Parent: measures the host baseline, supervises child attempts, prints the
# single JSON line (success or structured failure record).
# ---------------------------------------------------------------------------

def main():
    if len(sys.argv) >= 4 and sys.argv[1] == "--child":
        _child(sys.argv[2], sys.argv[3])
        return

    ref1, ref_kind = measure_reference_proxy(31)
    ref2, _ = measure_reference_proxy(63) if ref_kind == "measured" else (None, None)

    budget = float(os.environ.get("SKA_BENCH_BUDGET_S", 2400))
    attempt_timeout = float(os.environ.get("SKA_BENCH_ATTEMPT_S", 1500))
    t_start = time.monotonic()
    last_status = {"phase": "spawn"}
    attempt = 0
    backoff = 60.0

    # dead-relay pre-flight (r5 outage post-mortem): when even a 1-element
    # op cannot complete, cap the doomed device effort at one shortened
    # attempt and spend the saved budget on the host-only command table —
    # the driver artifact then still carries measured numbers.
    probe_ok = device_preflight(float(os.environ.get("SKA_BENCH_PROBE_S", 300)))
    if not probe_ok:
        attempt_timeout = min(attempt_timeout, 900.0)
        print("device pre-flight FAILED (relay down?): degrading to one "
              f"{attempt_timeout:.0f}s device attempt + host-only cmd table",
              file=sys.stderr)

    def emit_failure(error, cmds_json=None):
        out = {
            "metric": "split k-mers/sec/chip (ska build extract+sort+union, k=31)",
            "value": None,
            "unit": "kmers/s",
            "vs_baseline": None,
            "baseline_kmers_per_sec": round(ref1),
            "baseline_kind": ref_kind,
            "error": error,
            "phase": last_status.get("phase", "unknown"),
            "attempts": attempt,
            "device_preflight_ok": probe_ok,
        }
        if cmds_json is not None:
            out["cmds_json"] = cmds_json
        print(json.dumps(out), flush=True)

    def fail_and_exit(error, code):
        # mirror the success path's two-line shape: failure JSON first
        # (the driver can parse it even if the cmd suite is killed), then
        # the host-only command table, then the same JSON with the
        # artifact name attached as the tail's last line
        emit_failure(error)
        cmds = run_cmd_bench(
            max(budget - (time.monotonic() - t_start), 760.0),
            host_only=True)
        if cmds is not None:
            emit_failure(error, cmds_json=cmds)
        sys.exit(code)

    with tempfile.TemporaryDirectory() as td:
        status_path = os.path.join(td, "status.json")
        result_path = os.path.join(td, "result.json")
        while True:
            attempt += 1
            for stale in (result_path, status_path):
                # fresh attempt = fresh files: a child that dies before
                # its first set_phase must not inherit the previous
                # attempt's phase/error in the report
                try:
                    os.remove(stale)
                except FileNotFoundError:
                    pass
            proc = subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), "--child",
                 status_path, result_path],
                cwd=HERE,
            )
            try:
                # never run an attempt past the total budget (plus a
                # small grace so a nearly-done attempt can finish)
                rc = proc.wait(min(
                    attempt_timeout,
                    max(120.0, budget - (time.monotonic() - t_start)),
                ))
            except subprocess.TimeoutExpired:
                proc.kill()
                proc.wait()
                rc = -9
            try:
                with open(status_path) as f:
                    last_status = json.load(f)
            except Exception:  # noqa: BLE001 - child died before first phase
                last_status = {"phase": "spawn"}

            if os.path.exists(result_path):
                # the child writes the result as soon as W=1 is measured,
                # so ANY result file is shippable — a child killed or
                # failed mid-W=2 still delivers the headline number
                with open(result_path) as f:
                    res = json.load(f)
                out = {
                    "metric": ("split k-mers/sec/chip "
                               "(ska build extract+sort+union, k=31)"),
                    "value": round(res["w1_kmers_per_sec"]),
                    "unit": "kmers/s",
                    "vs_baseline": round(res["w1_kmers_per_sec"] / ref1, 3),
                    "baseline_kmers_per_sec": round(ref1),
                    "baseline_kind": ref_kind,
                    "vs_estimate": round(
                        res["w1_kmers_per_sec"] / REF_ESTIMATE_KMERS_PER_SEC, 3),
                    "w2_kmers_per_sec": (round(res["w2_kmers_per_sec"])
                                         if res["w2_kmers_per_sec"] else None),
                }
                if res["w2_kmers_per_sec"] and ref2:
                    out["w2_vs_baseline_k63"] = round(res["w2_kmers_per_sec"] / ref2, 3)
                    out["baseline_k63_kmers_per_sec"] = round(ref2)
                # on-chip correctness certificate (build k=9 fixtures +
                # map vs the reference golden, run on the default backend)
                out["oracle_ok"] = res.get("oracle_ok")
                if res.get("oracle_note"):
                    out["oracle_note"] = res["oracle_note"]
                if res["w2_kmers_per_sec"] is None and rc != 0:
                    out["w2_error"] = last_status.get(
                        "error", f"W=2 not measured (child rc={rc})")
                # SHIP THE HEADLINE FIRST (r4 post-mortem: the cmd bench
                # ran before this print, the driver's external timeout
                # fired mid-suite, and every measured number was lost).
                # Both lines parse; if the cmd bench is killed, the tail
                # still ends with this one.
                print(json.dumps(out), flush=True)
                out["cmds_json"] = run_cmd_bench(
                    budget - (time.monotonic() - t_start))
                # final line repeats the headline with the cmds artifact
                # attached so a clean run's LAST line carries everything
                print(json.dumps(out), flush=True)
                return

            if rc == 4:
                # deterministic code/config failure — retrying won't help
                fail_and_exit(
                    last_status.get("error", "deterministic child failure"), 4)

            elapsed = time.monotonic() - t_start
            why = last_status.get("error", f"child rc={rc}")
            print(f"attempt {attempt} failed in phase "
                  f"{last_status.get('phase')}: {why} "
                  f"({elapsed:.0f}s/{budget:.0f}s budget used)", file=sys.stderr)
            if not probe_ok:
                # pre-flight already said the device is down; one real
                # attempt was the benefit of the doubt
                fail_and_exit(f"device unreachable (pre-flight + {why})", 3)
            if elapsed + backoff + 120 > budget:
                fail_and_exit(why, 3)
            time.sleep(backoff)
            backoff = min(backoff * 2, 480)


if __name__ == "__main__":
    main()
