"""End-to-end tests of the all-native `ska_host` front-end
(csrc/host_cli.cpp) through the `ska` launcher.

With SKA_PLATFORM=cpu the launcher execs ska_host for
align/distance/map/build, skipping CPython entirely; anything the
front-end cannot handle execs ska.py with the same argv. These tests pin
byte-identity of the all-native route against the python pipeline and
that the fallback really reaches python.

The SKA_PYTHON=/bin/false trick proves native handling: if ska_host had
fallen back to python, the exec of /bin/false would fail the command.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_IN = "/root/reference/tests/test_files_in"
SKA = os.path.join(REPO, "ska")
BIN = os.path.join(REPO, "ska_host")


def _fresh():
    if not os.path.exists(BIN):
        return False
    bt = os.path.getmtime(BIN)
    for s in ("host_cli", "skanative", "host_build", "host_modes",
              "merge_batches"):
        if os.path.getmtime(os.path.join(REPO, "csrc", f"{s}.cpp")) > bt:
            return False
    return True


pytestmark = pytest.mark.skipif(
    not _fresh(), reason="ska_host binary missing/stale (make -C csrc)")


def _env(**extra):
    env = dict(os.environ, SKA_PLATFORM="cpu", SKA_PYTHON=sys.executable)
    for k in ("PALLAS_AXON_POOL_IPS", "JAX_PLATFORMS",
              "PALLAS_AXON_REMOTE_COMPILE", "SKA_THREADS"):
        env.pop(k, None)
    env.update(extra)
    return env


def _run(args, check=True, **extra):
    r = subprocess.run([SKA] + args, env=_env(**extra), capture_output=True,
                       timeout=300)
    if check:
        assert r.returncode == 0, r.stderr[-500:]
    return r


NATIVE_ONLY = {"SKA_PYTHON": "/bin/false"}  # fallback would exit nonzero


CASES = [
    (["align", f"{REF_IN}/merge.skf"], True),
    (["align", f"{REF_IN}/merge_k41.skf", "--filter", "no-ambig",
      "-m", "0.5"], True),
    (["distance", f"{REF_IN}/merge.skf"], True),
    (["distance", f"{REF_IN}/multidist.skf", "--allow-ambiguous"], True),
    (["map", f"{REF_IN}/test_ref.fa", f"{REF_IN}/merge.skf"], True),
    (["map", f"{REF_IN}/test_ref_two_chrom_repeats.fa",
      f"{REF_IN}/merge_k9.skf", "-f", "vcf", "--repeat-mask"], True),
    (["map", f"{REF_IN}/test_ref.fa", f"{REF_IN}/merge_k41.skf",
      "--ambig-mask"], True),
    # implicit build from a plain-FASTA list (io_utils.rs:60-93)
    (["align", f"{REF_IN}/test_1.fa", f"{REF_IN}/test_2.fa"], True),
    (["map", f"{REF_IN}/test_ref.fa", f"{REF_IN}/test_1.fa",
      f"{REF_IN}/test_2.fa"], True),
    (["map", f"{REF_IN}/test_ref.fa", f"{REF_IN}/test_1.fa",
      f"{REF_IN}/test_2.fa", "-f", "vcf"], True),
    (["nk", f"{REF_IN}/merge.skf"], True),
    (["nk", f"{REF_IN}/merge_k41.skf", "--full-info"], True),
    (["nk", f"{REF_IN}/multidist.skf", "--full-info"], True),
]


@pytest.mark.parametrize("args,native", CASES)
def test_stdout_byte_identity_and_native_handling(tmp_path, args, native):
    got = _run(args, **NATIVE_ONLY).stdout
    want = _run(args, SKA_NATIVE_CMDS="0").stdout
    assert got == want
    assert b"SKA: Split K-mer Analysis" in _run(args).stderr


def test_output_file_and_attached_short_flags(tmp_path):
    out = str(tmp_path / "a.aln")
    _run(["align", f"{REF_IN}/merge.skf", "-o" + out, "-m0.9"],
         **NATIVE_ONLY)
    want = _run(["align", f"{REF_IN}/merge.skf", "-m", "0.9"],
                SKA_NATIVE_CMDS="0").stdout
    assert open(out, "rb").read() == want


def test_build_positional_and_filelist(tmp_path):
    out_n = str(tmp_path / "n")
    _run(["build", "-o", out_n, "-k", "17", f"{REF_IN}/test_1.fa",
          f"{REF_IN}/test_2.fa"], **NATIVE_ONLY)
    fl = tmp_path / "list.txt"
    fl.write_text(f"test_1\t{REF_IN}/test_1.fa\n"
                  f"test_2\t{REF_IN}/test_2.fa\n")
    out_l = str(tmp_path / "l")
    _run(["build", "-o", out_l, "-k", "17", "-f", str(fl)], **NATIVE_ONLY)
    out_p = str(tmp_path / "p")
    _run(["build", "-o", out_p, "-k", "17", f"{REF_IN}/test_1.fa",
          f"{REF_IN}/test_2.fa"], SKA_NATIVE_CMDS="0")
    n = open(out_n + ".skf", "rb").read()
    assert n == open(out_l + ".skf", "rb").read()
    assert n == open(out_p + ".skf", "rb").read()


def test_weed_and_delete_byte_identity(tmp_path):
    import shutil

    base = tmp_path / "base.skf"
    shutil.copy(f"{REF_IN}/merge.skf", base)
    cases = [
        (["weed", str(base), f"{REF_IN}/weed.fa"], "w1"),
        (["weed", str(base), f"{REF_IN}/weed.fa", "--reverse"], "w2"),
        (["weed", str(base), "--filter", "no-ambig-or-const", "-m", "0.5",
          "--ambig-mask"], "w3"),
        (["weed", str(base), f"{REF_IN}/weed.fa",
          "--filter-ambig-as-missing", "--no-gap-only-sites"], "w4"),
        (["delete", "-s", str(base), "test_1"], "d1"),
    ]
    for args, tag in cases:
        out_n = tmp_path / f"{tag}_n.skf"
        out_p = tmp_path / f"{tag}_p.skf"
        _run(args + ["-o", str(out_n)], **NATIVE_ONLY)
        _run(args + ["-o", str(out_p)], SKA_NATIVE_CMDS="0")
        assert out_n.read_bytes() == out_p.read_bytes(), tag


def test_merge_byte_identity(tmp_path):
    cases = [
        ([f"{REF_IN}/merge.skf", f"{REF_IN}/merge.skf"], "m1"),
        ([f"{REF_IN}/merge_k9.skf", f"{REF_IN}/multidist.skf"], "m2"),
        ([f"{REF_IN}/multidist.skf", f"{REF_IN}/merge_k9.skf",
          f"{REF_IN}/multidist.skf"], "m3"),
    ]
    for files, tag in cases:
        out_n = tmp_path / f"{tag}_n"
        out_p = tmp_path / f"{tag}_p"
        _run(["merge"] + files + ["-o", str(out_n)], **NATIVE_ONLY)
        _run(["merge"] + files + ["-o", str(out_p)], SKA_NATIVE_CMDS="0")
        assert (tmp_path / f"{tag}_n.skf").read_bytes() == \
               (tmp_path / f"{tag}_p.skf").read_bytes(), tag
    # k mismatch: native declines, python raises the canonical error
    r = _run(["merge", f"{REF_IN}/merge.skf", f"{REF_IN}/merge_k41.skf",
              "-o", str(tmp_path / "bad")], check=False)
    assert r.returncode != 0
    assert b"K-mer lengths do not match" in r.stderr


def test_delete_filelist_and_missing_name(tmp_path):
    import shutil

    base = tmp_path / "base.skf"
    shutil.copy(f"{REF_IN}/merge.skf", base)
    fl = tmp_path / "list.txt"
    fl.write_text(f"test_2\t{REF_IN}/test_2.fa\n")
    out_n = tmp_path / "n.skf"
    out_p = tmp_path / "p.skf"
    _run(["delete", "-s", str(base), "-f", str(fl), "-o", str(out_n)],
         **NATIVE_ONLY)
    _run(["delete", "-s", str(base), "-f", str(fl), "-o", str(out_p)],
         SKA_NATIVE_CMDS="0")
    assert out_n.read_bytes() == out_p.read_bytes()
    # unknown sample: native declines, python raises its canonical error
    r = _run(["delete", "-s", str(base), "nosuch", "-o",
              str(tmp_path / "x")], check=False)
    assert r.returncode != 0
    assert b"Could not find sample" in r.stderr


def test_fastq_build_via_launcher(tmp_path):
    """FASTQ-pair cohorts (gz) build all-native through ska_host."""
    fl = tmp_path / "pairs.txt"
    fl.write_text(
        f"test_1\t{REF_IN}/test_1_fwd.fastq.gz\t{REF_IN}/test_1_rev.fastq.gz\n"
        f"test_2\t{REF_IN}/test_2_fwd.fastq.gz\t{REF_IN}/test_2_rev.fastq.gz\n")
    out_n = tmp_path / "n"
    out_p = tmp_path / "p"
    args = ["build", "-f", str(fl), "-k", "9", "--min-count", "2",
            "--min-qual", "2"]
    _run(args + ["-o", str(out_n)], **NATIVE_ONLY)
    _run(args + ["-o", str(out_p)], SKA_NATIVE_CMDS="0")
    assert (tmp_path / "n.skf").read_bytes() == \
           (tmp_path / "p.skf").read_bytes()
    # --min-count auto must reach the python coverage-model path
    r = subprocess.run(
        [SKA, "build", "-f", str(fl), "-k", "9", "--min-count", "auto",
         "-o", str(tmp_path / "x")],
        env=_env(SKA_PYTHON="/bin/false"), capture_output=True, timeout=60)
    assert r.returncode != 0  # python (here /bin/false) had to run


def test_fallback_reaches_python(tmp_path):
    # -v asks for progress messages, which live in the python pipeline;
    # python must run (SKA_PYTHON=/bin/false then fails)
    r = subprocess.run(
        [SKA, "align", f"{REF_IN}/merge.skf", "-v"],
        env=_env(SKA_PYTHON="/bin/false"), capture_output=True, timeout=60)
    assert r.returncode != 0
    ok = _run(["align", f"{REF_IN}/merge.skf", "-v"])
    want = _run(["align", f"{REF_IN}/merge.skf"]).stdout
    assert ok.stdout == want


def test_fallback_error_messages_come_from_argparse():
    r = _run(["align", f"{REF_IN}/merge.skf", "-m", "1.5"], check=False)
    assert r.returncode != 0
    assert b"Frequency must be between 0 and 1" in r.stderr
    r = _run(["align", f"{REF_IN}/merge.skf", "--bogus-flag"], check=False)
    assert r.returncode != 0
    assert b"unrecognized arguments" in r.stderr


def test_native_cmds_kill_switch_uses_python():
    r = subprocess.run(
        [SKA, "align", f"{REF_IN}/merge.skf"],
        env=_env(SKA_PYTHON="/bin/false", SKA_NATIVE_CMDS="0"),
        capture_output=True, timeout=60)
    assert r.returncode != 0  # python (here /bin/false) had to run


def test_version_constant_in_sync():
    """host_cli.cpp hardcodes the .skf ska_version field; it must match
    the package version or launcher-built and python-built files
    diverge."""
    import re

    from ska_tpu import __version__

    src = open(os.path.join(REPO, "csrc", "host_cli.cpp")).read()
    m = re.search(r'SKA_VERSION = "([^"]+)"', src)
    assert m and m.group(1) == __version__
