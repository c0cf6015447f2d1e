"""`ska lo` goldens (reference tests/skalo.rs)."""

import os

from ska_tpu.io import skf
from ska_tpu.skalo import SkaloConfig, run_skalo


def test_skalo_snps_with_reference(tmp_path, ref_in, ref_out):
    arr = skf.load(f"{ref_in}/test_skalo.skf")
    out = str(tmp_path / "test_skalo")
    cfg = SkaloConfig(
        output_name=out, reference_genome=f"{ref_in}/test_skalo_reference.fas"
    )
    run_skalo(arr, cfg)
    with open(out + "_snps.fas") as f:
        got = f.read()
    with open(f"{ref_out}/test_skalo_snps.fas") as f:
        want = f.read()
    assert got == want
    assert os.path.exists(out + "_pseudo_genomes.fas")
    assert os.path.exists(out + "_snps.vcf")


def test_skalo_indels(tmp_path, ref_in, ref_out):
    arr = skf.load(f"{ref_in}/test_skalo_indel.skf")
    out = str(tmp_path / "test_skalo")
    cfg = SkaloConfig(output_name=out)
    run_skalo(arr, cfg)
    with open(out + "_indels.vcf") as f:
        got = f.read()
    with open(f"{ref_out}/test_skalo_indels.vcf") as f:
        want = f.read()
    assert got == want


def test_bubble_explosion_clean_memoryerror(tmp_path):
    """A repeat-dense cDBG (66 samples, k=7, depth 6) grows kept paths
    combinatorially — tens of GB from 4 KB inputs. The native core must
    convert the allocation failure into the CLI's guidance message, not
    a std::terminate/SIGABRT (csrc/skalo_core.cpp skalo_expand_run
    bad_alloc guard; fixtures = fuzz seed 818202699 iter 31)."""
    import pathlib
    import subprocess
    import sys

    repo = pathlib.Path(__file__).resolve().parent.parent
    samples = sorted((repo / "tests" / "data").glob("bubble_s*.fa"))
    assert len(samples) == 66
    env = dict(os.environ, SKA_PLATFORM="cpu", SKA_SKALO_CORE="native")
    subprocess.run(
        [sys.executable, str(repo / "ska.py"), "build", "-o",
         str(tmp_path / "bub"), "-k", "7", *map(str, samples)],
        env=env, check=True, capture_output=True, timeout=300,
    )
    r = subprocess.run(
        [sys.executable, "-c",
         "import resource, sys\n"
         "resource.setrlimit(resource.RLIMIT_AS, (1 << 30, 1 << 30))\n"
         f"sys.path.insert(0, {str(repo)!r})\n"
         f"sys.argv = ['ska', 'lo', {str(tmp_path / 'bub.skf')!r},"
         f" {str(tmp_path / 'bubout')!r}, '-d', '6']\n"
         "from ska_tpu.cli import main\n"
         "main()\n"],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 1, (r.returncode, r.stderr[-500:])
    assert "exceeded available memory" in r.stderr, r.stderr[-500:]
