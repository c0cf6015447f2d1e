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
