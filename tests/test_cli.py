"""CLI smoke tests (in-process; the harness pins the TPU backend via
sitecustomize so subprocesses would be slow)."""

import io
import sys

import pytest

from ska_tpu.cli import main


def _run(argv, capsys):
    main(argv)
    return capsys.readouterr()


def test_cli_build_align_nk(tmp_path, ref_in, capsys):
    out = str(tmp_path / "basic")
    _run(["build", "-o", out, "-k", "17", f"{ref_in}/test_1.fa", f"{ref_in}/test_2.fa"], capsys)
    import os

    assert os.path.exists(out + ".skf")

    res = _run(["nk", out + ".skf"], capsys)
    assert "k=17" in res.out and "samples=2" in res.out

    aln = str(tmp_path / "basic.aln")
    _run(["align", out + ".skf", "-o", aln], capsys)
    assert open(aln).read().startswith(">test_1\n")


def test_cli_map_vcf(tmp_path, ref_in, capsys):
    vcf = str(tmp_path / "map.vcf")
    _run(
        ["map", f"{ref_in}/test_ref.fa", f"{ref_in}/merge.skf", "-o", vcf, "-f", "vcf"],
        capsys,
    )
    head = open(vcf).read().splitlines()
    assert head[0].startswith("##fileformat=VCFv")
    assert head[1] == "##contig=<ID=fake_ref>"


def test_cli_distance_stdout(ref_in, capsys):
    res = _run(["distance", f"{ref_in}/merge.skf"], capsys)
    assert res.out.startswith("Sample1\tSample2\t")


def test_cli_k_validation(capsys):
    with pytest.raises(SystemExit):
        main(["build", "-o", "x", "-k", "65", "a.fa", "b.fa"])
    with pytest.raises(SystemExit):
        main(["build", "-o", "x", "-k", "8", "a.fa", "b.fa"])
