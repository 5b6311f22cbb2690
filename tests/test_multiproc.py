"""-t N multiprocess scaling (engine/worker.py): worker processes own
strided catalog slices and ship rendered record bytes to the parent
writer, so every output artifact is byte-identical to the -t1 run
(the reference's rayon pool, commands/genotype.rs:140-199, writes in
completion order instead; our ordering is the stronger property)."""

import os

import pytest

EXAMPLE = "/root/reference/example"


def _run(tmp_path, name, threads, n_loci=8):
    bed = tmp_path / "r.bed"
    bed.write_text("".join(
        f"chrA\t10001\t10061\tID=TR{i};MOTIFS=CAG;STRUC=<TR>\n"
        for i in range(1, n_loci + 1)))
    prefix = str(tmp_path / name)
    from trgt_tpu.cli import main
    rc = main([
        "genotype",
        "--genome", os.path.join(EXAMPLE, "reference.fasta"),
        "--repeats", str(bed),
        "--reads", os.path.join(EXAMPLE, "sample.bam"),
        "--output-prefix", prefix,
        "--device", "host",
        "-t", str(threads),
    ])
    assert rc == 0
    out = {}
    for ext in (".vcf.gz", ".spanning.bam"):
        with open(prefix + ext, "rb") as fh:
            out[ext] = fh.read()
    return out


@pytest.mark.parametrize("threads", [2, 3])
def test_multiproc_outputs_byte_identical(tmp_path, threads):
    base = _run(tmp_path, "t1", 1)
    multi = _run(tmp_path, f"t{threads}", threads)
    # sys.argv (the ##trgtCommand/@PG source) is pytest's own argv for
    # both runs, so FULL files must match byte for byte
    for ext, data in base.items():
        assert multi[ext] == data, f"{ext} differs at -t{threads}"


def test_multiproc_more_workers_than_loci(tmp_path):
    base = _run(tmp_path, "s1", 1, n_loci=2)
    multi = _run(tmp_path, "s5", 5, n_loci=2)
    for ext, data in base.items():
        assert multi[ext] == data, f"{ext} differs at -t5"
