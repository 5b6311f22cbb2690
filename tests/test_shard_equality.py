"""Catalog-shard equality: `genotype --shard-count N` outputs, combined,
must reproduce the unsharded run byte-for-byte (SURVEY.md §5.8 — shards
are the multi-host scaling unit, so correctness rests on this)."""

import random

from trgt_tpu.cli import main
from trgt_tpu.io.bgzf import BgzfReader

from synth import SynthLocus, make_dataset


def _records(prefix):
    data = BgzfReader(prefix + ".vcf.gz").read_all().decode()
    return [line for line in data.splitlines()
            if line and not line.startswith("#")]


def _run(fasta, bed, bam, prefix, extra=()):
    rc = main(["genotype", "--genome", fasta, "--repeats", bed,
               "--reads", bam, "--output-prefix", prefix, *extra])
    assert rc == 0
    return _records(prefix)


def test_shard_concat_equals_unsharded(tmp_path):
    rng = random.Random(99)
    motifs = ["CAG", "GGC", "AT", "A", "AAAG", "CAGG"]
    loci = []
    for i in range(200):
        motif = motifs[i % len(motifs)]
        ref = rng.randint(5, 15)
        a1 = max(2, ref + rng.randint(-3, 6))
        a2 = max(2, ref + rng.randint(-3, 6))
        loci.append(SynthLocus(f"L{i:03d}", motif, ref, (a1, a2)))
    fasta, bed, bam = make_dataset(str(tmp_path), loci, depth=8,
                                   flank=320, read_flank=280, seed=3)

    whole = _run(fasta, bed, bam, str(tmp_path / "whole"),
                 ("--disable-bam-output",))
    shard0 = _run(fasta, bed, bam, str(tmp_path / "s0"),
                  ("--disable-bam-output", "--shard-count", "2",
                   "--shard-index", "0"))
    shard1 = _run(fasta, bed, bam, str(tmp_path / "s1"),
                  ("--disable-bam-output", "--shard-count", "2",
                   "--shard-index", "1"))

    assert len(whole) == 200
    assert len(shard0) + len(shard1) == len(whole)
    # strided sharding: riffle the two shard outputs back into catalog
    # order and compare byte-for-byte
    riffled = []
    it0, it1 = iter(shard0), iter(shard1)
    for i in range(len(whole)):
        riffled.append(next(it0 if i % 2 == 0 else it1))
    assert riffled == whole
