"""Genotyper tests ported from the reference
(ref: diploid.rs:105-120, haploid.rs:32-62, genotype_flank.rs:292-392)."""

import random

import numpy as np

from trgt_tpu.genotype.gt import TrSize
from trgt_tpu.genotype.size import diploid_genotype, haploid_genotype
from trgt_tpu.genotype import genotype_flank, genotype_cluster, genotype_size
from trgt_tpu.reads.hifi_read import HiFiRead
from trgt_tpu.utils import Ploidy


def test_diploid_clean_het():
    gt = diploid_genotype([3, 4], [3, 3])
    assert gt == [TrSize(3, (3, 3)), TrSize(4, (4, 4))]


def test_haploid_clean():
    gt = haploid_genotype([3], [3])
    assert gt == [TrSize(3, (3, 3))]


def test_haploid_mosaic():
    sizes = [10, 20, 30, 40, 50, 60, 70, 80, 90, 100]
    counts = [1] * 10
    gt = haploid_genotype(sizes, counts)
    assert gt == [TrSize(50, (10, 100))]


def test_haploid_outliers():
    gt = haploid_genotype([10, 50], [4, 2])
    assert gt == [TrSize(10, (10, 50))]


def make_read(encoding: str) -> HiFiRead:
    # ASCII read-encoding DSL from genotype_flank.rs:297-337
    seq_start = min(i for i, c in enumerate(encoding) if c in "ATGC")
    seq_end = max(i for i, c in enumerate(encoding) if c in "ATGC") + 1
    bases = encoding[seq_start:seq_end].encode()
    mismatches = []
    for index, c in enumerate(encoding):
        if c == "X":
            if index < seq_start:
                mismatches.append(index - seq_start)
            else:
                mismatches.append(index - seq_end)
    return HiFiRead(
        id="read", is_reverse=False, bases=bases,
        quals=b"(" * len(bases), meth=None, read_qual=None,
        mismatch_offsets=mismatches, start_offset=-seq_start,
        end_offset=len(encoding) - seq_end, cigar=None, hp_tag=None,
        mapq=60)


def test_flank_het_snvs_then_genotype():
    reads = [make_read(e) for e in [
        "XX====TATATATA===X===",
        "XX=X==TATATATA===X===",
        "XX====TATATATATA=X=X===",
        "XX====TATATATATA=X=X===",
        "XX====TATATATATA=X=",
        "=TATATATA===X===",
    ]]
    tr_seqs = [r.bases.decode() for r in reads]
    result = genotype_flank.genotype(reads, tr_seqs)
    assert result is not None
    gt, alleles, assignment = result
    assert gt == [TrSize(8, (8, 8)), TrSize(10, (10, 10))]
    assert alleles == ["TATATATA", "TATATATATA"]
    assert assignment == [0, 0, 1, 1, 1, 0]


def test_flank_hom_snvs_then_none():
    reads = [make_read("XX====TATATATATA=X=X===")] * 4
    tr_seqs = [r.bases.decode() for r in reads]
    assert genotype_flank.genotype(reads, tr_seqs) is None


def test_flank_hp_tags():
    reads = []
    for i, e in enumerate(["==TATA==", "==TATA==", "==TATATA==",
                           "==TATATA=="]):
        r = make_read(e)
        r.hp_tag = 1 if i < 2 else 2
        reads.append(r)
    tr_seqs = [r.bases.decode() for r in reads]
    result = genotype_flank.genotype(reads, tr_seqs)
    assert result is not None
    gt, alleles, assignment = result
    assert alleles == ["TATA", "TATATA"]
    assert assignment == [0, 0, 1, 1]


def test_cluster_het():
    rng = random.Random(3)
    short = "CAG" * 10
    long = "CAG" * 25
    trs = [short] * 10 + [long] * 10
    gt, alleles, classification = genotype_cluster.genotype(
        Ploidy.TWO, trs)
    assert sorted([gt[0].size, gt[1].size]) == [30, 75]
    assert alleles[0] == short and alleles[1] == long
    assert classification == [0] * 10 + [1] * 10


def test_cluster_hom():
    trs = ["CAG" * 12] * 12
    gt, alleles, classification = genotype_cluster.genotype(
        Ploidy.TWO, trs)
    assert gt[0].size == 36 and gt[1].size == 36
    assert alleles == ["CAG" * 12, "CAG" * 12]


def test_cluster_haploid():
    trs = ["CAG" * 12] * 8
    gt, alleles, classification = genotype_cluster.genotype(
        Ploidy.ONE, trs)
    assert len(gt) == 1
    assert alleles == ["CAG" * 12]


def test_size_genotype_hom():
    trs = ["CAG" * 11] * 15
    gt, alleles, classification = genotype_size.genotype(Ploidy.TWO, trs)
    assert gt[0].size == 33 and gt[1].size == 33
    assert alleles == ["CAG" * 11, "CAG" * 11]
    assert all(c in (0, 1) for c in classification)


def test_size_genotype_het():
    trs = ["CAG" * 10] * 8 + ["CAG" * 20] * 8
    gt, alleles, classification = genotype_size.genotype(Ploidy.TWO, trs)
    assert (gt[0].size, gt[1].size) == (30, 60)
    assert alleles == ["CAG" * 10, "CAG" * 20]
