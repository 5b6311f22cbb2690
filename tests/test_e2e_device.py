"""Device end-to-end affine aligner vs host: optimal scores must match;
CIGARs must be valid optimal alignments."""

import random

from trgt_tpu.kernels.align_host import align_end_to_end
from trgt_tpu.kernels.e2e_device import e2e_align_batch


def random_dna(rng, lo, hi):
    return bytes(rng.choice(b"ACGT") for _ in range(rng.randint(lo, hi)))


def check_cigar(pattern, text, cigar, score, mism, gapo, gape):
    plen = sum(l for l, op in cigar if op in "=XD")
    tlen = sum(l for l, op in cigar if op in "=XI")
    assert plen == len(pattern) and tlen == len(text)
    cost = 0
    p = t = 0
    for l, op in cigar:
        if op == "=":
            assert pattern[p:p + l] == text[t:t + l]
            p += l
            t += l
        elif op == "X":
            for k in range(l):
                assert pattern[p + k] != text[t + k]
            cost += mism * l
            p += l
            t += l
        elif op == "D":
            cost += gapo + gape * l
            p += l
        else:
            cost += gapo + gape * l
            t += l
    assert cost == score, (cost, score)


def test_e2e_device_matches_host_scores():
    rng = random.Random(41)
    pairs = []
    for _ in range(30):
        a = random_dna(rng, 1, 60)
        b = random_dna(rng, 1, 60)
        pairs.append((a, b))
    pairs.append((b"ACGT", b""))
    pairs.append((b"", b"ACGT"))
    results = e2e_align_batch(pairs, 2, 5, 1)
    for (a, b), (score, cigar) in zip(pairs, results):
        h_score, _ = align_end_to_end(a, b, 2, 5, 1)
        assert score == h_score, (a, b, score, h_score)
        check_cigar(a, b, cigar, score, 2, 5, 1)


def test_e2e_device_cigars_byte_identical_to_host():
    """The consensus stage RACES the device kernel against the host
    aligner (engine/pipeline._consensus_aligner), so the two must agree
    on the exact CIGAR — co-optimal tie-breaks included — or the race
    winner would change output bytes. Fuzzed over near-identical pairs
    (the consensus-repair workload) and random pairs."""
    rng = random.Random(7)
    pairs = []
    for _ in range(60):
        if rng.random() < 0.5:
            a = random_dna(rng, 5, 80)
            b = bytearray(a)
            for _ in range(rng.randint(0, 4)):
                op = rng.random()
                pos = rng.randrange(max(1, len(b)))
                if op < 0.5:
                    b[pos:pos + 1] = bytes([rng.choice(b"ACGT")])
                elif op < 0.75:
                    b[pos:pos] = bytes([rng.choice(b"ACGT")])
                else:
                    del b[pos:pos + 1]
            pairs.append((a, bytes(b)))
        else:
            pairs.append((random_dna(rng, 1, 60), random_dna(rng, 1, 60)))
    results = e2e_align_batch(pairs, 2, 5, 1)
    for (a, b), (score, cigar) in zip(pairs, results):
        h_score, h_cigar = align_end_to_end(a, b, 2, 5, 1)
        assert score == h_score
        assert cigar == h_cigar, (a, b, cigar, h_cigar)


def test_e2e_device_consensus_scoring():
    # consensus aligner penalties (2,5,1) on near-identical repeats
    rng = random.Random(42)
    backbone = b"CAG" * 20
    pairs = []
    for _ in range(10):
        read = bytearray(backbone)
        for _ in range(rng.randint(0, 3)):
            pos = rng.randrange(len(read))
            read[pos] = rng.choice(b"ACGT")
        pairs.append((backbone, bytes(read)))
    results = e2e_align_batch(pairs, 2, 5, 1)
    for (a, b), (score, cigar) in zip(pairs, results):
        h_score, _ = align_end_to_end(a, b, 2, 5, 1)
        assert score == h_score
        check_cigar(a, b, cigar, score, 2, 5, 1)
