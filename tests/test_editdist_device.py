import random

from trgt_tpu.kernels.align_host import edit_distance
from trgt_tpu.kernels.editdist import (edit_distances_batch,
                                       pairwise_distance_matrix)


def random_dna(rng, lo, hi):
    return bytes(rng.choice(b"ACGT") for _ in range(rng.randint(lo, hi)))


def test_edit_batch_random():
    rng = random.Random(11)
    pairs = [(random_dna(rng, 1, 60), random_dna(rng, 1, 60))
             for _ in range(40)]
    got = edit_distances_batch(pairs)
    want = [edit_distance(a, b) for a, b in pairs]
    assert got == want


def test_pairwise_matrix_with_skip_bound():
    rng = random.Random(12)
    trs = [random_dna(rng, 20, 60) for _ in range(8)]
    trs.append(random_dna(rng, 300, 300))  # triggers the MAX_OPS bound
    m = pairwise_distance_matrix(trs)
    n = len(trs)
    for i in range(n):
        for j in range(i + 1, n):
            if len(trs[i]) * len(trs[j]) > 10000:
                assert m[i, j] == abs(len(trs[i]) - len(trs[j]))
            else:
                assert m[i, j] == edit_distance(trs[i], trs[j])
            assert m[i, j] == m[j, i]


def test_pallas_edit_matches_host():
    from trgt_tpu.kernels.editdist_pallas import edit_distances_batch_pallas
    rng = random.Random(21)
    pairs = [(random_dna(rng, 1, 90), random_dna(rng, 1, 90))
             for _ in range(25)]
    got = edit_distances_batch_pallas(pairs)
    want = [edit_distance(a, b) for a, b in pairs]
    assert got == want
