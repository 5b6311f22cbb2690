"""Vectorized cluster-path equivalence (VERDICT r2 'Next round' #4):
the deduplicated / row-vectorized distance machinery must reproduce the
original per-pair loops exactly — including float accumulation order in
central_read and the skip-bound semantics of the distance matrix."""

import math
import random

import numpy as np

from trgt_tpu.genotype import cluster
from trgt_tpu.kernels.align_host import edit_distance


def loop_get_dist_matrix(trs, pair_dists=None):
    """The original (r2) per-pair reference implementation."""
    n = len(trs)
    if n < 2:
        return np.zeros(0, dtype=np.float64)
    dists = np.zeros(n * (n - 1) // 2, dtype=np.float64)
    idx = 0
    for i in range(n):
        for j in range(i + 1, n):
            if pair_dists is not None:
                dists[idx] = math.sqrt(float(pair_dists[i, j]))
            else:
                dists[idx] = cluster.get_dist(trs[i], trs[j])
            idx += 1
    return dists


def loop_central_read(num_seqs, group, dists):
    group_size = len(group)
    if group_size <= 2:
        return group[0]
    dist_sums = [0.0] * group_size
    for i in range(group_size - 1):
        for j in range(i + 1, group_size):
            index1, index2 = group[i], group[j]
            mat_index = (num_seqs * index1 - index1 * (index1 + 3) // 2
                         + index2 - 1)
            dist_sums[i] += dists[mat_index]
            dist_sums[j] += dists[mat_index]
    best = min(range(group_size), key=lambda i: (dist_sums[i], i))
    return group[best]


def rand_trs(rng, n, short=True):
    out = []
    for _ in range(n):
        if short:
            m = rng.randint(3, 60)
        else:
            m = rng.choice([5, 40, 200, 500])
        out.append(bytes(rng.choice(b"ACGT") for _ in range(m)))
    return out


def test_dist_matrix_host_matches_loop():
    rng = random.Random(3)
    for n, short in [(12, True), (30, True), (18, False)]:
        trs = rand_trs(rng, n, short)
        got = cluster.get_dist_matrix(trs)
        want = loop_get_dist_matrix(trs)
        assert np.array_equal(got, want)


def test_dist_matrix_square_matches_loop():
    rng = np.random.default_rng(5)
    n = 25
    sq = rng.integers(0, 40, size=(n, n)).astype(np.float64)
    sq = (sq + sq.T) / 2
    trs = [b"A"] * n
    got = cluster.get_dist_matrix(trs, sq)
    want = loop_get_dist_matrix(trs, sq)
    assert np.array_equal(got, want)


def test_dist_matrix_dedup_tuple_matches_square():
    """(ed_u, uidx) deduplicated form == expanding to the full square."""
    rng = random.Random(7)
    useqs = rand_trs(rng, 6)
    U = len(useqs)
    ed_u = np.zeros((U, U))
    for i in range(U):
        for j in range(U):
            if i != j:
                ed_u[i, j] = edit_distance(useqs[i], useqs[j])
    uidx = np.array([rng.randrange(U) for _ in range(40)])
    trs = [useqs[u] for u in uidx]
    sq = ed_u[uidx[:, None], uidx[None, :]]
    got = cluster.get_dist_matrix(trs, (ed_u, uidx))
    want = cluster.get_dist_matrix(trs, sq)
    assert np.array_equal(got, want)


def test_central_read_matches_loop():
    rng = np.random.default_rng(11)
    for n in [3, 7, 24, 60]:
        dists = np.sqrt(rng.integers(0, 30,
                                     size=n * (n - 1) // 2).astype(float))
        for _ in range(6):
            k = int(rng.integers(2, n + 1))
            group = sorted(rng.choice(n, size=k, replace=False).tolist())
            got = cluster.central_read(n, group, dists)
            want = loop_central_read(n, group, dists)
            assert got == want, (n, group)


def test_central_read_tie_first_index():
    """All-zero distances: every sum ties, the first group member wins
    (the reference's (sum, index) min key)."""
    n = 9
    dists = np.zeros(n * (n - 1) // 2)
    assert cluster.central_read(n, [2, 4, 7], dists) == 2


def test_pipeline_dedup_equals_workflow_cluster():
    """The deduplicated pipeline distance path must produce the same
    genotype as cluster.genotype with host-loop distances."""
    rng = random.Random(13)
    base = "".join(rng.choice("ACGT") for _ in range(45))
    other = base[:20] + "TTTGA" + base[20:]
    trs = []
    for _ in range(30):
        pick = base if rng.random() < 0.5 else other
        if rng.random() < 0.2:   # sprinkle errors
            pos = rng.randrange(len(pick))
            pick = pick[:pos] + rng.choice("ACGT") + pick[pos + 1:]
        trs.append(pick)
    from trgt_tpu.utils import Ploidy

    # deduplicated tuple form, as pipeline._stage_genotype builds it
    uniq = {}
    uidx = np.array([uniq.setdefault(t.encode(), len(uniq))
                     for t in trs], dtype=np.int64)
    useqs = list(uniq)
    U = len(useqs)
    ulens = np.array([len(s) for s in useqs])
    ed_u = np.abs(ulens[:, None] - ulens[None, :]).astype(np.float64)
    for i in range(U):
        for j in range(i + 1, U):
            if ulens[i] * ulens[j] <= cluster.MAX_OPS:
                ed_u[i, j] = ed_u[j, i] = edit_distance(useqs[i],
                                                        useqs[j])
    got = cluster.genotype(Ploidy.TWO, trs, pair_dists=(ed_u, uidx))
    want = cluster.genotype(Ploidy.TWO, trs)
    assert got[0] == want[0]
    assert got[1] == want[1]
    assert got[2] == want[2]
