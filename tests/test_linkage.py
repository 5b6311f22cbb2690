"""Ward linkage (nn-chain) vs a primitive O(n³) reference implementation."""

import math
import random

import numpy as np
import pytest

from trgt_tpu.genotype.linkage import Step, condensed_index, ward_linkage


def primitive_ward(dists, n):
    """Merge the globally closest pair each step (Lance-Williams Ward)."""
    D = np.full((n, n), np.inf)
    iu = np.triu_indices(n, 1)
    D[iu] = dists
    D[(iu[1], iu[0])] = D[iu]
    size = np.ones(n, dtype=int)
    active = list(range(n))
    label = list(range(n))          # current dendrogram node id
    next_id = n
    steps = []
    while len(active) > 1:
        best = None
        for ai in range(len(active)):
            for bi in range(ai + 1, len(active)):
                i, j = active[ai], active[bi]
                if best is None or D[i, j] < best[0]:
                    best = (D[i, j], i, j)
        dist, i, j = best
        li, lj = label[i], label[j]
        steps.append(Step(min(li, lj), max(li, lj), dist,
                          int(size[i] + size[j])))
        ni, nj = size[i], size[j]
        for k in active:
            if k in (i, j):
                continue
            nk = size[k]
            val = ((ni + nk) * D[i, k] ** 2 + (nj + nk) * D[j, k] ** 2
                   - nk * dist ** 2) / (ni + nj + nk)
            D[j, k] = D[k, j] = math.sqrt(max(val, 0.0))
        size[j] += size[i]
        label[j] = next_id
        next_id += 1
        active.remove(i)
    # steps are already in nondecreasing order for Ward, but relabeling
    # differs: renumber in sorted order like the production code
    order = sorted(range(len(steps)), key=lambda k: steps[k].dissimilarity)
    remap = {}
    out = []
    for new_i, k in enumerate(order):
        s = steps[k]
        c1 = remap.get(s.cluster1, s.cluster1)
        c2 = remap.get(s.cluster2, s.cluster2)
        if c1 > c2:
            c1, c2 = c2, c1
        out.append(Step(c1, c2, s.dissimilarity, s.size))
        remap[n + k] = n + new_i
    return out


@pytest.mark.parametrize("n", [3, 5, 8, 14])
def test_ward_linkage_matches_primitive(n):
    rng = random.Random(n)
    m = n * (n - 1) // 2
    # distinct dissimilarities → unique dendrogram
    dists = np.array(rng.sample(range(1, 1000), m), dtype=float) / 10.0
    got = ward_linkage(dists.copy(), n)
    want = primitive_ward(dists.copy(), n)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g.cluster1 == w.cluster1
        assert g.cluster2 == w.cluster2
        assert abs(g.dissimilarity - w.dissimilarity) < 1e-9
        assert g.size == w.size


def test_ward_linkage_sorted_output():
    rng = random.Random(99)
    n = 20
    dists = np.array([rng.uniform(0.5, 50) for _ in
                      range(n * (n - 1) // 2)])
    steps = ward_linkage(dists, n)
    ds = [s.dissimilarity for s in steps]
    assert ds == sorted(ds)
    assert steps[-1].size == n
