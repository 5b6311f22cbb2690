"""Ward hierarchical clustering (replaces the kodama crate,
ref: src/trgt/genotype/genotype_cluster.rs:161).

NN-chain algorithm on a condensed distance matrix with Lance-Williams Ward
updates, followed by the standard sort+union-find relabeling, producing
steps identical to kodama/scipy: sorted by dissimilarity, clusters numbered
n..2n-2 in merge order, each step (cluster1, cluster2, dissimilarity, size)
with cluster1 < cluster2.
"""

import math
from dataclasses import dataclass
from typing import List

import numpy as np


@dataclass
class Step:
    cluster1: int
    cluster2: int
    dissimilarity: float
    size: int


def condensed_index(n: int, i: int, j: int) -> int:
    if i > j:
        i, j = j, i
    return n * i - (i * (i + 1)) // 2 + (j - i - 1)


def ward_linkage(dists: np.ndarray, n: int) -> List[Step]:
    D = np.asarray(dists, dtype=np.float64).copy()
    size = np.ones(n, dtype=np.int64)
    merges = []  # (x_leafrep, y_leafrep, dist, new_size)
    chain = []

    def d(i, j):
        return D[condensed_index(n, i, j)]

    for _ in range(n - 1):
        if not chain:
            x = int(np.argmax(size > 0))
            chain.append(x)
        while True:
            x = chain[-1]
            if len(chain) > 1:
                y = chain[-2]
                current_min = d(x, y)
            else:
                y = -1
                current_min = math.inf
            for i in range(n):
                if size[i] == 0 or i == x:
                    continue
                dist = d(x, i)
                if dist < current_min:
                    current_min = dist
                    y = i
            if len(chain) > 1 and y == chain[-2]:
                break
            chain.append(y)
        chain.pop()
        chain.pop()
        if x > y:
            x, y = y, x
        nx, ny = int(size[x]), int(size[y])
        merges.append((x, y, current_min, nx + ny))
        size[x] = 0
        size[y] = nx + ny
        # Lance-Williams Ward update into label y
        d_xy2 = current_min * current_min
        for i in range(n):
            if size[i] == 0 or i == y:
                continue
            ni = int(size[i])
            d_xi = d(x, i)
            d_yi = d(y, i)
            val = ((nx + ni) * d_xi * d_xi + (ny + ni) * d_yi * d_yi
                   - ni * d_xy2) / (nx + ny + ni)
            D[condensed_index(n, y, i)] = math.sqrt(max(val, 0.0))

    # sort by dissimilarity (stable) + union-find relabel (kodama/scipy
    # `label` step: clusters numbered n..2n-2 in sorted order)
    order = sorted(range(n - 1), key=lambda k: merges[k][2])
    parent = list(range(2 * n - 1))

    def find(a: int) -> int:
        root = a
        while parent[root] != root:
            root = parent[root]
        while parent[a] != root:
            parent[a], a = root, parent[a]
        return root

    steps: List[Step] = []
    for i, k in enumerate(order):
        x, y, dist, sz = merges[k]
        rx, ry = find(x), find(y)
        if rx > ry:
            rx, ry = ry, rx
        steps.append(Step(rx, ry, dist, sz))
        parent[rx] = parent[ry] = n + i
    return steps


def cluster_size(steps: List[Step], n: int, node: int) -> int:
    # kodama Dendrogram::cluster_size semantics
    if node < n:
        return 1
    return steps[node - n].size
