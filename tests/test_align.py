import random

import numpy as np
import pytest

from trgt_tpu.kernels.align_host import (align_end_to_end,
                                         align_ends_free_text,
                                         edit_distance)


def naive_edit(a, b):
    m, n = len(a), len(b)
    d = np.zeros((m + 1, n + 1), dtype=int)
    d[:, 0] = np.arange(m + 1)
    d[0, :] = np.arange(n + 1)
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            d[i, j] = min(d[i - 1, j] + 1, d[i, j - 1] + 1,
                          d[i - 1, j - 1] + (a[i - 1] != b[j - 1]))
    return int(d[m, n])


def naive_affine(a, b, mism, gapo, gape):
    INF = 10 ** 9
    m, n = len(a), len(b)
    H = [[INF] * (n + 1) for _ in range(m + 1)]
    E = [[INF] * (n + 1) for _ in range(m + 1)]
    F = [[INF] * (n + 1) for _ in range(m + 1)]
    H[0][0] = 0
    for i in range(1, m + 1):
        E[i][0] = gapo + gape * i
        H[i][0] = E[i][0]
    for j in range(1, n + 1):
        F[0][j] = gapo + gape * j
        H[0][j] = F[0][j]
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            E[i][j] = min(H[i - 1][j] + gapo + gape, E[i - 1][j] + gape)
            F[i][j] = min(H[i][j - 1] + gapo + gape, F[i][j - 1] + gape)
            sub = 0 if a[i - 1] == b[j - 1] else mism
            H[i][j] = min(H[i - 1][j - 1] + sub, E[i][j], F[i][j])
    return H[m][n]


def random_dna(rng, lo, hi):
    return bytes(rng.choice(b"ACGT") for _ in range(rng.randint(lo, hi)))


def test_edit_distance_random():
    rng = random.Random(0)
    for _ in range(50):
        a = random_dna(rng, 0, 80)
        b = random_dna(rng, 0, 80)
        assert edit_distance(a, b) == naive_edit(a, b)


def test_e2e_affine_score_random():
    rng = random.Random(1)
    for _ in range(30):
        a = random_dna(rng, 1, 40)
        b = random_dna(rng, 1, 40)
        score, cigar = align_end_to_end(a, b, 2, 5, 1)
        assert score == naive_affine(a, b, 2, 5, 1)
        # cigar consistency: consumed lengths match
        plen = sum(l for l, op in cigar if op in "=XD")
        tlen = sum(l for l, op in cigar if op in "=XI")
        assert plen == len(a) and tlen == len(b)
        # cigar cost equals score
        cost = 0
        for l, op in cigar:
            if op == "X":
                cost += 2 * l
            elif op in "ID":
                cost += 5 + l
        assert cost == score


def test_e2e_cigar_perfect():
    score, cigar = align_end_to_end(b"ACGTACGT", b"ACGTACGT", 2, 5, 1)
    assert score == 0
    assert cigar == [(8, "=")]


def test_ends_free_exact_inside():
    pattern = b"ACGTAC"
    text = b"TTTTTACGTACTTTTT"
    score, matches, (ps, pe), (ts, te) = align_ends_free_text(
        pattern, text, 2, 5, 1)
    assert score == 0
    assert matches == 6
    assert (ts, te) == (5, 11)
    assert (ps, pe) == (0, 6)


def test_ends_free_with_mismatch():
    pattern = b"ACGTAC"
    text = b"TTTTTACCTACTTTTT"
    score, matches, _, (ts, te) = align_ends_free_text(pattern, text, 2, 5, 1)
    assert score == 2
    assert matches == 5
    assert (ts, te) == (5, 11)


def test_ends_free_pattern_at_edge():
    pattern = b"ACGT"
    text = b"ACGTGGGG"
    score, matches, _, (ts, te) = align_ends_free_text(pattern, text, 2, 5, 1)
    assert score == 0 and matches == 4
    assert (ts, te) == (0, 4)


def test_ends_free_optimal_vs_bruteforce():
    # score must equal min over all text substrings of global affine cost
    rng = random.Random(2)
    for _ in range(15):
        pattern = random_dna(rng, 3, 12)
        text = random_dna(rng, 3, 25)
        score, _, _, _ = align_ends_free_text(pattern, text, 2, 5, 1)
        best = min(
            naive_affine(pattern, text[s:e], 2, 5, 1)
            for s in range(len(text) + 1)
            for e in range(s, len(text) + 1))
        assert score == best
