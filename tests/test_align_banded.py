"""Adaptive-band aligner equivalence: kernels/align_banded.py must be
bit-identical (score AND CIGAR) to the full quadratic Gotoh DP whenever
its optimality certificate holds (VERDICT r2 'Next round' #3: the WFA
O(n·s) replacement for long-pair consensus repair)."""

import random

import pytest

from trgt_tpu.kernels.align_banded import align_end_to_end_banded
from trgt_tpu.kernels.align_host import (align_end_to_end,
                                         align_end_to_end_quadratic)

SCORINGS = [(2, 5, 1), (1, 0, 1), (5, 2, 1)]


def mutate(seq: str, rng: random.Random, sub=0.02, ins=0.01, dele=0.01,
           max_run=6):
    out = []
    i = 0
    while i < len(seq):
        r = rng.random()
        if r < sub:
            out.append(rng.choice("ACGT"))
            i += 1
        elif r < sub + ins:
            out.append("".join(rng.choice("ACGT")
                               for _ in range(rng.randint(1, max_run))))
        elif r < sub + ins + dele:
            i += rng.randint(1, max_run)
        else:
            out.append(seq[i])
            i += 1
    return "".join(out)


def rand_seq(rng: random.Random, n: int) -> str:
    return "".join(rng.choice("ACGT") for _ in range(n))


def check_equal(a: bytes, b: bytes, scoring, tb=None, te=None):
    mism, gapo, gape = scoring
    got = align_end_to_end_banded(a, b, mism, gapo, gape, tb=tb, te=te)
    want = align_end_to_end_quadratic(a, b, mism, gapo, gape, tb=tb,
                                      te=te)
    assert got is not None, "certificate unexpectedly failed"
    assert got[0] == want[0], (got[0], want[0])
    assert got[1] == want[1]


def test_identical_pair():
    rng = random.Random(1)
    s = rand_seq(rng, 2000).encode()
    for scoring in SCORINGS:
        got = align_end_to_end_banded(s, s, *scoring)
        assert got == (0, [(2000, "=")])


@pytest.mark.parametrize("n", [400, 1500, 4000])
@pytest.mark.parametrize("scoring", SCORINGS)
def test_random_mutations(n, scoring):
    """HiFi-like error rates (the consensus-repair regime the band is
    designed for: reads vs their own cluster's backbone)."""
    rng = random.Random(n * 31 + scoring[0])
    for _ in range(3):
        base = rand_seq(rng, n)
        mut = mutate(base, rng, sub=0.006, ins=0.003, dele=0.003,
                     max_run=3)
        check_equal(base.encode(), mut.encode(), scoring)


def test_repeat_structure():
    """Tandem-repeat sequences: many co-optimal paths, ties everywhere —
    the hardest case for CIGAR parity."""
    rng = random.Random(7)
    for motif in ["CAG", "A", "ATTCT", "CGCGG"]:
        a = motif * 400
        b = motif * 380 + "".join(rng.choice("ACGT") for _ in range(10))
        for scoring in SCORINGS:
            check_equal(a.encode(), b.encode(), scoring)


def test_gap_dominated():
    """Large structural indels (expansion alleles vs backbone)."""
    rng = random.Random(11)
    base = rand_seq(rng, 2500)
    with_ins = base[:1200] + rand_seq(rng, 700) + base[1200:]
    with_del = base[:800] + base[1700:]
    for scoring in SCORINGS:
        check_equal(base.encode(), with_ins.encode(), scoring)
        check_equal(base.encode(), with_del.encode(), scoring)
        check_equal(with_ins.encode(), base.encode(), scoring)


def test_boundary_open_costs():
    """tb/te leaf semantics from the Myers-Miller recursion."""
    rng = random.Random(13)
    base = rand_seq(rng, 900)
    mut = mutate(base, rng)
    for tb, te in [(0, None), (None, 0), (0, 0), (2, 7)]:
        check_equal(base.encode(), mut.encode(), (2, 5, 1), tb=tb, te=te)


def test_divergent_returns_none():
    """Unrelated sequences: the certificate can never hold before the
    band covers the full matrix — the caller's fallback must engage."""
    rng = random.Random(17)
    a = rand_seq(rng, 1200).encode()
    b = rand_seq(rng, 1150).encode()
    assert align_end_to_end_banded(a, b, 2, 5, 1) is None
    # the public entry still answers (quadratic/linear fallback)
    score, cigar = align_end_to_end(a, b, 2, 5, 1)
    want = align_end_to_end_quadratic(a, b, 2, 5, 1)
    assert (score, cigar) == want


def test_dispatch_above_threshold_identical():
    """align_end_to_end's banded fast path returns exactly what the
    quadratic DP would have (600x600 > BANDED_MIN_CELLS forces it)."""
    rng = random.Random(23)
    base = rand_seq(rng, 600)
    mut = mutate(base, rng)
    got = align_end_to_end(base.encode(), mut.encode(), 2, 5, 1)
    want = align_end_to_end_quadratic(base.encode(), mut.encode(),
                                      2, 5, 1)
    assert got == want


def test_very_long_near_identical_fast():
    """20kb pair with sparse edits: certified banded result equals the
    quadratic DP (this is the consensus-repair hot case the band is
    for; quadratic here is 400M cells — run it once, it is the test's
    cost ceiling... use 8kb to keep CI sane)."""
    rng = random.Random(29)
    base = rand_seq(rng, 8000)
    mut = mutate(base, rng, sub=0.005, ins=0.002, dele=0.002)
    check_equal(base.encode(), mut.encode(), (2, 5, 1))
