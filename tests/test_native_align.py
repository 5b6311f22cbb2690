"""Native C++ banded aligner equivalence: trgt_banded_align must be
bit-identical (score AND CIGAR) to the numpy quadratic DP — the numpy
twins remain the behavioural reference (CLAUDE.md invariant), the C++
is the speed path that serves align_end_to_end when available."""

import random

import pytest

from trgt_tpu.io import native
from trgt_tpu.kernels.align_host import (_native_end_to_end,
                                         align_end_to_end,
                                         align_end_to_end_quadratic)

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native codec unavailable")

SCORINGS = [(2, 5, 1), (1, 0, 1), (5, 2, 1)]


def mutate(seq, rng, sub, ins, dele, max_run=4):
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


def rand_seq(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def check(a: bytes, b: bytes, scoring, tb=None, te=None):
    mism, gapo, gape = scoring
    got = _native_end_to_end(a, b, mism, gapo, gape, tb, te)
    assert got is not None
    want = align_end_to_end_quadratic(a, b, mism, gapo, gape, tb=tb,
                                      te=te)
    assert got[0] == want[0], (got[0], want[0])
    assert got[1] == want[1]


@pytest.mark.parametrize("scoring", SCORINGS)
def test_fuzz_error_rates(scoring):
    """From near-identical (certificate holds early) to highly divergent
    (band grows to full cover == the full DP): all exact."""
    rng = random.Random(scoring[0] * 100 + 1)
    for err in (0.0, 0.01, 0.05, 0.2, 0.5):
        for n in (30, 200, 900):
            base = rand_seq(rng, n)
            mut = mutate(base, rng, err / 2, err / 4, err / 4)
            if not mut:
                mut = "A"
            check(base.encode(), mut.encode(), scoring)


def test_fully_random_pairs():
    rng = random.Random(9)
    for _ in range(5):
        a = rand_seq(rng, rng.randint(1, 300)).encode()
        b = rand_seq(rng, rng.randint(1, 300)).encode()
        check(a, b, (2, 5, 1))


def test_repeat_ties():
    rng = random.Random(3)
    for motif in ["A", "CAG", "ATT"]:
        a = (motif * 200).encode()
        b = (motif * 190 + rand_seq(rng, 7)).encode()
        for scoring in SCORINGS:
            check(a, b, scoring)


def test_boundary_open_costs():
    rng = random.Random(11)
    base = rand_seq(rng, 400)
    mut = mutate(base, rng, 0.01, 0.005, 0.005)
    for tb, te in [(0, None), (None, 0), (0, 0), (3, 9), (12, 1)]:
        check(base.encode(), mut.encode(), (2, 5, 1), tb=tb, te=te)


def test_tiny_edges():
    for a, b in [(b"A", b"A"), (b"A", b"T"), (b"A", b"ACGT"),
                 (b"ACGTACGT", b"T"), (b"AC", b"CA")]:
        for scoring in SCORINGS:
            check(a, b, scoring)


def test_structural_indels():
    rng = random.Random(17)
    base = rand_seq(rng, 2000)
    ins = base[:900] + rand_seq(rng, 400) + base[900:]
    dele = base[:300] + base[1000:]
    for scoring in SCORINGS:
        check(base.encode(), ins.encode(), scoring)
        check(base.encode(), dele.encode(), scoring)


def test_public_entry_uses_native():
    """align_end_to_end routes through the native kernel and stays
    bit-identical to the quadratic twin."""
    rng = random.Random(23)
    base = rand_seq(rng, 700)
    mut = mutate(base, rng, 0.02, 0.01, 0.01)
    got = align_end_to_end(base.encode(), mut.encode(), 2, 5, 1)
    want = align_end_to_end_quadratic(base.encode(), mut.encode(),
                                      2, 5, 1)
    assert got == want


def test_long_near_identical_fast():
    """The consensus-repair hot case: 12kb pair, sparse edits — must
    certify in a narrow band and run in well under a second."""
    import time
    rng = random.Random(29)
    base = rand_seq(rng, 12000)
    mut = mutate(base, rng, 0.004, 0.002, 0.002)
    t0 = time.time()
    got = _native_end_to_end(base.encode(), mut.encode(), 2, 5, 1,
                             None, None)
    dt = time.time() - t0
    assert got is not None
    assert dt < 1.0, f"native banded too slow: {dt:.2f}s"


def _numpy_ends_free(a, b, scoring):
    """Call the numpy twin directly (bypassing the native fast path)."""
    from unittest import mock
    from trgt_tpu.kernels import align_host
    with mock.patch.object(native, "get_lib", return_value=None):
        return align_host.align_ends_free_text(a, b, *scoring)


@pytest.mark.parametrize("scoring", SCORINGS)
def test_endsfree_fuzz(scoring):
    """Native ends-free == numpy twin: score, match count, and both
    spans (WFA M-or-X first..last column semantics)."""
    from trgt_tpu.kernels.align_host import align_ends_free_text
    rng = random.Random(scoring[1] * 7 + 2)
    for _ in range(30):
        flank = rand_seq(rng, rng.randint(10, 120))
        # embed a mutated copy of the flank inside a random read
        core = mutate(flank, rng, 0.05, 0.02, 0.02)
        read = (rand_seq(rng, rng.randint(0, 80)) + core
                + rand_seq(rng, rng.randint(0, 80)))
        if not read:
            read = "A"
        got = align_ends_free_text(flank.encode(), read.encode(),
                                   *scoring)
        want = _numpy_ends_free(flank.encode(), read.encode(), scoring)
        assert got == want


def test_endsfree_no_relation():
    from trgt_tpu.kernels.align_host import align_ends_free_text
    rng = random.Random(31)
    for _ in range(10):
        a = rand_seq(rng, rng.randint(1, 60)).encode()
        b = rand_seq(rng, rng.randint(1, 200)).encode()
        got = align_ends_free_text(a, b, 2, 5, 1)
        want = _numpy_ends_free(a, b, (2, 5, 1))
        assert got == want


def _numpy_label(hmm, q):
    from unittest import mock
    with mock.patch.object(native, "get_lib", return_value=None):
        return hmm.label(q)


def test_hmm_label_native_twin():
    """Native Viterbi == numpy label on random repeat queries across
    heterogeneous topologies (multi-motif, single-base, long)."""
    from trgt_tpu.hmm import build_hmm
    rng = random.Random(41)
    motif_sets = [[b"CAG"], [b"A"], [b"CAG", b"CAA"],
                  [b"AAGGCTT", b"TG"], [b"CCATTTTAGG", b"T", b"GATA"]]
    for ms in motif_sets:
        hmm = build_hmm(ms)
        for n_copies in (1, 3, 25, 120):
            seq = []
            for _ in range(n_copies):
                m = rng.choice(ms).decode()
                for ch in m:
                    r = rng.random()
                    if r < 0.02:
                        continue
                    seq.append(rng.choice("ACGT") if r < 0.05 else ch)
            q = "".join(seq)
            if not q:
                continue
            assert hmm.label(q) == _numpy_label(hmm, q), (ms, n_copies)


def test_hmm_label_native_twin_invalid_path():
    """Both paths raise on a query no path can emit... all bases are
    emittable via the skip block, so instead check empty-query parity
    and the '#' sentinel handling on a minimal query."""
    from trgt_tpu.hmm import build_hmm
    hmm = build_hmm([b"CAG"])
    assert hmm.label("") == []
    assert hmm.label("C") == _numpy_label(hmm, "C")
