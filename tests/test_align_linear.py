"""Linear-memory (Myers-Miller) aligner vs the quadratic host twin.

Covers VERDICT round-1 item 4: long-allele alignment must be memory
bounded (ref: WFA MemoryUltraLow, src/wfaligner.rs:173-181, used by
src/commands/genotype.rs:82-92)."""

import random

import numpy as np
import pytest

from trgt_tpu.kernels import align_host
from trgt_tpu.kernels.align_linear import align_end_to_end_linear


def _quadratic(pattern, text, mism, gapo, gape):
    """The quadratic DP, bypassing the size gate."""
    assert len(pattern) * len(text) <= align_host.LINEAR_FALLBACK_CELLS
    return align_host.align_end_to_end(pattern, text, mism, gapo, gape)


def _check_cigar(pattern, text, ops, mism, gapo, gape):
    """Validate op consistency and return the recomputed cost."""
    i = j = cost = 0
    for length, op in ops:
        assert length > 0
        if op in ("=", "X"):
            for k in range(length):
                same = pattern[i + k] == text[j + k]
                assert same == (op == "="), (i + k, j + k, op)
            i += length
            j += length
            if op == "X":
                cost += mism * length
        elif op == "D":
            i += length
            cost += gapo + gape * length
        elif op == "I":
            j += length
            cost += gapo + gape * length
        else:
            raise AssertionError(op)
    assert i == len(pattern) and j == len(text)
    # adjacent runs must be merged
    for a, b in zip(ops, ops[1:]):
        assert a[1] != b[1]
    return cost


def _mutate(rng, seq, sub_p, ind_p):
    out = []
    for c in seq:
        r = rng.random()
        if r < ind_p / 2:
            continue  # deletion
        if r < ind_p:
            out.append(rng.choice("ACGT"))  # insertion
        if rng.random() < sub_p:
            out.append(rng.choice("ACGT"))
        else:
            out.append(c)
    return "".join(out)


def test_linear_matches_quadratic_random():
    rng = random.Random(7)
    scorings = [(2, 5, 1), (1, 4, 2), (3, 1, 1), (2, 0, 1)]
    for case in range(120):
        mism, gapo, gape = scorings[case % len(scorings)]
        n = rng.randrange(0, 160)
        base = "".join(rng.choice("ACGT") for _ in range(n))
        text = _mutate(rng, base, sub_p=0.1, ind_p=0.15)
        # occasional big structural indel to force long gap runs
        if case % 5 == 0 and n > 20:
            cut = rng.randrange(0, n - 10)
            text = text[:cut] + "CAG" * rng.randrange(3, 30) + text[cut:]
        ql, ops_l = align_end_to_end_linear(
            base.encode(), text.encode(), mism, gapo, gape)
        qq, _ops_q = _quadratic(base.encode(), text.encode(), mism, gapo,
                                gape)
        assert ql == qq, (case, ql, qq)
        assert _check_cigar(base, text, ops_l, mism, gapo, gape) == ql


def test_linear_matches_quadratic_medium():
    rng = random.Random(11)
    base = "".join(rng.choice("ACGT") for _ in range(1200))
    text = _mutate(rng, base, sub_p=0.02, ind_p=0.02)
    ql, ops = align_end_to_end_linear(base.encode(), text.encode(), 2, 5, 1)
    qq, _ = _quadratic(base.encode(), text.encode(), 2, 5, 1)
    assert ql == qq
    assert _check_cigar(base, text, ops, 2, 5, 1) == ql


def test_gap_dominated_cases():
    # pure deletions / insertions / gap runs crossing many split rows
    for mism, gapo, gape in [(2, 5, 1), (1, 7, 3)]:
        p = b"A" * 300
        t = b"A" * 10
        score, ops = align_end_to_end_linear(p, t, mism, gapo, gape)
        qs, _ = _quadratic(p, t, mism, gapo, gape)
        assert score == qs == gapo + gape * 290
        assert _check_cigar(p.decode(), t.decode(), ops, mism, gapo,
                            gape) == score
        score, ops = align_end_to_end_linear(t, p, mism, gapo, gape)
        assert score == gapo + gape * 290
        _check_cigar(t.decode(), p.decode(), ops, mism, gapo, gape)
    # empty edges
    assert align_end_to_end_linear(b"", b"ACGT", 2, 5, 1)[0] == 9
    assert align_end_to_end_linear(b"ACGT", b"", 2, 5, 1)[0] == 9
    assert align_end_to_end_linear(b"", b"", 2, 5, 1) == (0, [])


def test_host_gate_delegates_above_threshold():
    # 2500 x 2500 = 6.25M cells > LINEAR_FALLBACK_CELLS: must not build
    # quadratic traceback matrices (would be ~140MB) and must stay exact.
    rng = random.Random(3)
    base = "".join(rng.choice("ACGT") for _ in range(2500))
    text = _mutate(rng, base, sub_p=0.01, ind_p=0.01)
    score, ops = align_host.align_end_to_end(base.encode(), text.encode(),
                                             2, 5, 1)
    assert _check_cigar(base, text, ops, 2, 5, 1) == score


def test_expansion_scale_15kb():
    """A 15kb CAG expansion allele aligns in bounded memory (VERDICT #4)."""
    rng = random.Random(5)
    backbone = "CAG" * 5000
    read = _mutate(rng, backbone, sub_p=0.002, ind_p=0.002)
    score, ops = align_host.align_end_to_end(backbone.encode(),
                                             read.encode(), 2, 5, 1)
    assert _check_cigar(backbone, read, ops, 2, 5, 1) == score
    # perfect copy: zero cost, single '=' run
    s0, o0 = align_host.align_end_to_end(backbone.encode(),
                                         backbone.encode(), 2, 5, 1)
    assert s0 == 0 and o0 == [(15000, "=")]


def test_device_batch_routes_long_pairs():
    from trgt_tpu.kernels.e2e_device import e2e_align_batch
    rng = random.Random(9)
    pairs = []
    for n in (40, 2500):
        base = "".join(rng.choice("ACGT") for _ in range(n))
        text = _mutate(rng, base, sub_p=0.05, ind_p=0.05)
        pairs.append((base.encode(), text.encode()))
    res = e2e_align_batch(pairs, 2, 5, 1)
    for (p, t), (score, ops) in zip(pairs, res):
        want, _ = align_host.align_end_to_end(p, t, 2, 5, 1)
        assert score == want
        assert _check_cigar(p.decode(), t.decode(), ops, 2, 5, 1) == score
