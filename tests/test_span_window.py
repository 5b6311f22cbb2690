"""Certified seed-window banding (kernels/span_window.py): the windowed
ends-free span alignment must be BIT-identical to the full-text DP —
score, match count, text span, and tie-broken end column — or fail its
certificate and be recomputed on the full text. Fuzzed over implanted
flanks with substitutions/indels, duplicate implants (co-optimal ends),
divergent texts (no implant), and heavy-error implants (certificate
failure path)."""

import random

import numpy as np
import pytest

from trgt_tpu.kernels import span_window
from trgt_tpu.kernels.align_host import align_ends_free_text

SCORINGS = [(2, 5, 1), (1, 0, 1)]


def _full(pattern, text, sc):
    score, matches, _, tspan = align_ends_free_text(pattern, text, *sc)
    return (score, matches, tspan)


def _one_sub(p, t, band, sc, use_band):
    """One sub-problem the way the pipeline host twin runs it: the
    native diagonal-banded DP when a band exists, else the full DP on
    the (window) text."""
    if use_band and band is not None:
        from trgt_tpu.io import native
        res = native.endsfree_banded(p, t, *sc, band[0], band[1])
        if res is not None:
            score, matches, _, tspan = res
            return (score, matches, tspan)
    return _full(p, t, sc)


def _windowed(patterns, texts, sc, use_band=True):
    """The pipeline's windowing orchestration against the host aligner."""
    mism, gapo, gape = sc
    plans = [span_window.plan_windows(p, t, mism, gapo, gape)
             for p, t in zip(patterns, texts)]
    subp, subt, subb, owners = span_window.expand(plans, patterns, texts)
    sub_results = [_one_sub(p, t, b, sc, use_band)
                   for p, t, b in zip(subp, subt, subb)]
    out, redo = span_window.reduce_and_certify(
        plans, owners, sub_results, len(texts), mism, gapo, gape)
    for mi in redo:
        out[mi] = _full(patterns[mi], texts[mi], sc)
    return out, plans, redo


def _mutate(rng, seq, n_sub, n_ins, n_del):
    s = bytearray(seq)
    for _ in range(n_sub):
        i = rng.randrange(len(s))
        s[i] = ord(rng.choice([c for c in "ACGT" if ord(c) != s[i]]))
    for _ in range(n_ins):
        i = rng.randrange(len(s) + 1)
        s[i:i] = rng.choice("ACGT").encode()
    for _ in range(n_del):
        i = rng.randrange(len(s))
        del s[i:i + 1]
    return bytes(s)


def _rand_dna(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n)).encode()


@pytest.mark.parametrize("use_band", [True, False])
@pytest.mark.parametrize("sc", SCORINGS)
def test_windowed_equals_full_fuzz_banded_and_window(sc, use_band):
    """Both host shapes — the diagonal-banded native DP and the
    window-sliced full DP (the device kernel's shape) — must reduce to
    the same accepted result, which equals the full-text DP."""
    _fuzz(sc, use_band)


def _fuzz(sc, use_band):
    rng = random.Random(1234)
    n_redo = 0
    for trial in range(60):
        P = rng.choice([200, 250])
        pattern = _rand_dna(rng, P)
        T = rng.randrange(800, 6000)
        text = bytearray(_rand_dna(rng, T))
        kind = trial % 4
        if kind == 0:        # clean-ish implant: few substitutions
            mut = _mutate(rng, pattern, rng.randrange(1, 5), 0, 0)
            pos = rng.randrange(0, T - len(mut))
            text[pos:pos + len(mut)] = mut
        elif kind == 1:      # implant with indels
            mut = _mutate(rng, pattern, rng.randrange(0, 3),
                          rng.randrange(0, 3), rng.randrange(0, 3))
            pos = rng.randrange(0, T - len(mut))
            text[pos:pos + len(mut)] = mut
        elif kind == 2:      # duplicate implant: co-optimal ends
            pos1 = rng.randrange(0, T // 2 - P)
            pos2 = rng.randrange(T // 2, T - P)
            text[pos1:pos1 + P] = pattern
            text[pos2:pos2 + P] = pattern
        else:                # heavy errors: certificate failure likely
            mut = _mutate(rng, pattern, rng.randrange(15, 40),
                          rng.randrange(0, 8), rng.randrange(0, 8))
            pos = rng.randrange(0, max(1, T - len(mut)))
            text[pos:pos + len(mut)] = mut
        text = bytes(text)
        got, plans, redo = _windowed([pattern], [text], sc,
                                     use_band=use_band)
        n_redo += len(redo)
        want = _full(pattern, text, sc)
        assert got[0] == want, (trial, kind, got[0], want)
    # the fuzz must actually exercise the certificate-failure path
    assert n_redo > 0


@pytest.mark.parametrize("sc", SCORINGS)
def test_divergent_text_goes_full(sc):
    """A text with no seed hits (neighbouring read without the flank)
    must dispatch the full text — and still match the full DP."""
    rng = random.Random(7)
    pattern = _rand_dna(rng, 250)
    text = _rand_dna(rng, 4000)
    plan = span_window.plan_windows(pattern, text, *sc)
    # random 4kb text almost surely contains none of the 31 8-mers...
    # but if it does, the plan is still valid; only equality is asserted
    got, _, _ = _windowed([pattern], [text], sc)
    assert got[0] == _full(pattern, text, sc)
    if plan is not None:
        assert sum(hi - lo for lo, hi, _dl, _dh in plan.windows) \
            < 0.75 * len(text)


def test_seed_hit_cap_bails_to_full():
    """A repeat-degenerate flank piece whose tiles hit the text
    thousands of times must bail to the full DP early (MAX_SEED_HITS)
    — and stay correct through the orchestration."""
    pattern = b"AT" * 125                  # 250bp of AT-repeat
    text = b"AT" * 2000                    # 4kb of the same repeat
    plan = span_window.plan_windows(pattern, text, 2, 5, 1)
    assert plan is None                    # capped -> full DP
    got, _, _ = _windowed([pattern], [text], (2, 5, 1))
    assert got[0] == _full(pattern, text, (2, 5, 1))


def test_short_text_goes_full():
    pattern = b"ACGT" * 60
    text = b"ACGT" * 100          # 400bp < MIN_TEXT_LEN
    assert span_window.plan_windows(pattern, text, 2, 5, 1) is None


def test_windows_cover_exact_implant():
    rng = random.Random(99)
    pattern = _rand_dna(rng, 250)
    text = bytearray(_rand_dna(rng, 5000))
    text[3000:3250] = pattern
    plan = span_window.plan_windows(pattern, bytes(text), 2, 5, 1)
    assert plan is not None
    assert any(lo <= 3000 and hi >= 3250
               for lo, hi, _dl, _dh in plan.windows)
    # the exact implant scores 0 -> certificate trivially holds
    assert span_window.certified(plan, 0.0, 2, 5, 1)


def test_native_banded_matches_full_direct():
    """The native diagonal-banded kernel vs the full ends-free DP on
    implants whose band is wide enough to stay certified."""
    from trgt_tpu.io import native
    if native.get_lib() is None:
        pytest.skip("native lib unavailable")
    rng = random.Random(321)
    for _ in range(40):
        P = 250
        pattern = _rand_dna(rng, P)
        T = rng.randrange(400, 3000)
        text = bytearray(_rand_dna(rng, T))
        mut = _mutate(rng, pattern, rng.randrange(0, 4),
                      rng.randrange(0, 3), rng.randrange(0, 3))
        pos = rng.randrange(0, T - len(mut))
        text[pos:pos + len(mut)] = mut
        text = bytes(text)
        for sc in SCORINGS:
            plan = span_window.plan_windows(pattern, text, *sc)
            if plan is None:
                continue
            _, subt, subb, owners = span_window.expand(
                [plan], [pattern], [text])
            best = None
            for t, b, (mi, lo, _w) in zip(subt, subb, owners):
                res = native.endsfree_banded(pattern, t, *sc, b[0], b[1])
                if res is None:
                    continue
                score, matches, _, tspan = res
                cand = (score, matches, (tspan[0] + lo, tspan[1] + lo))
                if best is None or cand[0] < best[0]:
                    best = cand
            if best is not None and span_window.certified(
                    plan, best[0], sc[0], sc[1], sc[2]):
                assert best == _full(pattern, text, sc)


def test_batch_mixed_plans():
    """A batch mixing windowed, full, and multi-window misses reduces
    back to per-miss results identical to the full DP."""
    rng = random.Random(5)
    sc = (2, 5, 1)
    patterns, texts = [], []
    for kind in range(6):
        P = 250
        pattern = _rand_dna(rng, P)
        text = bytearray(_rand_dna(rng, 3000))
        if kind % 3 == 0:
            mut = _mutate(rng, pattern, 2, 1, 1)
            pos = rng.randrange(0, 2500)
            text[pos:pos + len(mut)] = mut
        elif kind % 3 == 1:
            text[100:350] = pattern
            text[2600:2850] = pattern
        patterns.append(pattern)
        texts.append(bytes(text))
    got, _, _ = _windowed(patterns, texts, sc)
    want = [_full(p, t, sc) for p, t in zip(patterns, texts)]
    assert got == want
