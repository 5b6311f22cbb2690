"""Golden HMM tests ported from the reference behavior
(ref: src/hmm/builder.rs:186-274, purity.rs:43-97, events.rs:119-146)."""

import math

import pytest

from trgt_tpu.hmm import (build_hmm, calc_purity, get_base_match,
                          label_motifs, remove_imperfect_motifs)


def summarize(spans):
    # groups adjacent spans of the same motif (ref: builder.rs tests)
    out = []
    for s in spans:
        if out and out[-1][2] == s.motif_index:
            out[-1] = (out[-1][0], s.end, s.motif_index)
        else:
            out.append((s.start, s.end, s.motif_index))
    return out


def test_annotate_two_perfect_motif_runs():
    motifs = [b"CAG", b"A"]
    hmm = build_hmm(motifs)
    labels = label_motifs(hmm, hmm.label("CAGCAGCAGCAGAAAAA"))
    assert summarize(labels) == [(0, 12, 0), (12, 17, 1)]


def test_annotate_motif_runs_separated_by_insertion():
    motifs = [b"CAG", b"A"]
    hmm = build_hmm(motifs)
    query = "CAGCAGATCGATCGATCGATCGAAAAA"
    states = hmm.label(query)
    states = remove_imperfect_motifs(hmm, motifs, states, query.encode(), 6)
    labels = label_motifs(hmm, states)
    expected = [
        (0, 6, 0), (6, 7, 1), (7, 10, 2), (10, 11, 1), (11, 14, 2),
        (14, 15, 1), (15, 18, 2), (18, 19, 1), (19, 22, 2), (22, 27, 1),
    ]
    assert summarize(labels) == expected


def test_annotate_imperfect_repeat_run():
    motifs = [b"CAG", b"A"]
    hmm = build_hmm(motifs)
    labels = label_motifs(hmm, hmm.label("CAGCAGCTGCAGCAGAAACAG"))
    assert summarize(labels) == [(0, 15, 0), (15, 18, 1), (18, 21, 0)]


def test_parse_aga_repeat():
    motifs = [b"AAG", b"CAAC"]
    hmm = build_hmm(motifs)
    query = ("TCTATGCAACCAACTTTCTGTTAGTCATAGTACCCCAAGAAGAAGAAGAAGAAGAAGAAG"
             "AAGAAGAAGAAGAAGAAGAAGAAGAAGAAGAAGAATAGAAATGTGTTTAAGAATTCCTCA"
             "ATAAG")
    states = hmm.label(query)
    states = remove_imperfect_motifs(hmm, motifs, states, query.encode(), 6)
    labels = label_motifs(hmm, states)
    expected = [
        (0, 6, 2), (6, 14, 1), (14, 36, 2), (36, 93, 0), (93, 108, 2),
        (108, 111, 0), (111, 122, 2), (122, 125, 0),
    ]
    assert summarize(labels) == expected


def test_purity_perfect():
    motifs = [b"CAG", b"CCG"]
    hmm = build_hmm(motifs)
    query = "CAGCAGCAGCCGCCGCCGCCG"
    states = hmm.label(query)
    assert calc_purity(query.encode(), hmm, motifs, states) == 1.0


def test_purity_imperfect():
    motifs = [b"CAG", b"CCG"]
    hmm = build_hmm(motifs)
    query = "CAGCGCAGCCGCCGCCGGG"
    states = hmm.label(query)
    assert calc_purity(query.encode(), hmm, motifs, states) == 17.0 / 20.0


def test_purity_with_skip_states():
    motifs = [b"CAG", b"CCG"]
    hmm = build_hmm(motifs)
    query = "CAGCAGCAGTTTTTTTTCCGCCGCCG"
    states = hmm.label(query)
    assert calc_purity(query.encode(), hmm, motifs, states) == 18.0 / 26.0


def test_purity_polyalanine():
    motifs = [b"GCN"]
    hmm = build_hmm(motifs)
    query = "GCAGCCGCTGAG"
    states = hmm.label(query)
    assert calc_purity(query.encode(), hmm, motifs, states) == 11.0 / 12.0


def test_purity_empty_query():
    motifs = [b"CAG", b"CCG"]
    hmm = build_hmm(motifs)
    states = hmm.label("")
    assert math.isnan(calc_purity(b"", hmm, motifs, states))


def test_base_match():
    hmm = build_hmm([b"A"])
    assert get_base_match(hmm, 3) == ord("A")
    hmm = build_hmm([b"N"])
    assert get_base_match(hmm, 3) == ord("N")
