"""decode_fast numpy twins == decode.py reference replicas, on real
Viterbi paths over randomized adversarial queries (mutations, indels,
multi-motif HMMs, 'N' bases, impure copies, multi-run paths)."""

import random

import pytest

from trgt_tpu.hmm.decode import (calc_purity, label_motifs,
                                 remove_imperfect_motifs)
from trgt_tpu.hmm.decode_fast import (fast_calc_purity, fast_label_motifs,
                                      fast_remove_imperfect_motifs)
from trgt_tpu.hmm.model import build_hmm

CASES = []
_rng = random.Random(7)
_MOTIF_SETS = [[b"CAG"], [b"A"], [b"CAG", b"CCG"], [b"GATA"],
               [b"AATGG", b"TG"], [b"CNG"], [b"CCATTTTAGG"]]
for mi, motifs in enumerate(_MOTIF_SETS):
    for rep in range(4):
        base = b"".join(motifs[_rng.randrange(len(motifs))]
                        for _ in range(_rng.randint(3, 25)))
        seq = bytearray(base.replace(b"N", b"A"))
        # point errors + indels to force ins/del/mismatch/skip states
        for _ in range(_rng.randint(0, max(1, len(seq) // 8))):
            op = _rng.random()
            p = _rng.randrange(len(seq))
            if op < 0.5:
                seq[p] = ord(_rng.choice("ACGT"))
            elif op < 0.75:
                seq.insert(p, ord(_rng.choice("ACGT")))
            elif len(seq) > 4:
                del seq[p]
        # occasional unrelated insert to force the skip block / multi-run
        if rep == 3:
            p = _rng.randrange(len(seq))
            junk = bytes(_rng.choice(b"ACGT") for _ in range(20))
            seq = seq[:p] + bytearray(junk) + seq[p:]
        CASES.append((mi, rep, motifs, bytes(seq)))


@pytest.mark.parametrize("mi,rep,motifs,query",
                         CASES, ids=[f"{m}-{r}" for m, r, _, _ in CASES])
def test_fast_decoders_match_reference(mi, rep, motifs, query):
    hmm = build_hmm(motifs)
    path = hmm.label(query.decode())
    assert fast_calc_purity(query, hmm, motifs, path) == \
        calc_purity(query, hmm, motifs, path)
    ref_spans = label_motifs(hmm, path)
    fast_spans = fast_label_motifs(hmm, path)
    assert [(s.motif_index, s.start, s.end) for s in fast_spans] == \
        [(s.motif_index, s.start, s.end) for s in ref_spans]
    ref_upd = remove_imperfect_motifs(hmm, motifs, path, query, 6)
    fast_upd = fast_remove_imperfect_motifs(hmm, motifs, path, query, 6)
    assert fast_upd == ref_upd
    # and the decoders agree on the rewritten path too
    assert fast_calc_purity(query, hmm, motifs, ref_upd) == \
        calc_purity(query, hmm, motifs, ref_upd)
    assert [(s.motif_index, s.start, s.end)
            for s in fast_label_motifs(hmm, ref_upd)] == \
        [(s.motif_index, s.start, s.end)
         for s in label_motifs(hmm, ref_upd)]


def test_empty_query_nan():
    import math
    hmm = build_hmm([b"CAG"])
    assert math.isnan(fast_calc_purity(b"", hmm, [b"CAG"], []))
