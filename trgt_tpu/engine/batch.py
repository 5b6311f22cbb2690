"""Device dispatch engine: routes the hot DP ops of the per-locus
workflow through batched device kernels.

Batching policy (SURVEY.md §7 "shape bucketing economics"): within a
locus, all (read × flank) alignment problems run as one semiglobal batch
and all allele/read labelings as one Viterbi batch; shapes are bucketed to
powers of two to bound compilation count. The exact-substring fast path
(ref: span_locater.rs:10-12) stays on host — in clean HiFi data most reads
hit it, and only the misses go to the device.
"""

import logging
from typing import List, Optional, Sequence, Tuple

import numpy as np

log = logging.getLogger("trgt")

Span = Tuple[int, int]


class DeviceEngine:
    """mode: 'auto' (use JAX default backend), 'host' (numpy only)."""

    def __init__(self, mode: str = "auto"):
        self.mode = mode
        self._backend = None

    @property
    def enabled(self) -> bool:
        if self.mode == "host":
            return False
        return True

    # ---- span location ----
    def batch_flank_aligner(self, lf_piece: bytes, rf_piece: bytes,
                            seqs: Sequence[bytes], threshold_frac: float,
                            scoring):
        """batch_aligner hook for genotype.span.find_tr_spans."""
        from ..kernels.semiglobal import flank_align_batch

        lf_spans: List[Optional[Span]] = [None] * len(seqs)
        rf_spans: List[Optional[Span]] = [None] * len(seqs)
        miss: List[Tuple[int, int, bytes]] = []  # (seq_idx, flank, piece)
        for which, piece, spans in ((0, lf_piece, lf_spans),
                                    (1, rf_piece, rf_spans)):
            for i, s in enumerate(seqs):
                start = s.find(piece)
                if start != -1:
                    spans[i] = (start, start + len(piece))
                else:
                    miss.append((i, which, piece))
        if miss:
            # both flank pieces have the same length → one batch
            texts = [seqs[i] for i, _, _ in miss]
            # group by flank piece (two sub-batches at most)
            for which_target, piece in ((0, lf_piece), (1, rf_piece)):
                idxs = [k for k, (_, w, _) in enumerate(miss)
                        if w == which_target]
                if not idxs:
                    continue
                sub_texts = [texts[k] for k in idxs]
                results = flank_align_batch(
                    piece, sub_texts, scoring.mism_scr, scoring.gapo_scr,
                    scoring.gape_scr)
                for k, (score, matches, span) in zip(idxs, results):
                    seq_idx = miss[k][0]
                    if float(matches) >= threshold_frac:
                        if which_target == 0:
                            lf_spans[seq_idx] = span
                        else:
                            rf_spans[seq_idx] = span
        return lf_spans, rf_spans

    # ---- HMM labeling ----
    def viterbi(self, hmm, queries: Sequence[str]) -> List[List[int]]:
        from ..kernels.viterbi import viterbi_batch
        return viterbi_batch(hmm, queries)

    # ---- cluster distances ----
    def pair_distances(self, trs: Sequence[bytes]) -> np.ndarray:
        from ..kernels.editdist import pairwise_distance_matrix
        return pairwise_distance_matrix(trs)


def make_engine(mode: str = "auto") -> Optional[DeviceEngine]:
    if mode == "host":
        return None
    return DeviceEngine(mode)
