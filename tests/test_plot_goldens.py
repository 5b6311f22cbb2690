"""Plot segmentation content goldens (VERDICT r4 next #8).

Pins exact AlignSeg sequences (width, op, seg_type) for hand-derived
inputs, so a regression in HMM event→segment conversion
(plot/align.py, ref src/trvz/align_consensus.rs:9-122) or in the
WFA→segment projection (plots._convert_read_align, ref
align_reads.rs:31-113) fails loudly instead of silently redrawing
plots wrong.

Hand derivation notes:
- motifs ≤ 6bp: remove_imperfect_motifs (threshold 6,
  align_consensus.rs:41 / hmm/operations.rs:6-80) replaces imperfect
  copies with SKIP states, so errors surface as a skip segment
  (seg_type = Tr(len(motifs))) rendered as 'match', not as
  subst/ins/del.
- motifs > 6bp keep imperfect copies: a substituted base is one
  1-wide 'subst'; an extra query base is a 1-wide 'del' (HmmEvent::Ins
  → AlignOp::Del, align_consensus.rs:74-78 — op names describe the
  rendered consensus track); a missing query base is a 0-wide 'ins'
  (HmmEvent::Del → AlignOp::Ins, align_consensus.rs:69-73).
"""

from trgt_tpu.plot.align import AlignSeg, align_motifs, e2e_align
from trgt_tpu.plot.plots import _convert_read_align


def flat(align):
    return [(s.width, s.op, s.seg_type) for s in align]


def test_perfect_repeat_single_segment():
    assert flat(align_motifs([b"CAG"], "CAGCAGCAG")) == [
        (9, "match", ("tr", 0))]


def test_short_motif_errors_become_skip_segments():
    # imperfect CAG copies (subst / 1bp ins / 1bp del) are replaced by
    # the skip block → middle segment labelled Tr(1) == len(motifs)
    assert flat(align_motifs([b"CAG"], "CAGCTGCAG")) == [
        (3, "match", ("tr", 0)), (3, "match", ("tr", 1)),
        (3, "match", ("tr", 0))]
    assert flat(align_motifs([b"CAG"], "CAGCAAGCAG")) == [
        (3, "match", ("tr", 0)), (4, "match", ("tr", 1)),
        (3, "match", ("tr", 0))]
    assert flat(align_motifs([b"CAG"], "CAGCGCAG")) == [
        (3, "match", ("tr", 0)), (2, "match", ("tr", 1)),
        (3, "match", ("tr", 0))]


def test_two_motif_segmentation():
    assert flat(align_motifs([b"CAG", b"CCG"], "CAGCAGCCGCCG")) == [
        (6, "match", ("tr", 0)), (6, "match", ("tr", 1))]


def test_non_repeat_run_is_skip_segment():
    assert flat(align_motifs([b"CAG"], "CAGTTTTTTTTCAG")) == [
        (3, "match", ("tr", 0)), (8, "match", ("tr", 1)),
        (3, "match", ("tr", 0))]


def test_long_motif_substitution():
    seq = "CAGCAGC" + "CAGTAGC" + "CAGCAGC"
    assert flat(align_motifs([b"CAGCAGC"], seq)) == [
        (10, "match", ("tr", 0)), (1, "subst", ("tr", 0)),
        (10, "match", ("tr", 0))]


def test_long_motif_query_insertion_is_del_op():
    seq = "CAGCAGC" + "CAGCAAGC" + "CAGCAGC"
    assert flat(align_motifs([b"CAGCAGC"], seq)) == [
        (11, "match", ("tr", 0)), (1, "del", ("tr", 0)),
        (10, "match", ("tr", 0))]


def test_long_motif_query_deletion_is_zero_width_ins_op():
    seq = "CAGCAGC" + "CAGCGC" + "CAGCAGC"
    assert flat(align_motifs([b"CAGCAGC"], seq)) == [
        (11, "match", ("tr", 0)), (0, "ins", ("tr", 0)),
        (9, "match", ("tr", 0))]


def test_align_consensus_wraps_flanks():
    from trgt_tpu.plot.align import align_consensus

    class L:
        left_flank = "TTTT"
        right_flank = "GGG"
        motifs = ["CAG"]

    cons = "TTTT" + "CAGCAGCAG" + "GGG"
    assert flat(align_consensus(L, cons)) == [
        (4, "match", ("lf",)), (9, "match", ("tr", 0)),
        (3, "match", ("rf",))]


def test_convert_read_align_projects_deletion():
    # read missing one consensus base: WFA ops MMMMMMDMM → the D
    # becomes a 1-wide 'del' segment carrying the consensus seg_type
    cons, read = "CAGCAGCAG", "CAGCAGAG"
    ca = align_motifs([b"CAG"], cons)
    wfa = e2e_align(cons.encode(), read.encode())
    assert "".join(wfa.operations) == "MMMMMMDMM"
    assert flat(_convert_read_align(ca, wfa)) == [
        (6, "match", ("tr", 0)), (1, "del", ("tr", 0)),
        (2, "match", ("tr", 0))]


def test_convert_read_align_projects_insertion():
    cons, read = "CAGCAGCAG", "CAGCAGTCAG"
    ca = align_motifs([b"CAG"], cons)
    wfa = e2e_align(cons.encode(), read.encode())
    conv = flat(_convert_read_align(ca, wfa))
    # one extra read base: a zero-consensus-width 'ins' segment
    assert ("".join(wfa.operations)).count("I") == 1
    assert sum(1 for w, op, st in conv if op == "ins") == 1
    assert sum(w for w, op, st in conv if op in ("match", "subst",
                                                 "del")) == len(cons)
