"""Consensus building (ref: src/trgt/genotype/consensus.rs)."""

from collections import Counter
from typing import List, Optional, Sequence, Tuple

from ..kernels.align_host import align_end_to_end

CigarOps = List[Tuple[int, str]]

_BASE_INDEX = {ord("A"): 0, ord("T"): 1, ord("C"): 2, ord("G"): 3}
_INDEX_BASE = "ATCG"


def align_batch(backbone: str, seqs: Sequence[str],
                scoring=(2, 5, 1)) -> List[CigarOps]:
    """Align each seq against the backbone (ref: src/utils/align.rs:14-28,
    consensus aligner affine(2,5,1)). Deduplicated: the alignment is a
    pure function of (backbone, seq), and deep loci repeat identical
    read sequences, so each distinct seq is aligned once and the CIGAR
    shared (identical output to the per-read loop)."""
    mism, gapo, gape = scoring
    bb = backbone.encode()
    cache = {}
    out = []
    for s in seqs:
        cig = cache.get(s)
        if cig is None:
            cig = align_end_to_end(bb, s.encode(), mism, gapo, gape)[1]
            cache[s] = cig
        out.append(cig)
    return out


def repair_consensus(reference: str, seqs: Sequence[str],
                     aligns: Sequence[CigarOps]) -> str:
    # ref: consensus.rs:5-72 — per-column base/deletion voting + majority
    # insertions
    ref_counts = [[0, 0, 0, 0, 0] for _ in range(len(reference))]
    ref_inserts: List[List[str]] = [[] for _ in range(len(reference) + 1)]
    for seq_index, operations in enumerate(aligns):
        seq = seqs[seq_index]
        x_pos = 0
        y_pos = 0
        for op_len, op in operations:
            if op in ("=", "M", "X"):
                piece = seq[x_pos:x_pos + op_len]
                for offset, base in enumerate(piece.encode()):
                    ref_counts[y_pos + offset][_BASE_INDEX[base]] += 1
                x_pos += op_len
                y_pos += op_len
            elif op == "D":
                for offset in range(op_len):
                    ref_counts[y_pos + offset][4] += 1
                y_pos += op_len
            elif op == "I":
                ref_inserts[y_pos].append(seq[x_pos:x_pos + op_len])
                x_pos += op_len
            else:
                raise ValueError(f"Unexpected CIGAR operation: {op}")

    consensus_indexes = []
    for rec in ref_counts:
        best = max(range(5), key=lambda k: rec[k])
        consensus_indexes.append(best)

    consensus = []
    for ref_pos, base_index in enumerate(consensus_indexes):
        if len(ref_inserts[ref_pos]) > len(seqs) // 2:
            consensus.append(_ins_consensus(ref_inserts[ref_pos], len(seqs)))
        if base_index != 4:
            consensus.append(_INDEX_BASE[base_index])
    return "".join(consensus)


def _ins_consensus(ins_by_read: List[str], num_reads: int) -> str:
    # ref: consensus.rs:96-113 — most frequent insertion (ties: sorted order
    # puts the lexicographically smallest first), kept only if more reads
    # have it than lack any insertion
    ins_by_read = sorted(ins_by_read)
    reads_without_ins = num_reads - len(ins_by_read)
    groups: List[Tuple[str, int]] = []
    for ins in ins_by_read:
        if groups and groups[-1][0] == ins:
            groups[-1] = (ins, groups[-1][1] + 1)
        else:
            groups.append((ins, 1))
    # stable sort by count desc (matches itertools sorted_by on count)
    groups.sort(key=lambda g: -g[1])
    top_ins, ins_count = groups[0]
    return top_ins if ins_count > reads_without_ins else ""


def get_consensus(sizes: Sequence[int], seqs: Sequence[str],
                  counts: Sequence[int]) -> List[str]:
    # ref: consensus.rs:117-131
    consensuses = []
    allele = _closest_size(seqs, sizes[0])
    consensuses.append(_most_frequent_seq(seqs, counts, allele))
    if len(sizes) != 1 and sizes[0] != sizes[1]:
        allele = _closest_size(seqs, sizes[1])
        consensuses.append(_most_frequent_seq(seqs, counts, allele))
    return consensuses


def _closest_size(seqs: Sequence[str], allele: int) -> Optional[int]:
    # ref: consensus.rs:133-150
    closest = None
    for seq in seqs:
        read_len = len(seq)
        if closest is None:
            closest = read_len
            continue
        if abs(closest - allele) > abs(read_len - allele):
            closest = read_len
    return closest


def _most_frequent_seq(seqs: Sequence[str], counts: Sequence[int],
                       length: int) -> str:
    # ref: consensus.rs:152-163 — max_by_key keeps the LAST maximal element
    best_seq = None
    best_count = -1
    for seq, count in zip(seqs, counts):
        if len(seq) == length and count >= best_count:
            best_seq, best_count = seq, count
    assert best_seq is not None
    return best_seq
