"""Batched ends-free affine flank alignment on device.

Replaces the reference's per-read WFA2 `align_ends_free` calls in the span
locater (ref: src/trgt/genotype/span_locater.rs:14-27) — the #1 hot loop
of `trgt genotype` (SURVEY.md §3.1).

TPU-first design:
  * One (read × flank) problem per batch row; all problems of a locus
    batch run as ONE device program.
  * The DP scans over the SHORT pattern axis (flank length P ≈ 250 steps)
    and vectorizes over the text axis (clipped read length, lanes) and the
    batch axis (sublanes) — O(P) sequential steps of (B, T) vector work.
  * The within-row affine gap chain (gap-in-pattern, consuming text) is an
    associative min-plus prefix scan along lanes (`lax.associative_scan`).
  * No traceback storage: match counts and first/last match text positions
    are carried forward along the optimal path ("forward-carry"), so the
    kernel's outputs are just 4 scalars per problem.

Cost model: match 0, mismatch `mism`, gap open `gapo`+`gape`, extend
`gape`; pattern global, text free at both ends — identical optimal costs
to WFA2's ends-free mode with those penalties.
"""

import functools
import logging
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .bucket import bucket as _bucket, chunk_ranges

import jax
import jax.numpy as jnp

INF = jnp.float32(1e9)
log = logging.getLogger("trgt")

# Pallas is the preferred TPU path (single fused kernel per dispatch vs
# one fused op per DP row); on the first Mosaic/compile failure we latch
# to the XLA kernel so every later dispatch skips the broken compile.
_PALLAS_BROKEN = False


def _use_pallas() -> bool:
    return (not _PALLAS_BROKEN
            and jax.default_backend() == "tpu"
            and os.environ.get("TRGT_TPU_KERNELS", "pallas") == "pallas")


def _po2(n: int, minimum: int) -> int:
    """Smallest power of two ≥ max(n, minimum)."""
    v = minimum
    while v < n:
        v *= 2
    return v


@functools.partial(jax.jit, static_argnames=("mism", "gapo", "gape",
                                             "use_ladder", "row_block"))
def _semiglobal_scan(pattern_toks, text_toks, mism: int, gapo: int,
                     gape: int, use_ladder: bool = True,
                     row_block: int = 8):
    """pattern_toks: (B, P) uint8; text_toks: (B, T) uint8 (255 = pad).

    Returns per-item (score (B,), matches (B,), first_match (B,),
    last_match (B,), end_j (B,)) — text span is [first, last+1).
    """
    B, P = pattern_toks.shape
    T = text_toks.shape[1]
    go_ge = jnp.float32(gapo + gape)
    ge = jnp.float32(gape)
    mism_f = jnp.float32(mism)

    j_idx = jnp.arange(T + 1, dtype=jnp.float32)          # (T+1,)
    j_int = jnp.arange(T + 1, dtype=jnp.int32)

    # initial row i=0: H = 0 (free text start), D = INF
    H0 = jnp.zeros((B, T + 1), dtype=jnp.float32)
    D0 = jnp.full((B, T + 1), INF, dtype=jnp.float32)
    M0 = jnp.zeros((B, T + 1), dtype=jnp.float32)         # match counts
    FS0 = jnp.full((B, T + 1), -1.0, dtype=jnp.float32)   # first match j
    LS0 = jnp.full((B, T + 1), -1.0, dtype=jnp.float32)   # last match j
    MD0, FSD0, LSD0 = M0, FS0, LS0                        # payload of D

    def prefix_min_with_payload(base, payloads):
        # Hillis-Steele min-scan carrying payload arrays through the same
        # selection masks — NO gathers (dynamic gathers in a scan body are
        # a compile catastrophe on TPU). Tie rule: later (larger-k) wins.
        v = base
        ps = list(payloads)
        shift = 1
        width = base.shape[1]
        Bn = base.shape[0]
        while shift < width:
            sv = jnp.concatenate(
                [jnp.full((Bn, shift), INF), v[:, :-shift]], axis=1)
            take = sv < v
            v = jnp.where(take, sv, v)
            for k in range(len(ps)):
                sp = jnp.concatenate(
                    [jnp.zeros((Bn, shift), ps[k].dtype),
                     ps[k][:, :-shift]], axis=1)
                ps[k] = jnp.where(take, sp, ps[k])
            shift *= 2
        return v, ps

    def one_row(carry, p_tok):
        (H_prev, D_prev, M_H, FS_H, LS_H, M_D, FS_D, LS_D) = carry

        # D: gap in text (consume pattern), from previous row
        d_open = H_prev + go_ge
        d_ext = D_prev + ge
        take_ext = d_ext < d_open                        # tie prefers open
        D_row = jnp.where(take_ext, d_ext, d_open)
        M_Dr = jnp.where(take_ext, M_D, M_H)
        FS_Dr = jnp.where(take_ext, FS_D, FS_H)
        LS_Dr = jnp.where(take_ext, LS_D, LS_H)

        # diagonal: H_prev[j-1] + sub
        is_match = (text_toks == p_tok[:, None])         # (B, T)
        subcost = jnp.where(is_match, 0.0, mism_f)
        H_shift = jnp.concatenate(
            [jnp.full((B, 1), INF), H_prev[:, :-1]], axis=1)
        M_Hs = jnp.concatenate([M_H[:, :1] * 0, M_H[:, :-1]], axis=1)
        FS_Hs = jnp.concatenate([FS_H[:, :1] * 0 - 1, FS_H[:, :-1]], axis=1)
        LS_Hs = jnp.concatenate([LS_H[:, :1] * 0 - 1, LS_H[:, :-1]], axis=1)
        diag = jnp.concatenate(
            [jnp.full((B, 1), INF),
             H_prev[:, :-1] + subcost], axis=1)
        m_here = jnp.concatenate(
            [jnp.zeros((B, 1), dtype=bool), is_match], axis=1)
        # after a diagonal step into column j, the consumed text char is j-1
        M_diag = M_Hs + m_here.astype(jnp.float32)
        # WFA span recovery runs first→last M-or-X column (ref:
        # src/wfaligner.rs:888-905): FS/LS update on EVERY diagonal step,
        # match or mismatch. Column 0's diag candidate is INF so its
        # payload is never selected (and j_idx-1 there is the -1 sentinel).
        FS_diag = jnp.where(FS_Hs < 0, j_idx - 1, FS_Hs)
        LS_diag = jnp.zeros_like(LS_Hs) + (j_idx - 1.0)

        # H without I (priority: diag wins ties over D)
        take_d = D_row < diag
        H_noI = jnp.where(take_d, D_row, diag)
        M_n = jnp.where(take_d, M_Dr, M_diag)
        FS_n = jnp.where(take_d, FS_Dr, FS_diag)
        LS_n = jnp.where(take_d, LS_Dr, LS_diag)

        # I: gap in pattern (consume text) — prefix min along lanes of
        # (H_noI[k] + gapo - gape*k); I[j] = scan[j-1] + gape*j
        base = H_noI + go_ge - ge * j_idx[None, :] - ge
        # note: open at k, first gap col k+1 → cost H_noI[k]+gapo+gape*(j-k)
        zero_col = jnp.zeros((B, 1), jnp.float32)
        if use_ladder:
            # TPU: payloads carried through the ladder — dynamic gathers
            # in a scan body are a compile catastrophe there
            vals, (pm, pfs, pls) = prefix_min_with_payload(
                base, (M_n, FS_n, LS_n))
            M_I = jnp.concatenate([zero_col, pm[:, :-1]], axis=1)
            FS_I = jnp.concatenate([zero_col - 1, pfs[:, :-1]], axis=1)
            LS_I = jnp.concatenate([zero_col - 1, pls[:, :-1]], axis=1)
        else:
            # CPU: value+argmin ladder, payloads fetched with one gather
            vals, (kvals,) = prefix_min_with_payload(
                base, (jnp.broadcast_to(
                    j_int[None, :], base.shape).astype(jnp.float32),))
            k_star = jnp.concatenate(
                [jnp.zeros((B, 1), jnp.int32),
                 kvals[:, :-1].astype(jnp.int32)], axis=1)
            M_I = jnp.take_along_axis(M_n, k_star, axis=1)
            FS_I = jnp.take_along_axis(FS_n, k_star, axis=1)
            LS_I = jnp.take_along_axis(LS_n, k_star, axis=1)
        I_row = jnp.concatenate(
            [jnp.full((B, 1), INF),
             vals[:, :-1] + ge * (j_idx[1:])[None, :]], axis=1)

        # H (priority: H_noI wins ties over I)
        take_i = I_row < H_noI
        H_row = jnp.where(take_i, I_row, H_noI)
        M_out = jnp.where(take_i, M_I, M_n)
        FS_out = jnp.where(take_i, FS_I, FS_n)
        LS_out = jnp.where(take_i, LS_I, LS_n)

        # padded rows (token 0) leave the carry unchanged
        active = (p_tok != 0)[:, None]
        old = (H_prev, D_prev, M_H, FS_H, LS_H, M_D, FS_D, LS_D)
        new = (H_row, D_row, M_out, FS_out, LS_out, M_Dr, FS_Dr, LS_Dr)
        return tuple(jnp.where(active, n, o) for n, o in zip(new, old))

    ROW_BLOCK = row_block  # rows per scan step — fewer launches, same math

    def row_step(carry, rows_in):
        # rows_in: (ROW_BLOCK, B)
        for r in range(ROW_BLOCK):
            carry = one_row(carry, rows_in[r])
        return carry, None

    P_pad = ((P + ROW_BLOCK - 1) // ROW_BLOCK) * ROW_BLOCK
    pat = jnp.pad(pattern_toks, ((0, 0), (0, P_pad - P)))
    rows = pat.T.reshape(P_pad // ROW_BLOCK, ROW_BLOCK, B)

    carry = (H0, D0, M0, FS0, LS0, MD0, FSD0, LSD0)
    carry, _ = jax.lax.scan(row_step, carry, rows)
    H_fin, _, M_fin, FS_fin, LS_fin, _, _, _ = carry

    return H_fin, M_fin, FS_fin, LS_fin


@functools.partial(jax.jit, static_argnames=("mism", "gapo", "gape",
                                             "use_ladder"))
def _semiglobal_scan_finalized(pattern_toks, text_toks, lens, mism: int,
                               gapo: int, gape: int,
                               use_ladder: bool = True):
    """Like _semiglobal_scan but reduces to per-item scalars on device
    (score, matches, first, last) — the full rows never leave the chip,
    which matters when host↔device bandwidth is the bottleneck."""
    H_fin, M_fin, FS_fin, LS_fin = _semiglobal_scan(
        pattern_toks, text_toks, mism, gapo, gape, use_ladder=use_ladder,
        row_block=8 if use_ladder else 1)
    T1 = H_fin.shape[1]
    j_int = jnp.arange(T1, dtype=jnp.int32)
    masked = jnp.where(j_int[None, :] <= lens[:, None], H_fin, INF)
    j_end = jnp.argmin(masked, axis=1)                  # first min
    take = lambda A: jnp.take_along_axis(A, j_end[:, None], axis=1)[:, 0]
    return take(masked), take(M_fin), take(FS_fin), take(LS_fin)


def _tokenize(seqs: Sequence[bytes], length: int, pad: int) -> np.ndarray:
    """Raw-byte tokens (the reference compares raw bytes, so identical
    non-ACGT characters count as matches); pad byte 0 never occurs in
    sequence data."""
    out = np.full((len(seqs), length), pad, dtype=np.uint8)
    for i, s in enumerate(seqs):
        arr = np.frombuffer(s, dtype=np.uint8)[:length]
        out[i, :len(arr)] = arr
    return out




def flank_align_batch_multi(patterns: Sequence[bytes],
                            seqs: Sequence[bytes], mism: int, gapo: int,
                            gape: int, cancelled=lambda: False):
    """Batched ends-free alignment with a per-item pattern (all patterns
    must have equal length — flank pieces always do). Large batches are
    chunked to a bounded batch dimension (compile-time control).

    `cancelled` is polled between bucket/chunk dispatches: a raced
    device side that lost must stop occupying the serialized link.

    Returns list of (score, n_matches, (text_start, text_end))."""
    if not seqs:
        return []
    if cancelled():
        raise InterruptedError("raced device side cancelled")
    assert len(patterns) == len(seqs)
    global _PALLAS_BROKEN
    # group by text-length bucket so short texts don't pad to the
    # longest (on a heterogeneous catalog the clipped reads span
    # ~0.5kb-12kb; without bucketing the padded-cell waste measured
    # ~15x, costing far more than the extra per-bucket dispatches even
    # over the high-latency tunnel). Buckets are powers of two with a
    # 512 floor: waste ≤2x while the distinct compile-shape count stays
    # small (each new Mosaic shape costs ~2min over the tunnel).
    buckets = {}
    for i, s in enumerate(seqs):
        buckets.setdefault(_po2(len(s) + 1, 512), []).append(i)
    if len(buckets) > 1:
        out = [None] * len(seqs)
        for _tb, idxs in sorted(buckets.items()):
            sub = flank_align_batch_multi(
                [patterns[i] for i in idxs], [seqs[i] for i in idxs],
                mism, gapo, gape, cancelled=cancelled)
            for i, r in zip(idxs, sub):
                out[i] = r
        return out
    # the Pallas kernel's VMEM budget tops out at W=8192 (the fori-loop
    # carry holds 8 f32 rows + double-buffered inputs; W=16384 blows the
    # 16MB scoped limit even at the minimum block) — the rare >8kb-read
    # bucket runs on the XLA kernel instead
    if _use_pallas() and _po2(max(len(s) for s in seqs) + 1, 512) <= 8192:
        from .semiglobal_pallas import flank_align_leaf_pallas
        try:
            out = []
            for lo, hi in chunk_ranges(len(seqs), 4096):
                if cancelled():
                    raise InterruptedError("raced device side cancelled")
                out.extend(flank_align_leaf_pallas(
                    patterns[lo:hi], seqs[lo:hi], mism, gapo, gape,
                    interpret=False))
            return out
        except InterruptedError:
            raise
        except Exception as e:
            _PALLAS_BROKEN = True
            log.warning("Pallas flank kernel failed (%s); using the XLA "
                        "kernel for the rest of the run", e)
    if len(seqs) > 512:
        out = []
        for lo, hi in chunk_ranges(len(seqs)):
            if cancelled():
                raise InterruptedError("raced device side cancelled")
            out.extend(flank_align_batch_multi(
                patterns[lo:hi], seqs[lo:hi], mism, gapo, gape))
        return out
    plen = len(patterns[0])
    assert all(len(p) == plen for p in patterns)
    from .. import mesh
    from . import telemetry
    T = _bucket(max(len(s) for s in seqs))
    B = mesh.batch_bucket(len(seqs))
    telemetry.add_cells("span", B * plen * (T + 1))
    text_toks = np.zeros((B, T), dtype=np.uint8)
    text_toks[:len(seqs)] = _tokenize(seqs, T, pad=0)
    pattern_toks = np.zeros((B, plen), dtype=np.uint8)
    pattern_toks[:len(patterns)] = _tokenize(patterns, plen, pad=0)

    lens = np.zeros(B, dtype=np.int32)
    lens[:len(seqs)] = [len(s) for s in seqs]
    use_ladder = jax.default_backend() == "tpu"
    score_a, m_a, fs_a, ls_a = _semiglobal_scan_finalized(
        mesh.put_batch(pattern_toks), mesh.put_batch(text_toks),
        mesh.put_batch(lens), mism, gapo, gape, use_ladder=use_ladder)
    score_a = np.asarray(score_a)
    m_a = np.asarray(m_a)
    fs_a = np.asarray(fs_a)
    ls_a = np.asarray(ls_a)

    results = []
    for b in range(len(seqs)):
        score = float(score_a[b])
        matches = int(m_a[b])
        fs = int(fs_a[b])
        ls = int(ls_a[b])
        if fs < 0:
            results.append((score, 0, (0, 0)))
        else:
            results.append((score, matches, (fs, ls + 1)))
    return results


def flank_align_batch(pattern: bytes, seqs: Sequence[bytes], mism: int,
                      gapo: int, gape: int):
    """Batched ends-free alignment of one pattern against many texts."""
    return flank_align_batch_multi([pattern] * len(seqs), seqs, mism, gapo,
                                   gape)
