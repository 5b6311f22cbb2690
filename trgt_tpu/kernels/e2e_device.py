"""Batched end-to-end affine alignment with CIGAR on device.

Replaces the consensus-repair WFA2 calls (ref: src/utils/align.rs:14-28,
affine 2,5,1) for batches of (backbone × read) problems. The device scan
emits 4 packed direction bits per cell — H-choice (diag/D/I), D-extend,
I-extend — and the CIGAR is recovered by a linear host traceback.

Tie-breaking: diagonal ≻ D(gap-in-text) ≻ I(gap-in-pattern); gap open
preferred over extend on equal cost; I runs open at the latest optimal
column. Scores are always optimal; on exact ties the chosen co-optimal
path may differ from the numpy host kernel's.
"""

import functools
from typing import List, Sequence, Tuple

import numpy as np

from .bucket import bucket as _bucket, chunk_ranges

import jax
import jax.numpy as jnp

INF = jnp.float32(1e9)

CigarOps = List[Tuple[int, str]]

# Memory bounds for the (P+1, B, T+1) direction-bit traceback tensor:
# problems above MAX_DEVICE_CELLS per pair route to the host aligner
# (which delegates to the Myers-Miller linear-memory path when large —
# the analog of WFA MemoryUltraLow, ref: src/wfaligner.rs:173-181 used by
# src/commands/genotype.rs:82-92); below it, the batch dimension is
# chunked so one dispatch never materializes more than
# TRACEBACK_BUDGET_BYTES of direction bits.
MAX_DEVICE_CELLS = 1 << 20
TRACEBACK_BUDGET_BYTES = 1 << 27


@functools.partial(jax.jit, static_argnames=("mism", "gapo", "gape"))
def _e2e_scan(pattern_toks, text_toks, mism: int, gapo: int, gape: int):
    """pattern (B,P) uint8 (0 pad), text (B,T) uint8 (0 pad).
    Returns (H_fin (B,T+1), packed direction bits
    (P+1, B, ceil((T+1)/2)) uint8 — two 4-bit cells per byte, packed on
    device so the host fetch moves half the bytes; the traceback cost
    of a remote link is the dominant term of this kernel's latency)."""
    B, P = pattern_toks.shape
    T = text_toks.shape[1]
    go_ge = jnp.float32(gapo + gape)
    ge = jnp.float32(gape)
    mism_f = jnp.float32(mism)
    j_idx = jnp.arange(T + 1, dtype=jnp.float32)
    j_int = jnp.arange(T + 1, dtype=jnp.int32)

    # row 0: H[0,j] = gapo + gape*j (leading I run), H[0,0] = 0
    H0 = jnp.where(j_idx[None, :] == 0, 0.0,
                   jnp.float32(gapo) + ge * j_idx[None, :])
    H0 = jnp.broadcast_to(H0, (B, T + 1))
    D0 = jnp.full((B, T + 1), INF)
    # bits row 0: choice I (2), I-ext for j >= 2
    bits0 = jnp.where(j_int[None, :] == 0, 0,
                      jnp.where(j_int[None, :] == 1, 2, 2 | 8))
    bits0 = jnp.broadcast_to(bits0, (B, T + 1)).astype(jnp.uint8)

    def prefix_min_with_idx(base):
        # Hillis-Steele min-scan with argmin; tie keeps the later k
        v = base
        idx = jnp.broadcast_to(j_int[None, :], base.shape)
        shift = 1
        width = base.shape[1]
        while shift < width:
            sv = jnp.concatenate(
                [jnp.full((base.shape[0], shift), INF), v[:, :-shift]],
                axis=1)
            sidx = jnp.concatenate(
                [jnp.zeros((base.shape[0], shift), jnp.int32),
                 idx[:, :-shift]], axis=1)
            take = sv < v
            v = jnp.where(take, sv, v)
            idx = jnp.where(take, sidx, idx)
            shift *= 2
        return v, idx

    def row_step(carry, p_tok):
        H_prev, D_prev = carry
        d_open = H_prev + go_ge
        d_ext = D_prev + ge
        take_ext = d_ext < d_open
        D_row = jnp.where(take_ext, d_ext, d_open)

        is_match = text_toks == p_tok[:, None]
        subcost = jnp.where(is_match, 0.0, mism_f)
        diag = jnp.concatenate(
            [jnp.full((B, 1), INF), H_prev[:, :-1] + subcost], axis=1)

        take_d = D_row < diag
        H_noI = jnp.where(take_d, D_row, diag)

        base = H_noI + go_ge - ge * j_idx[None, :] - ge
        vals, idxs = prefix_min_with_idx(base)
        I_row = jnp.concatenate(
            [jnp.full((B, 1), INF),
             vals[:, :-1] + ge * (j_idx[1:])[None, :]], axis=1)
        k_star = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32), idxs[:, :-1]], axis=1)

        take_i = I_row < H_noI
        H_row = jnp.where(take_i, I_row, H_noI)

        choice = jnp.where(take_i, 2, jnp.where(take_d, 1, 0))
        d_ext_bit = take_ext.astype(jnp.int32) << 2
        i_ext_bit = (k_star != (j_int[None, :] - 1)).astype(jnp.int32) << 3
        bits = (choice | d_ext_bit | i_ext_bit).astype(jnp.uint8)
        return (H_row, D_row), bits

    (H_fin, _), bits_rows = jax.lax.scan(row_step, (H0, D0),
                                         pattern_toks.T)
    bits = jnp.concatenate([bits0[None], bits_rows], axis=0)
    # nibble-pack along the column axis (cell values fit in 4 bits:
    # 2-bit choice + D-ext + I-ext)
    T1 = T + 1
    if T1 % 2:
        bits = jnp.pad(bits, ((0, 0), (0, 0), (0, 1)))
    packed = bits[..., 0::2] | (bits[..., 1::2] << 4)
    return H_fin, packed


def _traceback(bits: np.ndarray, pattern: bytes, text: bytes) -> CigarOps:
    i, j = len(pattern), len(text)
    ops: List[str] = []
    while i > 0 or j > 0:
        b = bits[i, j]
        choice = b & 3
        if i == 0:
            choice = 2 if j > 0 else 0
        if j == 0 and i > 0:
            choice = 1
        if choice == 0:
            ops.append("=" if pattern[i - 1] == text[j - 1] else "X")
            i -= 1
            j -= 1
        elif choice == 1:
            # D run: consume pattern while extend bit set
            ops.append("D")
            ext = bool(b & 4)
            i -= 1
            while ext and i > 0:
                b = bits[i, j]
                ops.append("D")
                ext = bool(b & 4)
                i -= 1
        else:
            ops.append("I")
            ext = bool(b & 8)
            j -= 1
            while ext and j > 0:
                b = bits[i, j]
                ops.append("I")
                ext = bool(b & 8)
                j -= 1
    ops.reverse()
    out: CigarOps = []
    for op in ops:
        if out and out[-1][1] == op:
            out[-1] = (out[-1][0] + 1, op)
        else:
            out.append((1, op))
    return out


def e2e_align_batch(pattern_texts: Sequence[Tuple[bytes, bytes]],
                    mism: int, gapo: int, gape: int,
                    cancelled=lambda: False):
    """Batched global affine alignment; returns [(score, cigar)] with
    '='/'X'/'I'/'D' ops ('I' consumes text, 'D' consumes pattern).

    `cancelled` is polled between bucket/chunk dispatches: a raced
    device side that lost must stop occupying the serialized link."""
    if not pattern_texts:
        return []
    if cancelled():
        raise InterruptedError("raced device side cancelled")
    # group by (pattern, text) length buckets to bound padding waste
    buckets = {}
    for i, (p, t) in enumerate(pattern_texts):
        key = (_bucket(max(len(p), 1)), _bucket(max(len(t), 1)))
        buckets.setdefault(key, []).append(i)
    if len(buckets) > 1:
        out = [None] * len(pattern_texts)
        for _key, idxs in sorted(buckets.items()):
            sub = e2e_align_batch([pattern_texts[i] for i in idxs],
                                  mism, gapo, gape, cancelled=cancelled)
            for i, r in zip(idxs, sub):
                out[i] = r
        return out
    bP = _bucket(max(len(pattern_texts[0][0]), 1)) + 1
    bT = _bucket(max(len(pattern_texts[0][1]), 1)) + 1
    if bP * bT > MAX_DEVICE_CELLS:
        from .align_host import align_end_to_end
        if len(pattern_texts) > 1:
            # numpy row passes release the GIL → thread the per-pair
            # host alignments (results identical; order preserved)
            from concurrent.futures import ThreadPoolExecutor
            import os as _os
            with ThreadPoolExecutor(min(len(pattern_texts),
                                        _os.cpu_count() or 2)) as pool:
                return list(pool.map(
                    lambda pt: align_end_to_end(pt[0], pt[1], mism,
                                                gapo, gape),
                    pattern_texts))
        return [align_end_to_end(p, t, mism, gapo, gape)
                for p, t in pattern_texts]
    max_chunk = max(1, min(512, TRACEBACK_BUDGET_BYTES // (bP * bT)))
    if len(pattern_texts) > max_chunk:
        out = []
        for lo, hi in chunk_ranges(len(pattern_texts), max_chunk):
            if cancelled():
                raise InterruptedError("raced device side cancelled")
            out.extend(e2e_align_batch(pattern_texts[lo:hi], mism, gapo,
                                       gape))
        return out
    results = [None] * len(pattern_texts)
    todo = []
    for idx, (p, t) in enumerate(pattern_texts):
        if len(p) == 0:
            cig = [(len(t), "I")] if t else []
            results[idx] = ((gapo + gape * len(t)) if t else 0, cig)
        elif len(t) == 0:
            results[idx] = (gapo + gape * len(p), [(len(p), "D")])
        else:
            todo.append(idx)
    if not todo:
        return results
    from .. import mesh
    from . import telemetry
    P = _bucket(max(len(pattern_texts[i][0]) for i in todo))
    T = _bucket(max(len(pattern_texts[i][1]) for i in todo))
    B = mesh.batch_bucket(len(todo))
    telemetry.add_cells("consensus", B * P * (T + 1))
    p_toks = np.zeros((B, P), dtype=np.uint8)
    t_toks = np.zeros((B, T), dtype=np.uint8)
    for b, idx in enumerate(todo):
        p, t = pattern_texts[idx]
        p_toks[b, :len(p)] = np.frombuffer(p, dtype=np.uint8)
        t_toks[b, :len(t)] = np.frombuffer(t, dtype=np.uint8)
    H_fin, packed = _e2e_scan(mesh.put_batch(p_toks),
                              mesh.put_batch(t_toks), mism, gapo, gape)
    del H_fin
    packed = np.asarray(packed)                 # the only device fetch
    bits = np.empty((packed.shape[0], packed.shape[1],
                     packed.shape[2] * 2), dtype=np.uint8)
    bits[..., 0::2] = packed & 0xF
    bits[..., 1::2] = packed >> 4
    for b, idx in enumerate(todo):
        p, t = pattern_texts[idx]
        # bits rows beyond len(p) used padded pattern chars — but the DP
        # is causal in rows, so rows 0..len(p) are exact for this item
        cigar = _traceback(bits[:, b, :], p, t)
        cost = 0
        for length, op in cigar:
            if op == "X":
                cost += mism * length
            elif op in "ID":
                cost += gapo + gape * length
        results[idx] = (cost, cigar)
    return results
