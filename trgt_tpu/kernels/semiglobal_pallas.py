"""Pallas TPU kernel: batched ends-free affine flank alignment.

Mosaic port of kernels/semiglobal.py (the #1 hot op of `genotype`,
ref: src/trgt/genotype/span_locater.rs). All DP state — cost rows for the
H/D lattices plus the forward-carried match-count / first-match /
last-match payloads — lives in VMEM scratch across the whole scan; the
grid walks the P pattern rows sequentially, each step a (B, T+1) VPU row
update. The within-row affine insertion chain is a Hillis-Steele min-plus
prefix scan that carries its payloads through the same selection masks,
so no gather ops are needed.

Semantics match the jnp/XLA kernel exactly (same tie-break rules:
diagonal ≻ D ≻ I; gap-open preferred over extend on ties; later gap-open
column preferred within a row).
"""

import functools

import numpy as np

from .bucket import bucket as _bucket

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = 1e9


def _row_kernel(mism_go_ge_ref, pattern_ref, text_ref,
                h_out, m_out, fs_out, ls_out,
                H, D, MH, FSH, LSH, MD, FSD, LSD):
    i = pl.program_id(1)
    num_rows = pl.num_programs(1)
    B = H.shape[0]
    T1 = H.shape[1]
    # Mosaic iota must be integer-typed; convert to f32 afterwards
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (B, T1), 1).astype(
        jnp.float32)
    mism = mism_go_ge_ref[0]
    go_ge = mism_go_ge_ref[1]
    ge = mism_go_ge_ref[2]

    @pl.when(i == 0)
    def _():
        H[:, :] = jnp.zeros((B, T1), jnp.float32)
        D[:, :] = jnp.full((B, T1), INF, jnp.float32)
        MH[:, :] = jnp.zeros((B, T1), jnp.float32)
        FSH[:, :] = jnp.full((B, T1), -1.0, jnp.float32)
        LSH[:, :] = jnp.full((B, T1), -1.0, jnp.float32)
        MD[:, :] = jnp.zeros((B, T1), jnp.float32)
        FSD[:, :] = jnp.full((B, T1), -1.0, jnp.float32)
        LSD[:, :] = jnp.full((B, T1), -1.0, jnp.float32)

    p_tok = pattern_ref[:, pl.ds(i, 1)]                  # (B, 1) int32

    H_prev = H[:, :]
    D_prev = D[:, :]
    M_H, FS_H, LS_H = MH[:, :], FSH[:, :], LSH[:, :]
    M_D, FS_D, LS_D = MD[:, :], FSD[:, :], LSD[:, :]

    # D: gap in text (consume pattern); tie prefers open
    d_open = H_prev + go_ge
    d_ext = D_prev + ge
    take_ext = d_ext < d_open
    D_row = jnp.where(take_ext, d_ext, d_open)
    M_Dr = jnp.where(take_ext, M_D, M_H)
    FS_Dr = jnp.where(take_ext, FS_D, FS_H)
    LS_Dr = jnp.where(take_ext, LS_D, LS_H)

    # diagonal
    is_match = text_ref[:, :] == p_tok                   # (B, T)
    subcost = jnp.where(is_match, 0.0, mism)
    inf_col = jnp.full((B, 1), INF, jnp.float32)
    diag = jnp.concatenate([inf_col, H_prev[:, :-1] + subcost], axis=1)
    zero_col = jnp.zeros((B, 1), jnp.float32)
    neg_col = zero_col - 1.0
    M_Hs = jnp.concatenate([zero_col, M_H[:, :-1]], axis=1)
    FS_Hs = jnp.concatenate([neg_col, FS_H[:, :-1]], axis=1)
    LS_Hs = jnp.concatenate([neg_col, LS_H[:, :-1]], axis=1)
    false_col = jnp.zeros((B, 1), jnp.bool_)
    m_here = jnp.concatenate([false_col, is_match], axis=1)
    M_diag = M_Hs + m_here.astype(jnp.float32)
    FS_diag = jnp.where(m_here & (FS_Hs < 0), j_idx - 1.0, FS_Hs)
    LS_diag = jnp.where(m_here, j_idx - 1.0, LS_Hs)

    # H without I (diagonal wins ties over D)
    take_d = D_row < diag
    H_noI = jnp.where(take_d, D_row, diag)
    M_n = jnp.where(take_d, M_Dr, M_diag)
    FS_n = jnp.where(take_d, FS_Dr, FS_diag)
    LS_n = jnp.where(take_d, LS_Dr, LS_diag)

    # I: prefix min over (H_noI[k] + gapo - gape*k), payloads carried
    # through the same selection; strict < keeps later-k on ties
    v = H_noI + go_ge - ge * j_idx - ge
    pm, pfs, pls = M_n, FS_n, LS_n
    shift = 1
    while shift < T1:
        inf_fill = jnp.full((B, shift), INF, jnp.float32)
        zero_fill = jnp.zeros((B, shift), jnp.float32)
        sv = jnp.concatenate([inf_fill, v[:, :-shift]], axis=1)
        sm = jnp.concatenate([zero_fill, pm[:, :-shift]], axis=1)
        sfs = jnp.concatenate([zero_fill - 1.0, pfs[:, :-shift]], axis=1)
        sls = jnp.concatenate([zero_fill - 1.0, pls[:, :-shift]], axis=1)
        take = sv < v
        v = jnp.where(take, sv, v)
        pm = jnp.where(take, sm, pm)
        pfs = jnp.where(take, sfs, pfs)
        pls = jnp.where(take, sls, pls)
        shift *= 2
    # I_row[j] = scan[j-1] + ge * j
    I_row = jnp.concatenate(
        [inf_col, v[:, :-1] + ge * j_idx[:, 1:]], axis=1)
    M_I = jnp.concatenate([zero_col, pm[:, :-1]], axis=1)
    FS_I = jnp.concatenate([neg_col, pfs[:, :-1]], axis=1)
    LS_I = jnp.concatenate([neg_col, pls[:, :-1]], axis=1)

    # H (H_noI wins ties over I)
    take_i = I_row < H_noI
    H_row = jnp.where(take_i, I_row, H_noI)
    M_out = jnp.where(take_i, M_I, M_n)
    FS_out = jnp.where(take_i, FS_I, FS_n)
    LS_out = jnp.where(take_i, LS_I, LS_n)

    H[:, :] = H_row
    D[:, :] = D_row
    MH[:, :], FSH[:, :], LSH[:, :] = M_out, FS_out, LS_out
    MD[:, :], FSD[:, :], LSD[:, :] = M_Dr, FS_Dr, LS_Dr

    @pl.when(i == num_rows - 1)
    def _():
        h_out[:, :] = H_row
        m_out[:, :] = M_out
        fs_out[:, :] = FS_out
        ls_out[:, :] = LS_out


def _pick_block(B: int, T1: int, n_bufs: int = 14) -> int:
    """Largest batch block that (a) divides B and (b) keeps ~n_bufs
    (BLK, T1) f32 buffers under ~10MB of VMEM."""
    budget = 10 * 1024 * 1024 // (n_bufs * 4 * T1)
    blk = 8
    while blk * 2 <= min(B, max(8, budget)) and B % (blk * 2) == 0:
        blk *= 2
    while B % blk != 0 and blk > 1:
        blk //= 2
    return max(blk, 1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _semiglobal_pallas(pattern_toks, text_toks, penalties,
                       interpret: bool = False):
    B, P = pattern_toks.shape
    T = text_toks.shape[1]
    T1 = T + 1
    f32 = jnp.float32
    BLK = _pick_block(B, T1)
    n_blocks = B // BLK
    out_shapes = [jax.ShapeDtypeStruct((B, T1), f32)] * 4
    # grid: (batch blocks, pattern rows) — rows iterate fastest, so the
    # per-block scratch carries the DP rows across the inner dimension
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks, P),
        in_specs=[
            pl.BlockSpec((BLK, P), lambda b, i, *_: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, T), lambda b, i, *_: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((BLK, T1), lambda b, i, *_: (b, 0),
                                memory_space=pltpu.VMEM)] * 4,
        scratch_shapes=[pltpu.VMEM((BLK, T1), f32)] * 8,
    )
    return pl.pallas_call(
        _row_kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )(penalties, pattern_toks.astype(jnp.int32),
      text_toks.astype(jnp.int32))




def flank_align_batch_pallas(patterns, seqs, mism: int, gapo: int,
                             gape: int, interpret=None):
    """Pallas version of kernels.semiglobal.flank_align_batch_multi."""
    if not seqs:
        return []
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    plen = len(patterns[0])
    T = _bucket(max(len(s) for s in seqs))
    B = _bucket(len(seqs), minimum=8)
    pattern_toks = np.zeros((B, plen), dtype=np.uint8)
    text_toks = np.zeros((B, T), dtype=np.uint8)
    for i, (p, s) in enumerate(zip(patterns, seqs)):
        pattern_toks[i, :len(p)] = np.frombuffer(p, dtype=np.uint8)
        text_toks[i, :len(s)] = np.frombuffer(s[:T], dtype=np.uint8)
    penalties = jnp.asarray(
        [float(mism), float(gapo + gape), float(gape)], dtype=jnp.float32)
    H, M, FS, LS = _semiglobal_pallas(
        jnp.asarray(pattern_toks), jnp.asarray(text_toks), penalties,
        interpret=interpret)
    H = np.asarray(H)
    M = np.asarray(M)
    FS = np.asarray(FS)
    LS = np.asarray(LS)
    results = []
    for b in range(len(seqs)):
        row = H[b, :len(seqs[b]) + 1]
        j_end = int(np.argmin(row))
        score = float(row[j_end])
        matches = int(M[b, j_end])
        fs = int(FS[b, j_end])
        ls = int(LS[b, j_end])
        if fs < 0:
            results.append((score, 0, (0, 0)))
        else:
            results.append((score, matches, (fs, ls + 1)))
    return results
