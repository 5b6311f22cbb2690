"""Pallas TPU kernel: batched ends-free affine flank alignment.

Mosaic port of kernels/semiglobal.py (the #1 hot op of `genotype`,
ref: src/trgt/genotype/span_locater.rs). The whole DP runs inside ONE
kernel invocation per batch block: the pattern rows are walked by an
in-kernel `lax.fori_loop` whose carry holds the H/D cost rows plus the
forward-carried match-count / first-match / last-match payloads — no
per-row grid steps (grid steps cost ~30-50µs each on TPU; the fori
variant measured 158x faster at bench shapes). The within-row affine
insertion chain is a Hillis-Steele min-plus prefix scan that carries its
payloads through the same selection masks, so no gather ops are needed.

Mosaic constraints honored here:
  * no dynamic indexing along the lane axis — the per-row pattern token
    is extracted with a one-hot lane reduction instead of `ref[:, i]`
    (dynamic lane indices must be provably 128-aligned);
  * every row array has a lane width that is a multiple of 128 (the DP
    needs T+1 columns; we round up and mask at finalize — the prefix
    structures only propagate left→right, so junk columns past the text
    length never contaminate valid ones);
  * iota is integer-typed (Mosaic requirement), cast to f32 after;
  * loop-carried values must have consistent non-replicated layouts —
    the carry init and the iota are derived from a VMEM-loaded array
    (`text * 0`) because `broadcasted_iota`/`full` produce replicated
    layouts that crash Mosaic's relayout when fed through `select_n`
    inside a loop ("Invalid relayout: Non-singleton logical dimension
    is replicated in destination but not in source").

Semantics match the jnp/XLA kernel exactly (same tie-break rules:
diagonal ≻ D ≻ I; gap-open preferred over extend on ties; later gap-open
column preferred within a row; first-minimum column wins at finalize).
"""

import functools

import numpy as np

from .bucket import bucket as _bucket

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = 1e9

# host↔device transfers over the remote-TPU tunnel run at ~26MB/s, so
# sequences travel as 4-bit codes (two per byte) and are unpacked by XLA
# on device. The 15-symbol map covers the BAM NT16 alphabet minus '='
# (which never occurs in real reads); an input containing unmapped bytes
# falls back to raw-byte tokens so semantics never change.
_NIBBLE_SYMS = b"ACGTNMRSVWYHKDB"
_NIBBLE_MAP = np.zeros(256, dtype=np.uint8)
for _i, _c in enumerate(_NIBBLE_SYMS):
    _NIBBLE_MAP[_c] = _i + 1


def _nibble_encode(toks: np.ndarray):
    """(B, W) byte tokens → (B, W/2) packed nibble codes, or None if any
    non-pad byte has no nibble code (caller falls back to raw bytes)."""
    coded = _NIBBLE_MAP[toks]
    if np.any((coded == 0) & (toks != 0)):
        return None
    return (coded[:, 0::2] << 4) | coded[:, 1::2]


def _unpack_nibbles(packed):
    """XLA device-side unpack: (B, W/2) uint8 → (B, W) int32 codes."""
    hi = (packed >> 4).astype(jnp.int32)
    lo = (packed & 0xF).astype(jnp.int32)
    return jnp.stack([hi, lo], axis=-1).reshape(packed.shape[0], -1)


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def _flank_kernel(mism_go_ge_ref, pattern_ref, text_ref, lens_ref,
                  h_out, m_out, fs_out, ls_out):
    B = text_ref.shape[0]
    W = text_ref.shape[1]          # row width, multiple of 128, ≥ T + 1
    Pp = pattern_ref.shape[1]
    mism = mism_go_ge_ref[0]
    go_ge = mism_go_ge_ref[1]
    ge = mism_go_ge_ref[2]
    text = text_ref[:, :]
    pattern = pattern_ref[:, :]
    # natural-layout zero: carries and iota must NOT be lane/sublane-
    # replicated (see module docstring)
    zf = text.astype(jnp.float32) * 0.0
    # Mosaic iota must be integer-typed; convert to f32 afterwards
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1).astype(
        jnp.float32) + zf
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (B, Pp), 1)
    inf_col = jnp.full((B, 1), INF, jnp.float32)
    zero_col = jnp.zeros((B, 1), jnp.float32)
    neg_col = zero_col - 1.0

    def body(i, carry):
        H_prev, D_prev, M_H, FS_H, LS_H, M_D, FS_D, LS_D = carry
        # per-row pattern token via one-hot lane reduction (NO dynamic
        # lane index: Mosaic requires those to be provably 128-aligned)
        row_sel = (row_iota == i).astype(jnp.int32)
        p_tok = jnp.sum(pattern * row_sel, axis=1, keepdims=True)

        # deletion lattice (D): open vs extend, open wins ties
        D_ext = D_prev + ge
        D_open = H_prev + go_ge
        take_ext = D_ext < D_open
        D_row = jnp.where(take_ext, D_ext, D_open)
        M_Dr = jnp.where(take_ext, M_D, M_H)
        FS_Dr = jnp.where(take_ext, FS_D, FS_H)
        LS_Dr = jnp.where(take_ext, LS_D, LS_H)

        # diagonal: column j consumes text char j-1
        is_match = text == p_tok
        subcost = jnp.where(is_match, 0.0, mism)
        diag = jnp.concatenate(
            [inf_col, (H_prev + subcost)[:, :-1]], axis=1)
        M_Hs = jnp.concatenate([zero_col, M_H[:, :-1]], axis=1)
        FS_Hs = jnp.concatenate([neg_col, FS_H[:, :-1]], axis=1)
        LS_Hs = jnp.concatenate([neg_col, LS_H[:, :-1]], axis=1)
        # NOTE: concatenating (B, 1) bool columns crashes Mosaic
        # ("Check failed: limits[i] <= dim(i)"); shift the mask as f32
        m_f = jnp.concatenate(
            [zero_col, is_match[:, :-1].astype(jnp.float32)], axis=1)
        M_diag = M_Hs + m_f
        # WFA span recovery runs first→last M-or-X column (ref:
        # src/wfaligner.rs:888-905): FS/LS update on EVERY diagonal step,
        # match or mismatch. Column 0's diag candidate is INF so its
        # payload is never selected (j_idx-1 there is the -1 sentinel).
        FS_diag = jnp.where(FS_Hs < 0, j_idx - 1.0, FS_Hs)
        LS_diag = j_idx - 1.0 + LS_Hs * 0.0

        # H without insertions: diagonal ≻ D on ties
        take_d = D_row < diag
        H_noI = jnp.where(take_d, D_row, diag)
        M_n = jnp.where(take_d, M_Dr, M_diag)
        FS_n = jnp.where(take_d, FS_Dr, FS_diag)
        LS_n = jnp.where(take_d, LS_Dr, LS_diag)

        # insertion chain: I[j] = min_k<j (H_noI[k] + go + (j-k)*ge)
        # via prefix min of (H_noI[k] + go_ge - ge*k - ge), payloads
        # carried through the same selection masks
        v = H_noI + go_ge - ge * j_idx - ge
        pm, pfs, pls = M_n, FS_n, LS_n
        shift = 1
        while shift < W:
            inf_fill = jnp.full((B, shift), INF, jnp.float32)
            zero_fill = jnp.zeros((B, shift), jnp.float32)
            sv = jnp.concatenate([inf_fill, v[:, :-shift]], axis=1)
            sm = jnp.concatenate([zero_fill, pm[:, :-shift]], axis=1)
            sfs = jnp.concatenate([zero_fill - 1.0, pfs[:, :-shift]],
                                  axis=1)
            sls = jnp.concatenate([zero_fill - 1.0, pls[:, :-shift]],
                                  axis=1)
            take = sv < v
            v = jnp.where(take, sv, v)
            pm = jnp.where(take, sm, pm)
            pfs = jnp.where(take, sfs, pfs)
            pls = jnp.where(take, sls, pls)
            shift *= 2
        # I_row[j] = scan[j-1] + ge * j. NOTE: slicing `j_idx` would be
        # fine here (it has natural layout), but shifting v first keeps
        # the op count down (column 0 is INF either way).
        I_row = jnp.concatenate([inf_col, v[:, :-1]], axis=1) + ge * j_idx
        M_I = jnp.concatenate([zero_col, pm[:, :-1]], axis=1)
        FS_I = jnp.concatenate([neg_col, pfs[:, :-1]], axis=1)
        LS_I = jnp.concatenate([neg_col, pls[:, :-1]], axis=1)

        take_i = I_row < H_noI
        H_row = jnp.where(take_i, I_row, H_noI)
        M_out = jnp.where(take_i, M_I, M_n)
        FS_out = jnp.where(take_i, FS_I, FS_n)
        LS_out = jnp.where(take_i, LS_I, LS_n)

        # padded rows (token 0) leave the carry unchanged
        active = p_tok != 0
        return (jnp.where(active, H_row, H_prev),
                jnp.where(active, D_row, D_prev),
                jnp.where(active, M_out, M_H),
                jnp.where(active, FS_out, FS_H),
                jnp.where(active, LS_out, LS_H),
                jnp.where(active, M_Dr, M_D),
                jnp.where(active, FS_Dr, FS_D),
                jnp.where(active, LS_Dr, LS_D))

    init = (zf,                       # H row 0 (ends-free: free start)
            zf + INF,                 # D
            zf,                       # M_H
            zf - 1.0,                 # FS_H
            zf - 1.0,                 # LS_H
            zf,                       # M_D
            zf - 1.0,                 # FS_D
            zf - 1.0)                 # LS_D
    H_row, _D, M_out, FS_out, LS_out, _md, _fd, _ld = lax.fori_loop(
        0, Pp, body, init)

    # finalize (reductions only — Mosaic has no cheap argmin/gather):
    # first minimum over valid columns, then one-hot-select the payloads
    # at that column. Outputs are (BLK, 128) scalar columns, so only
    # ~4·B floats leave the kernel instead of 4·B·W.
    lens_col = jnp.max(lens_ref[:, :].astype(jnp.float32), axis=1,
                       keepdims=True)
    masked = jnp.where(j_idx <= lens_col, H_row, INF)
    m_val = jnp.min(masked, axis=1, keepdims=True)
    j_end = jnp.min(jnp.where(masked == m_val, j_idx, float(W)),
                    axis=1, keepdims=True)
    sel = j_idx == j_end
    pick = lambda A: jnp.sum(jnp.where(sel, A, 0.0), axis=1,
                             keepdims=True)
    ones = jnp.ones((B, 128), jnp.float32)
    h_out[:, :] = m_val * ones
    m_out[:, :] = pick(M_out) * ones
    fs_out[:, :] = pick(FS_out) * ones
    ls_out[:, :] = pick(LS_out) * ones


def _flank_kernel_seg(seg: int, mism_go_ge_ref, pattern_ref, text_ref,
                      lens_ref, h_out, m_out, fs_out, ls_out):
    """Segmented variant (VERDICT r4 next #3): G = W//seg problems
    SHARING ONE PATTERN occupy one row, each in its own `seg`-wide
    lane segment, so short windowed texts stop padding to the
    512-lane bucket floor (padded cells per problem drop by G). The
    span workload always has same-pattern groups — one flank piece is
    aligned against every read window of its locus — so the pattern
    token stays a per-row scalar exactly like _flank_kernel (no
    per-lane pattern broadcast needed).

    Exact same per-problem semantics as _flank_kernel: the insertion
    prefix scan is segmented (a shifted candidate is valid only when
    its source lane lies in the same segment, i.e. j_local >= shift —
    and the ladder depth drops to log2(seg)), diagonal shifts are
    masked at segment column 0, and the finalize reduces per
    segment."""
    B = text_ref.shape[0]
    W = text_ref.shape[1]
    Pp = pattern_ref.shape[1]
    G = W // seg
    log2seg = seg.bit_length() - 1
    mism = mism_go_ge_ref[0]
    go_ge = mism_go_ge_ref[1]
    ge = mism_go_ge_ref[2]
    text = text_ref[:, :]
    pattern = pattern_ref[:, :]
    zf = text.astype(jnp.float32) * 0.0
    j_int = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1) + text * 0
    j_local_i = j_int & (seg - 1)
    j_local = j_local_i.astype(jnp.float32) + zf
    seg_col0 = j_local_i == 0
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (B, Pp), 1)
    inf_col = jnp.full((B, 1), INF, jnp.float32)
    zero_col = jnp.zeros((B, 1), jnp.float32)
    neg_col = zero_col - 1.0

    # per-segment lengths: lens_ref slot g broadcast over segment g's
    # lanes via a one-time (B,128)x(128,W) one-hot matmul
    gi = jax.lax.broadcasted_iota(jnp.int32, (128, W), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (128, W), 1)
    E = ((jj >> log2seg) == gi).astype(jnp.float32)
    lens_lane = jnp.dot(lens_ref[:, :].astype(jnp.float32), E,
                        preferred_element_type=jnp.float32)

    def body(i, carry):
        H_prev, D_prev, M_H, FS_H, LS_H, M_D, FS_D, LS_D = carry
        # per-row pattern token via one-hot lane reduction (NO dynamic
        # lane index), as in _flank_kernel
        row_sel = (row_iota == i).astype(jnp.int32)
        p_tok = jnp.sum(pattern * row_sel, axis=1, keepdims=True)

        D_ext = D_prev + ge
        D_open = H_prev + go_ge
        take_ext = D_ext < D_open
        D_row = jnp.where(take_ext, D_ext, D_open)
        M_Dr = jnp.where(take_ext, M_D, M_H)
        FS_Dr = jnp.where(take_ext, FS_D, FS_H)
        LS_Dr = jnp.where(take_ext, LS_D, LS_H)

        is_match = text == p_tok
        subcost = jnp.where(is_match, 0.0, mism)
        diag = jnp.concatenate(
            [inf_col, (H_prev + subcost)[:, :-1]], axis=1)
        diag = jnp.where(seg_col0, INF, diag)
        M_Hs = jnp.where(seg_col0, 0.0, jnp.concatenate(
            [zero_col, M_H[:, :-1]], axis=1))
        FS_Hs = jnp.where(seg_col0, -1.0, jnp.concatenate(
            [neg_col, FS_H[:, :-1]], axis=1))
        LS_Hs = jnp.where(seg_col0, -1.0, jnp.concatenate(
            [neg_col, LS_H[:, :-1]], axis=1))
        m_f = jnp.where(seg_col0, 0.0, jnp.concatenate(
            [zero_col, is_match[:, :-1].astype(jnp.float32)], axis=1))
        M_diag = M_Hs + m_f
        FS_diag = jnp.where(FS_Hs < 0, j_local - 1.0, FS_Hs)
        LS_diag = j_local - 1.0 + LS_Hs * 0.0

        take_d = D_row < diag
        H_noI = jnp.where(take_d, D_row, diag)
        M_n = jnp.where(take_d, M_Dr, M_diag)
        FS_n = jnp.where(take_d, FS_Dr, FS_diag)
        LS_n = jnp.where(take_d, LS_Dr, LS_diag)

        # segmented insertion prefix scan: sources must share the
        # segment (j_local >= shift); ladder depth is log2(seg)
        v = H_noI + go_ge - ge * j_local - ge
        pm, pfs, pls = M_n, FS_n, LS_n
        shift = 1
        while shift < seg:
            inf_fill = jnp.full((B, shift), INF, jnp.float32)
            zero_fill = jnp.zeros((B, shift), jnp.float32)
            sv = jnp.concatenate([inf_fill, v[:, :-shift]], axis=1)
            sm = jnp.concatenate([zero_fill, pm[:, :-shift]], axis=1)
            sfs = jnp.concatenate([zero_fill - 1.0, pfs[:, :-shift]],
                                  axis=1)
            sls = jnp.concatenate([zero_fill - 1.0, pls[:, :-shift]],
                                  axis=1)
            take = (sv < v) & (j_local_i >= shift)
            v = jnp.where(take, sv, v)
            pm = jnp.where(take, sm, pm)
            pfs = jnp.where(take, sfs, pfs)
            pls = jnp.where(take, sls, pls)
            shift *= 2
        I_row = jnp.where(seg_col0, INF, jnp.concatenate(
            [inf_col, v[:, :-1]], axis=1)) + ge * j_local
        M_I = jnp.where(seg_col0, 0.0, jnp.concatenate(
            [zero_col, pm[:, :-1]], axis=1))
        FS_I = jnp.where(seg_col0, -1.0, jnp.concatenate(
            [neg_col, pfs[:, :-1]], axis=1))
        LS_I = jnp.where(seg_col0, -1.0, jnp.concatenate(
            [neg_col, pls[:, :-1]], axis=1))

        take_i = I_row < H_noI
        H_row = jnp.where(take_i, I_row, H_noI)
        M_out = jnp.where(take_i, M_I, M_n)
        FS_out = jnp.where(take_i, FS_I, FS_n)
        LS_out = jnp.where(take_i, LS_I, LS_n)

        # padded rows (token 0) leave the carry unchanged (one shared
        # pattern per row, so activity is a row scalar)
        active = p_tok != 0
        return (jnp.where(active, H_row, H_prev),
                jnp.where(active, D_row, D_prev),
                jnp.where(active, M_out, M_H),
                jnp.where(active, FS_out, FS_H),
                jnp.where(active, LS_out, LS_H),
                jnp.where(active, M_Dr, M_D),
                jnp.where(active, FS_Dr, FS_D),
                jnp.where(active, LS_Dr, LS_D))

    init = (zf, zf + INF, zf, zf - 1.0, zf - 1.0, zf, zf - 1.0,
            zf - 1.0)
    H_row, _D, M_out, FS_out, LS_out, _md, _fd, _ld = lax.fori_loop(
        0, Pp, body, init)

    masked = jnp.where(j_local <= lens_lane, H_row, INF)
    lane_i = jax.lax.broadcasted_iota(
        jnp.int32, (B, 128), 1) + lens_ref[:, :] * 0
    h_acc = lens_ref[:, :].astype(jnp.float32) * 0.0
    m_acc, fs_acc, ls_acc = h_acc, h_acc - 1.0, h_acc - 1.0
    seg_of = j_int >> log2seg
    for g in range(G):
        in_seg = seg_of == g
        mg = jnp.where(in_seg, masked, INF)
        mv = jnp.min(mg, axis=1, keepdims=True)
        je = jnp.min(jnp.where(mg == mv, j_local, float(seg)),
                     axis=1, keepdims=True)
        sel = in_seg & (j_local == je)
        pick = lambda A: jnp.sum(jnp.where(sel, A, 0.0), axis=1,
                                 keepdims=True)
        lane_g = lane_i == g
        h_acc = jnp.where(lane_g, mv, h_acc)
        m_acc = jnp.where(lane_g, pick(M_out), m_acc)
        fs_acc = jnp.where(lane_g, pick(FS_out), fs_acc)
        ls_acc = jnp.where(lane_g, pick(LS_out), ls_acc)
    h_out[:, :] = h_acc
    m_out[:, :] = m_acc
    fs_out[:, :] = fs_acc
    ls_out[:, :] = ls_acc


def _pick_block(B: int, T1: int, n_bufs: int = 24) -> int:
    """Largest batch block that (a) divides B and (b) keeps ~n_bufs
    (BLK, T1) f32 buffers (loop carries + double-buffered pipeline
    blocks + in-kernel temporaries) under ~8MB of VMEM (hard scoped
    limit 16MB)."""
    budget = 8 * 1024 * 1024 // (n_bufs * 4 * T1)
    blk = 8
    while blk * 2 <= min(B, max(8, budget)) and B % (blk * 2) == 0:
        blk *= 2
    while B % blk != 0 and blk > 1:
        blk //= 2
    return max(blk, 1)


@functools.partial(jax.jit, static_argnames=("interpret", "packed"))
def _semiglobal_pallas(pattern_toks, text_toks, penalties, lens,
                       interpret: bool = False, packed: bool = False):
    """pattern_toks: (B, Pp) int-like, lane-padded with 0; rows past
    each item's own pattern length are 0 and skipped via `active`.
    text_toks: (B, W) with W a multiple of 128 and ≥ max text len + 1.
    With packed=True both token arrays arrive nibble-packed at half
    width and are unpacked by XLA on device (transfer bandwidth over the
    tunnel is the binding constraint).
    Returns per-item scalars (score, matches, first, last): the finalize
    (masked first-argmin over columns) runs on device, so only 4·B
    scalars ever cross the host↔device link."""
    if packed:
        pattern_toks = _unpack_nibbles(pattern_toks)
        text_toks = _unpack_nibbles(text_toks)
    B, Pp = pattern_toks.shape
    W = text_toks.shape[1]
    f32 = jnp.float32
    BLK = _pick_block(B, W)
    n_blocks = B // BLK
    out_shapes = [jax.ShapeDtypeStruct((B, 128), f32)] * 4
    lens_2d = jnp.broadcast_to(lens[:, None].astype(jnp.int32), (B, 128))
    H_fin, M_fin, FS_fin, LS_fin = pl.pallas_call(
        _flank_kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((BLK, Pp), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, W), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, 128), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((BLK, 128), lambda b: (b, 0),
                                memory_space=pltpu.VMEM)] * 4,
        out_shape=out_shapes,
        interpret=interpret,
    )(penalties, pattern_toks.astype(jnp.int32),
      text_toks.astype(jnp.int32), lens_2d)
    # finalize (first-min column + payload pick) runs inside the kernel;
    # column 0 of each (B, 128) output holds the scalar. Outputs are
    # stacked into ONE array: each device→host fetch costs ~28ms fixed
    # over the tunnel, so one fetch beats four.
    return jnp.stack([H_fin[:, 0], M_fin[:, 0], FS_fin[:, 0],
                      LS_fin[:, 0]])


@functools.partial(jax.jit,
                   static_argnames=("seg", "interpret", "packed"))
def _semiglobal_pallas_seg(pattern_toks, text_toks, penalties, lens,
                           seg: int, interpret: bool = False,
                           packed: bool = False):
    """Segmented dispatch: pattern_toks (B, Pp) — ONE pattern per row
    shared by that row's G = W//seg packed problems; text_toks (B, W);
    lens (B, 128) with problem (b, g)'s text length in slot g.
    Returns (4, B*G) scalars in problem order (b, g)."""
    if packed:
        pattern_toks = _unpack_nibbles(pattern_toks)
        text_toks = _unpack_nibbles(text_toks)
    B, Pp = pattern_toks.shape
    W = text_toks.shape[1]
    G = W // seg
    f32 = jnp.float32
    BLK = _pick_block(B, W)
    n_blocks = B // BLK
    out_shapes = [jax.ShapeDtypeStruct((B, 128), f32)] * 4
    kernel = functools.partial(_flank_kernel_seg, seg)
    H_fin, M_fin, FS_fin, LS_fin = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((BLK, Pp), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, W), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, 128), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((BLK, 128), lambda b: (b, 0),
                                memory_space=pltpu.VMEM)] * 4,
        out_shape=out_shapes,
        interpret=interpret,
    )(penalties, pattern_toks.astype(jnp.int32),
      text_toks.astype(jnp.int32), lens.astype(jnp.int32))
    # problem (b, g) result sits at [b, g]; flatten to problem order
    out = jnp.stack([H_fin[:, :G], M_fin[:, :G],
                     FS_fin[:, :G], LS_fin[:, :G]])
    return out.reshape(4, B * G)


def _flank_align_leaf_seg(patterns, seqs, mism, gapo, gape, seg: int,
                          W: int, Pp: int, interpret: bool):
    """Packed leaf: all seqs fit in `seg`-wide segments; G = W//seg
    SAME-PATTERN problems per row (the span workload aligns one flank
    piece against every read window of a locus, so same-pattern groups
    are large). Problems are packed per pattern group; partial rows
    pad with empty segments."""
    from .. import mesh as _mesh
    from . import telemetry
    from .bucket import const_cells_batch
    from .semiglobal import _po2
    G = W // seg

    # rows: (pattern, [problem indices]) packed G per row
    rows = []
    by_pattern = {}
    for i, p in enumerate(patterns):
        by_pattern.setdefault(p, []).append(i)
    for p, idxs in by_pattern.items():
        for lo in range(0, len(idxs), G):
            rows.append((p, idxs[lo:lo + G]))

    if interpret:
        B = _mesh.round_up_batch(_po2(len(rows), 8))
    else:
        # deterministic batch SHAPE per problem shape (one compile
        # variant; see _flank_align_leaf_full) — each packed row holds
        # G problems, so the cell target scales down by G to keep the
        # problems-per-dispatch capacity (and the per-problem padded
        # cells G× lower than the unpacked path)
        B = _mesh.round_up_batch(const_cells_batch(
            Pp * W, target=600_000_000 // G, lo=256, hi=4096))
        if len(rows) > B:
            out = [None] * len(seqs)
            for lo in range(0, len(rows), B):
                chunk_rows = rows[lo:lo + B]
                idxs = [i for _, grp in chunk_rows for i in grp]
                sub = _flank_align_leaf_seg(
                    [patterns[i] for i in idxs],
                    [seqs[i] for i in idxs],
                    mism, gapo, gape, seg, W, Pp, interpret)
                for i, r in zip(idxs, sub):
                    out[i] = r
            return out
    telemetry.add_cells("span", B * Pp * W)
    pattern_toks = np.zeros((B, Pp), dtype=np.uint8)
    text_toks = np.zeros((B, W), dtype=np.uint8)
    lens = np.zeros((B, 128), dtype=np.int32)
    slot_of = {}
    for b, (p, grp) in enumerate(rows):
        pattern_toks[b, :len(p)] = np.frombuffer(p, dtype=np.uint8)
        for g, i in enumerate(grp):
            s = seqs[i]
            text_toks[b, g * seg:g * seg + len(s)] = np.frombuffer(
                s, dtype=np.uint8)
            lens[b, g] = len(s)
            slot_of[i] = b * G + g
    penalties = jnp.asarray(
        [float(mism), float(gapo + gape), float(gape)], dtype=jnp.float32)
    pat_packed = _nibble_encode(pattern_toks)
    txt_packed = _nibble_encode(text_toks)
    if pat_packed is not None and txt_packed is not None:
        pattern_in, text_in, packed = pat_packed, txt_packed, True
    else:
        pattern_in, text_in, packed = pattern_toks, text_toks, False
    m = _mesh.current_mesh()
    if m is None:
        out = np.asarray(_semiglobal_pallas_seg(
            jnp.asarray(pattern_in), jnp.asarray(text_in), penalties,
            jnp.asarray(lens), seg=seg, interpret=interpret,
            packed=packed))
    else:
        from jax.sharding import PartitionSpec as SP
        fn = jax.shard_map(
            lambda pt, tt, pen, ln: _semiglobal_pallas_seg(
                pt, tt, pen, ln, seg=seg, interpret=interpret,
                packed=packed),
            mesh=m, in_specs=(SP("data"), SP("data"), SP(), SP("data")),
            out_specs=SP(None, "data"), check_vma=False)
        out = np.asarray(fn(
            _mesh.put_batch(pattern_in), _mesh.put_batch(text_in),
            _mesh.put_replicated(penalties), _mesh.put_batch(lens)))
    results = []
    for i in range(len(seqs)):
        k = slot_of[i]
        score = float(out[0][k])
        matches = int(out[1][k])
        fs = int(out[2][k])
        ls = int(out[3][k])
        if fs < 0:
            results.append((score, 0, (0, 0)))
        else:
            results.append((score, matches, (fs, ls + 1)))
    return results


def flank_align_leaf_pallas(patterns, seqs, mism: int, gapo: int,
                            gape: int, interpret=None):
    """Single-dispatch leaf (all seqs share a length bucket; callers —
    kernels/semiglobal.flank_align_batch_multi — handle bucketing and
    chunking). Returns list of (score, n_matches, (start, end)).

    Texts short enough to pack (po2 segment < the 512-lane bucket
    floor) route to the segmented kernel: G = 512//seg problems share
    each row, cutting padded cells by G for windowed span problems
    (VERDICT r4 next #3)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    from .semiglobal import _po2
    if _po2(max(len(s) for s in seqs) + 1, 512) == 512:
        groups = {}
        for i, s in enumerate(seqs):
            groups.setdefault(_po2(len(s) + 1, 64), []).append(i)
        if min(groups) < 512:
            plen = max(len(p) for p in patterns)
            Pp = _round_up(_bucket(plen, minimum=128), 128)
            out = [None] * len(seqs)
            for sg in sorted(groups):
                idxs = groups[sg]
                pats = [patterns[i] for i in idxs]
                sqs = [seqs[i] for i in idxs]
                if sg >= 512:
                    sub = _flank_align_leaf_full(
                        pats, sqs, mism, gapo, gape, interpret)
                else:
                    sub = _flank_align_leaf_seg(
                        pats, sqs, mism, gapo, gape, sg, 512, Pp,
                        interpret)
                for i, r in zip(idxs, sub):
                    out[i] = r
            return out
    return _flank_align_leaf_full(patterns, seqs, mism, gapo, gape,
                                  interpret)


def _flank_align_leaf_full(patterns, seqs, mism: int, gapo: int,
                           gape: int, interpret: bool):
    """Unpacked leaf: one problem per row (texts ≥ the 512 floor)."""
    from .. import mesh as _mesh
    from . import telemetry
    from .semiglobal import _po2
    plen = max(len(p) for p in patterns)
    # power-of-two shapes with coarse floors: each new Mosaic shape
    # costs ~2min of remote compile (round-3 tunnel), so the shape
    # lattice is kept small (callers group texts into the same po2
    # buckets, so W here equals the caller's bucket key)
    Pp = _round_up(_bucket(plen, minimum=128), 128)
    W = _po2(max(len(s) for s in seqs) + 1, 512)
    if interpret:
        # CPU interpret mode (tests) pays per padded cell — keep the
        # old tight batch padding there
        B = _mesh.round_up_batch(_po2(len(seqs), 8))
    else:
        # batch SHAPE is a deterministic function of (Pp, W): one
        # compiled variant per problem shape, so warm-run compiles
        # transfer across catalog sizes (bucket.const_cells_batch)
        from .bucket import const_cells_batch
        B = _mesh.round_up_batch(const_cells_batch(
            Pp * W, target=600_000_000, lo=256, hi=4096))
        if len(seqs) > B:
            out = []
            for lo_i in range(0, len(seqs), B):
                out.extend(_flank_align_leaf_full(
                    patterns[lo_i:lo_i + B], seqs[lo_i:lo_i + B],
                    mism, gapo, gape, interpret))
            return out
    telemetry.add_cells("span", B * Pp * W)
    pattern_toks = np.zeros((B, Pp), dtype=np.uint8)
    text_toks = np.zeros((B, W), dtype=np.uint8)
    lens = np.zeros(B, dtype=np.int32)
    for i, (p, s) in enumerate(zip(patterns, seqs)):
        pattern_toks[i, :len(p)] = np.frombuffer(p, dtype=np.uint8)
        text_toks[i, :len(s)] = np.frombuffer(s, dtype=np.uint8)
        lens[i] = len(s)
    penalties = jnp.asarray(
        [float(mism), float(gapo + gape), float(gape)], dtype=jnp.float32)
    pat_packed = _nibble_encode(pattern_toks)
    txt_packed = _nibble_encode(text_toks)
    if pat_packed is not None and txt_packed is not None:
        pattern_toks, text_toks, packed = pat_packed, txt_packed, True
    else:
        packed = False
    m = _mesh.current_mesh()
    if m is None:
        out = np.asarray(_semiglobal_pallas(
            jnp.asarray(pattern_toks), jnp.asarray(text_toks), penalties,
            jnp.asarray(lens), interpret=interpret, packed=packed))
    else:
        # multi-chip: each device runs the SAME single-chip kernel on its
        # batch shard (pure data parallelism, no collectives) — the
        # pallas_call is wrapped in shard_map so Mosaic sees local shapes
        from jax.sharding import PartitionSpec as SP
        fn = jax.shard_map(
            lambda pt, tt, pen, ln: _semiglobal_pallas(
                pt, tt, pen, ln, interpret=interpret, packed=packed),
            mesh=m, in_specs=(SP("data"), SP("data"), SP(), SP("data")),
            out_specs=SP(None, "data"), check_vma=False)
        out = np.asarray(fn(
            _mesh.put_batch(pattern_toks), _mesh.put_batch(text_toks),
            _mesh.put_replicated(penalties), _mesh.put_batch(lens)))
    score_a, m_a, fs_a, ls_a = out[0], out[1], out[2], out[3]
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


def flank_align_batch_pallas(patterns, seqs, mism: int, gapo: int,
                             gape: int, interpret=None):
    """Pallas version of kernels.semiglobal.flank_align_batch_multi
    (kept as a direct entry point for tests)."""
    if not seqs:
        return []
    return flank_align_leaf_pallas(patterns, seqs, mism, gapo, gape,
                                   interpret=interpret)
