"""Pallas TPU kernel: batched pairwise edit distance.

Hand-written Mosaic kernel for the cluster genotyper's distance matrix
(same semantics as kernels/editdist.py). The DP state lives in VMEM for
the whole scan: the grid dimension walks the rows of sequence `a`
(sequential on TPU, scratch persists across grid steps), each step doing
one row update vectorized over (pairs × text columns) on the VPU. The
intra-row insertion chain is a Hillis-Steele min-plus prefix scan
(log2(T) shift+min passes) — no HBM traffic between rows.

Runs compiled on TPU; `interpret=True` is used on CPU (tests/fallback).
"""

import functools

import numpy as np

from .bucket import bucket as _bucket

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = 1e9


def _edit_row_kernel(a_ref, b_ref, out_ref, h_scratch):
    i = pl.program_id(1)
    T1 = h_scratch.shape[1]              # T + 1
    # Mosaic iota must be integer-typed
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (1, T1), 1).astype(
        jnp.float32)

    @pl.when(i == 0)
    def _():
        h_scratch[:, :] = jnp.broadcast_to(j_idx, h_scratch.shape)

    a_col = a_ref[:, pl.ds(i, 1)]                     # (B, 1) uint8… as i32
    active = (a_col != 0)                             # (B, 1)
    is_match = b_ref[:, :] == a_col                   # (B, T)
    sub = jnp.where(is_match, 0.0, 1.0)

    h_prev = h_scratch[:, :]
    B = h_prev.shape[0]
    diag = jnp.concatenate(
        [jnp.full((B, 1), INF), h_prev[:, :-1] + sub], axis=1)
    up = h_prev + 1.0
    pre = jnp.minimum(diag, up)
    # left chain: H[j] = min_k<=j (pre[k] + (j - k)) via prefix min of
    # (pre[k] - k), Hillis-Steele over lanes
    v = pre - jnp.broadcast_to(j_idx, pre.shape)
    shift = 1
    while shift < T1:
        shifted = jnp.concatenate(
            [jnp.full((B, shift), INF), v[:, :-shift]], axis=1)
        v = jnp.minimum(v, shifted)
        shift *= 2
    h_row = jnp.minimum(pre, v + jnp.broadcast_to(j_idx, pre.shape))
    h_new = jnp.where(active, h_row, h_prev)
    h_scratch[:, :] = h_new
    out_ref[:, :] = h_new


@functools.partial(jax.jit, static_argnames=("interpret",))
def _edit_scan_pallas(a_toks, b_toks, interpret: bool = False):
    from .semiglobal_pallas import _pick_block
    B, P = a_toks.shape
    T = b_toks.shape[1]
    BLK = _pick_block(B, T + 1, n_bufs=5)
    return pl.pallas_call(
        _edit_row_kernel,
        grid=(B // BLK, P),
        in_specs=[
            pl.BlockSpec((BLK, P), lambda b, i: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, T), lambda b, i: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLK, T + 1), lambda b, i: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T + 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((BLK, T + 1), jnp.float32)],
        interpret=interpret,
    )(a_toks.astype(jnp.int32), b_toks.astype(jnp.int32))




def edit_distances_batch_pallas(pairs, interpret=None):
    """Pallas version of kernels.editdist.edit_distances_batch."""
    if not pairs:
        return []
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    norm = []
    for a, b in pairs:
        if len(a) > len(b):
            a, b = b, a
        norm.append((a, b))
    P = _bucket(max(len(a) for a, _ in norm))
    T = _bucket(max(len(b) for _, b in norm), minimum=128)
    B = _bucket(len(norm), minimum=8)
    a_toks = np.zeros((B, P), dtype=np.uint8)
    b_toks = np.zeros((B, T), dtype=np.uint8)
    for i, (a, b) in enumerate(norm):
        a_toks[i, :len(a)] = np.frombuffer(a, dtype=np.uint8)
        b_toks[i, :len(b)] = np.frombuffer(b, dtype=np.uint8)
    H = np.asarray(_edit_scan_pallas(jnp.asarray(a_toks),
                                     jnp.asarray(b_toks),
                                     interpret=interpret))
    return [int(H[i, len(b)]) for i, (_, b) in enumerate(norm)]
