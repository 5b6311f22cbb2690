"""Pallas TPU kernel: batched pairwise edit distance.

Hand-written Mosaic kernel for the cluster genotyper's distance matrix
(same semantics as kernels/editdist.py, ref:
src/trgt/genotype/genotype_cluster.rs:236-286). The whole DP runs inside
ONE kernel invocation per batch block: the rows of sequence `a` are
walked by an in-kernel `lax.fori_loop` whose carry holds the DP row —
no per-row grid steps (grid steps cost ~30-50µs each on TPU; see
kernels/semiglobal_pallas.py for the measurements). Each iteration does
one row update vectorized over (pairs × text columns) on the VPU; the
intra-row insertion chain is a Hillis-Steele min-plus prefix scan
(log2(W) shift+min passes).

Mosaic constraints honored (see kernels/semiglobal_pallas.py): the
per-row token of `a` is extracted with a one-hot lane reduction instead
of a dynamic lane index, every row array is 128-lane aligned (junk
columns past each item's text length are masked at the device
finalize), and the loop carry is derived from a VMEM-loaded array so
its layout is non-replicated.
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


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def _edit_kernel(a_ref, b_ref, lens_ref, out_ref):
    B = b_ref.shape[0]
    W = b_ref.shape[1]            # lane-aligned row width ≥ T + 1
    Pp = a_ref.shape[1]
    b_toks = b_ref[:, :]
    a_toks = a_ref[:, :]
    zf = b_toks.astype(jnp.float32) * 0.0
    # Mosaic iota must be integer-typed
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1).astype(
        jnp.float32) + zf
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (B, Pp), 1)

    def body(i, h_prev):
        # per-row token of `a` via one-hot lane reduction (no dynamic
        # lane indexing: Mosaic requires provable 128-alignment there)
        row_sel = (row_iota == i).astype(jnp.int32)
        a_col = jnp.sum(a_toks * row_sel, axis=1, keepdims=True)  # (B,1)
        active = a_col != 0
        is_match = b_toks == a_col
        sub = jnp.where(is_match, 0.0, 1.0)
        # diag into column j consumes text char j-1
        diag = jnp.concatenate(
            [jnp.full((B, 1), INF, jnp.float32),
             (h_prev + sub)[:, :-1]], axis=1)
        up = h_prev + 1.0
        pre = jnp.minimum(diag, up)
        # left chain: H[j] = min_k<=j (pre[k] + (j - k)) via prefix min
        # of (pre[k] - k), Hillis-Steele over lanes
        v = pre - j_idx
        shift = 1
        while shift < W:
            shifted = jnp.concatenate(
                [jnp.full((B, shift), INF, jnp.float32), v[:, :-shift]],
                axis=1)
            v = jnp.minimum(v, shifted)
            shift *= 2
        h_row = jnp.minimum(pre, v + j_idx)
        return jnp.where(active, h_row, h_prev)

    h_fin = lax.fori_loop(0, Pp, body, j_idx)

    # in-kernel finalize: one-hot-select H[·, len_b] (reductions only;
    # no gather), so only B scalars leave the kernel
    lens_col = jnp.max(lens_ref[:, :].astype(jnp.float32), axis=1,
                       keepdims=True)
    sel = j_idx == lens_col
    ed = jnp.sum(jnp.where(sel, h_fin, 0.0), axis=1, keepdims=True)
    out_ref[:, :] = ed * jnp.ones((B, 128), jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret", "packed"))
def _edit_scan_pallas(a_toks, b_toks, lens_b, interpret: bool = False,
                      packed: bool = False):
    """Returns per-pair edit distances (B,) — the H[·, len_b] gather runs
    on device, so only B scalars cross the host↔device link. packed=True
    → token arrays arrive nibble-packed (see kernels/semiglobal_pallas)."""
    from .semiglobal_pallas import _pick_block, _unpack_nibbles
    if packed:
        a_toks = _unpack_nibbles(a_toks)
        b_toks = _unpack_nibbles(b_toks)
    B, Pp = a_toks.shape
    W = b_toks.shape[1]
    BLK = _pick_block(B, W, n_bufs=10)
    lens_2d = jnp.broadcast_to(lens_b[:, None].astype(jnp.int32),
                               (B, 128))
    H = pl.pallas_call(
        _edit_kernel,
        grid=(B // BLK,),
        in_specs=[
            pl.BlockSpec((BLK, Pp), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, W), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, 128), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLK, 128), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 128), jnp.float32),
        interpret=interpret,
    )(a_toks.astype(jnp.int32), b_toks.astype(jnp.int32), lens_2d)
    return H[:, 0]


def edit_distances_leaf_pallas(pairs, interpret=None):
    """Single-dispatch leaf (callers — kernels/editdist.
    edit_distances_batch — handle chunking). Pairs are (a, b) with
    len(a) <= len(b)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # bucket then lane-align to bound the distinct compile-shape count
    Pp = _round_up(_bucket(max(len(a) for a, _ in pairs), minimum=128),
                   128)
    W = _round_up(_bucket(max(len(b) for _, b in pairs) + 1, minimum=128),
                  128)
    from .. import mesh as _mesh
    from . import telemetry
    if interpret:
        B = _mesh.batch_bucket(len(pairs),
                               minimum=8 * _mesh.batch_multiple())
    else:
        # deterministic batch SHAPE per (Pp, W): one compiled variant
        # per problem shape (see kernels/bucket.const_cells_batch)
        from .bucket import const_cells_batch
        B = _mesh.round_up_batch(const_cells_batch(
            Pp * W, target=300_000_000, lo=256, hi=4096))
        if len(pairs) > B:
            out = []
            for lo_i in range(0, len(pairs), B):
                out.extend(edit_distances_leaf_pallas(
                    pairs[lo_i:lo_i + B], interpret=interpret))
            return out
    telemetry.add_cells("editdist", B * Pp * W)
    a_toks = np.zeros((B, Pp), dtype=np.uint8)
    b_toks = np.zeros((B, W), dtype=np.uint8)
    lens = np.zeros(B, dtype=np.int32)
    for i, (a, b) in enumerate(pairs):
        a_toks[i, :len(a)] = np.frombuffer(a, dtype=np.uint8)
        b_toks[i, :len(b)] = np.frombuffer(b, dtype=np.uint8)
        lens[i] = len(b)
    from .semiglobal_pallas import _nibble_encode
    a_packed = _nibble_encode(a_toks)
    b_packed = _nibble_encode(b_toks)
    if a_packed is not None and b_packed is not None:
        a_toks, b_toks, packed = a_packed, b_packed, True
    else:
        packed = False
    m = _mesh.current_mesh()
    if m is None:
        eds = np.asarray(_edit_scan_pallas(
            jnp.asarray(a_toks), jnp.asarray(b_toks), jnp.asarray(lens),
            interpret=interpret, packed=packed))
    else:
        # multi-chip: shard_map the single-chip kernel over the batch
        # shard (pure data parallelism — see trgt_tpu/mesh.py)
        from jax.sharding import PartitionSpec as SP
        fn = jax.shard_map(
            lambda at, bt, ln: _edit_scan_pallas(
                at, bt, ln, interpret=interpret, packed=packed),
            mesh=m, in_specs=(SP("data"), SP("data"), SP("data")),
            out_specs=SP("data"), check_vma=False)
        eds = np.asarray(fn(_mesh.put_batch(a_toks),
                            _mesh.put_batch(b_toks),
                            _mesh.put_batch(lens)))
    return [int(eds[i]) for i in range(len(pairs))]


def edit_distances_batch_pallas(pairs, interpret=None):
    """Pallas version of kernels.editdist.edit_distances_batch (kept as
    a direct entry point for tests)."""
    if not pairs:
        return []
    norm = []
    for a, b in pairs:
        if len(a) > len(b):
            a, b = b, a
        norm.append((a, b))
    return edit_distances_leaf_pallas(norm, interpret=interpret)
