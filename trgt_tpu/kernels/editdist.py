"""Batched edit-distance on device for the cluster genotyper's O(n²)
pairwise distance matrix (ref: src/trgt/genotype/genotype_cluster.rs:236-286,
hot loop #2 in SURVEY.md §3.1).

All (i, j) pairs small enough for exact ED (len_i·len_j ≤ MAX_OPS, the
reference's skip bound) are packed into one batch; the DP scans the rows
of the first sequence and vectorizes over (pairs × columns), with the
intra-row insertion chain as an associative min-plus prefix scan.
Oversized pairs use the |len difference| lower bound, as in the reference.
"""

import functools
from typing import List, Sequence

import numpy as np

from .bucket import bucket as _bucket, chunk_ranges

import jax
import jax.numpy as jnp

INF = jnp.float32(1e9)
MAX_OPS = 10000  # ref: genotype_cluster.rs:231


@functools.partial(jax.jit)
def _edit_scan(a_toks, b_toks):
    """a_toks: (B, P) uint8 (0 = pad), b_toks: (B, T) uint8.
    Returns H rows stacked: final full DP table row per row index is not
    kept — returns (B, T+1) last row per item computed at its own P via
    masking: rows beyond a's length leave H unchanged."""
    B, P = a_toks.shape
    T = b_toks.shape[1]
    j_idx = jnp.arange(T + 1, dtype=jnp.float32)
    j_int = jnp.arange(T + 1, dtype=jnp.int32)

    H0 = jnp.broadcast_to(j_idx[None, :], (B, T + 1))

    def prefix_min(x):
        # Hillis-Steele min-scan (uniform shifts compile fast)
        shift = 1
        width = x.shape[1]
        while shift < width:
            sx = jnp.concatenate(
                [jnp.full((x.shape[0], shift), INF), x[:, :-shift]],
                axis=1)
            x = jnp.minimum(x, sx)
            shift *= 2
        return x

    def row_step(H_prev, a_col):
        # a_col: (B,) token of sequence a at this row; 0 = padding row
        active = (a_col != 0)[:, None]                    # (B, 1)
        is_match = (b_toks == a_col[:, None])             # (B, T)
        sub = jnp.where(is_match, 0.0, 1.0)
        diag = jnp.concatenate(
            [jnp.full((B, 1), INF), H_prev[:, :-1] + sub], axis=1)
        up = H_prev + 1.0
        pre = jnp.minimum(diag, up)
        pre = pre.at[:, 0].set(H_prev[:, 0] + 1.0)        # H[i][0] = i
        # left chain: H[j] = min(pre[j], min_k<j (pre[k] + (j-k)))
        scan_in = pre - j_idx[None, :]
        cm = prefix_min(scan_in)
        H_row = jnp.minimum(pre, cm + j_idx[None, :])
        H_new = jnp.where(active, H_row, H_prev)
        return H_new, None

    H_fin, _ = jax.lax.scan(row_step, H0, a_toks.T)
    return H_fin




def edit_distances_batch(pairs: Sequence[tuple],
                         cancelled=lambda: False) -> List[int]:
    """Exact edit distances for a list of (bytes, bytes) pairs.

    `cancelled` is polled between chunk dispatches: a raced device side
    that lost must stop occupying the serialized device link
    (engine/pipeline._race)."""
    if not pairs:
        return []
    if cancelled():
        raise InterruptedError("raced device side cancelled")
    from . import semiglobal
    if semiglobal._use_pallas():
        # one dispatch per 4096 pairs: tunnel dispatches cost ~90ms fixed
        # vs ~1ms kernel time (see kernels/semiglobal.py)
        from .editdist_pallas import edit_distances_leaf_pallas
        norm = []
        for a, b in pairs:
            if len(a) > len(b):
                a, b = b, a
            norm.append((a, b))
        try:
            out = []
            for lo, hi in chunk_ranges(len(norm), 4096):
                if cancelled():
                    raise InterruptedError("raced device side cancelled")
                out.extend(edit_distances_leaf_pallas(norm[lo:hi],
                                                      interpret=False))
            return out
        except InterruptedError:
            raise
        except Exception as e:
            semiglobal._PALLAS_BROKEN = True
            import logging
            logging.getLogger("trgt").warning(
                "Pallas edit-distance kernel failed (%s); using the XLA "
                "kernel for the rest of the run", e)
    if len(pairs) > 512:
        out = []
        for lo, hi in chunk_ranges(len(pairs)):
            if cancelled():
                raise InterruptedError("raced device side cancelled")
            out.extend(edit_distances_batch(pairs[lo:hi]))
        return out
    # put the shorter sequence on the scan axis
    norm = []
    for a, b in pairs:
        if len(a) > len(b):
            a, b = b, a
        norm.append((a, b))
    from .. import mesh
    from . import telemetry
    P = _bucket(max(len(a) for a, _ in norm))
    T = _bucket(max(len(b) for _, b in norm))
    B = mesh.batch_bucket(len(norm))
    telemetry.add_cells("editdist", B * P * (T + 1))
    a_toks = np.zeros((B, P), dtype=np.uint8)
    b_toks = np.zeros((B, T), dtype=np.uint8)
    for i, (a, b) in enumerate(norm):
        a_toks[i, :len(a)] = np.frombuffer(a, dtype=np.uint8)
        b_toks[i, :len(b)] = np.frombuffer(b, dtype=np.uint8)
    H_fin = np.asarray(_edit_scan(mesh.put_batch(a_toks),
                                  mesh.put_batch(b_toks)))
    out = []
    for i, (a, b) in enumerate(norm):
        out.append(int(H_fin[i, len(b)]))
    return out


def pairwise_distance_matrix(trs: Sequence[bytes]) -> np.ndarray:
    """Full (n, n) raw edit-distance matrix with the reference's
    skip-bound semantics (|len diff| when len_i*len_j > MAX_OPS)."""
    n = len(trs)
    dist = np.zeros((n, n), dtype=np.float64)
    pair_idx = []
    pairs = []
    for i in range(n):
        for j in range(i + 1, n):
            if len(trs[i]) * len(trs[j]) > MAX_OPS:
                dist[i, j] = dist[j, i] = abs(len(trs[i]) - len(trs[j]))
            else:
                pair_idx.append((i, j))
                pairs.append((trs[i], trs[j]))
    if pairs:
        eds = edit_distances_batch(pairs)
        for (i, j), d in zip(pair_idx, eds):
            dist[i, j] = dist[j, i] = d
    return dist
