"""Batched HMM Viterbi on device (the flagship kernel; replaces the
per-sequence Rust Viterbi at ref src/hmm/hmm_model.rs:54-156).

Design (TPU-first):
  * One locus's HMM topology is compiled to dense tables (S states, E max
    in-degree).  A batch of B sequences (alleles or reads), padded to L
    tokens, runs as ONE device program.
  * The position loop is a `lax.scan`; each step computes all emitting
    states via one-hot gather formulated as (B,S)×(S,S) matmuls (MXU) or
    direct gathers (VPU), then resolves silent states level-by-level —
    the silent levels are a static property of the topology, so the whole
    step is trace-once control flow.
  * Per-position argmax predecessors stream out as an (L,B,S) int32 array;
    traceback is a cheap linear host pass (matches the reference's
    first-max tie-breaking because jnp.argmax picks the first maximum).

Padding semantics: the DP is causal, so predecessors at positions < len
are unaffected by padding; traceback simply starts at each sequence's own
final position.
"""

import functools
from typing import List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..hmm.model import Hmm

NEG = -1e30


def hmm_device_tables(hmm: Hmm, dtype=jnp.float32):
    """Extract dense device tables from a host Hmm (cached per instance)."""
    cached = getattr(hmm, "_device_tables", None)
    if cached is not None:
        return cached
    t = hmm.dense_tables()
    in_idx = jnp.asarray(t["in_idx"], dtype=jnp.int32)
    in_lp = jnp.asarray(
        np.where(np.isneginf(t["in_lp"]), NEG, t["in_lp"]), dtype=dtype)
    em = jnp.asarray(
        np.where(np.isneginf(t["em"]), NEG, t["em"]), dtype=dtype)
    silent = jnp.asarray(t["silent"])
    has_edges = jnp.asarray(t["has_edges"])
    # static level masks
    S = hmm.num_states
    level_masks = []
    for level in t["silent_levels"]:
        mask = np.zeros(S, dtype=bool)
        mask[level] = True
        level_masks.append(jnp.asarray(mask))
    tables = dict(in_idx=in_idx, in_lp=in_lp, em=em, silent=silent,
                  has_edges=has_edges, level_masks=tuple(level_masks))
    hmm._device_tables = tables
    return tables


def _edge_max(col: jnp.ndarray, in_idx: jnp.ndarray,
              in_lp: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """col: (B,S) scores; returns (best (B,S), pred (B,S)) over in-edges."""
    # gather: (B, S, E)
    cand = col[:, in_idx] + in_lp[None, :, :]
    best_e = jnp.argmax(cand, axis=2)                     # first max wins
    best = jnp.take_along_axis(cand, best_e[:, :, None], axis=2)[:, :, 0]
    pred = in_idx[jnp.arange(in_idx.shape[0])[None, :], best_e]
    return best, pred


@functools.partial(jax.jit, static_argnames=("num_levels",))
def _viterbi_scan(tokens, tables, num_levels: int):
    """tokens: (B, L) int32 of encoded symbols. Returns preds (L, B, S)
    int32 and valid (L, B, S) bool."""
    in_idx, in_lp, em = tables["in_idx"], tables["in_lp"], tables["em"]
    silent, has_edges = tables["silent"], tables["has_edges"]
    level_masks = tables["level_masks"]
    B, L = tokens.shape
    S = em.shape[0]

    no_edges = ~has_edges

    def resolve_silent(col, pred, valid):
        for mask in level_masks:
            best, p = _edge_max(col, in_idx, in_lp)
            upd = mask[None, :]
            newv = best > NEG / 2
            col = jnp.where(upd, jnp.where(newv, best, NEG), col)
            pred = jnp.where(upd & newv, p, pred)
            valid = jnp.where(upd, newv, valid)
        return col, pred, valid

    # position 0: only edge-less emitting states seed (the start state)
    sym0 = tokens[:, 0]
    em0 = em[:, :].T[sym0]                       # (B, S)
    col0 = jnp.where((no_edges & ~silent)[None, :], em0, NEG)
    pred0 = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None, :],
                             (B, S))
    valid0 = (no_edges & ~silent)[None, :] & (col0 > NEG / 2)
    col0, pred0, valid0 = resolve_silent(col0, pred0, valid0)

    def step(col_prev, sym_t):
        best, pred = _edge_max(col_prev, in_idx, in_lp)
        em_t = em.T[sym_t]                       # (B, S)
        col = jnp.where(silent[None, :], NEG, best + em_t)
        valid = (~silent & has_edges)[None, :] & (col > NEG / 2)
        col = jnp.where(valid, col, NEG)
        col, pred, valid = resolve_silent(col, pred, valid)
        return col, (pred, valid)

    _, (preds, valids) = jax.lax.scan(step, col0, tokens[:, 1:].T)
    preds = jnp.concatenate([pred0[None], preds], axis=0)
    valids = jnp.concatenate([valid0[None], valids], axis=0)
    return preds, valids


def _bucket(n: int, minimum: int = 32) -> int:
    """Round up to a power of two — bounds the number of distinct compiled
    shapes (the batching-policy lever called out in SURVEY.md §7)."""
    size = minimum
    while size < n:
        size *= 2
    return size


def encode_queries(queries: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
    """'#'+q+'#' encoded 0..4, padded with 0s into bucketed shapes.
    Returns (tokens, lengths)."""
    table = np.zeros(256, dtype=np.int32)
    for i, c in enumerate(b"#ATCG"):
        table[c] = i
    lens = np.array([len(q) + 2 for q in queries], dtype=np.int32)
    L = _bucket(int(lens.max()))
    B = _bucket(len(queries), minimum=8)
    toks = np.zeros((B, L), dtype=np.int32)
    for b, q in enumerate(queries):
        arr = np.frombuffer(("#" + q + "#").encode(), dtype=np.uint8)
        toks[b, :len(arr)] = table[arr]
    return toks, lens


def viterbi_batch(hmm: Hmm, queries: Sequence[str]) -> List[List[int]]:
    """Device-batched version of [hmm.label(q) for q in queries]."""
    nonempty = [(i, q) for i, q in enumerate(queries) if q]
    out: List[List[int]] = [[] for _ in queries]
    if not nonempty:
        return out
    toks, lens = encode_queries([q for _, q in nonempty])
    tables = hmm_device_tables(hmm)
    preds, valids = _viterbi_scan(jnp.asarray(toks), tables,
                                  len(tables["level_masks"]))
    preds = np.asarray(preds)
    valids = np.asarray(valids)
    S = hmm.num_states
    for b, (i, q) in enumerate(nonempty):
        out[i] = _traceback(hmm, preds[:, b, :], valids[:, b, :],
                            int(lens[b]))
    return out


def _traceback(hmm: Hmm, preds: np.ndarray, valids: np.ndarray,
               length: int) -> List[int]:
    state = hmm.num_states - 1
    index = length - 1
    path = []
    while state != 0:
        path.append(state)
        if not valids[index, state]:
            raise ValueError("HMM traceback failed (no valid path)")
        prev_state = int(preds[index, state])
        if not hmm.is_silent(state):
            index -= 1
        state = prev_state
    path.append(0)
    path.reverse()
    return path
