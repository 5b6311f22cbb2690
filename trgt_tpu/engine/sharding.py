"""Multi-chip sharding of the genotyping compute (SURVEY.md §5.8).

The reference is a single-process rayon pool; the TPU-native scaling model
is pure data parallelism over the locus/read batch axis: a 1-D device
mesh ('data'), batch-sharded inputs, replicated HMM/scoring tables, no
cross-device communication in the hot path (loci are independent), with
collectives reserved for run-level statistics.

`genotype_batch_step` is the jittable "full step": batched ends-free
flank alignment + batched Viterbi + the diploid penalty reduction, all
expressed on-device so XLA partitions them across the mesh.
"""

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..hmm.model import build_hmm
from ..kernels.semiglobal import _semiglobal_scan
from ..kernels.viterbi import encode_queries, _stack_tables, _viterbi_scan


def diploid_penalty(sizes: jnp.ndarray, counts: jnp.ndarray) -> jnp.ndarray:
    """Vectorized diploid penalty matrix (ref: diploid.rs:51-84) for a
    batch of loci: sizes/counts (B, N) → penalties (B, N, N)."""
    diff = jnp.abs(sizes[:, :, None] - sizes[:, None, :])
    term = jnp.where(diff == 0, 0.0, 10.0 + 2.0 * diff)
    short_t = term[:, :, None, :]
    long_t = term[:, None, :, :]
    lo = jnp.minimum(short_t, long_t)
    hi = jnp.maximum(short_t, long_t)
    expansion = jnp.abs(sizes[:, :, None] - sizes[:, None, :]) > 100
    max_frac = jnp.where(expansion, 0.05, 0.25)[:, :, :, None]
    per_read = lo + max_frac * hi
    return jnp.sum(per_read * counts[:, None, None, :], axis=3)


def genotype_batch_step(flank_pattern, flank_text, vit_tokens, tables,
                        sizes, counts):
    """One sharded genotyping step over a locus/read batch."""
    H, M, FS, LS = _semiglobal_scan(flank_pattern, flank_text, 2, 5, 1)
    preds, valids = _viterbi_scan(vit_tokens, tables,
                                  tables["level_masks"].shape[1])
    pen = diploid_penalty(sizes, counts)
    return H, M, FS, LS, preds, valids, pen


def make_sharded_step(n_devices: int):
    """Builds (jitted step, example sharded args) over an n-device mesh."""
    devices = jax.devices()[:n_devices]
    mesh = Mesh(np.array(devices), ("data",))
    batch_sharded = NamedSharding(mesh, P("data"))
    replicated = NamedSharding(mesh, P())

    B = n_devices * 8
    P_len, T_len = 64, 128
    rng = np.random.default_rng(0)
    flank_pattern = jnp.asarray(
        rng.integers(65, 85, (B, P_len)), dtype=jnp.uint8)
    flank_text = jnp.asarray(
        rng.integers(65, 85, (B, T_len)), dtype=jnp.uint8)

    hmm = build_hmm([b"CAG"])
    hmm2 = build_hmm([b"CAG", b"A"])  # heterogeneous-topology batch
    tables_np, _ = _stack_tables([hmm, hmm2] * (B // 2))
    tables = {k: jnp.asarray(v) for k, v in tables_np.items()}
    toks, _ = encode_queries(["CAG" * 8] * B)
    vit_tokens = jnp.asarray(toks[:B])

    N = 16
    sizes = jnp.asarray(rng.integers(10, 100, (B, N)), dtype=jnp.float32)
    counts = jnp.asarray(rng.integers(1, 5, (B, N)), dtype=jnp.float32)

    args = (
        jax.device_put(flank_pattern, batch_sharded),
        jax.device_put(flank_text, batch_sharded),
        jax.device_put(vit_tokens, batch_sharded),
        jax.tree.map(lambda x: jax.device_put(x, batch_sharded), tables),
        jax.device_put(sizes, batch_sharded),
        jax.device_put(counts, batch_sharded),
    )

    step = jax.jit(genotype_batch_step)
    return step, args, mesh


def dryrun(n_devices: int) -> None:
    step, args, mesh = make_sharded_step(n_devices)
    out = step(*args)
    jax.block_until_ready(out)
