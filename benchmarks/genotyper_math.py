#!/usr/bin/env python
"""Measured decision for SURVEY §2.1's TPU-plan deviation (VERDICT r3
next #7): the plan column marks the size-genotyper penalty search as
[JAX]; the shipping implementation is vectorized host numpy
(genotype/size.py). This benchmark quantifies the choice on a LOCAL
backend (CPU-JAX — no tunnel latency, the most favourable case for the
device path short of a local TPU).

The diploid penalty search is an (n, n, n) einsum-like reduction over
n = distinct read lengths at one locus; the real distribution on the
heterogeneous bench catalog has median n ≈ 10-40 (error-free reads of
the same allele collapse). The numbers this prints show host numpy
finishing a whole locus in ~10-100 µs at those sizes, below even a
LOCAL jit dispatch (~50-200 µs), and ~1000x below the remote-TPU
dispatch+fetch floor (~25+28 ms, NOTES round 1). Batching loci across
a padded (B, n_max, n_max, n_max) device tensor would cube the padding
waste for a stage that is <2%% of pipeline wall. Decision: host numpy
stays; the same applies a fortiori to the smaller flank ln_sum_exp
scoring and consensus column voting.

Usage: python benchmarks/genotyper_math.py   (prints one JSON line)
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def bench_numpy(sizes, counts, iters):
    from trgt_tpu.genotype.size import diploid_penalty_matrix
    t0 = time.perf_counter()
    for _ in range(iters):
        pen = diploid_penalty_matrix(sizes, counts)
        int(np.argmin(pen))
    return (time.perf_counter() - t0) / iters


def bench_jax(sizes, counts, iters):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    @jax.jit
    def pen_jax(sizes_a, counts_a):
        diff = jnp.abs(sizes_a[:, None] - sizes_a[None, :])
        term = jnp.where(diff == 0, 0, 10 + 2 * diff).astype(jnp.float64)
        lo = jnp.minimum(term[:, None, :], term[None, :, :])
        hi = jnp.maximum(term[:, None, :], term[None, :, :])
        expansion = diff > 100
        max_frac = jnp.where(expansion, 0.05, 0.25)[:, :, None]
        per_read = lo + max_frac * hi
        pen = (per_read * counts_a[None, None, :]).sum(axis=2)
        return jnp.argmin(pen)

    s = sizes.astype(np.int64)
    c = counts.astype(np.float64)
    int(pen_jax(s, c))                      # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        int(pen_jax(s, c))                  # includes host<->device sync
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(42)
    rows = []
    for n in (8, 32, 128, 256):
        sizes = np.sort(rng.choice(5000, size=n, replace=False))
        counts = rng.integers(1, 20, size=n)
        iters = 200 if n <= 32 else 20
        t_np = bench_numpy(sizes, counts, iters)
        t_jx = bench_jax(sizes, counts, iters)
        rows.append({"n_lens": n,
                     "numpy_us": round(t_np * 1e6, 1),
                     "jax_cpu_us": round(t_jx * 1e6, 1),
                     "jax_over_numpy": round(t_jx / t_np, 2)})
    print(json.dumps({
        "workload": "diploid penalty search (ref diploid.rs:5-84)",
        "remote_tpu_dispatch_floor_ms": 25,
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
