"""Shared shape-bucketing policy (SURVEY.md §7 "shape bucketing
economics").

Sizes snap to {2^k, 1.5·2^k} so padding waste is ≤ 33% (vs ≤ 100% for
pure powers of two) while the distinct-shape count stays ~2·log2(range)
— the compile-count / padding-waste tradeoff lever."""


def bucket(n: int, minimum: int = 8) -> int:
    size = minimum
    while size < n:
        if size * 3 // 2 >= n:
            return size * 3 // 2
        size *= 2
    return size


def const_cells_batch(per_item_cells: int, target: int,
                      lo: int, hi: int) -> int:
    """Deterministic batch SHAPE for a given per-item problem shape:
    the largest power-of-two in [lo, hi] keeping cells/dispatch under
    `target`. Because the batch shape depends only on the problem
    shape (never on how many items a call happens to carry), each
    problem shape compiles exactly ONE kernel variant — a warm run on
    any subset pre-compiles the shapes of every future run, and the
    per-process jit-trace + compile-cache-load tax (measured ~1s/shape,
    ~40s/run before this) stops scaling with catalog size."""
    b = lo
    while b < hi and 2 * b * per_item_cells <= target:
        b *= 2
    return b


# Device batches are chunked to a bounded batch dimension: compile time
# grows superlinearly with the batch dim on the remote TPU compiler, while
# a fixed-size chunk compiles once and is reused for any workload size.
MAX_DEVICE_BATCH = 512


def chunk_ranges(n: int, chunk: int = MAX_DEVICE_BATCH):
    """Yield (start, end) covering [0, n) in chunks of `chunk`."""
    start = 0
    while start < n:
        yield start, min(start + chunk, n)
        start += chunk
