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
