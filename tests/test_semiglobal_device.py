"""Device batched ends-free flank alignment vs host numpy kernel."""

import random

import pytest

from trgt_tpu.kernels.align_host import align_ends_free_text
from trgt_tpu.kernels.semiglobal import flank_align_batch


def random_dna(rng, lo, hi):
    return bytes(rng.choice(b"ACGT") for _ in range(rng.randint(lo, hi)))


def mutate(rng, seq, rate):
    out = bytearray()
    for c in seq:
        r = rng.random()
        if r < rate / 3:
            continue
        if r < 2 * rate / 3:
            out.append(rng.choice(b"ACGT"))
        else:
            out.append(c)
        if rng.random() < rate / 3:
            out.append(rng.choice(b"ACGT"))
    return bytes(out)


def test_device_matches_host_scores():
    rng = random.Random(7)
    pattern = random_dna(rng, 40, 40)
    texts = []
    for _ in range(20):
        left = random_dna(rng, 0, 30)
        right = random_dna(rng, 0, 30)
        mid = mutate(rng, pattern, 0.1)
        texts.append(left + mid + right)
    texts.append(random_dna(rng, 50, 80))   # unrelated text
    texts.append(pattern)                   # exact
    results = flank_align_batch(pattern, texts, 2, 5, 1)
    for text, (score, matches, span) in zip(texts, results):
        h_score, h_matches, _, h_span = align_ends_free_text(
            pattern, text, 2, 5, 1)
        assert score == h_score, (text, score, h_score)
        # matches/span may differ between co-optimal paths; on the
        # embedded-pattern cases the optimum is effectively unique
        if score == 0:
            assert matches == h_matches == len(pattern)
            assert span == h_span


def test_device_exact_span():
    pattern = b"ACGTACGTAC"
    texts = [b"TTTT" + pattern + b"GGGG", pattern, b"T" * 30]
    results = flank_align_batch(pattern, texts, 2, 5, 1)
    assert results[0][0] == 0
    assert results[0][1] == 10
    assert results[0][2] == (4, 14)
    assert results[1][2] == (0, 10)
    assert results[2][1] < 10


def test_device_targeted_scoring():
    # targeted preset scoring 1,0,1 (gapo == 0)
    rng = random.Random(9)
    pattern = random_dna(rng, 30, 30)
    texts = [mutate(rng, pattern, 0.15) + random_dna(rng, 0, 10)
             for _ in range(8)]
    results = flank_align_batch(pattern, texts, 1, 0, 1)
    for text, (score, matches, span) in zip(texts, results):
        h_score, _, _, _ = align_ends_free_text(pattern, text, 1, 0, 1)
        assert score == h_score


def test_pallas_matches_jnp_kernel():
    from trgt_tpu.kernels.semiglobal import flank_align_batch_multi
    from trgt_tpu.kernels.semiglobal_pallas import flank_align_batch_pallas
    rng = random.Random(31)
    pattern = random_dna(rng, 40, 40)
    texts = []
    for _ in range(12):
        left = random_dna(rng, 0, 25)
        right = random_dna(rng, 0, 25)
        mid = mutate(rng, pattern, 0.12)
        texts.append(left + mid + right)
    patterns = [pattern] * len(texts)
    jnp_res = flank_align_batch_multi(patterns, texts, 2, 5, 1)
    pal_res = flank_align_batch_pallas(patterns, texts, 2, 5, 1)
    assert jnp_res == pal_res
