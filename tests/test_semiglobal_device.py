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
        # device forward-carry uses the same tie-break priorities as the
        # host traceback (diag > D > I; open > extend; latest gap-open
        # column), so matches and spans agree on ALL inputs, not just
        # unique optima
        assert matches == h_matches, (text, matches, h_matches)
        assert span == h_span, (text, span, h_span)


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


def test_mismatch_edged_spans():
    """WFA span recovery runs first→last M-or-X column (ref:
    src/wfaligner.rs:888-905): an alignment whose extremal aligned
    columns are MISMATCHES must still report them inside the span.
    The old device kernel carried match-only endpoints and shifted
    these spans inward."""
    # pattern edges mutated in the text: X......X alignment shape
    pattern = b"ACGTACGTACGTACGTACGT"
    core = b"T" + pattern[1:-1] + b"A"     # both edge columns mismatch
    texts = [b"GGGGG" + core + b"CCCCC", core, b"G" + core]
    results = flank_align_batch(pattern, texts, 2, 5, 1)
    for text, (score, matches, span) in zip(texts, results):
        h_score, h_matches, _, h_span = align_ends_free_text(
            pattern, text, 2, 5, 1)
        assert score == h_score
        assert matches == h_matches == len(pattern) - 2
        assert span == h_span, (text, span, h_span)
    # the first text embeds core at offset 5: span must include the
    # mismatch columns at both ends
    assert results[0][2] == (5, 5 + len(core))


def test_adversarial_randomized_spans():
    """Randomized device-vs-host span equality, including heavy edge
    mutation so extremal aligned columns are often mismatches."""
    rng = random.Random(1234)
    for trial in range(30):
        plen = rng.randint(10, 60)
        pattern = random_dna(rng, plen, plen)
        mid = bytearray(mutate(rng, pattern, 0.2))
        # force-mutate the edges half the time
        if mid and rng.random() < 0.5:
            mid[0] = rng.choice([c for c in b"ACGT" if c != mid[0]])
            mid[-1] = rng.choice([c for c in b"ACGT" if c != mid[-1]])
        text = (random_dna(rng, 0, 20) + bytes(mid)
                + random_dna(rng, 0, 20))
        if not text:
            continue
        (score, matches, span), = flank_align_batch(
            pattern, [text], 2, 5, 1)
        h_score, h_matches, _, h_span = align_ends_free_text(
            pattern, text, 2, 5, 1)
        assert score == h_score, (trial, pattern, text)
        assert matches == h_matches, (trial, pattern, text)
        assert span == h_span, (trial, pattern, text, span, h_span)


def test_pallas_mismatch_edged_spans():
    """Pallas twin of test_mismatch_edged_spans (interpret mode on CPU)."""
    from trgt_tpu.kernels.semiglobal_pallas import flank_align_batch_pallas
    pattern = b"ACGTACGTACGTACGTACGT"
    core = b"T" + pattern[1:-1] + b"A"
    texts = [b"GGGGG" + core + b"CCCCC", core]
    results = flank_align_batch_pallas([pattern] * len(texts), texts,
                                       2, 5, 1)
    for text, (score, matches, span) in zip(texts, results):
        h_score, h_matches, _, h_span = align_ends_free_text(
            pattern, text, 2, 5, 1)
        assert score == h_score
        assert matches == h_matches
        assert span == h_span, (text, span, h_span)


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


def test_pallas_segmented_packing_matches_host():
    """Segmented packing (texts < the 512 bucket floor share rows in
    seg-wide lane segments) must be bit-identical to the host twin —
    mixed segment buckets, varied pattern lengths, pad rows, and
    pathological tie cases (duplicate implants) in one call."""
    from trgt_tpu.kernels.semiglobal import flank_align_batch_multi
    from trgt_tpu.kernels.semiglobal_pallas import flank_align_batch_pallas
    rng = random.Random(77)
    patterns, texts = [], []
    for i in range(37):                       # odd count: pad segments
        pattern = random_dna(rng, 40, 40)
        tlen_hi = rng.choice([28, 60, 120, 250, 480])
        left = random_dna(rng, 0, tlen_hi // 3)
        right = random_dna(rng, 0, tlen_hi // 3)
        mid = mutate(rng, pattern, rng.choice([0.0, 0.1, 0.3]))
        if i % 7 == 0:
            mid = mid + mid                   # duplicate implant: ties
        texts.append((left + mid + right)[:tlen_hi + 1])
        patterns.append(pattern)
    pal = flank_align_batch_pallas(patterns, texts, 2, 5, 1)
    want = flank_align_batch_multi(patterns, texts, 2, 5, 1)
    assert pal == want


def test_pallas_segmented_vs_full_route_identical():
    """A group whose texts straddle the packing threshold routes some
    problems to the segmented kernel and some to the full kernel;
    results must be order-preserving and host-identical."""
    from trgt_tpu.kernels.semiglobal import flank_align_batch_multi
    from trgt_tpu.kernels.semiglobal_pallas import flank_align_batch_pallas
    rng = random.Random(123)
    pattern = random_dna(rng, 50, 50)
    texts = []
    for tl in (30, 500, 64, 400, 31, 505, 90):
        base = mutate(rng, pattern, 0.15)
        filler = random_dna(rng, max(0, tl - len(base)),
                            max(0, tl - len(base)))
        texts.append((base + filler)[:tl])
    patterns = [pattern] * len(texts)
    pal = flank_align_batch_pallas(patterns, texts, 2, 5, 1)
    want = flank_align_batch_multi(patterns, texts, 2, 5, 1)
    assert pal == want
