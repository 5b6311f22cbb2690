"""Bit-exactness tests for the rand-0.9 StdRng reimplementation
(trgt_tpu/utils/rand_rs.py) against independently published vectors."""

from trgt_tpu.utils.rand_rs import StdRng, chacha_block, seed_from_u64


def test_chacha20_zero_key_keystream():
    """The parameterized ChaCha core at 20 rounds must reproduce the
    canonical all-zero-key keystream. Expected bytes independently
    generated with `openssl enc -chacha20 -K 0{64} -iv 0{32}` (zero
    key/nonce makes the djb and IETF layouts coincide)."""
    ks = bytes.fromhex(
        "76b8e0ada0f13d90405d6ae55386bd28"
        "bdd219b8a08ded1aa836efcc8b770dc7"
        "da41597c5157488d7724e03fb8d84a37"
        "6a43b8f41518a11cc387b669b2ee6586"
        "9f07e7be5551387a98ba977c732d080d"
        "cb0f29a048e3656912c6533e32ee7aed"
        "29b721769ce64e43d57133b074d839d5"
        "31ed1f28510afb45ace10a1f4b794d6f")
    words = [int.from_bytes(ks[i:i + 4], "little") for i in range(0, 128, 4)]
    assert chacha_block([0] * 8, 0, (0, 0), 20) == words[:16]
    assert chacha_block([0] * 8, 1, (0, 0), 20) == words[16:]


def test_stdrng_value_stability():
    """rand's rngs/std.rs test_stdrng_construction target: ChaCha12 with
    this seed must emit 10719222850664546238 as the first next_u64."""
    seed = bytes([1, 0, 0, 0, 23, 0, 0, 0, 200, 1, 0, 0, 210, 30, 0, 0]
                 + [0] * 16)
    rng = StdRng(seed)
    assert rng.next_u64() == 10719222850664546238


def test_seed_from_u64_locked():
    """Lock the PCG32 seed expansion of seed 42 (the reference's fixed
    reservoir seed, ref: src/trgt/workflows/tr.rs:315)."""
    assert seed_from_u64(42).hex() == (
        "a48fa17b58323d0aeab8a1cc690114b8"
        "2b8cc87518b4f7548d446ea1e4df20f2")
    # stream must be stable too: first samples of random_range(0..750)
    rng = StdRng.seed_from_u64(42)
    assert [rng.random_range(750) for _ in range(8)] == [
        100, 394, 186, 407, 651, 477, 742, 304]


def test_random_range_bounds_and_bias_branch():
    rng = StdRng.seed_from_u64(7)
    for n in (1, 2, 3, 750, 751, 10**6, (1 << 32) - 1, 1 << 32):
        for _ in range(50):
            v = rng.random_range(n)
            assert 0 <= v < n
    # a range just below 2^32 forces the Canon bias branch to fire often
    rng = StdRng.seed_from_u64(0)
    big = (1 << 32) - 5
    seen_words = []
    for _ in range(16):
        seen_words.append(rng.random_range(big))
    assert all(0 <= v < big for v in seen_words)


def test_reservoir_walk_determinism():
    """Two replays of the same reservoir walk select identical indices
    (the native extraction path replays the Python walk, so cross-path
    read selection hinges on this)."""
    def walk(total, threshold):
        rng = StdRng.seed_from_u64(42)
        kept = list(range(threshold))
        for i in range(threshold, total):
            j = rng.random_range(i)
            if j < threshold:
                kept[j] = i
        return kept

    assert walk(2000, 750) == walk(2000, 750)
    assert walk(2000, 750) != list(range(750))
