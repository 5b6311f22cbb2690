"""Multi-chip sharding on the virtual 8-device CPU mesh: the production
pipeline dry run, kernel-level mesh equality (XLA and Pallas/shard_map
paths), and catalog shard-concatenation equality."""

import random

import jax
import pytest

from trgt_tpu import mesh


@pytest.fixture(autouse=True)
def _mesh_cleanup():
    yield
    mesh.disable_mesh()


def test_dryrun_multichip_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from trgt_tpu.engine.sharding import dryrun
    dryrun(8)


def test_graft_entry_compiles():
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import entry
    fn, args = entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)


def _random_dna(rng, lo, hi):
    return bytes(rng.choice(b"ACGT") for _ in range(rng.randint(lo, hi)))


def test_mesh_xla_flank_kernel_equality():
    """The XLA flank kernel must return identical results with and
    without the mesh (sharded inputs, same program)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from trgt_tpu.kernels.semiglobal import flank_align_batch_multi
    rng = random.Random(5)
    pattern = _random_dna(rng, 40, 40)
    texts = [_random_dna(rng, 30, 90) for _ in range(21)]
    patterns = [pattern] * len(texts)
    mesh.disable_mesh()
    plain = flank_align_batch_multi(patterns, texts, 2, 5, 1)
    mesh.enable_mesh(8)
    sharded = flank_align_batch_multi(patterns, texts, 2, 5, 1)
    assert plain == sharded


def test_mesh_pallas_flank_shard_map():
    """The Pallas flank kernel under shard_map (interpret mode on CPU)
    must match the host twin per item."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from trgt_tpu.kernels.align_host import align_ends_free_text
    from trgt_tpu.kernels.semiglobal_pallas import flank_align_batch_pallas
    rng = random.Random(6)
    pattern = _random_dna(rng, 30, 30)
    texts = [_random_dna(rng, 20, 60) for _ in range(10)]
    mesh.enable_mesh(8)
    res = flank_align_batch_pallas([pattern] * len(texts), texts, 2, 5, 1,
                                   interpret=True)
    for text, (score, matches, span) in zip(texts, res):
        h_score, h_matches, _, h_span = align_ends_free_text(
            pattern, text, 2, 5, 1)
        assert score == h_score
        assert matches == h_matches
        assert span == h_span


def test_mesh_pallas_editdist_shard_map():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from trgt_tpu.kernels.align_host import edit_distance
    from trgt_tpu.kernels.editdist_pallas import edit_distances_leaf_pallas
    rng = random.Random(7)
    pairs = []
    for _ in range(12):
        a = _random_dna(rng, 10, 40)
        b = _random_dna(rng, 10, 60)
        if len(a) > len(b):
            a, b = b, a
        pairs.append((a, b))
    mesh.enable_mesh(8)
    eds = edit_distances_leaf_pallas(pairs, interpret=True)
    assert eds == [edit_distance(a, b) for a, b in pairs]


def test_mesh_viterbi_and_editdist_xla_equality():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from trgt_tpu.hmm.model import build_hmm
    from trgt_tpu.kernels.editdist import edit_distances_batch
    from trgt_tpu.kernels.viterbi import viterbi_batch_multi
    rng = random.Random(8)
    hmms = [build_hmm([b"CAG"]), build_hmm([b"CAG", b"A"]),
            build_hmm([b"AT"])]
    queries = ["CAG" * rng.randint(3, 12) for _ in range(9)]
    hseq = [hmms[i % 3] for i in range(9)]
    pairs = [(_random_dna(rng, 10, 30), _random_dna(rng, 10, 30))
             for _ in range(17)]
    mesh.disable_mesh()
    paths_plain = viterbi_batch_multi(hseq, queries)
    eds_plain = edit_distances_batch(pairs)
    mesh.enable_mesh(8)
    paths_mesh = viterbi_batch_multi(hseq, queries)
    eds_mesh = edit_distances_batch(pairs)
    assert paths_plain == paths_mesh
    assert eds_plain == eds_mesh
