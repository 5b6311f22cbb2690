"""Adversarial synthetic e2e (VERDICT r3 missing #3: input diversity
beyond clean synthetics): homopolymer/low-complexity motifs,
motif-copy stutter, indel-rich TR boundaries (the span certificate's
hardest region). Assertions: the pipeline completes, the device path
(CPU-JAX kernels) produces byte-identical VCFs to the host path for
both genotypers, and the spanning BAM exists."""

import gzip
import os

import pytest

from trgt_tpu.cli import main
from trgt_tpu.utils.synth import (adversarial_loci, adversarial_mutator,
                                  make_dataset)


@pytest.fixture(scope="module")
def adversarial_dataset(tmp_path_factory):
    td = str(tmp_path_factory.mktemp("adv"))
    loci = adversarial_loci(14, seed=7)
    fasta, bed, bam = make_dataset(td, loci, seed=7,
                                   read_mutator=adversarial_mutator)
    return td, fasta, bed, bam


def _vcf_body(path):
    with gzip.open(path, "rt") as fh:
        return "".join(l for l in fh if not l.startswith("##"))


@pytest.mark.parametrize("genotyper", ["size", "cluster"])
def test_adversarial_device_matches_host(adversarial_dataset, genotyper):
    td, fasta, bed, bam = adversarial_dataset
    bodies = {}
    for device in ("host", "cpu"):
        prefix = os.path.join(td, f"adv_{genotyper}_{device}")
        rc = main(["genotype", "--genome", fasta, "--repeats", bed,
                   "--reads", bam, "--output-prefix", prefix,
                   "--genotyper", genotyper, "--device", device])
        assert rc == 0
        bodies[device] = _vcf_body(prefix + ".vcf.gz")
        assert os.path.exists(prefix + ".spanning.bam")
    assert bodies["host"] == bodies["cpu"]
    # every adversarial locus must produce a record (no silent drops)
    n_records = sum(1 for l in bodies["host"].splitlines()
                    if not l.startswith("#"))
    assert n_records == 14


def test_adversarial_span_certificate_exercised(adversarial_dataset):
    """The indel-rich boundaries must actually drive the span-window
    certificate machinery (windowed misses AND full-DP fallbacks)."""
    td, fasta, bed, bam = adversarial_dataset
    from trgt_tpu.kernels import span_window
    stats = {"win": 0, "full": 0, "redo": 0}
    orig_plan = span_window.plan_windows
    orig_rc = span_window.reduce_and_certify

    def plan(p, t, *a, **k):
        r = orig_plan(p, t, *a, **k)
        stats["win" if r is not None else "full"] += 1
        return r

    def rc_(plans, owners, subr, n, *a):
        out, redo = orig_rc(plans, owners, subr, n, *a)
        stats["redo"] += len(redo)
        return out, redo

    span_window.plan_windows = plan
    span_window.reduce_and_certify = rc_
    try:
        prefix = os.path.join(td, "adv_stats")
        rc = main(["genotype", "--genome", fasta, "--repeats", bed,
                   "--reads", bam, "--output-prefix", prefix,
                   "--device", "host"])
        assert rc == 0
    finally:
        span_window.plan_windows = orig_plan
        span_window.reduce_and_certify = orig_rc
    # adversarial reads must hit the windowed path AND produce
    # certificate failures (heavy boundary indels score past the
    # certified error budget and are recomputed on the full text)
    assert stats["win"] > 0
    assert stats["redo"] > 0
