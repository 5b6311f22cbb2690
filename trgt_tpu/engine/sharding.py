"""Multi-chip dry run: the PRODUCTION genotype pipeline over a device
mesh (SURVEY.md §5.8).

The reference scales with a single-process rayon pool
(ref: src/commands/genotype.rs:140-199); the TPU-native model is pure
data parallelism over the batch axis of every kernel dispatch, installed
process-wide by trgt_tpu/mesh.py and used automatically by run_genotype.

`dryrun(n)` builds a synthetic multi-locus dataset (FASTA + BED + BAM,
utils/synth.py), runs the REAL `genotype` command twice — once with the
batched device pipeline over an n-device mesh, once on the host (numpy)
path — and asserts the VCF bodies are byte-identical. This certifies
that the production code path (extraction → batched span DP → genotyper
→ batched Viterbi → VCF writer) compiles, partitions, and executes
correctly across the mesh, not merely that a synthetic jit step does.
"""

import os
import tempfile

from .. import mesh


def _vcf_body(path: str) -> bytes:
    from ..io.bgzf import BgzfReader
    data = BgzfReader(path).read_all()
    return b"\n".join(line for line in data.splitlines()
                      if not line.startswith(b"##"))


def _run(fasta, bed, bam, prefix, device):
    from ..cli import main as cli_main
    rc = cli_main(["genotype", "--genome", fasta, "--repeats", bed,
                   "--reads", bam, "--output-prefix", prefix,
                   "--device", device])
    if rc != 0:
        raise RuntimeError(f"genotype --device {device} failed ({rc})")
    return _vcf_body(prefix + ".vcf.gz")


def dryrun(n_devices: int) -> None:
    """Run one production genotyping pass over an n-device mesh and
    verify it reproduces the host-path output byte-for-byte."""
    from ..utils.synth import SynthLocus, make_dataset

    # the dry run executes on the virtual-device CPU backend; loading
    # persistent-cache entries compiled on a different machine spams
    # XLA:CPU AOT machine-feature warnings that would mask a real error
    # in the driver tail — CPU compiles are cheap, skip the cache
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", None)
    except Exception:
        pass

    loci = [
        SynthLocus("HOM", "CAG", 15, (15, 15)),
        SynthLocus("HET", "CAG", 10, (10, 20)),
        SynthLocus("EXP", "GGC", 8, (8, 40)),
        SynthLocus("REF", "AT", 12, (12, 12)),
        SynthLocus("A10", "A", 10, (10, 14)),
        SynthLocus("MIX", "CAG", 12, (12, 16), motifs="CAG,CAA"),
    ]
    prev = os.environ.get("TRGT_TPU_MESH")
    os.environ["TRGT_TPU_MESH"] = str(n_devices)
    try:
        with tempfile.TemporaryDirectory() as td:
            fasta, bed, bam = make_dataset(td, loci, depth=10)
            meshed = _run(fasta, bed, bam, f"{td}/mesh", "auto")
            assert mesh.current_mesh() is not None and \
                mesh.current_mesh().devices.size == n_devices, \
                "mesh was not active during the device run"
            mesh.disable_mesh()
            os.environ["TRGT_TPU_MESH"] = "0"
            host = _run(fasta, bed, bam, f"{td}/host", "host")
            assert meshed == host, (
                "mesh-sharded device pipeline diverged from host path")
    finally:
        mesh.disable_mesh()
        if prev is None:
            os.environ.pop("TRGT_TPU_MESH", None)
        else:
            os.environ["TRGT_TPU_MESH"] = prev
