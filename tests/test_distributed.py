"""jax.distributed multi-process path (VERDICT r2 'Next round' #7):
two OS processes join a coordinator via TRGT_COORDINATOR_ADDRESS, each
runs its catalog shard of the production `genotype` pipeline on the CPU
backend (8 virtual devices each → per-process local mesh), and the
riffled shard outputs must equal the unsharded run byte-for-byte.

This exercises mesh.initialize_distributed (previously scaffolding no
test touched) end to end: cluster bootstrap, local-device mesh under a
multi-process runtime, and shard-combine semantics."""

import os
import random
import socket
import subprocess
import sys

from trgt_tpu.cli import main
from trgt_tpu.io.bgzf import BgzfReader

from synth import SynthLocus, make_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _records(prefix):
    data = BgzfReader(prefix + ".vcf.gz").read_all().decode()
    return [line for line in data.splitlines()
            if line and not line.startswith("#")]


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_shards(tmp_path):
    rng = random.Random(7)
    motifs = ["CAG", "GGC", "AT", "AAAG"]
    loci = []
    for i in range(40):
        motif = motifs[i % len(motifs)]
        ref = rng.randint(5, 14)
        a1 = max(2, ref + rng.randint(-3, 5))
        a2 = max(2, ref + rng.randint(-3, 5))
        loci.append(SynthLocus(f"D{i:02d}", motif, ref, (a1, a2)))
    fasta, bed, bam = make_dataset(str(tmp_path), loci, depth=8,
                                   flank=320, read_flank=280, seed=5)

    # unsharded baseline, in-process (conftest already forces CPU)
    rc = main(["genotype", "--genome", fasta, "--repeats", bed,
               "--reads", bam, "--output-prefix",
               str(tmp_path / "whole"), "--disable-bam-output"])
    assert rc == 0
    whole = _records(str(tmp_path / "whole"))
    assert len(whole) == 40

    # two processes, one coordinator; each joins the cluster and runs
    # its shard over its OWN local 8-device CPU mesh
    port = _free_port()
    env = dict(os.environ)
    env["TRGT_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    code = (
        "import sys, jax; sys.path.insert(0, {repo!r})\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from trgt_tpu.cli import main\n"
        "rc = main(['genotype', '--genome', {fasta!r}, '--repeats',\n"
        "           {bed!r}, '--reads', {bam!r}, '--output-prefix',\n"
        "           {prefix!r}, '--disable-bam-output',\n"
        "           '--shard-count', '2', '--shard-index', {idx!r}])\n"
        "import jax as j\n"
        "assert len(j.devices()) == 16, j.devices()   # global cluster\n"
        "assert len(j.local_devices()) == 8\n"
        "sys.exit(rc)\n"
    )
    procs = []
    for idx in ("0", "1"):
        procs.append(subprocess.Popen(
            [sys.executable, "-c",
             code.format(repo=REPO, fasta=fasta, bed=bed, bam=bam,
                         prefix=str(tmp_path / f"s{idx}"), idx=idx)],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE))
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err.decode()[-2000:]

    shard0 = _records(str(tmp_path / "s0"))
    shard1 = _records(str(tmp_path / "s1"))
    assert len(shard0) + len(shard1) == len(whole)
    riffled = []
    it0, it1 = iter(shard0), iter(shard1)
    for i in range(len(whole)):
        riffled.append(next(it0 if i % 2 == 0 else it1))
    assert riffled == whole
