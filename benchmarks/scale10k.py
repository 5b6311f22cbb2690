#!/usr/bin/env python
"""Sustained-throughput scale artifact: run the FULL genotype pipeline
over a 10^4-locus heterogeneous catalog (same generator/distribution as
the 96-locus bench catalog) and report loci/sec, peak RSS, and the
per-stage breakdown including the writer thread ("write" = VCF+BAMlet
record building + BGZF deflate).

The streaming model being matched is the reference's bounded-channel
producer/pool/writer (ref: src/trgt/locus.rs:95-137,
src/commands/genotype.rs:140-199): memory must stay flat in catalog
size — RSS is the evidence.

Usage: python benchmarks/scale10k.py [--n 10000] [--device host]
                                     [--threads N]
Prints one JSON line; commit the result into NOTES.md.
"""

import argparse
import json
import os
import resource
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10000)
    ap.add_argument("--device", default="host")
    ap.add_argument("--threads", type=int, default=0)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    # synthesize (or reuse) the dataset in a subprocess so generator
    # allocations don't pollute the pipeline's RSS measurement
    code = (
        "import sys; sys.path.insert(0, {repo!r})\n"
        "from trgt_tpu.utils.synth import cached_hetero_dataset\n"
        "print(cached_hetero_dataset({n}, seed={seed}, tag='scale'))\n"
    ).format(repo=REPO, n=args.n, seed=args.seed)
    t0 = time.time()
    proc = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                          capture_output=True, text=True, check=True)
    dsdir = proc.stdout.strip().splitlines()[-1]
    synth_s = time.time() - t0

    from trgt_tpu.cli import main as cli_main
    from trgt_tpu.engine import pipeline

    argv = [
        "genotype",
        "--genome", os.path.join(dsdir, "ref.fasta"),
        "--repeats", os.path.join(dsdir, "repeats.bed"),
        "--reads", os.path.join(dsdir, "reads.bam"),
        "--output-prefix", os.path.join(dsdir, f"scale_{args.device}"),
        "--device", args.device,
    ]
    if args.threads:
        argv += ["--threads", str(args.threads)]
    pipeline.STAGE_TIMES.clear()
    t0 = time.time()
    rc = cli_main(argv)
    wall = time.time() - t0
    assert rc == 0
    stages = {k: round(v, 1) for k, v in pipeline.STAGE_TIMES.items()}
    rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
    # -t N runs worker PROCESSES: the flat-memory evidence must cover
    # them too (max child RSS; the dataset-synth subprocess above also
    # lands here, so prefer the -t1 number for the streaming claim)
    child_rss_mb = resource.getrusage(
        resource.RUSAGE_CHILDREN).ru_maxrss / 1024.0
    vcf = os.path.join(dsdir, f"scale_{args.device}.vcf.gz")
    print(json.dumps({
        "n_loci": args.n,
        "device": args.device,
        "threads": args.threads or 1,
        "lps": round(args.n / wall, 2),
        "wall_s": round(wall, 1),
        "rss_mb": round(rss_mb, 1),
        "max_child_rss_mb": round(child_rss_mb, 1),
        "stages": stages,
        "write_frac_of_wall": round(stages.get("write", 0.0) / wall, 3),
        # thread CPU time of the writer — the wall timer above also
        # counts GIL waits, overstating the writer's real cost
        "write_cpu_frac_of_wall": round(
            stages.get("write_cpu", 0.0) / wall, 3),
        "synth_s": round(synth_s, 1),
        "vcf_bytes": os.path.getsize(vcf),
        "dataset": dsdir,
    }))


if __name__ == "__main__":
    main()
