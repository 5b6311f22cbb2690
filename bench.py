"""Benchmark: end-to-end genotyping throughput (loci/sec) on the default
JAX backend (TPU under the driver).

Replays the bundled example locus as a multi-locus catalog and times the
full pipeline — BAM fetch/parse, span location (device flank DP on the
~half of read×flank problems that miss the exact-substring path),
genotyping, device HMM annotation, VCF+BAM output. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is the speedup of the device-kernel path over the host-only
(numpy) path measured in the same run — the reference TRGT Rust binary
cannot be built in this image (no cargo), so the in-run host path is the
honest baseline anchor; see BASELINE.md.

Robustness: the remote-TPU tunnel can hang indefinitely (wedged grants),
so every measured run executes in a subprocess with its own timeout; on
device failure the bench falls back to CPU-JAX kernels.
"""

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))

EXAMPLE = "/root/reference/example"
N_LOCI = 256


def make_catalog(path: str, n: int) -> None:
    with open(path, "w") as fh:
        for i in range(n):
            fh.write(f"chrA\t10001\t10061\tID=TR{i + 1};MOTIFS=CAG;"
                     f"STRUC=<TR>\n")


def run_pipeline_inproc(workdir: str, device_mode: str) -> float:
    from trgt_tpu.jax_setup import setup_jax_cache
    setup_jax_cache()
    from trgt_tpu.cli import main
    catalog = os.path.join(workdir, "repeats.bed")
    if not os.path.exists(catalog):
        make_catalog(catalog, N_LOCI)
    prefix = os.path.join(workdir, f"bench_{device_mode}")
    t0 = time.time()
    rc = main([
        "genotype",
        "--genome", os.path.join(EXAMPLE, "reference.fasta"),
        "--repeats", catalog,
        "--reads", os.path.join(EXAMPLE, "sample.bam"),
        "--output-prefix", prefix,
        "--device", device_mode,
    ])
    elapsed = time.time() - t0
    assert rc == 0
    return N_LOCI / elapsed


def run_pipeline_subproc(workdir: str, device_mode: str,
                         timeout_s: float, warmup: bool):
    """Run (optionally warmup+) timed pipeline in a subprocess.
    Returns loci/sec or None on failure/timeout."""
    code = (
        "import sys; sys.path.insert(0, {repo!r})\n"
        "import bench\n"
        "w = {warmup!r}\n"
        "if w: bench.run_pipeline_inproc({workdir!r}, {mode!r})\n"
        "lps = bench.run_pipeline_inproc({workdir!r}, {mode!r})\n"
        "print('LPS', lps)\n"
    ).format(repo=REPO, workdir=workdir, mode=device_mode, warmup=warmup)
    try:
        proc = subprocess.run([sys.executable, "-c", code],
                              capture_output=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return None
    for line in proc.stdout.decode().splitlines():
        if line.startswith("LPS "):
            return float(line.split()[1])
    return None


def main():
    workdir = tempfile.mkdtemp(prefix="trgt_bench_")
    make_catalog(os.path.join(workdir, "repeats.bed"), N_LOCI)

    # timed device run (warmup + measurement in one subprocess; the
    # persistent compile cache makes the warmup cheap on reruns)
    device_lps = run_pipeline_subproc(workdir, "auto", timeout_s=2400,
                                      warmup=True)
    metric = "genotype loci/sec (example-locus replay, e2e)"
    if device_lps is None:
        metric = ("genotype loci/sec (example-locus replay, e2e; "
                  "TPU unavailable, CPU-JAX kernels)")
        device_lps = run_pipeline_subproc(workdir, "cpu", timeout_s=900,
                                          warmup=True)

    host_lps = run_pipeline_subproc(workdir, "host", timeout_s=900,
                                    warmup=False)

    if device_lps is None and host_lps is None:
        print(json.dumps({"metric": metric, "value": 0.0,
                          "unit": "loci/sec/chip", "vs_baseline": 0.0}))
        return
    if device_lps is None:
        device_lps = host_lps
        metric += " [numpy host fallback]"
    vs = device_lps / host_lps if host_lps else 1.0
    print(json.dumps({
        "metric": metric,
        "value": round(device_lps, 3),
        "unit": "loci/sec/chip",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
