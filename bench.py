"""Benchmark: end-to-end genotyping throughput (loci/sec) on the default
JAX backend (TPU under the driver).

Replays the bundled example locus as a multi-locus catalog and times the
full pipeline — BAM fetch/parse, span location, genotyping, device HMM
annotation, VCF+BAM output. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is the speedup of the device-engine path over the host-only
(numpy) path measured in the same run — the reference TRGT Rust binary
cannot be built in this image (no cargo), so the in-run host path is the
honest baseline anchor; see BASELINE.md.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Persistent XLA compilation cache: TPU (re)compiles dominate cold-start
# wall time, especially over a remote-compile tunnel.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
try:
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

EXAMPLE = "/root/reference/example"
N_LOCI = 64


def make_catalog(path: str, n: int) -> None:
    with open(path, "w") as fh:
        for i in range(n):
            fh.write(f"chrA\t10001\t10061\tID=TR{i + 1};MOTIFS=CAG;"
                     f"STRUC=<TR>\n")


def run_pipeline(workdir: str, device_mode: str) -> float:
    from trgt_tpu.cli import main
    catalog = os.path.join(workdir, "repeats.bed")
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


def _device_reachable(timeout_s: float = 120.0) -> bool:
    """Probe the default JAX backend in a subprocess — a wedged remote-TPU
    tunnel hangs jax.devices() indefinitely, which must not take the bench
    down with it."""
    import subprocess
    code = ("import jax; jax.devices(); "
            "import jax.numpy as jnp; "
            "(jnp.ones((8,8))@jnp.ones((8,8))).block_until_ready(); "
            "print('ok')")
    try:
        proc = subprocess.run([sys.executable, "-c", code],
                              capture_output=True, timeout=timeout_s)
        return b"ok" in proc.stdout
    except subprocess.TimeoutExpired:
        return False


def main():
    workdir = tempfile.mkdtemp(prefix="trgt_bench_")
    try:
        device_ok = _device_reachable()
        if not device_ok:
            # TPU tunnel unreachable: measure the batched-kernel path on
            # CPU-JAX vs the numpy host loop so the speedup of the
            # batched design is still captured.
            run_pipeline(workdir, "cpu")   # warmup/compile
            cpu_lps = run_pipeline(workdir, "cpu")
            host_lps = run_pipeline(workdir, "host")
            print(json.dumps({
                "metric": "genotype loci/sec (example-locus replay, e2e; "
                          "TPU UNREACHABLE, CPU-JAX kernels)",
                "value": round(cpu_lps, 3),
                "unit": "loci/sec/chip",
                "vs_baseline": round(cpu_lps / host_lps, 3),
            }))
            return

        # warmup with IDENTICAL shapes (compiles device kernels; excluded
        # from timing — subsequent runs hit the persistent XLA cache)
        run_pipeline(workdir, "auto")

        device_lps = run_pipeline(workdir, "auto")
        host_lps = run_pipeline(workdir, "host")

        print(json.dumps({
            "metric": "genotype loci/sec (example-locus replay, e2e)",
            "value": round(device_lps, 3),
            "unit": "loci/sec/chip",
            "vs_baseline": round(device_lps / host_lps, 3),
        }))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
