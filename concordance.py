"""Catalog-scale concordance harness (VERDICT r1 item 5).

Generates a deterministic heterogeneous synthetic catalog
(trgt_tpu/utils/synth.py hetero_loci: motif lengths 1-10, TR lengths
10bp-10kb, depths 10-200, error rates 0-2%, hom/het/double-het,
multi-motif HMMs) plus an XY-karyotype (haploid chrX) set, runs the
production `genotype` pipeline over each config on BOTH the device path
and the host (numpy twin) path, and asserts:

  1. device VCF == host VCF, byte-for-byte (uncompressed text), for the
     size genotyper, the cluster genotyper, and the XY/haploid path;
  2. for error-free loci, called allele lengths (AL) == the synthetic
     truth (copies x motif_len, as a multiset).

Writes CONCORDANCE.md with the results. Each pipeline run executes in
its own subprocess (JAX backend isolation; the remote-TPU tunnel must
only ever see one client). Reference analog: the tutorial golden record
(ref docs/tutorial.md:44-48) scaled to a heterogeneous catalog.

Usage: python concordance.py [--n 256] [--device auto] [--quick]
"""

import argparse
import gzip
import hashlib
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))

def dataset_dir(tag: str, n: int, seed: int, chrom: str = "chrS",
                haploid_homs: bool = False) -> str:
    from trgt_tpu.utils.synth import cached_hetero_dataset
    return cached_hetero_dataset(n, seed=seed, chrom=chrom,
                                 haploid_homs=haploid_homs, tag=tag)


def run_genotype(dsdir: str, device: str, genotyper: str, karyotype: str,
                 out_prefix: str, timeout_s: float):
    """Run `genotype` in a subprocess; returns (elapsed_s, ok)."""
    code = (
        "import sys; sys.path.insert(0, {repo!r})\n"
        "from trgt_tpu.jax_setup import setup_jax_cache\n"
        "setup_jax_cache()\n"
        "from trgt_tpu.cli import exit_cli, main\n"
        "rc = main(['genotype', '--genome', {fasta!r}, '--repeats',\n"
        "           {bed!r}, '--reads', {bam!r}, '--output-prefix',\n"
        "           {prefix!r}, '--device', {device!r}, '--genotyper',\n"
        "           {genotyper!r}, '--karyotype', {karyotype!r}])\n"
        # exit_cli skips interpreter teardown (os._exit) when raced
        # device threads were abandoned on a stalled link — plain
        # sys.exit aborts with 'FATAL: exception not rethrown' there
        "exit_cli(rc)\n"
    ).format(repo=REPO, fasta=os.path.join(dsdir, "ref.fasta"),
             bed=os.path.join(dsdir, "repeats.bed"),
             bam=os.path.join(dsdir, "reads.bam"), prefix=out_prefix,
             device=device, genotyper=genotyper, karyotype=karyotype)
    t0 = time.time()
    proc = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                          capture_output=True, timeout=timeout_s)
    ok = proc.returncode == 0 and os.path.exists(out_prefix + ".vcf.gz")
    if not ok:
        sys.stderr.write(proc.stderr.decode()[-2000:] + "\n")
    return time.time() - t0, ok


def run_genotype_resident(jobs, device: str, timeout_s: float):
    """Run ALL configs in ONE resident subprocess (the serving
    measurement: a genotyping service does not cold-start per
    catalog). The first config is visited twice — its first visit
    absorbs the one-time per-process jit-trace/compile-cache warmup
    (written to a _warm prefix and discarded); every reported time is
    a steady-state visit. Returns (times list, warmup_s, ok)."""
    job_list = [list(j) for j in jobs]
    code = (
        "import sys, time, json, os\n"
        "sys.path.insert(0, {repo!r})\n"
        "from trgt_tpu.jax_setup import setup_jax_cache\n"
        "setup_jax_cache()\n"
        "from trgt_tpu.cli import main\n"
        "jobs = {jobs!r}\n"
        "device = {device!r}\n"
        "order = [0] + list(range(len(jobs)))\n"
        "times = [None] * len(jobs)\n"
        "warm = None\n"
        "for k, idx in enumerate(order):\n"
        "    dsdir, gt, kary, prefix = jobs[idx]\n"
        "    p = prefix + '_warm' if k == 0 else prefix\n"
        "    t0 = time.time()\n"
        "    rc = main(['genotype', '--genome',\n"
        "               os.path.join(dsdir, 'ref.fasta'), '--repeats',\n"
        "               os.path.join(dsdir, 'repeats.bed'), '--reads',\n"
        "               os.path.join(dsdir, 'reads.bam'),\n"
        "               '--output-prefix', p, '--device', device,\n"
        "               '--genotyper', gt, '--karyotype', kary])\n"
        "    assert rc == 0, (idx, rc)\n"
        "    if k == 0:\n"
        "        warm = time.time() - t0\n"
        "    else:\n"
        "        times[idx] = time.time() - t0\n"
        "print('RESULT', json.dumps({{'times': times, 'warm': warm}}))\n"
        "sys.stdout.flush()\n"
        "os._exit(0)\n"
    ).format(repo=REPO, jobs=job_list, device=device)
    proc = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                          capture_output=True, timeout=timeout_s)
    for line in proc.stdout.decode().splitlines():
        if line.startswith("RESULT "):
            d = json.loads(line[len("RESULT "):])
            return d["times"], d["warm"], True
    sys.stderr.write(proc.stderr.decode()[-2000:] + "\n")
    return None, None, False


def vcf_text(path: str) -> bytes:
    with gzip.open(path, "rb") as fh:
        return fh.read()


def vcf_md5(path: str) -> str:
    return hashlib.md5(vcf_text(path)).hexdigest()


def check_truth(vcf_path: str, truth: dict):
    """Returns (n_checked, n_pass, failures) for error-free loci."""
    n_checked = n_pass = 0
    failures = []
    for line in vcf_text(vcf_path).decode().splitlines():
        if line.startswith("#"):
            continue
        fields = line.split("\t")
        info = dict(kv.split("=", 1) for kv in fields[7].split(";")
                    if "=" in kv)
        trid = info.get("TRID")
        t = truth.get(trid)
        if t is None or t["error_rate"] > 0.0:
            continue
        fmt = fields[8].split(":")
        sample = fields[9].split(":")
        rec = dict(zip(fmt, sample))
        if rec.get("AL", ".") == ".":
            failures.append((trid, "no call", t["alleles"]))
            n_checked += 1
            continue
        als = sorted(int(x) for x in rec["AL"].split(","))
        expected = t["alleles"]
        if t["haploid"]:
            expected = expected[:1]
        n_checked += 1
        if als == expected:
            n_pass += 1
        else:
            failures.append((trid, als, expected))
    return n_checked, n_pass, failures


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--n-xy", type=int, default=40)
    ap.add_argument("--device", default="auto",
                    help="device path to compare against host (auto/cpu)")
    ap.add_argument("--out", default=os.path.join(REPO, "CONCORDANCE.md"))
    ap.add_argument("--timeout", type=float, default=7200)
    ap.add_argument("--quick", action="store_true",
                    help="small catalogs + tight timeouts (the pytest "
                         "CI mode, tests/test_concordance_quick.py — "
                         "keeps this harness from silently rotting)")
    ap.add_argument("--resident", action="store_true",
                    help="one resident process per mode runs all "
                         "configs (steady-state serving times; the "
                         "one-time jit warmup is reported separately)")
    args = ap.parse_args(argv)
    if args.quick:
        args.n = min(args.n, 16)
        args.n_xy = min(args.n_xy, 6)
        args.timeout = min(args.timeout, 600)

    configs = [
        ("size", "XX", "hetero", args.n, "chrS", False),
        ("cluster", "XX", "hetero", args.n, "chrS", False),
        ("size", "XY", "heteroX", args.n_xy, "chrX", True),
    ]
    rows = []
    all_ok = True
    warmups = {}
    dsdirs = [dataset_dir(tag, n, 42, chrom=chrom, haploid_homs=hap)
              for _gt, _k, tag, n, chrom, hap in configs]
    if args.resident:
        mode_times = {}
        for device in (args.device, "host"):
            jobs = [(dsdirs[i], gt, kary,
                     os.path.join(dsdirs[i], f"out_{gt}_{device}"))
                    for i, (gt, kary, *_rest) in enumerate(configs)]
            times, warm, ok = run_genotype_resident(jobs, device,
                                                    args.timeout)
            if not ok:
                raise SystemExit(f"FAILED: resident run on {device}")
            mode_times[device] = times
            warmups[device] = warm
            print(f"[resident/{device}] warmup={warm:.1f}s "
                  f"times={[round(t, 1) for t in times]}", flush=True)
    for ci, (genotyper, karyotype, tag, n, chrom, hap) in \
            enumerate(configs):
        dsdir = dsdirs[ci]
        truth = json.load(open(os.path.join(dsdir, "truth.json")))
        outs = {}
        times = {}
        for device in (args.device, "host"):
            prefix = os.path.join(dsdir, f"out_{genotyper}_{device}")
            if args.resident:
                outs[device] = prefix + ".vcf.gz"
                times[device] = mode_times[device][ci]
                continue
            dt, ok = run_genotype(dsdir, device, genotyper, karyotype,
                                  prefix, args.timeout)
            if not ok:
                raise SystemExit(
                    f"FAILED: {genotyper}/{karyotype} on {device}")
            outs[device] = prefix + ".vcf.gz"
            times[device] = dt
        md5_dev = vcf_md5(outs[args.device])
        md5_host = vcf_md5(outs["host"])
        identical = md5_dev == md5_host
        n_checked, n_pass, failures = check_truth(outs[args.device], truth)
        all_ok &= identical and (n_pass == n_checked)
        rows.append(dict(genotyper=genotyper, karyotype=karyotype, n=n,
                         identical=identical, md5=md5_dev,
                         truth=f"{n_pass}/{n_checked}",
                         dev_s=round(times[args.device], 1),
                         host_s=round(times["host"], 1),
                         failures=failures[:10]))
        print(f"[{genotyper}/{karyotype}] identical={identical} "
              f"truth={n_pass}/{n_checked} device={times[args.device]:.1f}s "
              f"host={times['host']:.1f}s", flush=True)

    # preserve manually-committed scale sections across regenerations
    preserved = ""
    if os.path.exists(args.out):
        with open(args.out) as fh:
            old = fh.read()
        idx = old.find("\n## Scale run")
        if idx != -1:
            preserved = old[idx:]

    with open(args.out, "w") as fh:
        fh.write("# Concordance report — heterogeneous synthetic catalog\n\n")
        fh.write(f"Generated by `python concordance.py --n {args.n} "
                 f"--device {args.device}"
                 f"{' --resident' if args.resident else ''}` (seed 42). "
                 "Catalog: motif "
                 "lengths 1-10, TR lengths 10bp-10kb, depths 10-200, "
                 "error rates 0-2%, hom/het/double-het genotypes, "
                 "multi-motif HMMs; XY config runs haploid chrX loci.\n\n")
        if args.resident:
            fh.write("Resident mode: one process per mode runs every "
                     "config (the serving measurement); each row is a "
                     "steady-state visit. One-time per-process warmup "
                     "(jit trace + compile-cache load, absorbed by a "
                     "discarded first visit): "
                     + ", ".join(f"{m} {w:.1f}s"
                                 for m, w in warmups.items())
                     + ".\n\n")
        fh.write("| genotyper | karyotype | loci | device==host (VCF bytes)"
                 " | truth AL (error-free loci) | device s | host s |\n")
        fh.write("|---|---|---|---|---|---|---|\n")
        for r in rows:
            fh.write(f"| {r['genotyper']} | {r['karyotype']} | {r['n']} | "
                     f"{'YES' if r['identical'] else 'NO'} "
                     f"(md5 {r['md5'][:12]}) | {r['truth']} | "
                     f"{r['dev_s']} | {r['host_s']} |\n")
        fh.write("\n")
        for r in rows:
            if r["failures"]:
                fh.write(f"Failures ({r['genotyper']}/{r['karyotype']}): "
                         f"{r['failures']}\n")
        fh.write(f"\nOverall: {'PASS' if all_ok else 'FAIL'}\n")
        fh.write(preserved)
    print(f"Overall: {'PASS' if all_ok else 'FAIL'} -> {args.out}")
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
