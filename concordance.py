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
    for genotyper, karyotype, tag, n, chrom, hap in configs:
        dsdir = dataset_dir(tag, n, 42, chrom=chrom, haploid_homs=hap)
        truth = json.load(open(os.path.join(dsdir, "truth.json")))
        outs = {}
        times = {}
        for device in (args.device, "host"):
            prefix = os.path.join(dsdir, f"out_{genotyper}_{device}")
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
                 f"--device {args.device}` (seed 42). Catalog: motif "
                 "lengths 1-10, TR lengths 10bp-10kb, depths 10-200, "
                 "error rates 0-2%, hom/het/double-het genotypes, "
                 "multi-motif HMMs; XY config runs haploid chrX loci.\n\n")
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
