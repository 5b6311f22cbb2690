#!/usr/bin/env python
"""Cohort-merge scale artifact (ref workload:
src/merge/vcf_processor.rs:237-337): synthesize an 8-sample cohort of
TRGT VCFs (~N records each, two samples in legacy 0.4.0 format with no
trgtVersion header, integer AM, and pre-1.0 POS/padding conventions to
exercise the compat paths), run `trgt merge` in a subprocess, and
report wall time + the merge process's peak RSS.

Flat memory = RSS stays far below the total input size and does not
scale with N (the text reader streams records; merge/vcf_text.py).

Usage: python benchmarks/merge_cohort.py [--n 10000] [--samples 8]
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

CONTIGS = [("chrM1", 60_000_000), ("chrM2", 60_000_000),
           ("chrM3", 60_000_000)]
MOTIF = "CAG"

HDR_CURRENT = """##fileformat=VCFv4.2
##FILTER=<ID=PASS,Description="All filters passed">
##INFO=<ID=TRID,Number=1,Type=String,Description="Tandem repeat ID">
##INFO=<ID=END,Number=1,Type=Integer,Description="End position of the variant described in this record">
##INFO=<ID=MOTIFS,Number=.,Type=String,Description="Motifs that the tandem repeat is composed of">
##INFO=<ID=STRUC,Number=1,Type=String,Description="Structure of the region">
##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">
##FORMAT=<ID=AL,Number=.,Type=Integer,Description="Length of each allele">
##FORMAT=<ID=ALLR,Number=.,Type=String,Description="Length range per allele">
##FORMAT=<ID=SD,Number=.,Type=Integer,Description="Number of spanning reads supporting per allele">
##FORMAT=<ID=MC,Number=.,Type=String,Description="Motif counts per allele">
##FORMAT=<ID=MS,Number=.,Type=String,Description="Motif spans per allele">
##FORMAT=<ID=AP,Number=.,Type=Float,Description="Allele purity per allele">
##FORMAT=<ID=AM,Number=.,Type=Float,Description="Mean methylation level per allele">
{contigs}
##trgtVersion=3.0.0-tpu
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t{sample}
"""

# legacy 0.4.0: no trgtVersion line; sniffed from ALLR + integer AM
# (merge/vcf_text._sniff_version; ref vcf_reader.rs:127-176)
HDR_LEGACY = """##fileformat=VCFv4.2
##FILTER=<ID=PASS,Description="All filters passed">
##INFO=<ID=TRID,Number=1,Type=String,Description="Tandem repeat ID">
##INFO=<ID=END,Number=1,Type=Integer,Description="End position of the variant described in this record">
##INFO=<ID=MOTIFS,Number=.,Type=String,Description="Motifs that the tandem repeat is composed of">
##INFO=<ID=STRUC,Number=1,Type=String,Description="Structure of the region">
##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">
##FORMAT=<ID=AL,Number=.,Type=Integer,Description="Length of each allele">
##FORMAT=<ID=ALLR,Number=.,Type=String,Description="Length range per allele">
##FORMAT=<ID=SD,Number=.,Type=Integer,Description="Number of spanning reads supporting per allele">
##FORMAT=<ID=MC,Number=.,Type=String,Description="Motif counts per allele">
##FORMAT=<ID=MS,Number=.,Type=String,Description="Motif spans per allele">
##FORMAT=<ID=AP,Number=.,Type=Float,Description="Allele purity per allele">
##FORMAT=<ID=AM,Number=.,Type=Integer,Description="Mean methylation level per allele">
{contigs}
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t{sample}
"""


def sites(n):
    """Deterministic site list: (contig, start_1based, copies)."""
    per = (n + len(CONTIGS) - 1) // len(CONTIGS)
    out = []
    for ci, (contig, _len) in enumerate(CONTIGS):
        for k in range(min(per, n - ci * per)):
            start = 10_000 + k * 500
            copies = 5 + (k % 20)
            out.append((contig, start, copies, f"COHORT_{ci}_{k}"))
    return out


def write_sample(path, sample_i, site_list, legacy):
    from trgt_tpu.io.bgzf import BgzfWriter
    contig_lines = "\n".join(
        f"##contig=<ID={c},length={l}>" for c, l in CONTIGS)
    hdr = (HDR_LEGACY if legacy else HDR_CURRENT).format(
        contigs=contig_lines, sample=f"sample{sample_i}")
    w = BgzfWriter(path)
    w.write(hdr.encode())
    for si, (contig, start, copies, trid) in enumerate(site_list):
        if (si + sample_i) % 11 == 0:
            continue                      # per-sample missing sites
        tr = MOTIF * copies
        alt_tr = MOTIF * (copies + 1)
        het = (si + sample_i) % 3 == 0
        end = start + len(tr)
        if legacy:
            pos, ref = start + 1, tr      # pre-1.0: no padding base
            alt = alt_tr if het else "."
            am = f"{(si * 7) % 256},{(si * 13) % 256}"
        else:
            pos, ref = start, "T" + tr    # genome is all-T
            alt = "T" + alt_tr if het else "."
            am = f"{((si * 7) % 256) / 255.0:g},{((si * 13) % 256) / 255.0:g}"
        gt = "0/1" if het else "0/0"
        al = (f"{len(tr)},{len(alt_tr)}" if het
              else f"{len(tr)},{len(tr)}")
        allr = ",".join(f"{x}-{x}" for x in al.split(","))
        mc = (f"{copies},{copies + 1}" if het else f"{copies},{copies}")
        ms = ",".join(f"0(0-{x})" for x in al.split(","))
        row = [contig, str(pos), ".", ref, alt, ".", ".",
               f"TRID={trid};END={end};MOTIFS={MOTIF};STRUC=<TR>",
               "GT:AL:ALLR:SD:MC:MS:AP:AM",
               f"{gt}:{al}:{allr}:12,11:{mc}:{ms}:"
               f"0.990000,0.980000:{am}"]
        w.write(("\t".join(row) + "\n").encode())
    w.close()


def write_genome(path):
    fai = []
    with open(path, "w") as fh:
        for contig, length in CONTIGS:
            fh.write(f">{contig}\n")
            offset = fh.tell()
            # merge only fetches single padding bases; an all-T contig
            # matching the synthetic records' padding keeps this small
            line = "T" * 60
            n_lines = length // 60
            for _ in range(n_lines):
                fh.write(line + "\n")
            fai.append(f"{contig}\t{n_lines * 60}\t{offset}\t60\t61")
    with open(path + ".fai", "w") as fh:
        fh.write("\n".join(fai) + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10000)
    ap.add_argument("--samples", type=int, default=8)
    ap.add_argument("--legacy", type=int, default=2,
                    help="how many samples use the 0.4.0 format")
    ap.add_argument("--workdir", default="/tmp/trgt_merge_cohort")
    ap.add_argument("--bcf", action="store_true",
                    help="convert the current-format samples to BCF "
                         "inputs (streaming BcfStreamReader path, "
                         "VERDICT r4 next #7); legacy samples stay "
                         "text to keep the 0.4.0 compat coverage")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    site_list = sites(args.n)
    genome = os.path.join(args.workdir, "ref.fasta")
    if not os.path.exists(genome):
        write_genome(genome)
    t0 = time.time()
    paths = []
    for s in range(args.samples):
        p = os.path.join(args.workdir, f"sample{s}_n{args.n}.vcf.gz")
        if not os.path.exists(p):
            write_sample(p, s, site_list, legacy=s < args.legacy)
        paths.append(p)
    if args.bcf:
        conv = []
        for s, p in enumerate(paths):
            if s < args.legacy:
                conv.append(p)     # text legacy: 0.4.0 compat coverage
                continue
            b = p.replace(".vcf.gz", ".bcf.gz")
            if not os.path.exists(b):
                r = subprocess.run(
                    [sys.executable, "-m", "trgt_tpu", "merge",
                     "--vcf", p, "--force-single", "-O", "b",
                     "--output", b], cwd=REPO, capture_output=True,
                    text=True)
                if r.returncode != 0:
                    sys.stderr.write(r.stderr[-2000:])
                    raise SystemExit(1)
            conv.append(b)
        paths = conv
    gen_s = time.time() - t0
    input_mb = sum(os.path.getsize(p) for p in paths) / 1e6

    out = os.path.join(args.workdir,
                       f"merged_n{args.n}{'_bcf' if args.bcf else ''}"
                       ".vcf.gz")
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "trgt_tpu", "merge",
         "--vcf", *paths, "--genome", genome, "--output", out],
        cwd=REPO, capture_output=True, text=True)
    wall = time.time() - t0
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-2000:])
        raise SystemExit(1)
    child_rss_mb = resource.getrusage(
        resource.RUSAGE_CHILDREN).ru_maxrss / 1024.0

    # output invariants: every site present, 8 sample columns
    import gzip
    n_rows = 0
    n_cols = None
    with gzip.open(out, "rt") as fh:
        for line in fh:
            if line.startswith("#"):
                continue
            n_rows += 1
            n_cols = len(line.rstrip("\n").split("\t"))
    assert n_rows == len(site_list), (n_rows, len(site_list))
    assert n_cols == 9 + args.samples

    print(json.dumps({
        "bcf_inputs": args.bcf,
        "samples": args.samples,
        "legacy_samples": args.legacy,
        "records_per_sample": len(site_list),
        "total_input_records": len(site_list) * args.samples,
        "input_mb": round(input_mb, 1),
        "merge_wall_s": round(wall, 2),
        "merge_peak_rss_mb": round(child_rss_mb, 1),
        "records_per_sec": round(len(site_list) / wall, 0),
        "gen_s": round(gen_s, 1),
        "output": out,
    }))


if __name__ == "__main__":
    main()
