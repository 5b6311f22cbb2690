"""`genotype` command driver (ref: src/commands/genotype.rs).

Host pipeline: stream loci → analyze (batched device kernels where
enabled) → write VCF + spanning BAM. Parallelism model differs from the
reference's rayon pool by design (SURVEY.md §5.8): loci are bucketed into
fixed-shape batches dispatched to the TPU; multi-host runs shard the
catalog (engine/sharding.py)."""

import logging
import os
import sys
import time
from typing import Optional

from .. import FULL_VERSION
from ..io.bam import BamReader
from ..io.bam_write import BamWriter, encode_bamlet_record
from ..io.catalog import iter_loci
from ..io.fasta import FastaReader
from ..io.vcf_write import VcfWriter
from ..reads import clip_bases
from ..utils import Genotyper, Karyotype, TrgtScoring
from .workflow import Params, analyze_tr

log = logging.getLogger("trgt")
PROGRAM_NAME = "trgt"


def get_sample_name(reads_path: str, header) -> str:
    # ref: src/utils/bam_utils.rs:22-47
    names = header.sample_names()
    if len(names) == 1:
        return names[0]
    if len(names) == 0:
        log.warning("No sample names found")
    else:
        log.warning("Multiple sample names found")
    stem = os.path.basename(reads_path)
    for ext in (".bam", ".cram"):
        if stem.endswith(ext):
            stem = stem[:-len(ext)]
    return stem


def write_spanning_reads(bam_writer: BamWriter, locus, results,
                         flank_len: int) -> None:
    # ref: src/trgt/writers/write_bam.rs:72-144
    for index in range(len(results.reads)):
        read = results.reads[index]
        classification = results.classification[index]
        span = results.tr_spans[index]
        if span[0] < flank_len or len(read.bases) < span[1] + flank_len:
            log.error("Read %s has unexpectedly short flanks", read.id)
            continue
        left_clip = span[0] - flank_len
        right_clip = len(read.bases) - span[1] - flank_len
        clipped = clip_bases(read, left_clip, right_clip)
        if clipped is None:
            log.error("Read %s has unexpectedly short flanks", read.id)
            continue
        read = clipped
        contig_id = bam_writer.header.tid(locus.region.contig)

        flag = 0x10 if read.is_reverse else 0
        if read.cigar is not None:
            pos = read.cigar.ref_pos
            cigar = read.cigar.ops
            mapq = read.mapq
        else:
            pos = locus.region.start
            cigar = None
            flag |= 0x4
            mapq = 0  # htslib's zero-initialized record default

        rq = read.read_qual if read.read_qual is not None else -1.0
        rec = encode_bamlet_record(
            read.id, flag, contig_id, pos, mapq, cigar, read.bases,
            read.quals, locus.id, rq, read.meth, read.mismatch_offsets,
            read.hp_tag, read.start_offset, read.end_offset,
            classification, flank_len)
        if rec is not None:
            ref_span = sum(length for length, op in (cigar or [])
                           if op in "MDN=X")
            bam_writer.write_encoded(rec, contig_id, pos,
                                     pos + ref_span)
            continue
        aux = [("TR", "Z", locus.id),
               ("rq", "f", rq)]
        if read.meth is not None:
            aux.append(("MC", "B", ("C", read.meth)))
        if read.mismatch_offsets is not None:
            aux.append(("MO", "B", ("i", read.mismatch_offsets)))
        if read.hp_tag is not None:
            aux.append(("HP", "C", read.hp_tag))
        aux.append(("SO", "i", read.start_offset))
        aux.append(("EO", "i", read.end_offset))
        aux.append(("AL", "i", classification))
        aux.append(("FL", "B", ("I", [flank_len, flank_len])))

        bam_writer.write_record(read.id, flag, contig_id, pos, mapq, cigar,
                                read.bases.decode(), read.quals, aux)


def open_alignments(reads_path: str, genome_path: Optional[str] = None):
    """BAM or CRAM reader by magic sniffing (ref: rust-htslib
    IndexedReader::from_path + set_reference, commands/genotype.rs:46)."""
    with open(reads_path, "rb") as fh:
        magic = fh.read(4)
    if magic == b"CRAM":
        from ..io.cram import CramReader
        return CramReader(reads_path, genome_path)
    return BamReader(reads_path)


def run_genotype(args) -> None:
    karyotype = Karyotype.new(args.karyotype)
    genotyper = Genotyper.from_str(args.genotyper)
    scoring = TrgtScoring.from_string(args.aln_scoring)

    bam = open_alignments(args.reads_path, args.genome_path)
    if not bam.header.is_mapped():
        raise RuntimeError("Input BAM is not mapped")
    sample_name = args.sample_name or get_sample_name(args.reads_path,
                                                      bam.header)

    command_line = " ".join(sys.argv)
    vcf_path = f"{args.output_prefix}.vcf.gz"
    vcf_writer = VcfWriter(vcf_path, sample_name, bam.header.references,
                           command_line, FULL_VERSION, PROGRAM_NAME)

    output_flank_len = min(args.flank_len, args.output_flank_len)
    bam_writer = None
    if not args.disable_bam_output:
        header_text = bam.header.text
        if not header_text.endswith("\n") and header_text:
            header_text += "\n"
        header_text += (f"@PG\tID:{PROGRAM_NAME}\tPN:{PROGRAM_NAME}\t"
                        f"CL:{command_line}\tVN:{FULL_VERSION}\n")
        bam_writer = BamWriter(f"{args.output_prefix}.spanning.bam",
                               header_text, bam.header.references)

    params = Params(
        min_flank_id_frac=args.min_flank_id_frac,
        min_read_qual=args.min_hifi_read_qual,
        search_flank_len=args.flank_len,
        max_depth=args.max_depth,
        aln_scoring=scoring,
    )

    device_mode = getattr(args, "device", "auto")
    use_device = device_mode != "host"
    if device_mode in ("cpu", "host"):
        # must happen before JAX backend initialization; 'host' never
        # dispatches to a device, but stray backend discovery would
        # still grab the single-client remote-TPU tunnel
        import jax
        jax.config.update("jax_platforms", "cpu")

    shard_index = getattr(args, "shard_index", None)
    shard_count = getattr(args, "shard_count", None)
    if shard_count:
        if shard_index is None or not 0 <= shard_index < shard_count:
            raise ValueError("--shard-index must be in [0, --shard-count)")
    if use_device:
        from .. import mesh
        if shard_count:
            # multi-process mesh scaffolding (no-op without a
            # coordinator address; catalog shards then run standalone)
            mesh.initialize_distributed(shard_index, shard_count)
        # local data-parallel mesh over all visible chips
        mesh.auto_enable()

    genome = FastaReader(args.genome_path)
    n_ok = 0
    n_err = 0

    def on_error(msg):
        nonlocal n_err
        log.error("Locus processing: %s", msg)
        n_err += 1

    from .pipeline import BatchPipeline
    pipeline = BatchPipeline(
        params, use_device=use_device,
        batch_size=(getattr(args, "batch_size", None)
                    or (256 if use_device else 64)),
        num_threads=getattr(args, "num_threads", 1),
        bam_factory=lambda: open_alignments(args.reads_path,
                                            args.genome_path))
    loci = iter_loci(args.repeats_path, genome, karyotype, args.flank_len,
                     genotyper, on_error=on_error)

    # Multi-host catalog sharding (SURVEY.md §5.8): each host owns a
    # strided shard of the locus stream; per-shard outputs are combined
    # by concatenation (same sample) or `merge` (multi-sample).
    if shard_count:
        loci = (locus for i, locus in enumerate(loci)
                if i % shard_count == shard_index)
    use_writer_thread = os.environ.get("TRGT_WRITER_THREAD", "1") != "0"
    if use_writer_thread:
        # Writer thread (the reference's genotype.rs:153-164 design):
        # record building + BGZF deflate overlap the next batch's device
        # waits (which release the GIL). Records stay in pipeline order.
        import queue
        import threading
        write_queue: "queue.Queue" = queue.Queue(maxsize=4096)
        writer_error = []

        from .pipeline import _timed

        def writer_main():
            while True:
                item = write_queue.get()
                if item is None:
                    return
                w_locus, w_results = item
                try:
                    # "write" = record building + BGZF deflate; it runs
                    # on this thread and OVERLAPS pipeline compute, so
                    # it exceeding other stages does not extend wall
                    # time until it exceeds the whole pipeline.
                    # "write_cpu" is the thread's CPU time — the wall
                    # timer also counts GIL waits against the compute
                    # thread, which overstates the writer's real cost
                    t_cpu = time.thread_time()
                    with _timed("write"):
                        vcf_writer.write(w_locus, w_results)
                        if bam_writer is not None:
                            write_spanning_reads(bam_writer, w_locus,
                                                 w_results,
                                                 output_flank_len)
                    from .pipeline import STAGE_TIMES, _STAGE_LOCK
                    with _STAGE_LOCK:
                        STAGE_TIMES["write_cpu"] += \
                            time.thread_time() - t_cpu
                except Exception as e:   # surfaced on the main thread
                    writer_error.append(e)
                    return

        writer_thread = threading.Thread(target=writer_main, daemon=True)
        writer_thread.start()

        def put_checked(item) -> bool:
            # A dead writer stops draining the bounded queue; a plain
            # put() would then block forever. Re-check writer_error
            # between bounded attempts so its exception always surfaces.
            while True:
                if writer_error:
                    return False
                try:
                    write_queue.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    continue

        try:
            for locus, results in pipeline.process(loci, bam):
                if not put_checked((locus, results)):
                    break
                n_ok += 1
        finally:
            put_checked(None)
            writer_thread.join()
        if writer_error:
            raise writer_error[0]
    else:
        from .pipeline import _timed
        for locus, results in pipeline.process(loci, bam):
            with _timed("write"):
                vcf_writer.write(locus, results)
                if bam_writer is not None:
                    write_spanning_reads(bam_writer, locus, results,
                                         output_flank_len)
            n_ok += 1

    vcf_writer.close()
    if bam_writer is not None:
        bam_writer.close()
    log.info("Processed %d loci (%d errors)", n_ok, n_err)
