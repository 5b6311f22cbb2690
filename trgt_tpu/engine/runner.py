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


def iter_spanning_records(tid_of, locus, results, flank_len: int):
    """Yield (length-prefixed record bytes, ref_id, pos, ref_end) for
    each spanning read of a locus (ref: src/trgt/writers/
    write_bam.rs:72-144). Shared by the in-process writer and the -t N
    worker protocol, so both produce identical record bytes."""
    from ..io.bam_write import build_record
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
        contig_id = tid_of(locus.region.contig)

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
            yield rec, contig_id, pos, pos + ref_span
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

        rec_b, ref_end = build_record(read.id, flag, contig_id, pos, mapq,
                                      cigar, read.bases.decode(),
                                      read.quals, aux)
        yield rec_b, contig_id, pos, ref_end


def write_spanning_reads(bam_writer: BamWriter, locus, results,
                         flank_len: int) -> None:
    for rec, rid, pos, ref_end in iter_spanning_records(
            bam_writer.header.tid, locus, results, flank_len):
        bam_writer.write_encoded(rec, rid, pos, ref_end)


def open_alignments(reads_path: str, genome_path: Optional[str] = None):
    """BAM or CRAM reader by magic sniffing (ref: rust-htslib
    IndexedReader::from_path + set_reference, commands/genotype.rs:46)."""
    with open(reads_path, "rb") as fh:
        magic = fh.read(4)
    if magic == b"CRAM":
        from ..io.cram import CramReader
        return CramReader(reads_path, genome_path)
    return BamReader(reads_path)


def _run_genotype_procs(args, vcf_writer, bam_writer, nproc: int):
    """Spawn `nproc` worker processes (engine/worker.py), hand out
    catalog chunks dynamically (first worker to ask gets the next
    chunk — the work-distribution property of the reference's rayon
    pool, commands/genotype.rs:178-187), and k-way merge the framed
    output records by catalog stream index, which reproduces the -t1
    byte order exactly (chunks are granted in ascending order, so each
    worker's indices ascend). Worker 0 inherits the requested device
    mode; the rest run host-side (the single-client TPU tunnel admits
    one device process)."""
    import heapq
    import json
    import struct
    import subprocess
    import threading

    pkg_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    level = logging.getLogger("trgt").getEffectiveLevel()
    procs = []
    for wk in range(nproc):
        a = dict(vars(args))
        if wk > 0:
            a["device"] = "host"
        env = None
        if a.get("device") == "host":
            # host workers never dispatch: skip the axon PJRT plugin
            # registration (sitecustomize) and pin the cpu backend via
            # env so the worker can skip importing jax entirely —
            # ~2.5s of startup per worker on this image
            env = dict(os.environ)
            env.pop("PALLAS_AXON_POOL_IPS", None)
            env["JAX_PLATFORMS"] = "cpu"
        spec = {"args": a, "worker_index": wk, "log_level": level}
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "trgt_tpu.engine.worker",
             json.dumps(spec)],
            stdout=subprocess.PIPE, stdin=subprocess.PIPE,
            cwd=pkg_root, env=env))

    def read_exact(fh, k):
        buf = b""
        while len(buf) < k:
            chunk = fh.read(k - len(buf))
            if not chunk:
                return None
            buf += chunk
        return buf

    stats = [None] * nproc

    # dynamic chunk grants: chunk requests arrive as b'R' frames and
    # are answered in arrival order with the next unassigned chunk, so
    # an expensive locus only delays its own worker
    chunk_size = int(os.environ.get("TRGT_TPU_CHUNK", "2"))
    grant_lock = threading.Lock()
    next_start = [0]

    def grant_chunk(i):
        with grant_lock:
            start = next_start[0]
            next_start[0] += chunk_size
        try:
            procs[i].stdin.write(struct.pack("<qq", start, chunk_size))
            procs[i].stdin.flush()
        except (BrokenPipeError, OSError):
            pass   # worker ended its stream; E-frame handling decides

    def read_frame(i):
        """Parse one L/E frame from worker i's pipe, answering R
        frames inline; None at end-of-stream."""
        fh = procs[i].stdout
        while True:
            tag = read_exact(fh, 1)
            if tag is None:
                raise RuntimeError(
                    f"genotype worker {i} exited without end-of-stream "
                    f"(rc={procs[i].poll()})")
            if tag == b"R":
                grant_chunk(i)
                continue
            if tag == b"E":
                stats[i] = struct.unpack("<QQ", read_exact(fh, 16))
                return None
            if tag != b"L":
                raise RuntimeError(
                    f"genotype worker {i}: bad frame tag {tag!r}")
            j, vcf_len, n_bam = struct.unpack("<QII", read_exact(fh, 16))
            vcf = read_exact(fh, vcf_len)
            recs = []
            for _ in range(n_bam):
                rec_len, rid, pos, ref_end = struct.unpack(
                    "<Iiqq", read_exact(fh, 24))
                recs.append((read_exact(fh, rec_len), rid, pos, ref_end))
            return j, vcf, recs

    # one reader thread per worker: the merge loop consumes indices in
    # strict interleave, so without buffering a worker would stall on a
    # full 64KB pipe whenever a sibling lags — the bounded queues give
    # each worker a deep runahead window instead. The reader also
    # answers its worker's chunk requests, so grants never wait on the
    # merge loop.
    import queue as queue_mod
    queues = [queue_mod.Queue(maxsize=256) for _ in range(nproc)]

    def reader_main(i):
        try:
            while True:
                frame = read_frame(i)
                queues[i].put(frame)
                if frame is None:
                    return
        except Exception as e:   # surfaced on the merge thread
            queues[i].put(("ERR", e))

    readers = [threading.Thread(target=reader_main, args=(i,), daemon=True)
               for i in range(nproc)]
    for t in readers:
        t.start()

    def next_frame(i):
        frame = queues[i].get()
        if frame is not None and isinstance(frame[0], str):
            raise frame[1]
        return frame

    heap = []
    for i in range(nproc):
        frame = next_frame(i)
        if frame is not None:
            heapq.heappush(heap, (frame[0], i, frame[1], frame[2]))
    while heap:
        _, i, vcf, recs = heapq.heappop(heap)
        vcf_writer.write_bytes(vcf)
        if bam_writer is not None:
            for rec, rid, pos, ref_end in recs:
                bam_writer.write_encoded(rec, rid, pos, ref_end)
        frame = next_frame(i)
        if frame is not None:
            heapq.heappush(heap, (frame[0], i, frame[1], frame[2]))
    for t in readers:
        t.join()

    for i, p in enumerate(procs):
        rc = p.wait()
        p.stdout.close()
        if rc != 0:
            # stats[i] set ⇒ the end-of-stream frame arrived, so every
            # output record was delivered; a nonzero exit after that is
            # a teardown artifact (e.g. a device thread blocked on the
            # stalled link aborting interpreter shutdown), not data loss
            if stats[i] is None:
                raise RuntimeError(f"genotype worker {i} failed (rc={rc})")
            log.warning("genotype worker %d exited rc=%d after "
                        "end-of-stream (teardown artifact); outputs "
                        "are complete", i, rc)
    n_ok = sum(s[0] for s in stats if s)
    # every worker parses the whole catalog, so BED parse errors are
    # counted once per worker — max() recovers the -t1 count
    n_err = max((s[1] for s in stats if s), default=0)
    return n_ok, n_err


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

    num_threads = getattr(args, "num_threads", 1)
    if num_threads > 1 and os.environ.get("TRGT_TPU_PROCS", "1") != "0":
        # -t N runs N worker PROCESSES over strided catalog slices
        # (zero-coordination shards; the GIL caps the in-process thread
        # path at ~1.2x). The parent only merges rendered record bytes,
        # so output is byte-identical to -t1. TRGT_TPU_PROCS=0 restores
        # the in-process thread path.
        try:
            n_ok, n_err = _run_genotype_procs(args, vcf_writer, bam_writer,
                                              num_threads)
        finally:
            vcf_writer.close()
            if bam_writer is not None:
                bam_writer.close()
        log.info("Processed %d loci (%d errors)", n_ok, n_err)
        return

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
