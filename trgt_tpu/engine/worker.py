"""Multiprocess `-t N` genotype worker (the TPU-native answer to the
reference's rayon work-stealing pool, ref commands/genotype.rs:140-199).

The parent process (engine/runner.py) spawns N workers and hands out
catalog chunks DYNAMICALLY: a worker writes a request frame (b'R')
whenever it has fewer than two outstanding chunks, and the parent
replies on the worker's stdin with the next unassigned chunk
[start, start+count) of the (post multi-host shard) locus stream —
first-come first-served, so an expensive locus only delays its own
worker (the work-stealing property that the README credits for the
reference's 200x targeted speed-up). Chunks are granted in globally
ascending order, which makes each worker's output indices ascending,
so the parent's k-way merge by stream index reproduces the -t1 output
byte stream exactly.

Each worker runs the ordinary BatchPipeline over its granted loci and
ships RENDERED output records (VCF line bytes + length-prefixed BAM
record bytes, produced by exactly the same code as the single-process
writer) to the parent over stdout.

Frame protocol (little-endian), worker stdout:
  b'R'                                 (chunk request)
  b'L' u64 index  u32 vcf_len  u32 n_bam
       vcf bytes
       n_bam x [ u32 rec_len  i32 ref_id  i64 pos  i64 ref_end
                 rec bytes ]
  b'E' u64 n_ok  u64 n_err             (end of stream, stats)
Parent replies on worker stdin:
  i64 start  i64 count                 (count <= 0: no more work)
"""

import collections
import json
import logging
import os
import struct
import sys
import threading


def worker_main(spec: dict) -> int:
    args_d = dict(spec["args"])
    w = spec["worker_index"]

    logging.basicConfig(
        level=spec.get("log_level", logging.WARNING),
        stream=sys.stderr,
        format=f"[worker {w}] %(levelname)s %(message)s")
    log = logging.getLogger("trgt")

    from types import SimpleNamespace
    args = SimpleNamespace(**args_d)

    device_mode = getattr(args, "device", "auto")
    want_cpu = (device_mode in ("cpu", "host")
                or os.environ.get("JAX_PLATFORMS") == "cpu")
    if want_cpu and os.environ.get("PALLAS_AXON_POOL_IPS"):
        # the sitecustomize force-registers the remote-TPU backend and
        # overrides jax_platforms, so the env var alone is not enough
        # (same hard-override as tests/conftest.py) — an auto-mode
        # worker under a cpu-pinned parent (test env) must not grab
        # the single-client tunnel
        import jax
        jax.config.update("jax_platforms", "cpu")
    elif want_cpu:
        # no axon registration in this process: the env var suffices,
        # and skipping the jax import saves ~2s of worker startup on
        # the pure-host path
        os.environ["JAX_PLATFORMS"] = "cpu"

    from ..io.catalog import iter_loci
    from ..io.fasta import FastaReader
    from ..io.vcf_write import VcfWriter
    from ..utils import Genotyper, Karyotype, TrgtScoring
    from .pipeline import BatchPipeline
    from .runner import iter_spanning_records, open_alignments
    from .workflow import Params

    karyotype = Karyotype.new(args.karyotype)
    genotyper = Genotyper.from_str(args.genotyper)
    scoring = TrgtScoring.from_string(args.aln_scoring)
    use_device = device_mode != "host"

    bam = open_alignments(args.reads_path, args.genome_path)
    tid_of = bam.header.tid
    genome = FastaReader(args.genome_path)
    output_flank_len = min(args.flank_len, args.output_flank_len)
    write_bam = not args.disable_bam_output

    params = Params(
        min_flank_id_frac=args.min_flank_id_frac,
        min_read_qual=args.min_hifi_read_qual,
        search_flank_len=args.flank_len,
        max_depth=args.max_depth,
        aln_scoring=scoring,
    )
    if use_device:
        from .. import mesh
        mesh.auto_enable()

    n_err = 0

    def on_error(msg):
        nonlocal n_err
        log.error("Locus processing: %s", msg)
        n_err += 1

    # small host batches: a worker claims up to 2 batches of loci ahead
    # of its compute (batching + prefetch), and claimed loci cannot be
    # redistributed — big batches would quietly turn dynamic balancing
    # back into static slicing
    default_batch = 256 if use_device else int(
        os.environ.get("TRGT_TPU_WORKER_BATCH", "4"))
    pipeline = BatchPipeline(
        params, use_device=use_device,
        batch_size=getattr(args, "batch_size", None) or default_batch,
        num_threads=1,
        bam_factory=lambda: open_alignments(args.reads_path,
                                            args.genome_path))

    loci = iter_loci(args.repeats_path, genome, karyotype, args.flank_len,
                     genotyper, on_error=on_error)
    shard_index = getattr(args, "shard_index", None)
    shard_count = getattr(args, "shard_count", None)
    if shard_count:
        loci = (locus for i, locus in enumerate(loci)
                if i % shard_count == shard_index)

    out = sys.stdout.buffer
    stdin = sys.stdin.buffer
    out_lock = threading.Lock()

    def request_chunk():
        with out_lock:
            out.write(b"R")
            out.flush()

    def read_chunk():
        hdr = stdin.read(16)
        if len(hdr) < 16:
            return None
        start, count = struct.unpack("<qq", hdr)
        if count <= 0:
            return None
        return start, count

    idxq = collections.deque()

    def granted():
        """Yield loci of dynamically granted chunks, tracking stream
        indices. Chunks are granted in ascending order; the stream is
        forward-only, so unassigned loci are parsed and skipped."""
        stream = enumerate(loci)
        pos = 0          # next stream index to read
        request_chunk()  # keep two chunks outstanding (double buffer)
        request_chunk()
        while True:
            chunk = read_chunk()
            if chunk is None:
                return
            start, count = chunk
            request_chunk()
            exhausted = False
            for j in range(start, start + count):
                locus = None
                while pos <= j:
                    nxt = next(stream, None)
                    if nxt is None:
                        exhausted = True
                        break
                    pos = nxt[0] + 1
                    if nxt[0] == j:
                        locus = nxt[1]
                if exhausted:
                    return
                if locus is not None:
                    idxq.append(j)
                    yield locus

    n_ok = 0
    for locus, results in pipeline.process(granted(), bam):
        j = idxq.popleft()
        vcf_line = VcfWriter.render(locus, results).encode("utf-8")
        recs = []
        if write_bam:
            # bytes() copy is required: the native encoder yields
            # memoryviews into a reused scratch buffer, valid only
            # until the next iteration
            recs = [(bytes(rec), rid, pos, ref_end)
                    for rec, rid, pos, ref_end in iter_spanning_records(
                        tid_of, locus, results, output_flank_len)]
        with out_lock:
            out.write(b"L" + struct.pack("<QII", j, len(vcf_line),
                                         len(recs)))
            out.write(vcf_line)
            for rec, rid, pos, ref_end in recs:
                out.write(struct.pack("<Iiqq", len(rec), rid, pos, ref_end))
                out.write(rec)
            out.flush()
        n_ok += 1
    with out_lock:
        out.write(b"E" + struct.pack("<QQ", n_ok, n_err))
        out.flush()
    from .pipeline import STAGE_TIMES
    log.debug("worker done: %d loci, stages %s", n_ok,
              {k: round(v, 2) for k, v in STAGE_TIMES.items()})
    return 0


def _exit(rc: int) -> None:
    # unconditional os._exit: a device-mode worker with raced dispatches
    # in flight can abort interpreter teardown ("FATAL: exception not
    # rethrown") even when threads are merely blocked, not abandoned —
    # and the worker has nothing to tear down once its frames are
    # flushed (the parent owns every output file)
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(rc)


if __name__ == "__main__":
    _exit(worker_main(json.loads(sys.argv[1])))
