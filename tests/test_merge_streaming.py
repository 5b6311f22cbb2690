"""Streaming VCF reader semantics (merge/vcf_text.py): records are
parsed lazily so merge memory stays flat in input size; disorder raises
instead of silently merging wrong; the pre-1.0 POS shift streams
through a bounded lookahead buffer."""

import pytest

from trgt_tpu.merge.vcf_text import VcfTextReader

HDR = """##fileformat=VCFv4.2
##INFO=<ID=TRID,Number=1,Type=String,Description="x">
##FORMAT=<ID=GT,Number=1,Type=String,Description="x">
##FORMAT=<ID=AL,Number=.,Type=Integer,Description="x">
##FORMAT=<ID=ALLR,Number=.,Type=String,Description="x">
##FORMAT=<ID=AM,Number=.,Type=Float,Description="x">
##contig=<ID=c1,length=1000000>
##contig=<ID=c2,length=1000000>
##trgtVersion=3.0.0-tpu
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts1
"""

HDR_LEGACY = HDR.replace("##trgtVersion=3.0.0-tpu\n", "").replace(
    "Type=Float", "Type=Integer")


def rec(contig, pos, al="5,5"):
    return (f"{contig}\t{pos}\t.\tTCAG\tTCAGCAG\t.\t.\tTRID=x\t"
            f"GT:AL:ALLR:AM\t0/1:{al}:5-5,5-5:.\n")


def write(tmp_path, body, header=HDR, name="a.vcf"):
    p = tmp_path / name
    p.write_text(header + body)
    return str(p)


def test_streaming_yields_in_order(tmp_path):
    p = write(tmp_path, rec("c1", 10) + rec("c1", 20) + rec("c2", 5))
    r = VcfTextReader(p)
    assert [x.pos for x in r.records("c1")] == [9, 19]
    assert [x.pos for x in r.records("c2")] == [4]


def test_missing_contig_between_blocks(tmp_path):
    # file lacks c1->c2 gap contig: peek mode yields nothing for it and
    # preserves the pending block
    p = write(tmp_path, rec("c1", 10) + rec("c2", 5))
    r = VcfTextReader(p)
    assert [x.pos for x in r.records("c1")] == [9]
    assert list(r.records("cX")) == []
    assert [x.pos for x in r.records("c2")] == [4]


def test_unsorted_positions_raise(tmp_path):
    p = write(tmp_path, rec("c1", 20) + rec("c1", 10))
    r = VcfTextReader(p)
    with pytest.raises(ValueError, match="sort the VCF"):
        list(r.records("c1"))


def test_split_contig_blocks_raise(tmp_path):
    p = write(tmp_path, rec("c1", 10) + rec("c2", 5) + rec("c1", 30))
    r = VcfTextReader(p)
    assert [x.pos for x in r.records("c1")] == [9]
    with pytest.raises(ValueError, match="out of order"):
        list(r.records("c2"))


def test_scan_mode_skips_to_target(tmp_path):
    # plot reads one contig out of a multi-contig VCF
    p = write(tmp_path, rec("c1", 10) + rec("c2", 5) + rec("c2", 7))
    r = VcfTextReader(p)
    assert [x.pos for x in r.records("c2", scan=True)] == [4, 6]


def test_pre10_shift_reorders_through_lookahead(tmp_path):
    """Pre-1.0 POS shift (-1 unless an allele length is 0) can swap
    raw-adjacent records; the streaming lookahead must emit them in
    final order (the slurped reader sorted after shifting)."""
    body = rec("c1", 100, al="0,5") + rec("c1", 100, al="3,3") \
        + rec("c1", 200, al="4,4")
    p = write(tmp_path, body, header=HDR_LEGACY)
    r = VcfTextReader(p)
    assert r.version == (0, 4, 0)
    got = [(x.pos, x.samples[0]["AL"]) for x in r.records("c1")]
    # AL 0,5 keeps pos 99; AL 3,3 shifts to 98; AL 4,4 shifts to 198
    assert got == [(98, "3,3"), (99, "0,5"), (198, "4,4")]


def test_contig_subset_skips_unrequested_blocks(tmp_path):
    """ADVICE r4 (high): merge --contigs c2 must not lose c2's block
    behind an unrequested c1 block — the reader reads forward past
    blocks that are not in `upcoming`."""
    p = write(tmp_path, rec("c1", 10) + rec("c2", 5) + rec("c2", 7))
    r = VcfTextReader(p)
    assert [x.pos for x in r.records("c2", upcoming={"c2"})] == [4, 6]


def test_header_order_mismatch_spills_block(tmp_path):
    """ADVICE r4 (medium): a file whose own header/block order is
    [c2, c1] merged under union order [c1, c2] must still produce both
    blocks — c2's block is spilled while streaming forward to c1."""
    hdr = HDR.replace(
        "##contig=<ID=c1,length=1000000>\n##contig=<ID=c2,length=1000000>",
        "##contig=<ID=c2,length=1000000>\n##contig=<ID=c1,length=1000000>")
    p = write(tmp_path, rec("c2", 5) + rec("c1", 10) + rec("c1", 20),
              header=hdr)
    r = VcfTextReader(p)
    up = {"c1", "c2"}
    assert [x.pos for x in r.records("c1", upcoming=up)] == [9, 19]
    assert [x.pos for x in r.records("c2", upcoming=up)] == [4]


def test_header_order_mismatch_pre10_spill_shifts(tmp_path):
    """Spilled blocks of pre-1.0 files get the POS shift + re-sort at
    serve time (same result as the eager loader)."""
    hdr = HDR_LEGACY.replace(
        "##contig=<ID=c1,length=1000000>\n##contig=<ID=c2,length=1000000>",
        "##contig=<ID=c2,length=1000000>\n##contig=<ID=c1,length=1000000>")
    body = rec("c2", 100, al="0,5") + rec("c2", 100, al="3,3") \
        + rec("c1", 10)
    p = write(tmp_path, body, header=hdr)
    r = VcfTextReader(p)
    assert r.version == (0, 4, 0)
    up = {"c1", "c2"}
    assert [x.pos for x in r.records("c1", upcoming=up)] == [8]
    got = [(x.pos, x.samples[0]["AL"]) for x in r.records("c2", upcoming=up)]
    assert got == [(98, "3,3"), (99, "0,5")]


def test_merge_contig_subset_end_to_end(tmp_path):
    """run_merge with --contigs c2 over multi-contig inputs emits c2's
    records (regression for the silent-empty-output bug)."""
    from types import SimpleNamespace
    from trgt_tpu.merge.runner import run_merge
    a = write(tmp_path, rec("c1", 10) + rec("c2", 5), name="a.vcf")
    b = write(tmp_path, rec("c1", 10) + rec("c2", 5), name="b.vcf")
    b_text = open(b).read().replace("\ts1\n", "\ts2\n", 1)
    open(b, "w").write(b_text)
    out = tmp_path / "merged.vcf"
    args = SimpleNamespace(
        vcfs=[a, b], vcf_list=None, output=str(out), output_type="v",
        contigs=["c2"], skip_n=0, process_n=None, print_header=False,
        force_samples=False, force_single=False, quit_on_errors=True,
        no_version=False, genome_path=None)
    run_merge(args)
    body = [l for l in out.read_text().splitlines()
            if not l.startswith("#")]
    assert len(body) == 1 and body[0].startswith("c2\t5\t")


def test_bcf_input_streams_lazily(tmp_path):
    """BCF merge inputs decode record-by-record from the container
    (VERDICT r4 next #7): after pulling one record, the underlying
    stream must not be fully consumed."""
    from types import SimpleNamespace
    from trgt_tpu.merge.runner import run_merge
    hdr_full = HDR.replace(
        '##FORMAT=<ID=AM,Number=.,Type=Float,Description="x">',
        '##FORMAT=<ID=SD,Number=.,Type=Integer,Description="x">\n'
        '##FORMAT=<ID=MC,Number=.,Type=String,Description="x">\n'
        '##FORMAT=<ID=MS,Number=.,Type=String,Description="x">\n'
        '##FORMAT=<ID=AP,Number=.,Type=Float,Description="x">\n'
        '##FORMAT=<ID=AM,Number=.,Type=Float,Description="x">')
    body = "".join(rec("c1", 10 + 500 * i) for i in range(200))
    p = write(tmp_path, body, header=hdr_full, name="in.vcf")
    bcf = str(tmp_path / "in.bcf.gz")
    args = SimpleNamespace(
        vcfs=[p], vcf_list=None, output=bcf, output_type="b",
        contigs=None, skip_n=0, process_n=None, print_header=False,
        force_samples=False, force_single=True, quit_on_errors=True,
        no_version=False, genome_path=None)
    run_merge(args)
    r = VcfTextReader(bcf)
    it = r.records("c1")
    first = next(it)
    assert first.pos == 9
    # generator-based: no eager per-contig dict was built
    assert r._bcf_gen is not None
    rest = list(it)
    assert len(rest) == 199 and rest[-1].pos == 9 + 500 * 199


def test_streaming_is_lazy(tmp_path):
    """The reader must not slurp at construction: records() consumption
    is observable one line at a time."""
    p = write(tmp_path, rec("c1", 10) + rec("c1", 20))
    r = VcfTextReader(p)
    it = r.records("c1")
    first = next(it)
    assert first.pos == 9
    # the second record has not been parsed yet (pending is empty and
    # the file handle is still open)
    assert r._pending is None and r._fh is not None
