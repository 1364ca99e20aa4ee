"""Ingest tests: mate collation, SA split reads, discordant mates,
read-through extraction, and fragment normalization."""

import numpy as np
import pytest

from arriba_tpu.constants import (CIGAR_SOFT_CLIP, FORWARD, MATE1, REVERSE,
                                  SPLIT_READ, SUPPLEMENTARY, cigar_op)
from arriba_tpu.ingest.chimeric import read_chimeric_alignments
from arriba_tpu.ingest.stats import Coverage
from arriba_tpu.io.bam import BamRecord, SamHeader, cigar_from_string, write_sam

from .util import gtf_line, load_annotation, make_indices, random_genome

GTF = "\n".join([
    gtf_line("1", "exon", 1000, 1999, "+", "G1", "GENE1", "T1"),
    gtf_line("1", "exon", 10000, 10999, "+", "G2", "GENE2", "T2"),
    gtf_line("2", "exon", 5000, 5999, "+", "G3", "GENE3", "T3"),
]) + "\n"


@pytest.fixture
def scenario(tmp_path):
    genome_named = random_genome({"1": 20000, "2": 20000})
    ann, contigs = load_annotation(tmp_path, GTF, ["1", "2"])
    assembly = {contigs.get(n): seq for n, seq in genome_named.items()}
    gene_index, exon_index = make_indices(ann, len(contigs))
    header = SamHeader(target_names=["1", "2"], target_lengths=[20000, 20000])

    def seq_at(tid, pos, length):
        return assembly[tid][pos:pos + length].tobytes().decode()

    records = [
        # r1: SA-tagged split read pair; supplementary on contig 2
        BamRecord(qname="r1", flag=99, tid=0, pos=1100, mapq=60,
                  cigar=cigar_from_string("50M"), mtid=0, mpos=1200, tlen=150,
                  seq=seq_at(0, 1100, 50), tags={"HI": 1}),
        BamRecord(qname="r1", flag=147, tid=0, pos=1200, mapq=60,
                  cigar=cigar_from_string("30M20S"), mtid=0, mpos=1100, tlen=-150,
                  seq=seq_at(0, 1200, 30) + seq_at(1, 5000, 20),
                  tags={"HI": 1, "SA": "2,5001,-,30S20M,60,0;"}),
        BamRecord(qname="r1", flag=2195, tid=1, pos=5000, mapq=60,
                  cigar=cigar_from_string("30H20M"), mtid=0, mpos=1100, tlen=0,
                  seq=seq_at(1, 5000, 20), tags={"HI": 1}),
        # r2: discordant mates (paired, not proper)
        BamRecord(qname="r2", flag=97, tid=0, pos=1100, mapq=60,
                  cigar=cigar_from_string("50M"), mtid=1, mpos=5100, tlen=0,
                  seq=seq_at(0, 1100, 50), tags={"HI": 1}),
        BamRecord(qname="r2", flag=145, tid=1, pos=5100, mapq=60,
                  cigar=cigar_from_string("50M"), mtid=0, mpos=1100, tlen=0,
                  seq=seq_at(1, 5100, 50), tags={"HI": 1}),
        # r3: read-through pair crossing the G1/G2 boundary via a spanning intron
        BamRecord(qname="r3", flag=99, tid=0, pos=1900, mapq=60,
                  cigar=cigar_from_string("30M8100N20M"), mtid=0, mpos=10030, tlen=0,
                  seq=seq_at(0, 1900, 30) + seq_at(0, 10030, 20), tags={"HI": 1}),
        BamRecord(qname="r3", flag=147, tid=0, pos=10030, mapq=60,
                  cigar=cigar_from_string("50M"), mtid=0, mpos=1900, tlen=0,
                  seq=seq_at(0, 10030, 50), tags={"HI": 1}),
        # r4: ordinary proper pair inside G1 (coverage only)
        BamRecord(qname="r4", flag=99, tid=0, pos=1150, mapq=60,
                  cigar=cigar_from_string("50M"), mtid=0, mpos=1250, tlen=150,
                  seq=seq_at(0, 1150, 50), tags={"HI": 1}),
        BamRecord(qname="r4", flag=147, tid=0, pos=1250, mapq=60,
                  cigar=cigar_from_string("50M"), mtid=0, mpos=1150, tlen=-150,
                  seq=seq_at(0, 1250, 50), tags={"HI": 1}),
    ]
    sam_path = str(tmp_path / "aligned.sam")
    write_sam(sam_path, header, records)
    return sam_path, assembly, contigs, ann, gene_index


def test_ingest(scenario):
    sam_path, assembly, contigs, ann, gene_index = scenario
    chimeric = {}
    coverage = Coverage()
    viral_reads = []
    n, mapped = read_chimeric_alignments(
        sam_path, assembly, chimeric, contigs, "1 2", "AC_* NC_*",
        ann.genes, gene_index, coverage, viral_reads,
        separate_chimeric_bam_file=False, is_rna_bam_file=True,
        external_duplicate_marking=False, max_itd_length=100)

    assert mapped == 8
    assert sorted(chimeric.keys()) == ["r1,1", "r2,1", "r3,1"]

    # r1: normalized split-read layout
    r1 = chimeric["r1,1"]
    assert len(r1) == 3
    assert not r1[MATE1].supplementary and not r1[SPLIT_READ].supplementary
    assert r1[SUPPLEMENTARY].supplementary
    assert r1[MATE1].contig == 0 and r1[MATE1].strand == FORWARD
    assert r1[SPLIT_READ].strand == REVERSE
    assert r1[SUPPLEMENTARY].contig == 1
    assert r1[SUPPLEMENTARY].sequence == ""
    assert r1[SPLIT_READ].sequence != ""

    # r2: discordant pair
    r2 = chimeric["r2,1"]
    assert len(r2) == 2
    assert r2[MATE1].contig != r2[1].contig

    # r3: synthetic split from read-through extraction
    r3 = chimeric["r3,1"]
    assert len(r3) == 3
    split = r3[SPLIT_READ]
    supp = r3[SUPPLEMENTARY]
    mate1 = r3[MATE1]
    # the forward mate was split at the intron: supplementary covers 1900-1929,
    # split read covers 10030-10049
    assert supp.start == 1900 and supp.end == 1929
    assert split.start == 10030 and split.end == 10049
    assert cigar_op(int(split.cigar[0])) == CIGAR_SOFT_CLIP
    # the reverse mate became MATE1
    assert mate1.start == 10030 and mate1.strand == REVERSE

    # coverage: r4 contributes around window 1150-1200
    assert coverage.get_coverage(0, 1120, False) >= 1  # DOWNSTREAM of 1120
    assert coverage.fragment_starts_here(0, 1100, 1200)


@pytest.fixture
def bam_scenario(tmp_path):
    """A small valid BAM plus the tables read_chimeric_alignments needs."""
    from .util import write_bam

    genome_named = random_genome({"1": 20000, "2": 20000})
    ann, contigs = load_annotation(tmp_path, GTF, ["1", "2"])
    assembly = {contigs.get(n): seq for n, seq in genome_named.items()}
    gene_index, _ = make_indices(ann, len(contigs))
    header = SamHeader(target_names=["1", "2"], target_lengths=[20000, 20000])

    def seq_at(tid, pos, length):
        return assembly[tid][pos:pos + length].tobytes().decode()

    records = [
        BamRecord(qname=f"r{i}", flag=flag, tid=0, pos=pos, mapq=60,
                  cigar=cigar_from_string("50M"), mtid=0, mpos=mpos, tlen=tlen,
                  seq=seq_at(0, pos, 50), tags={"HI": 1})
        for i in range(40)
        for flag, pos, mpos, tlen in [(99, 1150 + i, 1250 + i, 150),
                                      (147, 1250 + i, 1150 + i, -150)]
    ] + [
        # one discordant pair so the scan finds chimeric evidence
        BamRecord(qname="d1", flag=97, tid=0, pos=1100, mapq=60,
                  cigar=cigar_from_string("50M"), mtid=1, mpos=5100, tlen=0,
                  seq=seq_at(0, 1100, 50), tags={"HI": 1}),
        BamRecord(qname="d1", flag=145, tid=1, pos=5100, mapq=60,
                  cigar=cigar_from_string("50M"), mtid=0, mpos=1100, tlen=0,
                  seq=seq_at(1, 5100, 50), tags={"HI": 1}),
    ]
    bam_path = str(tmp_path / "aligned.bam")
    write_bam(bam_path, header, records)
    return bam_path, assembly, contigs, ann, gene_index


def _scan(bam_path, assembly, contigs, ann, gene_index, threads):
    chimeric = {}
    return read_chimeric_alignments(
        bam_path, assembly, chimeric, contigs, "1 2", "AC_* NC_*",
        ann.genes, gene_index, Coverage(), [],
        separate_chimeric_bam_file=False, is_rna_bam_file=True,
        external_duplicate_marking=False, max_itd_length=100, threads=threads)


@pytest.mark.parametrize("threads", [1, 2])
def test_corrupt_bam_raises(bam_scenario, threads):
    """A flipped byte inside a BGZF block must raise IOError, not silently
    truncate the scan (bgzf_parallel.h CRC + zlib gzerror checks)."""
    bam_path, assembly, contigs, ann, gene_index = bam_scenario
    data = bytearray(open(bam_path, "rb").read())
    data[len(data) // 2] ^= 0xFF  # inside a compressed payload
    open(bam_path, "wb").write(bytes(data))
    with pytest.raises(IOError):
        _scan(bam_path, assembly, contigs, ann, gene_index, threads)


@pytest.mark.parametrize("threads", [1, 2])
def test_truncated_bam_raises(bam_scenario, threads):
    """A BAM cut mid-block must raise IOError instead of reporting success
    on an incomplete scan."""
    bam_path, assembly, contigs, ann, gene_index = bam_scenario
    data = open(bam_path, "rb").read()
    open(bam_path, "wb").write(data[:len(data) - 100])
    with pytest.raises(IOError):
        _scan(bam_path, assembly, contigs, ann, gene_index, threads)


@pytest.mark.parametrize("threads", [1, 2])
def test_intact_bam_scans(bam_scenario, threads):
    """The corruption checks must not reject a valid BAM."""
    bam_path, assembly, contigs, ann, gene_index = bam_scenario
    n, mapped = _scan(bam_path, assembly, contigs, ann, gene_index, threads)
    assert mapped == 82  # 40 proper pairs + the discordant pair


def test_fast_inflate_differential():
    """The clean-room DEFLATE decoder (native/inflate.h) must byte-match
    zlib on random/DNA/run/copy/constant data across all levels and
    strategies (the native selftest compresses with zlib and diffs)."""
    import pytest

    from arriba_tpu.ingest.chimeric import _native
    if _native is None or not hasattr(_native, "bgzf_inflate_selftest"):
        pytest.skip("native module not built")
    assert _native.bgzf_inflate_selftest(400, 20260820) == 0
