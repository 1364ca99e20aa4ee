"""Shared helpers for building synthetic genomes/annotations/alignments."""

import gzip
import random

import numpy as np

from arriba_tpu.annotation.index import IntervalIndex
from arriba_tpu.contigs import ContigRegistry
from arriba_tpu.io.gtf import read_annotation_gtf

GTF_FEATURES = ('gene_name=gene_name gene_id=gene_id transcript_id=transcript_id '
                'feature_exon=exon feature_CDS=CDS')


def random_genome(lengths, seed=42):
    """{name: ASCII uint8 array} with deterministic random sequence."""
    rng = random.Random(seed)
    return {name: np.frombuffer("".join(rng.choice("ACGT") for _ in range(length)).encode(),
                                np.uint8).copy()
            for name, length in lengths.items()}


def write_fasta(path, genome):
    opener = gzip.open if str(path).endswith(".gz") else open
    with opener(str(path), "wt") as fh:
        for name, seq in genome.items():
            fh.write(f">{name}\n")
            data = seq.tobytes().decode()
            for i in range(0, len(data), 80):
                fh.write(data[i:i + 80] + "\n")


def gtf_line(contig, feature, start0, end0, strand, gene_id, gene_name, transcript_id=None):
    """Build one GTF line from 0-based inclusive coordinates."""
    attrs = f'gene_id "{gene_id}"; gene_name "{gene_name}";'
    if transcript_id:
        attrs += f' transcript_id "{transcript_id}";'
    return f"{contig}\ttest\t{feature}\t{start0 + 1}\t{end0 + 1}\t.\t{strand}\t.\t{attrs}"


def load_annotation(tmp_path, gtf_text, contig_names, assembly=None):
    gtf_path = tmp_path / "genes.gtf"
    gtf_path.write_text(gtf_text)
    contigs = ContigRegistry()
    for name in contig_names:
        contigs.add(name)
    ann = read_annotation_gtf(str(gtf_path), GTF_FEATURES, contigs, assembly or {})
    return ann, contigs


def make_indices(ann, n_contigs):
    gene_index = IntervalIndex(ann.genes.contig, ann.genes.start, ann.genes.end, n_contigs)
    exon_index = IntervalIndex(ann.exons.contig, ann.exons.start, ann.exons.end, n_contigs)
    return gene_index, exon_index


def bgzf_compress(raw: bytes) -> bytes:
    """Compress bytes as BGZF (64KB-block gzip members with BC subfield +
    EOF marker), e.g. to build test BAMs the parallel decoder can split."""
    import struct
    import zlib

    out = bytearray()
    block_size = 65280
    for offset in range(0, len(raw), block_size):
        chunk = raw[offset:offset + block_size]
        compressor = zlib.compressobj(6, zlib.DEFLATED, -15)
        cdata = compressor.compress(chunk) + compressor.flush()
        bsize = len(cdata) + 25  # header 12 + xlen 6 + crc 4 + isize 4 - 1
        out += b"\x1f\x8b\x08\x04\x00\x00\x00\x00\x00\xff"
        out += struct.pack("<H", 6)            # XLEN
        out += b"BC" + struct.pack("<HH", 2, bsize)
        out += cdata
        out += struct.pack("<II", zlib.crc32(chunk), len(chunk))
    # standard BGZF EOF marker
    out += bytes.fromhex("1f8b08040000000000ff0600424302001b0003000000000000000000")
    return bytes(out)


def write_bam(path, header, records) -> None:
    """Minimal BAM writer (BGZF blocks) for test fixtures."""
    import io
    import struct

    NT16 = "=ACMGRSVTWYHKDBN"
    lut = {c: i for i, c in enumerate(NT16)}
    out = io.BytesIO()

    def w(fmt, *values):
        out.write(struct.pack(fmt, *values))

    text = (header.text or "").encode()
    out.write(b"BAM\x01")
    w("<i", len(text) + 1)
    out.write(text + b"\x00")
    w("<i", len(header.target_names))
    for name, length in zip(header.target_names, header.target_lengths):
        encoded = name.encode() + b"\x00"
        w("<i", len(encoded))
        out.write(encoded)
        w("<i", length)
    for rec in records:
        qname = rec.qname.encode() + b"\x00"
        cigar = b"".join(struct.pack("<I", int(word)) for word in rec.cigar)
        seq = rec.seq
        seq4 = bytearray((len(seq) + 1) // 2)
        for i, base in enumerate(seq):
            seq4[i >> 1] |= lut.get(base, 15) << ((~i & 1) << 2)
        qual = bytes([255] * len(seq))
        aux = b""
        for name, value in rec.tags.items():
            if isinstance(value, int):
                aux += name.encode() + b"i" + struct.pack("<i", value)
            else:
                aux += name.encode() + b"Z" + str(value).encode() + b"\x00"
        body = struct.pack("<iiBBHHHiiii", rec.tid, rec.pos, len(qname), rec.mapq,
                           4680, len(rec.cigar), rec.flag, len(seq), rec.mtid,
                           rec.mpos, rec.tlen)
        body += qname + cigar + bytes(seq4) + qual + aux
        w("<i", len(body))
        out.write(body)
    with open(str(path), "wb") as fh:
        fh.write(bgzf_compress(out.getvalue()))
