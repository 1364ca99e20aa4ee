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
