"""Annotation queries: splice-site tests, alignment annotation, spliced
distance, exonic lengths.

Reference parity: source/annotation.cpp:379-618 and arriba.cpp:166-205.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..constants import (CIGAR_DEL, CIGAR_DIFF, CIGAR_EQUAL, CIGAR_HARD_CLIP,
                         CIGAR_MATCH, CIGAR_REF_SKIP, CIGAR_SOFT_CLIP,
                         DOWNSTREAM, MATE1, MATE2, MAX_SPLICE_SITE_DISTANCE,
                         SPLIT_READ, SUPPLEMENTARY, UPSTREAM, cigar_op,
                         cigar_oplen)
from ..model import Alignment, Fragment
from .index import EMPTY, IntervalIndex, combine_annotations
from .tables import ExonTable, GeneTable


def complement_strand_if(strand: bool, condition: bool) -> bool:
    """annotation.hpp:52-63."""
    return (not strand) if condition else strand


def _exons_near_splice_site(exons: ExonTable, gene: int, direction: bool,
                            breakpoint: int, exon_set: np.ndarray) -> bool:
    """annotation.cpp:379-401 — does any exon of `gene` in `exon_set` have a
    matching boundary within MAX_SPLICE_SITE_DISTANCE of the breakpoint,
    excluding terminal exons (with single-exon-coding and incomplete-
    annotation exceptions)?"""
    for e in exon_set:
        if exons.gene[e] != gene:
            continue
        prev_e = exons.prev_exon[e]
        next_e = exons.next_exon[e]
        if direction == UPSTREAM:
            if abs(exons.start[e] - breakpoint) <= MAX_SPLICE_SITE_DISTANCE and (
                prev_e >= 0
                or (prev_e < 0 and next_e < 0 and exons.coding_region_start[e] != -1)
                or exons.start[e] == exons.coding_region_start[e]
            ):
                return True
        else:  # DOWNSTREAM
            if abs(exons.end[e] - breakpoint) <= MAX_SPLICE_SITE_DISTANCE and (
                next_e >= 0
                or (prev_e < 0 and next_e < 0 and exons.coding_region_start[e] != -1)
                or exons.end[e] == exons.coding_region_end[e]
            ):
                return True
    return False


def is_breakpoint_spliced(gene: int, direction: bool, breakpoint: int,
                          genes: GeneTable, exons: ExonTable,
                          exon_index: IntervalIndex) -> bool:
    """annotation.cpp:404-429 — check the boundary sets at, after, and before
    the breakpoint."""
    contig = int(genes.contig[gene])
    if contig >= exon_index.n_contigs or len(exon_index.boundaries[contig]) == 0:
        return False
    bounds = exon_index.boundaries[contig]
    idx = int(np.searchsorted(bounds, breakpoint, side="left"))
    n = len(bounds)
    if idx < n:
        if _exons_near_splice_site(exons, gene, direction, breakpoint, exon_index.set_at(contig, idx)):
            return True
        if idx + 1 < n and _exons_near_splice_site(exons, gene, direction, breakpoint,
                                                   exon_index.set_at(contig, idx + 1)):
            return True
    if idx > 0:
        if _exons_near_splice_site(exons, gene, direction, breakpoint, exon_index.set_at(contig, idx - 1)):
            return True
    return False


def annotate_alignment(alignment: Alignment, exons: ExonTable, genes: GeneTable,
                       exon_index: IntervalIndex) -> np.ndarray:
    """annotation.cpp:431-503 — derive the gene set of one alignment from exon
    overlap, then disambiguate via splice-pattern agreement; may also resolve
    the predicted strand for unstranded data."""
    exon_set = exon_index.range_query(alignment.contig, alignment.start, alignment.end)
    if len(exon_set):
        gene_set = np.array(sorted(set(exons.gene[exon_set].tolist())), np.int64)
    else:
        gene_set = EMPTY

    if len(alignment.cigar) > 1 and (len(gene_set) > 1 or alignment.predicted_strand_ambiguous):
        supported = EMPTY
        reference_position = alignment.start
        for i in range(len(alignment.cigar)):
            op = cigar_op(int(alignment.cigar[i]))
            oplen = cigar_oplen(int(alignment.cigar[i]))
            if op in (CIGAR_SOFT_CLIP, CIGAR_HARD_CLIP, CIGAR_REF_SKIP):
                keep = []
                for g in gene_set:
                    g = int(g)
                    if op in (CIGAR_SOFT_CLIP, CIGAR_HARD_CLIP):
                        if i == 0:
                            spliced = is_breakpoint_spliced(g, UPSTREAM, reference_position,
                                                            genes, exons, exon_index)
                        else:
                            spliced = is_breakpoint_spliced(g, DOWNSTREAM, reference_position,
                                                            genes, exons, exon_index)
                        if spliced:
                            keep.append(g)
                    else:  # REF_SKIP: intron must align with exon end AND start
                        if (is_breakpoint_spliced(g, DOWNSTREAM, reference_position,
                                                  genes, exons, exon_index)
                                or is_breakpoint_spliced(g, UPSTREAM, reference_position + oplen,
                                                         genes, exons, exon_index)):
                            keep.append(g)
                supported = np.array(keep, np.int64)
                if len(supported):
                    break
            if op in (CIGAR_REF_SKIP, CIGAR_MATCH, CIGAR_DIFF, CIGAR_EQUAL, CIGAR_DEL):
                reference_position += oplen

        if len(supported):
            if len(supported) < len(gene_set):
                gene_set = supported
            if alignment.predicted_strand_ambiguous:
                strands = genes.strand[supported]
                if np.all(strands == strands[0]):
                    alignment.predicted_strand = bool(strands[0])
                    alignment.predicted_strand_ambiguous = False
    return gene_set


def annotate_alignments(fragment: Fragment, exons: ExonTable, genes: GeneTable,
                        exon_index: IntervalIndex) -> None:
    """annotation.cpp:505-555 — annotate each mate, then reconcile strands and
    gene sets across mates."""
    for mate in fragment:
        mate.genes = annotate_alignment(mate, exons, genes, exon_index)
        mate.exonic = len(mate.genes) > 0

    m1, m2 = fragment[MATE1], fragment[MATE2]
    if m1.predicted_strand_ambiguous and not m2.predicted_strand_ambiguous:
        m1.predicted_strand = complement_strand_if(m2.predicted_strand, m1.strand == m2.strand)
        m1.predicted_strand_ambiguous = False
    elif not m1.predicted_strand_ambiguous and m2.predicted_strand_ambiguous:
        m2.predicted_strand = complement_strand_if(m1.predicted_strand, m1.strand == m2.strand)
        m2.predicted_strand_ambiguous = False
    elif not m1.predicted_strand_ambiguous and not m2.predicted_strand_ambiguous:
        if (m1.predicted_strand != m2.predicted_strand) != (m1.strand == m2.strand):
            m1.predicted_strand_ambiguous = True
            m2.predicted_strand_ambiguous = True

    if len(fragment) == 3:  # split read
        split, supp = fragment[SPLIT_READ], fragment[SUPPLEMENTARY]
        combined = combine_annotations(split.genes, m1.genes)
        if len(m1.genes) == 0 or len(combined) < len(m1.genes):
            m1.genes = combined
        if len(split.genes) == 0 or len(combined) < len(split.genes):
            split.genes = combined

        if split.predicted_strand_ambiguous and not supp.predicted_strand_ambiguous:
            m1.predicted_strand = complement_strand_if(supp.predicted_strand, supp.strand != split.strand)
            m1.predicted_strand_ambiguous = False
            split.predicted_strand = m1.predicted_strand
            split.predicted_strand_ambiguous = False
        elif not split.predicted_strand_ambiguous and supp.predicted_strand_ambiguous:
            supp.predicted_strand = complement_strand_if(split.predicted_strand, supp.strand != split.strand)
            supp.predicted_strand_ambiguous = False
        elif not split.predicted_strand_ambiguous and not supp.predicted_strand_ambiguous:
            if (split.predicted_strand != supp.predicted_strand) != (split.strand != supp.strand):
                m1.predicted_strand_ambiguous = True
                split.predicted_strand_ambiguous = True
                supp.predicted_strand_ambiguous = True


def get_boundaries_of_biggest_gene(gene_set: np.ndarray, genes: GeneTable) -> Tuple[int, int]:
    """annotation.cpp:558-567 — hull over the gene set; (-1, -1) if empty."""
    if len(gene_set) == 0:
        return -1, -1
    return int(genes.start[gene_set].min()), int(genes.end[gene_set].max())


def get_spliced_distance(contig: int, position1: int, position2: int, gene: int,
                         exons: ExonTable, exon_index: IntervalIndex) -> int:
    """annotation.cpp:570-618 — transcriptomic distance between two positions,
    greedily following the transcript that skips the furthest."""
    if position1 > position2:
        position1, position2 = position2, position1
    if contig >= exon_index.n_contigs or len(exon_index.boundaries[contig]) == 0:
        return position2 - position1

    bounds = exon_index.boundaries[contig]
    n = len(bounds)
    idx = int(np.searchsorted(bounds, position1, side="left"))
    distance = 0
    if idx < n and bounds[idx] < position2:
        distance += int(bounds[idx]) - position1
        position1 = int(bounds[idx])
    while idx < n and bounds[idx] < position2:
        if bounds[idx] >= position1:
            furthest_start = -1
            furthest_end = -1
            furthest_skip = -1
            for e in exon_index.set_at(contig, idx):
                if exons.gene[e] != gene:
                    continue
                next_e = exons.next_exon[e]
                if next_e >= 0 and exons.start[next_e] <= position2:
                    exon_start = max(position1, int(exons.start[e]))
                    exon_end = min(position2, int(exons.end[e]))
                    exon_skip = int(exons.start[next_e]) - exon_start + 1
                    if furthest_start == -1 or (
                        (exon_end - exon_start) * furthest_skip
                        < (furthest_end - furthest_start) * exon_skip
                    ):
                        furthest_start = exon_start
                        furthest_end = exon_end
                        furthest_skip = exon_skip
            if furthest_start != -1:
                distance += furthest_end - furthest_start + 1
                position1 = furthest_start + furthest_skip - 1
        idx += 1
    distance += position2 - position1
    return distance


def compute_exonic_lengths(genes: GeneTable, exons: ExonTable,
                           exon_index: IntervalIndex) -> None:
    """arriba.cpp:166-184 — per-gene sum of disjoint exonic region lengths,
    walking the interval-index regions; genes without exons fall back to
    total gene length. Adjacent-duplicate gene deduplication within a region
    mirrors the reference's `previous_gene != current_gene` check over the
    exon-row-ordered set."""
    genes.exonic_length[:] = 0
    for contig in range(exon_index.n_contigs):
        bounds = exon_index.boundaries[contig]
        if len(bounds) == 0:
            continue
        offsets = exon_index.offsets[contig]
        items = exon_index.items[contig]
        if len(items) == 0:
            continue
        # vectorized region walk: per item, its boundary's region length;
        # the reference's previous_gene check dedups ADJACENT duplicates
        # within one region (exon-row order), which is `first element of
        # the region OR gene differs from the previous item`
        per_boundary = np.diff(offsets)
        boundary_of_item = np.repeat(
            np.arange(len(bounds), dtype=np.int64), per_boundary)
        region_length = bounds - np.concatenate([[0], bounds[:-1]])
        g = exons.gene[items]
        is_first = np.zeros(len(items), np.bool_)
        starts = offsets[:-1][per_boundary > 0]
        is_first[starts] = True
        keep = is_first | np.concatenate([[True], g[1:] != g[:-1]])
        np.add.at(genes.exonic_length, g[keep],
                  region_length[boundary_of_item[keep]])
    no_exons = genes.exonic_length == 0
    genes.exonic_length[no_exons] = genes.end[no_exons] - genes.start[no_exons]
