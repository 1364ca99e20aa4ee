"""In-vitro (RT/library-prep) artifact filter and the both-spliced recovery.

Reference parity: source/filter_in_vitro.cpp and source/recover_both_spliced.cpp
(which shares find_top_expressed_genes).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Tuple

import math

from ..annotation.index import IntervalIndex
from ..annotation.tables import GeneTable, ExonTable
from ..constants import (DOWNSTREAM, FILTER_HOMOPOLYMER,
                         FILTER_INCONSISTENTLY_CLIPPED, FILTER_IN_VITRO,
                         FILTER_INTRONIC, FILTER_MERGE_ADJACENT,
                         FILTER_MIN_SUPPORT, FILTER_NONE,
                         FILTER_RELATIVE_SUPPORT, FILTER_UNINTERESTING_CONTIGS,
                         FORWARD, MATE1, MATE2, REVERSE, SUPPLEMENTARY,
                         UPSTREAM)
from ..fusion import Fusion, Fusions
from ..ingest.stats import Coverage
from ..model import ChimericAlignments


def expression_gene_incidence(chimeric_alignments: ChimericAlignments
                              ) -> "np.ndarray":
    """Flat (read, gene) incidence stream — one gene id per counted hit of
    filter_in_vitro.cpp:48-62. The sharded expression reduction
    (parallel/stats.py) bincounts this per shard and psums."""
    import numpy as np
    chunks = []
    for mates in chimeric_alignments.values():
        chunks.append(mates[MATE1].genes)
        mate2 = MATE2 if len(mates) == 2 else SUPPLEMENTARY
        chunks.append(mates[mate2].genes)
    if not chunks:
        return np.empty(0, np.int64)
    return np.concatenate([np.asarray(c, np.int64) for c in chunks])


def find_top_expressed_genes(chimeric_alignments: ChimericAlignments,
                             high_expression_quantile: float,
                             precomputed: Tuple["np.ndarray", int] = None
                             ) -> Tuple[Dict[int, int], int]:
    """filter_in_vitro.cpp:48-83 — chimeric-read counts per gene and the
    high-expression quantile threshold (deterministic nth_element via full
    sort with the reference's tie-break on gene id).

    `precomputed` carries the sharded device reduction (dense per-gene
    counts + threshold, parallel/stats.py) — integer-exact, so consuming it
    is bit-identical to the host pass."""
    if precomputed is not None:
        dense, high_expression_threshold = precomputed
        import numpy as np
        nonzero = np.nonzero(dense)[0]
        read_count_by_gene = {
            int(g): int(dense[g]) for g in nonzero}
        return read_count_by_gene, int(high_expression_threshold)

    read_count_by_gene: Dict[int, int] = defaultdict(int)
    for mates in chimeric_alignments.values():
        for gene in mates[MATE1].genes.tolist():
            read_count_by_gene[gene] += 1
        mate2 = MATE2 if len(mates) == 2 else SUPPLEMENTARY
        for gene in mates[mate2].genes.tolist():
            read_count_by_gene[gene] += 1

    high_expression_threshold = 0
    if read_count_by_gene:
        genes_sorted = sorted(read_count_by_gene,
                              key=lambda g: (read_count_by_gene[g], g))
        quantile = int(math.floor(high_expression_quantile * len(genes_sorted)))
        if quantile >= len(genes_sorted):
            quantile = len(genes_sorted) - 1
        high_expression_threshold = read_count_by_gene[genes_sorted[quantile]]
    return read_count_by_gene, high_expression_threshold


def _find_higher_expressed_gene(contig: int, breakpoint: int,
                                gene_index: IntervalIndex,
                                expression_by_gene: Dict[int, int],
                                highest_expressed_gene: int) -> int:
    """filter_in_vitro.cpp:20-33."""
    highest_expression = expression_by_gene.get(highest_expressed_gene, 0)
    for gene in gene_index.point_query(contig, breakpoint):
        expression = expression_by_gene.get(int(gene), 0)
        if expression > highest_expression:
            highest_expression = expression
            highest_expressed_gene = int(gene)
    return highest_expressed_gene


def filter_in_vitro(fusions: Fusions, chimeric_alignments: ChimericAlignments,
                    high_expression_quantile: float, gene_index: IntervalIndex,
                    coverage: Coverage,
                    expression: Tuple["np.ndarray", int] = None) -> int:
    """filter_in_vitro.cpp:85-227. `expression` optionally carries the
    sharded device reduction (parallel/stats.py)."""
    min_clipped_length = 3
    max_exonic_breakpoints_by_gene_pair = 8

    # count breakpoints within exons per gene pair
    exonic_breakpoints_by_gene_pair: Dict[Tuple[int, int], int] = defaultdict(int)
    for f in fusions.values():
        if (f.gene1 != f.gene2 and not f.spliced1 and not f.spliced2
                and f.exonic1 and f.exonic2
                and len(f.split_read1_list) + len(f.split_read2_list) > 0
                and f.filter != FILTER_MERGE_ADJACENT
                and f.filter != FILTER_UNINTERESTING_CONTIGS):
            exonic_breakpoints_by_gene_pair[(f.gene1, f.gene2)] += 1
            exonic_breakpoints_by_gene_pair[(f.gene2, f.gene1)] += 1

    read_count_by_gene, high_expression_threshold = find_top_expressed_genes(
        chimeric_alignments, high_expression_quantile, precomputed=expression)

    for f in fusions.values():
        if f.filter != FILTER_NONE and not (
                (f.spliced1 or f.spliced2)
                and f.filter in (FILTER_RELATIVE_SUPPORT, FILTER_MIN_SUPPORT,
                                 FILTER_HOMOPOLYMER)):
            continue

        potential_rt_breakpoints = 0.0
        if not f.exonic1:
            potential_rt_breakpoints += 0.5
        elif not f.spliced1:
            potential_rt_breakpoints += 1
        if not f.exonic2:
            potential_rt_breakpoints += 0.5
        elif not f.spliced2:
            potential_rt_breakpoints += 1

        clipped_discordant_mates1 = 0
        clipped_discordant_mates2 = 0
        for name in f.discordant_mate_list:
            mates = chimeric_alignments[name]
            if mates.filter != FILTER_NONE:
                continue
            for mate in mates:
                if mate.strand == FORWARD and mate.postclipping() >= min_clipped_length:
                    if mate.contig == f.contig1 and mate.end == f.breakpoint1:
                        clipped_discordant_mates1 += 1
                    elif mate.contig == f.contig2 and mate.end == f.breakpoint2:
                        clipped_discordant_mates2 += 1
                elif mate.strand == REVERSE and mate.preclipping() >= min_clipped_length:
                    if mate.contig == f.contig1 and mate.start == f.breakpoint1:
                        clipped_discordant_mates1 += 1
                    elif mate.contig == f.contig2 and mate.start == f.breakpoint2:
                        clipped_discordant_mates2 += 1

        total_split_reads = (min(clipped_discordant_mates1, clipped_discordant_mates2)
                             + f.split_reads1 + f.split_reads2)

        gene1 = _find_higher_expressed_gene(f.contig1, f.breakpoint1, gene_index,
                                            read_count_by_gene, f.gene1)
        gene2 = _find_higher_expressed_gene(f.contig2, f.breakpoint2, gene_index,
                                            read_count_by_gene, f.gene2)
        gene1_expression = read_count_by_gene.get(gene1, 0)
        gene2_expression = read_count_by_gene.get(gene2, 0)

        exonic_breakpoints = max(
            exonic_breakpoints_by_gene_pair.get((gene1, gene2), 0),
            exonic_breakpoints_by_gene_pair.get((f.gene1, f.gene2), 0))

        coverage1 = coverage.get_coverage(f.contig1, f.breakpoint1,
                                          DOWNSTREAM if f.direction1 == UPSTREAM else UPSTREAM)
        coverage2 = coverage.get_coverage(f.contig2, f.breakpoint2,
                                          DOWNSTREAM if f.direction2 == UPSTREAM else UPSTREAM)

        sup = f.supporting_reads()
        if (total_split_reads <= 2 + 0.0001 * (gene1_expression + gene2_expression)
                and (total_split_reads * 2 <= f.discordant_mates or total_split_reads <= 2)
                and gene1_expression + gene2_expression > high_expression_threshold
                and not (sup >= 10 and sup * 4 >= max(coverage1, coverage2)
                         and coverage1 > sup and coverage2 > sup
                         and (f.spliced1 or f.spliced2)
                         and ((f.spliced1 or not f.exonic1) and (f.spliced2 or not f.exonic2)))
                and (potential_rt_breakpoints > 1
                     or (potential_rt_breakpoints > 0
                         and (gene1_expression > high_expression_threshold
                              or gene2_expression > high_expression_threshold))
                     or gene1_expression > 2 * high_expression_threshold
                     or gene2_expression > 2 * high_expression_threshold
                     or (gene1_expression > high_expression_threshold
                         and gene2_expression > high_expression_threshold)
                     or exonic_breakpoints > max_exonic_breakpoints_by_gene_pair
                     or sup <= 1)):
            f.filter = FILTER_IN_VITRO

    return sum(1 for f in fusions.values() if f.filter == FILTER_NONE)


# ---------------------------------------------------------------------------
# recover_both_spliced.cpp


def _opposite_direction(direction: bool) -> bool:
    return UPSTREAM if direction == DOWNSTREAM else DOWNSTREAM


def _count_supporting_reads(fusion: Fusion, chimeric_alignments: ChimericAlignments,
                            read_count_by_gene: Dict[int, int], genes: GeneTable,
                            exons: ExonTable, exon_index: IntervalIndex,
                            coverage: Coverage, high_expression_threshold: int,
                            max_exon_size: int, max_coverage: int) -> int:
    """recover_both_spliced.cpp:17-76."""
    if (read_count_by_gene.get(fusion.gene1, 0) > high_expression_threshold
            or read_count_by_gene.get(fusion.gene2, 0) > high_expression_threshold):
        if (fusion.both_breakpoints_spliced(genes)
                and fusion.discordant_mates <= fusion.split_reads1 + fusion.split_reads2):
            return 1
        return 0

    if not fusion.both_breakpoints_spliced(genes):
        coverage1 = coverage.get_coverage(fusion.contig1, fusion.breakpoint1,
                                          DOWNSTREAM if fusion.direction1 == UPSTREAM else UPSTREAM)
        coverage2 = coverage.get_coverage(fusion.contig2, fusion.breakpoint2,
                                          DOWNSTREAM if fusion.direction2 == UPSTREAM else UPSTREAM)
        if coverage1 + coverage2 > fusion.supporting_reads() * max_coverage:
            return 0
        for e in exon_index.point_query(fusion.contig1, fusion.breakpoint1):
            if exons.end[int(e)] + 1 - exons.start[int(e)] > max_exon_size:
                return 0
        for e in exon_index.point_query(fusion.contig2, fusion.breakpoint2):
            if exons.end[int(e)] + 1 - exons.start[int(e)] > max_exon_size:
                return 0

    multimappers = 0
    unique_mappers = 0
    from itertools import chain
    for name in chain(fusion.split_read1_list, fusion.split_read2_list,
                      fusion.discordant_mate_list):
        mates = chimeric_alignments[name]
        if mates.multimapper:
            multimappers += 1
        elif mates.filter == FILTER_NONE:
            unique_mappers += 1

    total_list_size = (len(fusion.split_read1_list) + len(fusion.split_read2_list)
                       + len(fusion.discordant_mate_list))
    if multimappers >= 0.5 * total_list_size:
        return 0
    if unique_mappers == 0:
        return 1
    return unique_mappers


def recover_both_spliced(fusions: Fusions, chimeric_alignments: ChimericAlignments,
                         genes: GeneTable, exons: ExonTable,
                         exon_index: IntervalIndex, coverage: Coverage,
                         max_fusions_to_recover: int, high_expression_quantile: float,
                         max_exon_size: int, max_coverage: int,
                         expression: Tuple["np.ndarray", int] = None) -> int:
    """recover_both_spliced.cpp:77-182 — two-mode (dry-run counting, then
    recover) with a dynamic min-supporting-reads threshold."""
    read_count_by_gene, high_expression_threshold = find_top_expressed_genes(
        chimeric_alignments, high_expression_quantile, precomputed=expression)

    def count_reads(f: Fusion) -> int:
        return _count_supporting_reads(f, chimeric_alignments, read_count_by_gene,
                                       genes, exons, exon_index, coverage,
                                       high_expression_threshold, max_exon_size,
                                       max_coverage)

    fusions_by_gene_pair: Dict[Tuple[int, int, bool, bool], List[Fusion]] = defaultdict(list)
    for f in fusions.values():
        if f.filter != FILTER_MERGE_ADJACENT:
            if (f.filter in (FILTER_NONE, FILTER_IN_VITRO, FILTER_INTRONIC,
                             FILTER_RELATIVE_SUPPORT, FILTER_MIN_SUPPORT)
                    or (f.filter == FILTER_INCONSISTENTLY_CLIPPED
                        and f.both_breakpoints_spliced(genes))):
                if count_reads(f) > 0:
                    fusions_by_gene_pair[(f.gene1, f.gene2, f.direction1, f.direction2)].append(f)

    remaining = 0
    recovered_by_supporting_reads: Dict[int, int] = defaultdict(int)
    min_supporting_reads = 1
    for mode in ("counting", "recover"):
        for f in fusions.values():
            if f.filter == FILTER_NONE:
                if mode == "recover":
                    remaining += 1
                continue
            if not f.both_breakpoints_spliced(genes):
                continue
            if f.gene1 == f.gene2 or f.breakpoint_overlaps_both_genes(genes):
                continue
            if f.is_read_through():
                continue
            if f.filter not in (FILTER_RELATIVE_SUPPORT, FILTER_MIN_SUPPORT,
                                FILTER_IN_VITRO):
                continue

            sum_of_supporting_reads = 0
            for other in fusions_by_gene_pair.get(
                    (f.gene1, f.gene2, f.direction1, f.direction2), ()):
                sum_of_supporting_reads += count_reads(other)
            for other in fusions_by_gene_pair.get(
                    (f.gene1, f.gene2, _opposite_direction(f.direction1),
                     _opposite_direction(f.direction2)), ()):
                if not other.is_read_through():
                    if (other.both_breakpoints_spliced(genes)
                            or (((f.direction1 == DOWNSTREAM) != (f.breakpoint1 > other.breakpoint1))
                                and ((f.direction2 == DOWNSTREAM) != (f.breakpoint2 > other.breakpoint2)))):
                        sum_of_supporting_reads += count_reads(other)

            if sum_of_supporting_reads >= 2:
                if mode == "recover":
                    add_one = (1 if (f.contig1 == f.contig2
                                     and abs(f.breakpoint1 - f.breakpoint2) < 1000000) else 0)
                    if f.supporting_reads() >= min_supporting_reads + add_one:
                        f.filter = FILTER_NONE
                        remaining += 1
                else:
                    recovered_by_supporting_reads[f.supporting_reads()] += 1

        if mode == "counting":
            would_be_recovered = 0
            for supporting_reads in sorted(recovered_by_supporting_reads, reverse=True):
                would_be_recovered += recovered_by_supporting_reads[supporting_reads]
                if would_be_recovered >= max_fusions_to_recover:
                    min_supporting_reads = supporting_reads + 1
                    break
    return remaining
