"""Candidate generation: breakpoint clustering and strand/5' prediction.

Reference parity: source/fusions.cpp. Every chimeric fragment contributes a
(contig1,bp1,dir1,genes1) x (contig2,bp2,dir2,genes2) candidate per gene
pair; split-read support is subsampled at `subsampling_threshold`; discordant
mates are assigned to candidates in a second pass via a gene-pair hash.
"""

from __future__ import annotations

import sys
from typing import Dict, List, Tuple

from .annotation.index import IntervalIndex
from .annotation.queries import complement_strand_if, is_breakpoint_spliced
from .annotation.tables import ExonTable, GeneTable
from .constants import (DOWNSTREAM, FILTER_DUPLICATES, FILTER_HAIRPIN,
                        FILTER_NONE, FORWARD, MATE1, MATE2, REVERSE,
                        SPLIT_READ, SUPPLEMENTARY, TRANSCRIPT_START_GENE1,
                        TRANSCRIPT_START_GENE2, UPSTREAM)
from .fusion import Fusion, FusionKey, Fusions
from .model import ChimericAlignments


def predict_fusion_strands(fusion: Fusion, chimeric_alignments: ChimericAlignments) -> None:
    """fusions.cpp:15-89 — majority vote of supporting reads over strand1."""
    strand1_forward = 0
    strand1_reverse = 0

    for name in fusion.split_read1_list:
        split = chimeric_alignments[name][SPLIT_READ]
        if not split.predicted_strand_ambiguous:
            if split.predicted_strand == FORWARD:
                strand1_forward += 1
            else:
                strand1_reverse += 1

    for name in fusion.split_read2_list:
        supp = chimeric_alignments[name][SUPPLEMENTARY]
        if not supp.predicted_strand_ambiguous:
            if supp.predicted_strand == FORWARD:
                strand1_forward += 1
            else:
                strand1_reverse += 1

    for name in fusion.discordant_mate_list:
        mates = chimeric_alignments[name]
        if mates[MATE1].predicted_strand_ambiguous or mates.filter == FILTER_HAIRPIN:
            continue
        mate1 = mates[MATE1]
        mate2 = mates[MATE2]
        if mate1.contig != fusion.contig1 or \
           (mate1.strand == FORWARD) != (fusion.direction1 == DOWNSTREAM):
            mate1, mate2 = mate2, mate1
        elif mate1.strand == mate2.strand:
            if fusion.direction1 == DOWNSTREAM:
                mate1_end, mate2_end = mate1.end, mate2.end
            else:
                mate1_end, mate2_end = mate1.start, mate2.start
            distance1 = abs(fusion.breakpoint1 - mate1_end) + abs(fusion.breakpoint2 - mate2_end)
            distance2 = abs(fusion.breakpoint2 - mate1_end) + abs(fusion.breakpoint1 - mate2_end)
            if distance1 == distance2:
                continue
            if distance2 < distance1:
                mate1, mate2 = mate2, mate1
        if mate1.predicted_strand == FORWARD:
            strand1_forward += 1
        else:
            strand1_reverse += 1

    if strand1_forward == strand1_reverse:
        fusion.predicted_strands_ambiguous = True
    else:
        fusion.predicted_strands_ambiguous = False
        fusion.predicted_strand1 = FORWARD if strand1_forward > strand1_reverse else REVERSE
        fusion.predicted_strand2 = complement_strand_if(
            fusion.predicted_strand1, fusion.direction1 == fusion.direction2)


def predict_transcript_start(fusion: Fusion, genes: GeneTable) -> None:
    """fusions.cpp:93-200 — decide which gene forms the 5' end."""
    fusion.transcript_start_ambiguous = False
    g1_strand = bool(genes.strand[fusion.gene1])
    g2_strand = bool(genes.strand[fusion.gene2])
    g1_dummy = bool(genes.is_dummy[fusion.gene1])
    g2_dummy = bool(genes.is_dummy[fusion.gene2])

    if fusion.spliced1 or (not fusion.predicted_strands_ambiguous and not g1_dummy
                           and fusion.predicted_strand1 == g1_strand):
        if g1_strand == FORWARD and fusion.direction1 == DOWNSTREAM:
            fusion.transcript_start = TRANSCRIPT_START_GENE1
        elif g1_strand == FORWARD and fusion.direction1 == UPSTREAM:
            fusion.transcript_start = TRANSCRIPT_START_GENE2
        elif g1_strand == REVERSE and fusion.direction1 == UPSTREAM:
            fusion.transcript_start = TRANSCRIPT_START_GENE1
        else:
            fusion.transcript_start = TRANSCRIPT_START_GENE2

    elif fusion.spliced2 or (not fusion.predicted_strands_ambiguous and not g2_dummy
                             and fusion.predicted_strand2 == g2_strand):
        if g2_strand == FORWARD and fusion.direction2 == DOWNSTREAM:
            fusion.transcript_start = TRANSCRIPT_START_GENE2
        elif g2_strand == FORWARD and fusion.direction2 == UPSTREAM:
            fusion.transcript_start = TRANSCRIPT_START_GENE1
        elif g2_strand == REVERSE and fusion.direction2 == UPSTREAM:
            fusion.transcript_start = TRANSCRIPT_START_GENE2
        else:
            fusion.transcript_start = TRANSCRIPT_START_GENE1

    elif not fusion.predicted_strands_ambiguous:
        if ((fusion.predicted_strand1 == FORWARD and fusion.direction1 == DOWNSTREAM
             or fusion.predicted_strand1 == REVERSE and fusion.direction1 == UPSTREAM)
                and (fusion.predicted_strand2 == REVERSE and fusion.direction2 == DOWNSTREAM
                     or fusion.predicted_strand2 == FORWARD and fusion.direction2 == UPSTREAM)):
            fusion.transcript_start = TRANSCRIPT_START_GENE1
        elif ((fusion.predicted_strand2 == FORWARD and fusion.direction2 == DOWNSTREAM
               or fusion.predicted_strand2 == REVERSE and fusion.direction2 == UPSTREAM)
                and (fusion.predicted_strand1 == REVERSE and fusion.direction1 == DOWNSTREAM
                     or fusion.predicted_strand1 == FORWARD and fusion.direction1 == UPSTREAM)):
            fusion.transcript_start = TRANSCRIPT_START_GENE2
        else:
            fusion.transcript_start_ambiguous = True

    elif not fusion.exonic1 and not fusion.exonic2:
        fusion.transcript_start_ambiguous = True

    elif not fusion.exonic1 and fusion.exonic2:
        if g2_strand == FORWARD and fusion.direction2 == DOWNSTREAM:
            fusion.transcript_start = TRANSCRIPT_START_GENE2
        elif g2_strand == REVERSE and fusion.direction2 == UPSTREAM:
            fusion.transcript_start = TRANSCRIPT_START_GENE2
        elif (fusion.split_reads1 + fusion.split_reads2 == 0
              and fusion.is_read_through()
              and (g2_strand == FORWARD and fusion.direction2 == UPSTREAM
                   or g2_strand == REVERSE and fusion.direction2 == DOWNSTREAM)):
            fusion.transcript_start = TRANSCRIPT_START_GENE1
        else:
            fusion.transcript_start_ambiguous = True

    elif not fusion.exonic2 and fusion.exonic1:
        if g1_strand == FORWARD and fusion.direction1 == DOWNSTREAM:
            fusion.transcript_start = TRANSCRIPT_START_GENE1
        elif g1_strand == REVERSE and fusion.direction1 == UPSTREAM:
            fusion.transcript_start = TRANSCRIPT_START_GENE1
        elif (fusion.split_reads1 + fusion.split_reads2 == 0
              and fusion.is_read_through()
              and (g1_strand == FORWARD and fusion.direction1 == UPSTREAM
                   or g1_strand == REVERSE and fusion.direction1 == DOWNSTREAM)):
            fusion.transcript_start = TRANSCRIPT_START_GENE1
        else:
            fusion.transcript_start_ambiguous = True

    else:
        # C++ operator precedence: (!dummy && cond1) || cond2
        if ((not g1_dummy and g1_strand == FORWARD and fusion.direction1 == DOWNSTREAM)
                or (g1_strand == REVERSE and fusion.direction1 == UPSTREAM)):
            fusion.transcript_start = TRANSCRIPT_START_GENE1
        elif ((not g2_dummy and g2_strand == FORWARD and fusion.direction2 == DOWNSTREAM)
                or (g2_strand == REVERSE and fusion.direction2 == UPSTREAM)):
            fusion.transcript_start = TRANSCRIPT_START_GENE2
        else:
            fusion.transcript_start_ambiguous = True

    if fusion.transcript_start_ambiguous:
        fusion.transcript_start = TRANSCRIPT_START_GENE1

    if not fusion.transcript_start_ambiguous and fusion.predicted_strands_ambiguous:
        fusion.predicted_strands_ambiguous = False
        if fusion.transcript_start == TRANSCRIPT_START_GENE1:
            fusion.predicted_strand1 = g1_strand
            fusion.predicted_strand2 = complement_strand_if(
                fusion.predicted_strand1, fusion.direction1 == fusion.direction2)
        else:
            fusion.predicted_strand2 = g2_strand
            fusion.predicted_strand1 = complement_strand_if(
                fusion.predicted_strand2, fusion.direction1 == fusion.direction2)


def _expand_anchor(fusion: Fusion, which: int, anchor_start: int) -> None:
    if which == 1:
        if fusion.direction1 == DOWNSTREAM and (anchor_start < fusion.anchor_start1 or fusion.anchor_start1 == 0):
            fusion.anchor_start1 = anchor_start
        elif fusion.direction1 == UPSTREAM and (anchor_start > fusion.anchor_start1 or fusion.anchor_start1 == 0):
            fusion.anchor_start1 = anchor_start
    else:
        if fusion.direction2 == DOWNSTREAM and (anchor_start < fusion.anchor_start2 or fusion.anchor_start2 == 0):
            fusion.anchor_start2 = anchor_start
        elif fusion.direction2 == UPSTREAM and (anchor_start > fusion.anchor_start2 or fusion.anchor_start2 == 0):
            fusion.anchor_start2 = anchor_start


def find_fusions(chimeric_alignments: ChimericAlignments, fusions: Fusions,
                 genes: GeneTable, exons: ExonTable, exon_index: IntervalIndex,
                 max_mate_gap: int, subsampling_threshold: int) -> int:
    """fusions.cpp:203-473."""
    discordant_by_gene_pair: Dict[Tuple[int, int, bool, bool],
                                  List[Tuple[int, int, str]]] = {}
    subsampled = False

    for name, mates in chimeric_alignments.items():
        if len(mates) == 3:  # split read
            split = mates[SPLIT_READ]
            supp = mates[SUPPLEMENTARY]
            contig1, contig2 = split.contig, supp.contig
            breakpoint1 = split.start if split.strand == FORWARD else split.end
            breakpoint2 = supp.end if supp.strand == FORWARD else supp.start
            genes1, genes2 = split.genes, supp.genes
            direction1 = UPSTREAM if split.strand == FORWARD else DOWNSTREAM
            direction2 = DOWNSTREAM if supp.strand == FORWARD else UPSTREAM
            exonic1, exonic2 = split.exonic, supp.exonic
            anchor_start1 = mates[MATE1].start if mates[MATE1].strand == FORWARD else mates[MATE1].end
            anchor_start2 = supp.start if supp.strand == FORWARD else supp.end

            swapped = False
            if contig1 > contig2 or (contig1 == contig2 and breakpoint1 > breakpoint2):
                contig1, contig2 = contig2, contig1
                breakpoint1, breakpoint2 = breakpoint2, breakpoint1
                genes1, genes2 = genes2, genes1
                direction1, direction2 = direction2, direction1
                exonic1, exonic2 = exonic2, exonic1
                anchor_start1, anchor_start2 = anchor_start2, anchor_start1
                swapped = True

            for gene1 in genes1.tolist():
                for gene2 in genes2.tolist():
                    key: FusionKey = (gene1, gene2, contig1, contig2,
                                      breakpoint1, breakpoint2, direction1, direction2)
                    fusion = fusions.get(key)
                    is_new = fusion is None
                    if is_new:
                        fusion = Fusion(gene1=gene1, gene2=gene2,
                                        direction1=direction1, direction2=direction2,
                                        contig1=contig1, contig2=contig2,
                                        breakpoint1=breakpoint1, breakpoint2=breakpoint2)
                        fusions[key] = fusion
                    fusion.exonic1 = exonic1 or fusion.exonic1
                    fusion.exonic2 = exonic2 or fusion.exonic2
                    if is_new or mates.filter == FILTER_NONE or fusion.filter == FILTER_DUPLICATES:
                        fusion.filter = mates.filter

                    if ((fusion.split_reads1 >= subsampling_threshold and not swapped)
                            or (fusion.split_reads2 >= subsampling_threshold and swapped)
                            or (mates.filter != FILTER_NONE and not swapped
                                and len(fusion.split_read1_list) >= subsampling_threshold)
                            or (mates.filter != FILTER_NONE and swapped
                                and len(fusion.split_read2_list) >= subsampling_threshold)):
                        subsampled = True
                    else:
                        _expand_anchor(fusion, 1, anchor_start1)
                        _expand_anchor(fusion, 2, anchor_start2)
                        if swapped:
                            fusion.split_read2_list.append(name)
                            if mates.filter == FILTER_NONE:
                                fusion.split_reads2 += 1
                        else:
                            fusion.split_read1_list.append(name)
                            if mates.filter == FILTER_NONE:
                                fusion.split_reads1 += 1

        elif len(mates) == 2:  # discordant mates
            m1, m2 = mates[MATE1], mates[MATE2]
            contig1, contig2 = m1.contig, m2.contig
            breakpoint1 = m1.end if m1.strand == FORWARD else m1.start
            breakpoint2 = m2.end if m2.strand == FORWARD else m2.start
            genes1, genes2 = m1.genes, m2.genes
            direction1 = DOWNSTREAM if m1.strand == FORWARD else UPSTREAM
            direction2 = DOWNSTREAM if m2.strand == FORWARD else UPSTREAM
            exonic1, exonic2 = m1.exonic, m2.exonic
            anchor_start1 = m1.start if m1.strand == FORWARD else m1.end
            anchor_start2 = m2.start if m2.strand == FORWARD else m2.end

            if contig1 > contig2 or (contig1 == contig2 and breakpoint1 > breakpoint2):
                contig1, contig2 = contig2, contig1
                breakpoint1, breakpoint2 = breakpoint2, breakpoint1
                genes1, genes2 = genes2, genes1
                direction1, direction2 = direction2, direction1
                exonic1, exonic2 = exonic2, exonic1
                anchor_start1, anchor_start2 = anchor_start2, anchor_start1

            for gene1 in genes1.tolist():
                for gene2 in genes2.tolist():
                    key = (gene1, gene2, contig1, contig2,
                           breakpoint1, breakpoint2, direction1, direction2)
                    fusion = fusions.get(key)
                    is_new = fusion is None
                    if is_new:
                        fusion = Fusion(gene1=gene1, gene2=gene2,
                                        direction1=direction1, direction2=direction2,
                                        contig1=contig1, contig2=contig2,
                                        breakpoint1=breakpoint1, breakpoint2=breakpoint2)
                        fusions[key] = fusion
                    fusion.exonic1 = exonic1 or fusion.exonic1
                    fusion.exonic2 = exonic2 or fusion.exonic2
                    if is_new or mates.filter == FILTER_NONE or fusion.filter == FILTER_DUPLICATES:
                        fusion.filter = mates.filter
                    _expand_anchor(fusion, 1, anchor_start1)
                    _expand_anchor(fusion, 2, anchor_start2)
                    discordant_by_gene_pair.setdefault(
                        (gene1, gene2, direction1, direction2), []
                    ).append((breakpoint1, breakpoint2, name))

    # second pass: assign discordant mates to fusions (fusions.cpp:368-437)
    for fusion in fusions.values():
        if fusion.filter != FILTER_NONE:
            continue
        candidates = discordant_by_gene_pair.get(
            (fusion.gene1, fusion.gene2, fusion.direction1, fusion.direction2))
        if candidates is None:
            continue
        max_overlap = 2 if (len(fusion.split_read1_list) + len(fusion.split_read2_list) > 0) else max_mate_gap
        fusion_bp1 = fusion.breakpoint1 + max_overlap if fusion.direction1 == DOWNSTREAM else fusion.breakpoint1 - max_overlap
        fusion_bp2 = fusion.breakpoint2 + max_overlap if fusion.direction2 == DOWNSTREAM else fusion.breakpoint2 - max_overlap

        for bp1, bp2, name in candidates:
            if not (((fusion.direction1 == DOWNSTREAM and bp1 <= fusion_bp1)
                     or (fusion.direction1 == UPSTREAM and bp1 >= fusion_bp1))
                    and ((fusion.direction2 == DOWNSTREAM and bp2 <= fusion_bp2)
                         or (fusion.direction2 == UPSTREAM and bp2 >= fusion_bp2))):
                continue
            # mate breakpoints must not stray into the partner gene, unless
            # they are close to the fusion breakpoints (fusions.cpp:392-396)
            genes_tab = genes
            not_overlapping = (not fusion.is_intragenic(genes_tab)
                               and not (genes_tab.start[fusion.gene2] <= bp1 <= genes_tab.end[fusion.gene2])
                               and not (genes_tab.start[fusion.gene1] <= bp2 <= genes_tab.end[fusion.gene1]))
            close = (abs(fusion.breakpoint1 - bp1) <= max_mate_gap
                     and abs(fusion.breakpoint2 - bp2) <= max_mate_gap)
            if not (not_overlapping or close):
                continue

            mates = chimeric_alignments[name]
            if mates.filter != FILTER_NONE and len(fusion.discordant_mate_list) >= subsampling_threshold:
                subsampled = True
                continue
            if fusion.discordant_mates >= subsampling_threshold:
                subsampled = True
                break

            fusion.discordant_mate_list.append(name)
            if mates.filter == FILTER_NONE:
                fusion.discordant_mates += 1

            # canonicalize the fragment in place: MATE1 = lower coordinate
            mate1, mate2 = mates[MATE1], mates[MATE2]
            mate1_bp = mate1.end if mate1.strand == FORWARD else mate1.start
            mate2_bp = mate2.end if mate2.strand == FORWARD else mate2.start
            if mate1.contig > mate2.contig or (mate1.contig == mate2.contig and mate1_bp > mate2_bp):
                mates[MATE1], mates[MATE2] = mates[MATE2], mates[MATE1]
                mate1, mate2 = mates[MATE1], mates[MATE2]

            if fusion.direction1 == DOWNSTREAM and (mate1.start < fusion.anchor_start1 or fusion.anchor_start1 == 0):
                fusion.anchor_start1 = mate1.start
            elif fusion.direction1 == UPSTREAM and (mate1.end > fusion.anchor_start1 or fusion.anchor_start1 == 0):
                fusion.anchor_start1 = mate1.end
            if fusion.direction2 == DOWNSTREAM and (mate2.start < fusion.anchor_start2 or fusion.anchor_start2 == 0):
                fusion.anchor_start2 = mate2.start
            elif fusion.direction2 == UPSTREAM and (mate2.end > fusion.anchor_start2 or fusion.anchor_start2 == 0):
                fusion.anchor_start2 = mate2.end

    if subsampled:
        print(f"WARNING: some fusions were subsampled, because they have more than "
              f"{subsampling_threshold} supporting reads", file=sys.stderr)

    remaining = 0
    for fusion in fusions.values():
        predict_fusion_strands(fusion, chimeric_alignments)
        if (len(fusion.split_read1_list) + len(fusion.split_read2_list) == 0
                or fusion.predicted_strands_ambiguous):
            fusion.spliced1 = False
            fusion.spliced2 = False
        else:
            fusion.spliced1 = (fusion.exonic1
                               and bool(genes.strand[fusion.gene1]) == fusion.predicted_strand1
                               and is_breakpoint_spliced(fusion.gene1, fusion.direction1,
                                                         fusion.breakpoint1, genes, exons, exon_index))
            fusion.spliced2 = (fusion.exonic2
                               and bool(genes.strand[fusion.gene2]) == fusion.predicted_strand2
                               and is_breakpoint_spliced(fusion.gene2, fusion.direction2,
                                                         fusion.breakpoint2, genes, exons, exon_index))
        predict_transcript_start(fusion, genes)
        if fusion.filter == FILTER_NONE:
            remaining += 1
    return remaining
