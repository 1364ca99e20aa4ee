"""WGS structural-variant support: marking, confidence scoring, filtering.

Reference parity: source/filter_genomic_support.cpp — parses SV calls in
Arriba 4-column or VCF format (BND bracket notation, DEL/DUP/INV + END),
matches fusions to the nearest compatible genomic breakpoint, derives the
three-level confidence score, and can discard/recover events based on WGS
agreement.
"""

from __future__ import annotations

import sys
from bisect import bisect_left
from collections import defaultdict
from typing import Dict, List, Optional, Tuple

from ..annotation.tables import GeneTable
from ..constants import (CONFIDENCE_HIGH, CONFIDENCE_LOW, CONFIDENCE_MEDIUM,
                         DOWNSTREAM, FILTER_END_TO_END, FILTER_IN_VITRO,
                         FILTER_INTRONIC, FILTER_MISMAPPERS, FILTER_NONE,
                         FILTER_NO_COVERAGE, FILTER_NO_GENOMIC_SUPPORT,
                         FILTER_RELATIVE_SUPPORT, UPSTREAM)
from ..contigs import ContigRegistry, remove_chr
from ..fusion import Fusion, Fusions
from ..ingest.stats import Coverage
from ..io.compressed import iter_lines


def _parse_breakpoint(text: str, contigs: ContigRegistry) -> Optional[Tuple[int, int]]:
    """filter_genomic_support.cpp:15-35."""
    separator = text.rfind(":")
    if separator < 0:
        return None
    contig_name = remove_chr(text[:separator])
    cid = contigs.name_to_id.get(contig_name)
    if cid is None:
        return None
    from ..io.compressed import str_to_int
    position = str_to_int(text[separator + 1:])
    if position is None:
        return None
    return cid, position - 1


def _parse_direction(text: str) -> Optional[bool]:
    """filter_genomic_support.cpp:37-46."""
    if text in ("upstream", "-"):
        return UPSTREAM
    if text in ("downstream", "+"):
        return DOWNSTREAM
    return None


def _parse_vcf_info(info: str, field: str) -> Optional[str]:
    """filter_genomic_support.cpp:48-60."""
    if info.startswith(field + "="):
        start = len(field) + 1
    else:
        start = info.find(";" + field + "=")
        if start < 0:
            return None
        start += len(field) + 2
    end = info.find(";", start)
    return info[start:] if end < 0 else info[start:end]


def _is_genomic_breakpoint_close_enough(direction: bool, genomic_breakpoint: int,
                                        fusion_breakpoint: int, gene: int,
                                        genes: GeneTable, max_distance: int) -> bool:
    """filter_genomic_support.cpp:62-78."""
    if direction == UPSTREAM:
        if genes.is_dummy[gene]:
            most_distal = fusion_breakpoint - max_distance
        else:
            most_distal = int(genes.start[gene]) - max_distance
        return most_distal <= genomic_breakpoint <= fusion_breakpoint + 5
    if genes.is_dummy[gene]:
        most_distal = fusion_breakpoint + max_distance
    else:
        most_distal = int(genes.end[gene]) + max_distance
    return fusion_breakpoint - 5 <= genomic_breakpoint <= most_distal


def mark_genomic_support(fusions: Fusions, genomic_breakpoints_file_path: str,
                         contigs: ContigRegistry, genes: GeneTable,
                         max_distance: int, max_itd_length: int) -> int:
    """filter_genomic_support.cpp:80-220."""
    # (contig1, contig2, direction1, direction2) -> sorted {position1: [position2...]}
    genomic_breakpoints: Dict[Tuple[int, int, bool, bool], Dict[int, List[int]]] = \
        defaultdict(lambda: defaultdict(list))

    for line in iter_lines(genomic_breakpoints_file_path):
        if not line or line[0] == "#":
            continue
        columns = line.split("\t")
        vcf_sv_type = ""
        parsed = None
        if len(columns) >= 4:
            bp1 = _parse_breakpoint(columns[0], contigs)
            bp2 = _parse_breakpoint(columns[1], contigs)
            dir1 = _parse_direction(columns[2])
            dir2 = _parse_direction(columns[3])
            if bp1 and bp2 and dir1 is not None and dir2 is not None:
                parsed = (bp1[0], bp1[1], bp2[0], bp2[1], dir1, dir2)
        if parsed is None:
            # try VCF
            if len(columns) < 8:
                print(f"WARNING: failed to parse line: {line}", file=sys.stderr)
                continue
            vcf_chrom, vcf_pos, _, _, vcf_alt, _, vcf_filter, vcf_info = columns[:8]
            vcf_sv_type = _parse_vcf_info(vcf_info, "SVTYPE")
            if vcf_sv_type is None:
                print(f"WARNING: failed to parse line: {line}", file=sys.stderr)
                continue
            if vcf_sv_type == "BND":
                opening = vcf_alt.find("[")
                closing = vcf_alt.find("]")
                if opening < 0:
                    opening = len(vcf_alt) + 1
                if closing < 0:
                    closing = len(vcf_alt) + 1
                bracket = "[" if opening < closing else "]"
                bracket_pos1 = min(opening, closing)
                bracket_pos2 = vcf_alt.find(bracket, bracket_pos1 + 1)
                if bracket_pos1 >= len(vcf_alt) or bracket_pos2 < 0:
                    if vcf_alt and (vcf_alt[0] == "." or vcf_alt[-1] == "."):
                        continue  # silently ignore single breakend
                    print(f"WARNING: failed to parse line: {line}", file=sys.stderr)
                    continue
                dir1 = UPSTREAM if bracket_pos1 == 0 else DOWNSTREAM
                dir2 = UPSTREAM if bracket == "[" else DOWNSTREAM
                breakpoint2_text = vcf_alt[bracket_pos1 + 1:bracket_pos2]
            else:
                vcf_info_end = _parse_vcf_info(vcf_info, "END")
                if vcf_info_end is None:
                    print(f"WARNING: failed to parse line: {line}", file=sys.stderr)
                    continue
                breakpoint2_text = vcf_chrom + ":" + vcf_info_end
                if vcf_sv_type == "INV":
                    dir1 = dir2 = DOWNSTREAM
                elif vcf_sv_type == "DEL":
                    dir1, dir2 = DOWNSTREAM, UPSTREAM
                elif vcf_sv_type == "DUP":
                    dir1, dir2 = UPSTREAM, DOWNSTREAM
                else:
                    print(f"WARNING: failed to parse line: {line}", file=sys.stderr)
                    continue
            bp1 = _parse_breakpoint(vcf_chrom + ":" + vcf_pos, contigs)
            bp2 = _parse_breakpoint(breakpoint2_text, contigs)
            if bp1 is None or bp2 is None:
                print(f"WARNING: failed to parse line: {line}", file=sys.stderr)
                continue
            if vcf_filter != "PASS":
                continue
            parsed = (bp1[0], bp1[1], bp2[0], bp2[1], dir1, dir2)

        contig1, position1, contig2, position2, direction1, direction2 = parsed
        if contig2 < contig1 or (contig2 == contig1 and position2 < position1):
            contig1, contig2 = contig2, contig1
            position1, position2 = position2, position1
            direction1, direction2 = direction2, direction1
        genomic_breakpoints[(contig1, contig2, direction1, direction2)][position1].append(position2)
        if vcf_sv_type == "INV":  # INV encodes two separate breakpoints
            genomic_breakpoints[(contig1, contig2, UPSTREAM, UPSTREAM)][position1].append(position2)

    # sort the per-key position maps for lower_bound scans
    sorted_breakpoints = {
        key: sorted(positions.items())
        for key, positions in genomic_breakpoints.items()
    }

    for f in fusions.values():
        entries = sorted_breakpoints.get((f.contig1, f.contig2, f.direction1, f.direction2))
        if entries is None:
            continue
        keys = [p for p, _ in entries]
        idx = bisect_left(keys, f.breakpoint1 + (5 if f.direction1 == UPSTREAM else -5))
        if f.direction1 == UPSTREAM:
            if idx == 0:
                continue
            idx -= 1
        else:
            if idx == len(entries):
                continue

        while _is_genomic_breakpoint_close_enough(f.direction1, entries[idx][0],
                                                  f.breakpoint1, f.gene1, genes, max_distance):
            genomic_bp1 = entries[idx][0]
            for genomic_bp2 in entries[idx][1]:
                if _is_genomic_breakpoint_close_enough(f.direction2, genomic_bp2,
                                                       f.breakpoint2, f.gene2, genes,
                                                       max_distance) and (
                        f.contig1 != f.contig2
                        or (f.direction1 == UPSTREAM and f.direction2 == DOWNSTREAM
                            and (not f.is_internal_tandem_duplication(max_itd_length)
                                 or (f.breakpoint1 - genomic_bp1 < max_itd_length
                                     and genomic_bp2 - f.breakpoint2 < max_itd_length)))
                        or (f.direction1 == DOWNSTREAM and f.direction2 == UPSTREAM
                            and genomic_bp1 < f.breakpoint2 and genomic_bp2 > f.breakpoint1)
                        or (f.direction1 == UPSTREAM and f.direction2 == UPSTREAM
                            and genomic_bp2 > f.breakpoint1)
                        or (f.direction1 == DOWNSTREAM and f.direction2 == DOWNSTREAM
                            and genomic_bp1 < f.breakpoint2)):
                    if (f.closest_genomic_breakpoint1 < 0 or f.closest_genomic_breakpoint2 < 0
                            or (abs(f.breakpoint1 - f.closest_genomic_breakpoint1)
                                + abs(f.breakpoint2 - f.closest_genomic_breakpoint2)
                                > abs(genomic_bp1 - f.breakpoint1)
                                + abs(f.breakpoint2 - genomic_bp2))):
                        f.closest_genomic_breakpoint1 = genomic_bp1
                        f.closest_genomic_breakpoint2 = genomic_bp2
            if idx > 0:
                idx -= 1
            else:
                break

    return sum(1 for f in fusions.values() if f.closest_genomic_breakpoint1 >= 0)


def assign_confidence(fusions: Fusions, coverage: Coverage, genes: GeneTable) -> None:
    """filter_genomic_support.cpp:222-401."""
    fusions_by_gene: Dict[int, List[Fusion]] = defaultdict(list)
    for f in fusions.values():
        fusions_by_gene[f.gene1].append(f)
        fusions_by_gene[f.gene2].append(f)

    for f in fusions.values():
        coverage1 = coverage.get_coverage(f.contig1, f.breakpoint1,
                                          DOWNSTREAM if f.direction1 == UPSTREAM else UPSTREAM)
        coverage2 = coverage.get_coverage(f.contig2, f.breakpoint2,
                                          DOWNSTREAM if f.direction2 == UPSTREAM else UPSTREAM)
        coverage_fraction = float(len(f.split_read1_list) + len(f.split_read2_list)
                                  + len(f.discordant_mate_list)) / max(1, max(coverage1, coverage2))

        if f.filter != FILTER_NONE:
            f.confidence = CONFIDENCE_LOW
            continue

        f.confidence = CONFIDENCE_HIGH

        if f.evalue > 0.3 or f.supporting_reads() < 2:
            f.confidence = CONFIDENCE_LOW

        elif f.is_read_through():
            f.confidence = CONFIDENCE_LOW
            if ((f.split_reads1 > 0 and f.split_reads2 > 0)
                    or (f.split_reads1 > 0 and f.discordant_mates > 0)
                    or (f.split_reads2 > 0 and f.discordant_mates > 0)) \
                    and f.supporting_reads() >= 10:
                if f.split_reads1 + f.split_reads2 >= 10 and coverage_fraction > 0.07:
                    f.confidence = CONFIDENCE_HIGH
                else:
                    f.confidence = CONFIDENCE_MEDIUM
            else:
                # look for multiple deletions involving the same gene
                number_of_deletions = 0
                for gene in (f.gene1, f.gene2):
                    for other in fusions_by_gene[gene]:
                        if (other.filter == FILTER_NONE
                                and other.split_reads1 + other.split_reads2 > 0
                                and other.direction1 == DOWNSTREAM
                                and other.direction2 == UPSTREAM
                                and ((other.gene1 == f.gene1 and other.gene2 != f.gene2)
                                     or (other.gene1 != f.gene1 and other.gene2 == f.gene2))
                                and (other.breakpoint1 != f.breakpoint1
                                     or other.breakpoint2 != f.breakpoint2)
                                and other.breakpoint2 > f.breakpoint1
                                and other.breakpoint1 < f.breakpoint2):
                            number_of_deletions += 1
                if number_of_deletions >= 1:
                    f.confidence = CONFIDENCE_MEDIUM

        elif f.breakpoint_overlaps_both_genes(genes) or f.gene1 == f.gene2:
            f.confidence = CONFIDENCE_LOW
            if f.split_reads1 + f.split_reads2 > 0:
                if not f.exonic1 and not f.exonic2:
                    if f.split_reads1 > 0 and f.split_reads2 > 0:
                        f.confidence = CONFIDENCE_HIGH
                    else:
                        f.confidence = CONFIDENCE_MEDIUM
                elif not f.exonic1 or not f.exonic2:
                    if f.split_reads1 > 3 and f.split_reads2 > 3:
                        f.confidence = CONFIDENCE_HIGH
                    else:
                        f.confidence = CONFIDENCE_MEDIUM

        # lift confidence of rescued internal tandem duplications
        if (f.confidence == CONFIDENCE_LOW and f.gene1 == f.gene2
                and f.exonic1 and f.exonic2 and not f.spliced1 and not f.spliced2
                and f.breakpoint2 - f.breakpoint1 < 100
                and f.split_reads1 > 0 and f.split_reads2 > 0
                and f.split_reads1 + f.split_reads2 >= 10
                and coverage_fraction > 0.15
                and f.direction1 == UPSTREAM and f.direction2 == DOWNSTREAM):
            f.confidence = CONFIDENCE_MEDIUM

        # multiple spliced events between the same pair of genes
        if (f.confidence < CONFIDENCE_HIGH and f.spliced1 and f.spliced2
                and not f.is_read_through() and f.gene1 != f.gene2):
            number_of_spliced_breakpoints = 0
            for gene in (f.gene1, f.gene2):
                for other in fusions_by_gene[gene]:
                    if (other.gene1 == f.gene1 and other.gene2 == f.gene2
                            and other.spliced1 and other.spliced2
                            and (abs(other.breakpoint1 - f.breakpoint1) > 2
                                 or abs(other.breakpoint2 - f.breakpoint2) > 2)):
                        number_of_spliced_breakpoints += 1
            if number_of_spliced_breakpoints > 0:
                f.confidence += 1

        # penalize when no breakpoint is spliced (not for intragenic events)
        if f.gene1 != f.gene2 and f.confidence > CONFIDENCE_LOW \
                and not f.spliced1 and not f.spliced2:
            f.confidence -= 1

        # excellent support => high confidence regardless
        if f.split_reads1 > 20 and f.split_reads2 > 20 and f.supporting_reads() > 60:
            f.confidence = CONFIDENCE_HIGH

        # suspicious read-count patterns
        if f.confidence > CONFIDENCE_LOW:
            if (f.split_reads1 + f.split_reads2 == 0
                    or f.split_reads1 + f.discordant_mates == 0
                    or f.split_reads2 + f.discordant_mates == 0):
                f.confidence -= 1
            elif (f.split_reads1 + f.split_reads2) * 20 < f.discordant_mates:
                f.confidence -= 1
            elif f.evalue > 0.2 or coverage_fraction < 0.01:
                f.confidence = CONFIDENCE_MEDIUM

        # supporting SV raises confidence
        if (f.confidence < CONFIDENCE_HIGH and f.closest_genomic_breakpoint1 >= 0
                and ((f.evalue < 0.3 and f.supporting_reads() >= 2)
                     or (f.spliced1 and f.spliced2 and f.gene1 != f.gene2)
                     or (abs(f.breakpoint1 - f.closest_genomic_breakpoint1)
                         + abs(f.breakpoint2 - f.closest_genomic_breakpoint2) < 20000)
                     or f.contig1 != f.contig2
                     or (abs(f.breakpoint2 - f.breakpoint1) > 1000000 and f.gene1 != f.gene2))):
            f.confidence += 1


def filter_no_genomic_support(fusions: Fusions, viral_contigs: List[bool]) -> int:
    """filter_genomic_support.cpp:404-419."""
    remaining = 0
    for f in fusions.values():
        if f.filter == FILTER_NONE:
            if (f.closest_genomic_breakpoint1 < 0 and f.confidence == CONFIDENCE_LOW
                    and not viral_contigs[f.contig1] and not viral_contigs[f.contig2]):
                f.filter = FILTER_NO_GENOMIC_SUPPORT
            else:
                remaining += 1
    return remaining


def recover_genomic_support(fusions: Fusions) -> int:
    """filter_genomic_support.cpp:421-444."""
    remaining = 0
    for f in fusions.values():
        if f.filter == FILTER_NONE:
            remaining += 1
            continue
        if f.closest_genomic_breakpoint1 >= 0 and f.filter in (
                FILTER_END_TO_END, FILTER_INTRONIC, FILTER_MISMAPPERS,
                FILTER_NO_COVERAGE, FILTER_IN_VITRO, FILTER_RELATIVE_SUPPORT):
            f.filter = FILTER_NONE
            remaining += 1
    return remaining
