"""Event-level filters and recoveries (operate on the fusion table).

Reference parity, one function per reference file:
merge_adjacent_fusions.cpp, filter_relative_support.cpp,
filter_non_coding_neighbors.cpp, filter_intragenic_both_exonic.cpp,
filter_min_support.cpp, recover_internal_tandem_duplication.cpp,
filter_both_intronic.cpp, select_best.cpp, filter_marginal_read_through.cpp,
recover_many_spliced.cpp, filter_short_anchor.cpp, filter_end_to_end.cpp,
filter_no_coverage.cpp, recover_isoforms.cpp.

Where the reference iterates its unordered_map, we iterate the fusion table
in canonical insertion order (deterministic: sorted-read-name ingest order);
the reference's own order is hash-bucket order, which is likewise arbitrary
but fixed — all comparisons below are engineered by the reference to be
order-independent except pure tie-breaks.
"""

from __future__ import annotations

import math
from collections import defaultdict
from typing import Dict, List, Set, Tuple

import numpy as np

from ..annotation.index import IntervalIndex
from ..annotation.queries import get_spliced_distance
from ..annotation.tables import ExonTable, GeneTable
from ..constants import (DOWNSTREAM, FILTER_BLACKLIST, FILTER_DUPLICATES,
                         FILTER_END_TO_END, FILTER_HAIRPIN,
                         FILTER_INCONSISTENTLY_CLIPPED,
                         FILTER_INTRAGENIC_EXONIC,
                         FILTER_INTERNAL_TANDEM_DUPLICATION, FILTER_INTRONIC,
                         FILTER_MARGINAL_READ_THROUGH, FILTER_MERGE_ADJACENT,
                         FILTER_MIN_SUPPORT, FILTER_MISMATCHES, FILTER_NONE,
                         FILTER_NON_CODING_NEIGHBORS, FILTER_NO_COVERAGE,
                         FILTER_RELATIVE_SUPPORT, FILTER_SELECT_BEST,
                         FILTER_SHORT_ANCHOR, FORWARD,
                         MAX_SPLICE_SITE_DISTANCE, REVERSE, UPSTREAM)
from ..fusion import Fusion, Fusions
from ..ingest.stats import Coverage
from ..model import ChimericAlignments

# ---------------------------------------------------------------------------
# merge_adjacent_fusions.cpp


def merge_adjacent_fusions(fusions: Fusions, max_distance: int,
                           max_itd_length: int) -> int:
    """merge_adjacent_fusions.cpp:19-108 — merge breakpoints within
    `max_distance` bp that are shifted consistently (fuzzily for ITDs) into
    the best-supported one."""
    sorted_fusions = [f for f in fusions.values()
                      if f.filter == FILTER_NONE
                      or f.is_internal_tandem_duplication(max_itd_length)]
    sorted_fusions.sort(key=lambda f: (f.contig1, f.breakpoint1, f.contig2, f.breakpoint2))

    for i, fusion in enumerate(sorted_fusions):
        is_itd = fusion.is_internal_tandem_duplication(max_itd_length)
        if (not is_itd and fusion.split_reads1 + fusion.split_reads2 == 0) or \
           (is_itd and len(fusion.split_read1_list) + len(fusion.split_read2_list) == 0):
            continue  # only merge fusions with exactly known breakpoints

        shift_sign_up = +1 if fusion.direction1 == fusion.direction2 else -1
        adjacent: List[Fusion] = []

        # look upstream for mergeable breakpoints
        j = i - 1
        while j >= 0 and sorted_fusions[j].contig1 == fusion.contig1 \
                and sorted_fusions[j].breakpoint1 >= fusion.breakpoint1 - max_distance:
            prev = sorted_fusions[j]
            if (prev.gene1 == fusion.gene1 and prev.gene2 == fusion.gene2
                    and prev.direction1 == fusion.direction1
                    and prev.direction2 == fusion.direction2
                    and prev.contig2 == fusion.contig2
                    and (prev.breakpoint2 == fusion.breakpoint2
                         + (fusion.breakpoint1 - prev.breakpoint1) * shift_sign_up
                         or (is_itd and abs(fusion.breakpoint2 - prev.breakpoint2) <= max_distance))):
                if (prev.split_reads1 + prev.split_reads2 > 0
                        or (is_itd and len(prev.split_read1_list) + len(prev.split_read2_list) > 0)):
                    adjacent.append(prev)
            j -= 1

        # look downstream for mergeable breakpoints
        j = i + 1
        while j < len(sorted_fusions) and sorted_fusions[j].contig1 == fusion.contig1 \
                and sorted_fusions[j].breakpoint1 <= fusion.breakpoint1 + max_distance:
            foll = sorted_fusions[j]
            if (foll.gene1 == fusion.gene1 and foll.gene2 == fusion.gene2
                    and foll.direction1 == fusion.direction1
                    and foll.direction2 == fusion.direction2
                    and foll.contig2 == fusion.contig2
                    and (foll.breakpoint2 == fusion.breakpoint2
                         + (foll.breakpoint1 - fusion.breakpoint1) * -shift_sign_up
                         or (is_itd and abs(fusion.breakpoint2 - foll.breakpoint2) <= max_distance))):
                if (foll.split_reads1 + foll.split_reads2 > 0
                        or (is_itd and len(foll.split_read1_list) + len(foll.split_read2_list) > 0)):
                    adjacent.append(foll)
            j += 1

        # select the one with the most supporting alignments
        sum_split_reads1 = 0
        sum_split_reads2 = 0
        fusion_has_most_support = True
        for other in adjacent:
            if (fusion.supporting_reads() < other.supporting_reads()
                    or (fusion.supporting_reads() == other.supporting_reads()
                        and len(fusion.split_read1_list) + len(fusion.split_read2_list)
                        < len(other.split_read1_list) + len(other.split_read2_list))):
                fusion_has_most_support = False
                break
            sum_split_reads1 += other.split_reads1
            sum_split_reads2 += other.split_reads2

        if fusion_has_most_support:
            fusion.split_reads1 += sum_split_reads1
            fusion.split_reads2 += sum_split_reads2
            for other in adjacent:
                other.filter = FILTER_MERGE_ADJACENT
                if is_itd:  # for ITDs, discarded reads are important => copy
                    fusion.split_read1_list.extend(other.split_read1_list)
                    fusion.split_read2_list.extend(other.split_read2_list)

    return sum(1 for f in fusions.values() if f.filter == FILTER_NONE)


# ---------------------------------------------------------------------------
# filter_relative_support.cpp


def extract_fusion_columns(fusion_list: List[Fusion],
                           genes: GeneTable) -> Dict[str, np.ndarray]:
    """One pass extracting the per-fusion columns every global statistic and
    the e-value chain consume (shared by the host path and the sharded-stats
    device marshal)."""
    n_fusions = len(fusion_list)
    cols = {
        "filter": np.fromiter((f.filter for f in fusion_list), np.int64, n_fusions),
        "gene1": np.fromiter((f.gene1 for f in fusion_list), np.int64, n_fusions),
        "gene2": np.fromiter((f.gene2 for f in fusion_list), np.int64, n_fusions),
        "bp1": np.fromiter((f.breakpoint1 for f in fusion_list), np.int64, n_fusions),
        "bp2": np.fromiter((f.breakpoint2 for f in fusion_list), np.int64, n_fusions),
        "contig1": np.fromiter((f.contig1 for f in fusion_list), np.int64, n_fusions),
        "contig2": np.fromiter((f.contig2 for f in fusion_list), np.int64, n_fusions),
        "dir1": np.fromiter((f.direction1 for f in fusion_list), np.bool_, n_fusions),
        "dir2": np.fromiter((f.direction2 for f in fusion_list), np.bool_, n_fusions),
        "split": np.fromiter((f.split_reads1 + f.split_reads2 for f in fusion_list),
                             np.int64, n_fusions),
        "sup": np.fromiter((f.supporting_reads() for f in fusion_list),
                           np.int64, n_fusions),
        "spliced1": np.fromiter((f.spliced1 for f in fusion_list), np.bool_, n_fusions),
        "spliced2": np.fromiter((f.spliced2 for f in fusion_list), np.bool_, n_fusions),
        "exonic1": np.fromiter((f.exonic1 for f in fusion_list), np.bool_, n_fusions),
        "exonic2": np.fromiter((f.exonic2 for f in fusion_list), np.bool_, n_fusions),
    }
    cols["none"] = cols["filter"] == FILTER_NONE
    cols["dummy1"] = genes.is_dummy[cols["gene1"]].astype(np.bool_)
    cols["dummy2"] = genes.is_dummy[cols["gene2"]].astype(np.bool_)
    cols["read_through"] = ((cols["contig1"] == cols["contig2"])
                            & (cols["bp2"] - cols["bp1"] < 400000)
                            & ~cols["dir1"] & cols["dir2"])
    return cols


class CascadeStats:
    """The global (cross-fusion) statistics of the e-value model
    (filter_relative_support.cpp:17-207), *before* the reference's
    small-sample fallbacks. All integers, so a sharded computation that
    reduces them with psum is bit-identical to the host pass regardless of
    shard count (SURVEY §2.7 deterministic global reductions)."""

    __slots__ = ("partner_count", "spliced_breakpoints", "exonic_breakpoints",
                 "intronic_breakpoints", "exonic_intronic_breakpoints",
                 "intragenic_duplications", "intragenic_inversions",
                 "spliced_same_gene", "spliced_different_genes",
                 "genes_with_fusions", "genes_with_read_through")

    def __init__(self, **kw):
        for name in self.__slots__:
            setattr(self, name, kw[name])

    def __eq__(self, other):
        return all(
            np.array_equal(getattr(self, n), getattr(other, n))
            for n in self.__slots__)


def compute_cascade_stats(cols: Dict[str, np.ndarray],
                          genes: GeneTable) -> CascadeStats:
    """Host computation of the global statistics (the reference's
    preliminary passes, filter_relative_support.cpp:20-83). The sharded
    device twin is parallel/stats.py:compute_stats_sharded."""
    col_none = cols["none"]
    col_gene1, col_gene2 = cols["gene1"], cols["gene2"]
    col_bp1, col_bp2 = cols["bp1"], cols["bp2"]
    col_contig1, col_contig2 = cols["contig1"], cols["contig2"]
    col_dir1, col_dir2 = cols["dir1"], cols["dir2"]
    col_split, col_sup = cols["split"], cols["sup"]
    col_spliced1, col_spliced2 = cols["spliced1"], cols["spliced2"]
    col_exonic1, col_exonic2 = cols["exonic1"], cols["exonic2"]
    col_dummy1, col_dummy2 = cols["dummy1"], cols["dummy2"]
    col_read_through = cols["read_through"]
    n_genes = len(genes.start)

    # find all fusion partners for each gene (deduplicated by breakpoints):
    # first occurrence of each (gene, bp1, bp2) key — over the interleaved
    # key2/key1 stream the reference walks — contributes a partner edge
    eligible = col_none & (col_gene1 != col_gene2)
    partner_count = np.zeros(n_genes, np.int64)
    if eligible.any():
        key_gene = np.empty(2 * int(eligible.sum()), np.int64)
        partner = np.empty_like(key_gene)
        key_gene[0::2] = col_gene2[eligible]
        partner[0::2] = col_gene1[eligible]
        key_gene[1::2] = col_gene1[eligible]
        partner[1::2] = col_gene2[eligible]
        bp1_rep = np.repeat(col_bp1[eligible], 2)
        bp2_rep = np.repeat(col_bp2[eligible], 2)
        keys = np.stack([key_gene, bp1_rep, bp2_rep], axis=1)
        _, first_indices = np.unique(keys, axis=0, return_index=True)
        edges = np.unique(np.stack([key_gene[first_indices],
                                    partner[first_indices]], axis=1), axis=0)
        out_degree = np.zeros(n_genes, np.int64)
        np.add.at(out_degree, edges[:, 0], 1)
        # a partner with no outgoing edges has an (implicitly) empty set
        keep = out_degree[edges[:, 0]] >= out_degree[edges[:, 1]]
        np.add.at(partner_count, edges[keep, 0], 1)

    # breakpoint-location distribution (spliced / exonic / intronic / mixed)
    located = (col_none
               & ((col_contig1 != col_contig2) | (col_bp2 - col_bp1 > 500000))
               & (col_sup >= 2) & (col_split > 0) & ~col_dummy1 & ~col_dummy2)
    any_spliced = col_spliced1 | col_spliced2

    # intragenic duplication/inversion ratio
    intragenic_mask = col_none & (col_gene1 == col_gene2) & (col_split >= 2)

    # intragenic : intergenic spliced ratio
    both_spliced = col_spliced1 & col_spliced2

    # genes involved in fusions / read-through fusions
    with_fusion = ~col_dummy1 & ~col_dummy2 & (col_split > 0)
    rt = with_fusion & col_read_through

    return CascadeStats(
        partner_count=partner_count,
        spliced_breakpoints=int(np.sum(located & any_spliced)),
        exonic_breakpoints=int(np.sum(located & ~any_spliced
                                      & col_exonic1 & col_exonic2)),
        intronic_breakpoints=int(np.sum(located & ~any_spliced
                                        & ~col_exonic1 & ~col_exonic2)),
        exonic_intronic_breakpoints=int(np.sum(located & ~any_spliced
                                               & (col_exonic1 != col_exonic2))),
        intragenic_duplications=int(np.sum(intragenic_mask & col_dir1 & ~col_dir2)),
        intragenic_inversions=int(np.sum(intragenic_mask & (col_dir1 == col_dir2))),
        spliced_same_gene=int(np.sum(both_spliced & (col_gene1 == col_gene2))),
        spliced_different_genes=int(np.sum(both_spliced
                                           & (col_gene1 != col_gene2))),
        genes_with_fusions=len(np.unique(np.concatenate(
            [col_gene1[with_fusion], col_gene2[with_fusion]]))),
        genes_with_read_through=len(np.unique(np.concatenate(
            [col_gene1[rt], col_gene2[rt]]))),
    )


def _libm_pow(base: np.ndarray, exponent: float) -> np.ndarray:
    """Elementwise pow through libm (math.pow): np.power differs from
    glibc's correctly-rounded pow by 1 ULP on ~5% of inputs, and each
    e-value step rounds to float32 — a 1-ULP float64 difference at a
    rounding midpoint would flip the stored e-value vs the reference."""
    flat = np.asarray(base, np.float64).ravel()
    out = np.fromiter((math.pow(b, exponent) if b > 0 else math.nan
                       for b in flat), np.float64, count=flat.size)
    return out.reshape(np.shape(base))


def estimate_expected_fusions(fusions: Fusions, mapped_reads: int,
                              genes: GeneTable, exons: ExonTable,
                              exon_index: IntervalIndex,
                              stats: "CascadeStats" = None) -> None:
    """filter_relative_support.cpp:17-207 — per-fusion e-value from sample-
    specific priors and empirical power laws. Every in-place multiplication
    rounds through float32 like the reference's `float evalue` member.

    When `stats` is given (the sharded device reduction,
    parallel/stats.py), the preliminary passes are skipped and the e-value
    chain consumes the precomputed global statistics — integer-exact, so the
    result is bit-identical to the host pass."""
    f32 = np.float32

    fusion_list = list(fusions.values())
    n_fusions = len(fusion_list)
    if n_fusions == 0:
        return
    cols = extract_fusion_columns(fusion_list, genes)
    if stats is None:
        # the fusion-partner dedup (filter_relative_support.cpp:21-29)
        # is first-insertion-wins in the reference's unordered_map
        # ITERATION order: when two gene pairs share breakpoints, which
        # partner enters a gene's set depends on that order, so the
        # statistics pass walks the emulated map order
        from ..output.stdmap_order import fusion_map_order
        order = fusion_map_order(list(fusions.keys()))
        stats_cols = extract_fusion_columns(
            [fusion_list[i] for i in order], genes)
        stats = compute_cascade_stats(stats_cols, genes)

    col_gene1, col_gene2 = cols["gene1"], cols["gene2"]
    col_bp1, col_bp2 = cols["bp1"], cols["bp2"]
    col_contig1, col_contig2 = cols["contig1"], cols["contig2"]
    col_dir1, col_dir2 = cols["dir1"], cols["dir2"]
    col_sup = cols["sup"]
    col_spliced1, col_spliced2 = cols["spliced1"], cols["spliced2"]
    col_exonic1, col_exonic2 = cols["exonic1"], cols["exonic2"]
    col_read_through = cols["read_through"]
    fusion_partner_count = stats.partner_count

    # the reference's small-sample fallbacks
    spliced_breakpoints = stats.spliced_breakpoints
    exonic_breakpoints = stats.exonic_breakpoints
    intronic_breakpoints = stats.intronic_breakpoints
    exonic_intronic_breakpoints = stats.exonic_intronic_breakpoints
    total = (spliced_breakpoints + exonic_breakpoints + intronic_breakpoints
             + exonic_intronic_breakpoints)
    if (total < 100 or spliced_breakpoints == 0 or exonic_breakpoints == 0
            or intronic_breakpoints == 0 or exonic_intronic_breakpoints == 0):
        spliced_breakpoints, exonic_breakpoints = 10, 65
        intronic_breakpoints, exonic_intronic_breakpoints = 10, 15

    intragenic_duplications = stats.intragenic_duplications
    intragenic_inversions = stats.intragenic_inversions
    if intragenic_inversions + intragenic_duplications < 100:
        intragenic_inversions = intragenic_duplications = 1

    spliced_events_in_same_gene = stats.spliced_same_gene
    spliced_events_in_different_genes = stats.spliced_different_genes
    if spliced_events_in_same_gene + spliced_events_in_different_genes < 100:
        spliced_events_in_same_gene = 0
        spliced_events_in_different_genes = 100

    fraction_read_through = (0.0 if stats.genes_with_fusions == 0
                             else float(f32(1.0 * stats.genes_with_read_through
                                            / stats.genes_with_fusions)))

    # Vectorized per-fusion e-value. Each reference step is `evalue *= x`
    # with float evalue and double x: multiply in float64, round to float32 —
    # reproduced below with explicit float64 intermediates per masked step.
    n = n_fusions
    gene1, gene2 = col_gene1, col_gene2
    bp1, bp2 = col_bp1, col_bp2
    contig1, contig2 = col_contig1, col_contig2
    dir1, dir2 = col_dir1, col_dir2
    sup = col_sup
    spliced_mask = col_spliced1 | col_spliced2
    both_exonic = col_exonic1 & col_exonic2
    neither_exonic = ~col_exonic1 & ~col_exonic2
    fpc1 = fusion_partner_count[gene1]
    fpc2 = fusion_partner_count[gene2]

    gs1, ge1 = genes.start[gene1], genes.end[gene1]
    gs2, ge2 = genes.start[gene2], genes.end[gene2]
    intragenic = (gene1 == gene2) | (
        (gs2 - 10000 <= bp1) & (bp1 <= ge2 + 10000)
        & (gs1 - 10000 <= bp2) & (bp2 <= ge1 + 10000))
    read_through = col_read_through

    exonic_length1 = genes.exonic_length[gene1].astype(np.float64)
    exonic_length2 = genes.exonic_length[gene2].astype(np.float64)
    max_fusion_partners = np.maximum(
        10000.0 / exonic_length1 * np.maximum(fpc1 - 1, 1),
        10000.0 / exonic_length2 * np.maximum(fpc2 - 1, 1)).astype(f32)

    with np.errstate(all="ignore"):
        # pow(0.02, sup-2) underflows for sup<2 in the reference (unsigned
        # wrap -> pow(0.02, huge) == 0) => the max() resolves to 1.0
        reads_scaling = np.where(
            sup >= 2, mapped_reads / 20000000.0 * np.power(0.02, (sup - 2).astype(np.float64)),
            0.0)
        evalue = (max_fusion_partners.astype(np.float64)
                  * np.maximum(1.0, reads_scaling)).astype(f32)

        def step(mask, factor):
            updated = (evalue.astype(np.float64) * factor).astype(f32)
            return np.where(mask, updated, evalue)

        evalue = step(intragenic, 2.0 / (intragenic_duplications + intragenic_inversions))
        duplication_mask = intragenic & dir1 & ~dir2          # UPSTREAM, DOWNSTREAM
        inversion_mask = intragenic & (dir1 == dir2)
        evalue = step(duplication_mask, float(intragenic_duplications))
        evalue = step(inversion_mask, float(intragenic_inversions))

        intragenic_sup = intragenic & (sup >= 1)
        evalue = step(intragenic_sup,
                      _libm_pow(sup - 0.42, -2.11) * math.pow(10, -1.11))
        for i in np.nonzero(intragenic_sup)[0]:
            f = fusion_list[i]
            spliced_distance = get_spliced_distance(f.contig1, f.breakpoint1, f.breakpoint2,
                                                    f.gene1, exons, exon_index)
            if spliced_distance < 1000:
                evalue[i] = f32(float(evalue[i]) * math.pow(max(400, spliced_distance) / 1000.0, -2))
                if spliced_distance < 400:
                    evalue[i] = f32(float(evalue[i]) * math.pow(max(1, spliced_distance) / 400.0, -4.58))
        evalue = step(intragenic, max(1.0, spliced_events_in_same_gene / 0.25
                                      / spliced_events_in_different_genes))

        intergenic_sup = ~intragenic & (sup >= 1)
        evalue = step(intergenic_sup,
                      _libm_pow(sup - 0.73, -2.28) * math.pow(10, -1.75))
        breakpoint_distance = np.maximum(1, bp2 - bp1) / 400000.0
        evalue = step(intergenic_sup & read_through, _libm_pow(breakpoint_distance, -0.63))
        close = (contig1 == contig2) & (bp2 - bp1 < 400000)
        evalue = step(intergenic_sup & ~read_through & close,
                      _libm_pow(breakpoint_distance, -1.53))

        # location bonus
        evalue = step(np.True_, 4.0 / (spliced_breakpoints + exonic_breakpoints
                                       + intronic_breakpoints + exonic_intronic_breakpoints))
        evalue = step(spliced_mask, float(spliced_breakpoints))
        evalue = step(~spliced_mask & both_exonic,
                      float(max(spliced_breakpoints, exonic_breakpoints)))
        evalue = step(~spliced_mask & neither_exonic,
                      float(max(spliced_breakpoints, intronic_breakpoints)))
        evalue = step(~spliced_mask & ~both_exonic & ~neither_exonic,
                      float(max(spliced_breakpoints, exonic_intronic_breakpoints)))

        if fraction_read_through > 0.25:
            evalue = step(read_through,
                          1 + math.pow((fraction_read_through - 0.25) * 20, 2))

    for f, value in zip(fusion_list, evalue.tolist()):
        f.evalue = value


def filter_relative_support(fusions: Fusions, genes: GeneTable, evalue_cutoff: float) -> int:
    """filter_relative_support.cpp:209-224."""
    remaining = 0
    for f in fusions.values():
        if f.filter != FILTER_NONE:
            continue
        if (np.float32(f.evalue) < np.float32(evalue_cutoff)
                and not (f.is_intragenic(genes) and f.split_reads1 + f.split_reads2 == 0)):
            remaining += 1
        else:
            f.filter = FILTER_RELATIVE_SUPPORT
    return remaining


# ---------------------------------------------------------------------------
# simple event filters


def filter_non_coding_neighbors(fusions: Fusions, genes: GeneTable) -> int:
    """filter_non_coding_neighbors.cpp:6-20."""
    remaining = 0
    for f in fusions.values():
        if f.filter != FILTER_NONE:
            continue
        if (not genes.is_protein_coding[f.gene1] and not genes.is_protein_coding[f.gene2]
                and f.is_read_through()):
            f.filter = FILTER_NON_CODING_NEIGHBORS
        else:
            remaining += 1
    return remaining


def filter_intragenic_both_exonic(fusions: Fusions, genes: GeneTable, exons: ExonTable,
                                  exon_index: IntervalIndex, exonic_fraction: float) -> int:
    """filter_intragenic_both_exonic.cpp:7-35."""
    remaining = 0
    for f in fusions.values():
        if f.filter != FILTER_NONE:
            continue
        if ((f.breakpoint_overlaps_both_genes(genes) or f.gene1 == f.gene2)
                and f.exonic1 and f.exonic2 and not (f.spliced1 and f.spliced2)):
            spliced_distance = get_spliced_distance(f.contig1, f.breakpoint1, f.breakpoint2,
                                                    f.gene1, exons, exon_index)
            distance = f.breakpoint2 - f.breakpoint1
            if spliced_distance == distance or 1.0 * spliced_distance / distance < exonic_fraction:
                f.filter = FILTER_INTRAGENIC_EXONIC
                continue
        remaining += 1
    return remaining


def filter_min_support(fusions: Fusions, genes: GeneTable, min_support: int) -> int:
    """filter_min_support.cpp:7-21."""
    remaining = 0
    for f in fusions.values():
        if f.filter != FILTER_NONE:
            continue
        if (f.split_reads1 + f.split_reads2 + f.discordant_mates < min_support
                or (f.breakpoint_overlaps_both_genes(genes)
                    and f.split_reads1 + f.split_reads2 < min_support)):
            f.filter = FILTER_MIN_SUPPORT
        else:
            remaining += 1
    return remaining


def filter_both_intronic(fusions: Fusions, chimeric_alignments: ChimericAlignments,
                         viral_contigs: List[bool]) -> int:
    """filter_both_intronic.cpp:8-35 — no supporting read overlaps an exon."""
    def list_contains_exonic_reads(read_list: List[str]) -> bool:
        for name in read_list:
            mates = chimeric_alignments[name]
            if mates.filter == FILTER_NONE:
                for mate in mates:
                    if mate.exonic:
                        return True
        return False

    remaining = 0
    for f in fusions.values():
        if f.filter != FILTER_NONE:
            continue
        if viral_contigs[f.contig1] or viral_contigs[f.contig2]:
            # viral contigs are often not annotated; note the reference's
            # `continue` also skips the remaining++ (filter_both_intronic.cpp:25)
            continue
        if (not list_contains_exonic_reads(f.split_read1_list)
                and not list_contains_exonic_reads(f.split_read2_list)
                and not list_contains_exonic_reads(f.discordant_mate_list)):
            f.filter = FILTER_INTRONIC
        else:
            remaining += 1
    return remaining


# ---------------------------------------------------------------------------
# recover_internal_tandem_duplication.cpp


def recover_internal_tandem_duplication(fusions: Fusions,
                                        chimeric_alignments: ChimericAlignments,
                                        coverage: Coverage, genes: GeneTable,
                                        exons: ExonTable, exon_index: IntervalIndex,
                                        max_itd_length: int, min_supporting_reads: int,
                                        min_fraction_of_coverage: float,
                                        subsampling_threshold: int) -> int:
    """recover_internal_tandem_duplication.cpp:8-84."""
    protrude_into_introns = 7

    duplicates = sum(1 for mates in chimeric_alignments.values()
                     if mates.filter == FILTER_DUPLICATES)
    duplication_rate = (1.0 * duplicates / len(chimeric_alignments)
                        if chimeric_alignments else 0.0)

    recoverable = (FILTER_RELATIVE_SUPPORT, FILTER_INTRAGENIC_EXONIC, FILTER_HAIRPIN,
                   FILTER_INCONSISTENTLY_CLIPPED, FILTER_MISMATCHES)
    rescued_read_filters = (FILTER_NONE, FILTER_HAIRPIN, FILTER_INCONSISTENTLY_CLIPPED,
                            FILTER_MISMATCHES)

    for f in fusions.values():
        if f.filter not in recoverable:
            continue
        if not (f.gene1 == f.gene2 and f.exonic1 and f.exonic2
                and f.direction1 == UPSTREAM and f.direction2 == DOWNSTREAM
                and genes.is_protein_coding[f.gene1]
                and 0 <= f.breakpoint2 - f.breakpoint1 < max_itd_length):
            continue

        # both breakpoints must be in the same exon and in a coding region
        exon_set = exon_index.range_query(f.contig1, f.breakpoint1, f.breakpoint2)
        is_in_coding_region = False
        for e in exon_set:
            e = int(e)
            if (exons.gene[e] == f.gene1
                    and exons.coding_region_start[e] <= f.breakpoint1 + protrude_into_introns
                    and exons.coding_region_end[e] + protrude_into_introns >= f.breakpoint1
                    and exons.coding_region_start[e] <= f.breakpoint2 + protrude_into_introns
                    and exons.coding_region_end[e] + protrude_into_introns >= f.breakpoint2):
                is_in_coding_region = True
        if not is_in_coding_region:
            continue

        coverage1 = coverage.get_coverage(f.contig1, f.breakpoint1,
                                          DOWNSTREAM if f.direction1 == UPSTREAM else UPSTREAM)
        coverage2 = coverage.get_coverage(f.contig2, f.breakpoint2,
                                          DOWNSTREAM if f.direction2 == UPSTREAM else UPSTREAM)
        split_reads = 0
        for name in f.split_read1_list + f.split_read2_list:
            if chimeric_alignments[name].filter in rescued_read_filters:
                split_reads += 1

        # C++ float division by zero coverage yields inf (> threshold);
        # Python would raise ZeroDivisionError
        peak = max(coverage1, coverage2)
        allele_fraction = (math.inf if peak == 0
                           else 1.0 * split_reads / peak / (1 - duplication_rate))
        if split_reads >= min_supporting_reads and (
                allele_fraction > min_fraction_of_coverage
                or split_reads >= subsampling_threshold):
            f.filter = FILTER_NONE
            for name in f.split_read1_list:
                mates = chimeric_alignments[name]
                if mates.filter in (FILTER_HAIRPIN, FILTER_INCONSISTENTLY_CLIPPED, FILTER_MISMATCHES):
                    mates.filter = FILTER_NONE
                    f.split_reads1 += 1
            for name in f.split_read2_list:
                mates = chimeric_alignments[name]
                if mates.filter in (FILTER_HAIRPIN, FILTER_INCONSISTENTLY_CLIPPED, FILTER_MISMATCHES):
                    mates.filter = FILTER_NONE
                    f.split_reads2 += 1

    return sum(1 for f in fusions.values() if f.filter == FILTER_NONE)


# ---------------------------------------------------------------------------
# select_best.cpp


def _rank_fusion(f: Fusion) -> int:
    """select_best.cpp:9-19."""
    if f.split_reads1 != 0 and f.split_reads2 != 0:
        return 3
    if (f.split_reads1 != 0 or f.split_reads2 != 0) and f.discordant_mates != 0:
        return 2
    if f.split_reads1 != 0 or f.split_reads2 != 0:
        return 1
    return 0


def select_most_supported_breakpoints(fusions: Fusions) -> int:
    """select_best.cpp:21-79 — keep one breakpoint pair per
    (gene1, gene2, direction1, direction2)."""
    best: Dict[Tuple[int, int, bool, bool], Fusion] = {}
    for f in fusions.values():
        if f.filter != FILTER_NONE:
            continue
        gene_pair = (f.gene1, f.gene2, f.direction1, f.direction2)
        current = best.get(gene_pair)
        if current is None:
            best[gene_pair] = f
            continue
        if _rank_fusion(f) > _rank_fusion(current):
            best[gene_pair] = f
        elif _rank_fusion(f) == _rank_fusion(current):
            if f.supporting_reads() > current.supporting_reads():
                best[gene_pair] = f
            elif f.supporting_reads() == current.supporting_reads():
                if (f.exonic1 and not current.exonic1) or (f.exonic2 and not current.exonic2):
                    best[gene_pair] = f
                elif ((not current.exonic1 or f.exonic1 == current.exonic1)
                      and (not current.exonic2 or f.exonic2 == current.exonic2)):
                    if (f.direction1 == DOWNSTREAM and f.breakpoint1 > current.breakpoint1) or \
                       (f.direction1 == UPSTREAM and f.breakpoint1 < current.breakpoint1):
                        best[gene_pair] = f
                    elif f.breakpoint1 == current.breakpoint1:
                        if (f.direction2 == DOWNSTREAM and f.breakpoint2 > current.breakpoint2) or \
                           (f.direction2 == UPSTREAM and f.breakpoint2 < current.breakpoint2):
                            best[gene_pair] = f

    remaining = 0
    for f in fusions.values():
        if f.filter != FILTER_NONE:
            continue
        if best[(f.gene1, f.gene2, f.direction1, f.direction2)] is f:
            remaining += 1
        else:
            f.filter = FILTER_SELECT_BEST
    return remaining


# ---------------------------------------------------------------------------
# filter_marginal_read_through.cpp


def filter_marginal_read_through(fusions: Fusions, genes: GeneTable,
                                 coverage: Coverage) -> int:
    """filter_marginal_read_through.cpp:7-45."""
    # float32 like the reference's `const float` constants
    # (filter_marginal_read_through.cpp:9-10): 1-margin and
    # min_vaf*coverage evaluate in float32 there, which flips the
    # comparison at exact boundaries (e.g. 7 supporting reads at
    # coverage 100: 0.07f*100 == 7.0f keeps the fusion; 0.07*100 in
    # float64 is 7.000000000000001 and would filter it)
    margin_threshold = float(np.float32(1) - np.float32(0.01))
    min_vaf = np.float32(0.07)

    remaining = 0
    for f in fusions.values():
        if f.filter == FILTER_NONE and f.is_read_through():
            position_in_donor = 1.0
            position_in_acceptor = 1.0
            g1, g2 = f.gene1, f.gene2
            g1_dummy, g2_dummy = bool(genes.is_dummy[g1]), bool(genes.is_dummy[g2])
            g1_strand, g2_strand = bool(genes.strand[g1]), bool(genes.strand[g2])
            if not g1_dummy and g1_strand == FORWARD and f.direction1 == DOWNSTREAM:
                position_in_donor = 1.0 * (f.breakpoint1 - genes.start[g1]) / (genes.end[g1] - genes.start[g1])
            elif not g2_dummy and g2_strand == REVERSE and f.direction2 == UPSTREAM:
                position_in_donor = 1.0 * (genes.end[g2] - f.breakpoint2) / (genes.end[g2] - genes.start[g2])
            elif not g1_dummy and g1_strand == REVERSE and f.direction1 == DOWNSTREAM:
                position_in_acceptor = 1.0 * (f.breakpoint1 - genes.start[g1]) / (genes.end[g1] - genes.start[g1])
            elif not g2_dummy and g2_strand == FORWARD and f.direction2 == UPSTREAM:
                position_in_acceptor = 1.0 * (genes.end[g2] - f.breakpoint2) / (genes.end[g2] - genes.start[g2])
            else:  # both breakpoints intergenic => filter does not apply
                remaining += 1
                continue

            coverage1 = coverage.get_coverage(f.contig1, f.breakpoint1,
                                              DOWNSTREAM if f.direction1 == UPSTREAM else UPSTREAM)
            coverage2 = coverage.get_coverage(f.contig2, f.breakpoint2,
                                              DOWNSTREAM if f.direction2 == UPSTREAM else UPSTREAM)
            if (position_in_donor > margin_threshold
                    and position_in_acceptor > margin_threshold
                    and np.float32(f.supporting_reads())
                    < np.float32(min_vaf * np.float32(max(coverage1,
                                                          coverage2)))):
                f.filter = FILTER_MARGINAL_READ_THROUGH

        if f.filter == FILTER_NONE:
            remaining += 1
    return remaining


# ---------------------------------------------------------------------------
# recover_many_spliced.cpp


def recover_many_spliced(fusions: Fusions, genes: GeneTable,
                         min_spliced_events: int) -> int:
    """recover_many_spliced.cpp:8-51."""
    considered = (FILTER_NONE, FILTER_INCONSISTENTLY_CLIPPED, FILTER_RELATIVE_SUPPORT,
                  FILTER_MIN_SUPPORT, FILTER_SELECT_BEST)
    spliced_by_gene_pair: Dict[Tuple[int, int], Set[Tuple[int, int]]] = defaultdict(set)
    for f in fusions.values():
        if (not f.is_read_through() and (f.spliced1 or f.spliced2)
                and f.gene1 != f.gene2 and not f.breakpoint_overlaps_both_genes(genes)
                and f.filter in considered):
            spliced_by_gene_pair[(f.gene1, f.gene2)].add(
                (f.breakpoint1 // 10, f.breakpoint2 // 10))

    remaining = 0
    for f in fusions.values():
        if f.filter == FILTER_NONE:
            remaining += 1
            continue
        if (f.is_read_through() or f.gene1 == f.gene2
                or f.breakpoint_overlaps_both_genes(genes)):
            continue
        if f.filter in (FILTER_INCONSISTENTLY_CLIPPED, FILTER_RELATIVE_SUPPORT,
                        FILTER_MIN_SUPPORT, FILTER_SELECT_BEST):
            if ((f.spliced1 or f.spliced2)
                    and len(spliced_by_gene_pair[(f.gene1, f.gene2)]) >= min_spliced_events):
                f.filter = FILTER_NONE
                remaining += 1
    return remaining


# ---------------------------------------------------------------------------
# filter_short_anchor.cpp


def filter_short_anchor(fusions: Fusions, min_length: int) -> int:
    """filter_short_anchor.cpp:7-23."""
    remaining = 0
    for f in fusions.values():
        if f.filter != FILTER_NONE:
            continue
        if (not (f.spliced1 and f.spliced2)
                and (abs(f.anchor_start1 - f.breakpoint1) < min_length
                     or abs(f.anchor_start2 - f.breakpoint2) < min_length)):
            f.filter = FILTER_SHORT_ANCHOR
        else:
            remaining += 1
    return remaining


# ---------------------------------------------------------------------------
# filter_end_to_end.cpp


def calculate_intronic_fraction(gene: int, genes: GeneTable, exons: ExonTable,
                                exon_index: IntervalIndex) -> float:
    """filter_end_to_end.cpp:8-23 — fraction of the gene not covered by its
    own exons, walking interval-index regions."""
    intronic_bases = 0
    gene_start = int(genes.start[gene])
    gene_end = int(genes.end[gene])
    contig = int(genes.contig[gene])
    previous_position = gene_start
    if contig < exon_index.n_contigs:
        bounds = exon_index.boundaries[contig]
        idx = int(np.searchsorted(bounds, gene_start, side="left"))
        while idx < len(bounds) and bounds[idx] <= gene_end:
            for e in exon_index.set_at(contig, idx):
                e = int(e)
                if exons.gene[e] == gene:
                    if previous_position < exons.start[e]:
                        intronic_bases += int(exons.start[e]) - previous_position
                    if previous_position < exons.end[e]:
                        previous_position = int(exons.end[e]) + 1
                    break
            idx += 1
    # float32 division like the reference (filter_end_to_end.cpp:23)
    return float(np.float32(intronic_bases)
                 / np.float32(gene_end - gene_start + 1))


def filter_end_to_end_fusions(fusions: Fusions, genes: GeneTable, exons: ExonTable,
                              exon_index: IntervalIndex, viral_contigs: List[bool]) -> int:
    """filter_end_to_end.cpp:25-77."""
    many_discordant_mates = 10
    min_breakpoint_distance = 1000000
    max_intronic_fraction = float(np.float32(0.66))  # const float, cpp:59

    remaining = 0
    for f in fusions.values():
        if f.filter != FILTER_NONE:
            continue
        if viral_contigs[f.contig1] or viral_contigs[f.contig2]:
            # the reference's `continue` skips remaining++ (filter_end_to_end.cpp:33)
            continue
        if (not f.is_read_through() and f.gene1 != f.gene2 and (f.spliced1 or f.spliced2)):
            remaining += 1
            continue

        if (f.discordant_mates + f.split_reads1 == 0
                or f.discordant_mates + f.split_reads2 == 0
                or f.split_reads1 + f.split_reads2 == 0
                or (f.breakpoint_overlaps_both_genes(genes)
                    and (f.split_reads1 == 0 or f.split_reads2 == 0))):
            g1_dummy, g2_dummy = bool(genes.is_dummy[f.gene1]), bool(genes.is_dummy[f.gene2])
            g1_strand, g2_strand = bool(genes.strand[f.gene1]), bool(genes.strand[f.gene2])
            if ((g1_dummy or (g1_strand == FORWARD and f.direction1 == UPSTREAM)
                 or (g1_strand == REVERSE and f.direction1 == DOWNSTREAM))
                    and (g2_dummy or (g2_strand == FORWARD and f.direction2 == UPSTREAM)
                         or (g2_strand == REVERSE and f.direction2 == DOWNSTREAM))):
                if (f.discordant_mates < many_discordant_mates
                        or (f.contig1 == f.contig2
                            and abs(f.breakpoint1 - f.breakpoint2) < min_breakpoint_distance)
                        or (f.exonic1 and f.exonic2
                            and calculate_intronic_fraction(f.gene1, genes, exons, exon_index) > max_intronic_fraction
                            and calculate_intronic_fraction(f.gene2, genes, exons, exon_index) > max_intronic_fraction)):
                    f.filter = FILTER_END_TO_END
                    continue
        remaining += 1
    return remaining


# ---------------------------------------------------------------------------
# filter_no_coverage.cpp


def filter_no_coverage(fusions: Fusions, coverage: Coverage, genes: GeneTable,
                       exons: ExonTable, exon_index: IntervalIndex) -> int:
    """filter_no_coverage.cpp:8-102."""
    scan_range = 200

    def breakpoint_in_terminal_exon(contig: int, breakpoint: int, gene: int) -> bool:
        for e in exon_index.point_query(contig, breakpoint):
            e = int(e)
            if exons.gene[e] == gene and (exons.prev_exon[e] < 0 or exons.next_exon[e] < 0):
                return True
        return False

    remaining = 0
    for f in fusions.values():
        if f.filter != FILTER_NONE:
            continue

        if not f.is_read_through():
            if (f.split_reads1 + f.split_reads2 != 0
                    and f.split_reads1 + f.discordant_mates != 0
                    and f.split_reads2 + f.discordant_mates != 0):
                remaining += 1
                continue
            if f.spliced1 or f.spliced2:
                remaining += 1
                continue
        else:
            if f.spliced1 and f.spliced2:
                remaining += 1
                continue

        filtered = False
        for which in (1, 2):
            contig = f.contig1 if which == 1 else f.contig2
            breakpoint = f.breakpoint1 if which == 1 else f.breakpoint2
            gene = f.gene1 if which == 1 else f.gene2
            direction = f.direction1 if which == 1 else f.direction2
            anchor_start = f.anchor_start1 if which == 1 else f.anchor_start2

            if breakpoint_in_terminal_exon(contig, breakpoint, gene):
                continue
            if direction == UPSTREAM:
                start = breakpoint
                if f.split_reads1 + f.split_reads2 == 0:
                    start -= scan_range
                end = max(breakpoint + scan_range, anchor_start)
            else:
                start = min(breakpoint - scan_range, anchor_start)
                end = breakpoint
                if f.split_reads1 + f.split_reads2 == 0:
                    end += scan_range
            if (direction == UPSTREAM and not coverage.fragment_starts_here(contig, start, end)) or \
               (direction == DOWNSTREAM and not coverage.fragment_ends_here(contig, start, end)):
                f.filter = FILTER_NO_COVERAGE
                filtered = True
                break
        if not filtered:
            remaining += 1
    return remaining


# ---------------------------------------------------------------------------
# recover_isoforms.cpp


def recover_isoforms(fusions: Fusions) -> int:
    """recover_isoforms.cpp:10-47."""
    fused_gene_pairs: Dict[Tuple[int, int, bool, bool], Fusion] = {}
    for f in fusions.values():
        if f.filter == FILTER_NONE:
            fused_gene_pairs[(f.gene1, f.gene2, f.direction1, f.direction2)] = f

    remaining = 0
    for f in fusions.values():
        if f.filter == FILTER_NONE:
            remaining += 1
            continue
        if (f.filter in (FILTER_MERGE_ADJACENT, FILTER_BLACKLIST, FILTER_END_TO_END,
                         FILTER_DUPLICATES)
                or f.gene1 == f.gene2):
            continue
        if f.spliced1 and f.spliced2:
            passing = fused_gene_pairs.get((f.gene1, f.gene2, f.direction1, f.direction2))
            if passing is not None and (
                    abs(passing.breakpoint1 - f.breakpoint1) > MAX_SPLICE_SITE_DISTANCE
                    or abs(passing.breakpoint2 - f.breakpoint2) > MAX_SPLICE_SITE_DISTANCE):
                f.filter = FILTER_NONE
                remaining += 1
    return remaining
