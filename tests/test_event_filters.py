"""Unit tests for event-level filters on synthetic fusion tables
(complementing the oracle-parity integration tests)."""

import numpy as np
import pytest

from arriba_tpu.annotation.tables import GeneTable
from arriba_tpu.constants import (CONFIDENCE_HIGH, CONFIDENCE_LOW,
                                  CONFIDENCE_MEDIUM, DOWNSTREAM,
                                  FILTER_MERGE_ADJACENT, FILTER_NONE,
                                  FILTER_SELECT_BEST, FILTER_SHORT_ANCHOR,
                                  UPSTREAM)
from arriba_tpu.filters.event_level import (filter_short_anchor,
                                            merge_adjacent_fusions,
                                            select_most_supported_breakpoints)
from arriba_tpu.filters.genomic_support import assign_confidence
from arriba_tpu.fusion import Fusion
from arriba_tpu.ingest.stats import Coverage


def make_genes(n=4):
    genes = GeneTable()
    genes.contig = np.zeros(n, np.int32)
    genes.start = np.arange(n, dtype=np.int64) * 100000
    genes.end = genes.start + 10000
    genes.strand = np.ones(n, np.bool_)
    genes.gene_id = [f"G{i}" for i in range(n)]
    genes.name = [f"GENE{i}" for i in range(n)]
    genes.exonic_length = np.full(n, 5000, np.int64)
    genes.is_dummy = np.zeros(n, np.bool_)
    genes.is_protein_coding = np.ones(n, np.bool_)
    return genes


def make_fusion(gene1=0, gene2=1, bp1=5000, bp2=105000, split1=2, split2=2,
                discordant=0, dir1=DOWNSTREAM, dir2=UPSTREAM, **kwargs):
    fusion = Fusion(gene1=gene1, gene2=gene2, contig1=0, contig2=0,
                    breakpoint1=bp1, breakpoint2=bp2, direction1=dir1,
                    direction2=dir2, split_reads1=split1, split_reads2=split2,
                    discordant_mates=discordant)
    for key, value in kwargs.items():
        setattr(fusion, key, value)
    fusion.split_read1_list = [f"r{i}" for i in range(split1)]
    fusion.split_read2_list = [f"s{i}" for i in range(split2)]
    fusion.discordant_mate_list = [f"d{i}" for i in range(discordant)]
    return fusion


def test_select_best_prefers_split_reads_on_both_sides():
    both = make_fusion(bp1=5000, bp2=105000, split1=1, split2=1)
    one_side = make_fusion(bp1=5100, bp2=105100, split1=5, split2=0,
                           discordant=5)
    fusions = {1: one_side, 2: both}
    remaining = select_most_supported_breakpoints(fusions)
    assert remaining == 1
    assert both.filter == FILTER_NONE          # rank 3 beats rank 2
    assert one_side.filter == FILTER_SELECT_BEST


def test_select_best_most_distal_tiebreak():
    proximal = make_fusion(bp1=5000, bp2=105000)
    distal = make_fusion(bp1=5500, bp2=104000)  # direction1 DOWNSTREAM: larger bp1 wins
    fusions = {1: proximal, 2: distal}
    select_most_supported_breakpoints(fusions)
    assert distal.filter == FILTER_NONE
    assert proximal.filter == FILTER_SELECT_BEST


def test_merge_adjacent_consistent_shift():
    # breakpoints shifted together by 2bp (deletion orientation => same
    # shift sign on breakpoint2, merge_adjacent_fusions.cpp:49)
    best = make_fusion(bp1=5000, bp2=105000, split1=4, split2=0)
    shifted = make_fusion(bp1=5002, bp2=105002, split1=1, split2=0)
    unrelated = make_fusion(bp1=5002, bp2=104998, split1=1, split2=0)
    fusions = {1: best, 2: shifted, 3: unrelated}
    merge_adjacent_fusions(fusions, 5, 100)
    assert shifted.filter == FILTER_MERGE_ADJACENT
    assert best.filter == FILTER_NONE
    assert best.split_reads1 == 5              # absorbed the shifted support
    assert unrelated.filter == FILTER_NONE     # inconsistent shift not merged


def test_short_anchor():
    short = make_fusion(anchor_start1=4990, anchor_start2=105010)
    long = make_fusion(bp1=6000, bp2=106000, anchor_start1=5900,
                       anchor_start2=106100)
    fusions = {1: short, 2: long}
    remaining = filter_short_anchor(fusions, 23)
    assert remaining == 1
    assert short.filter == FILTER_SHORT_ANCHOR
    assert long.filter == FILTER_NONE


def test_assign_confidence_tiers():
    genes = make_genes()
    coverage = Coverage()  # empty => get_coverage returns -1
    # spliced inter-gene event with balanced support => high
    good = make_fusion(split1=10, split2=10, discordant=5, spliced1=True,
                       spliced2=True, evalue=0.001)
    # single-read event => low
    weak = make_fusion(gene1=2, gene2=3, bp1=205000, bp2=305000, split1=1,
                       split2=0, evalue=0.5)
    # non-spliced with support from one side only => demoted from high
    lopsided = make_fusion(gene1=0, gene2=3, bp2=305000, split1=6, split2=0,
                           discordant=0, evalue=0.001)
    fusions = {1: good, 2: weak, 3: lopsided}
    assign_confidence(fusions, coverage, genes)
    assert good.confidence == CONFIDENCE_HIGH
    assert weak.confidence == CONFIDENCE_LOW
    # demotions: not spliced (-1), one-sided reads (-1) => low
    assert lopsided.confidence == CONFIDENCE_LOW


def test_assign_confidence_read_through_demotion():
    genes = make_genes()
    # deletion orientation, <400kb apart => read-through => low by default
    read_through = make_fusion(split1=2, split2=2, spliced1=True, spliced2=True,
                               evalue=0.001)
    assert read_through.is_read_through()
    assign_confidence({1: read_through}, Coverage(), genes)
    assert read_through.confidence == CONFIDENCE_LOW


# ---------------------------------------------------------------------------
# output classification helpers (output_fusions.cpp:547-635, protein frame)

def test_get_fusion_type_classification():
    from arriba_tpu.output.writer import get_fusion_type

    genes = make_genes(4)
    # deletion (same strand, downstream->upstream); <400kb => read-through
    fusion = make_fusion(dir1=DOWNSTREAM, dir2=UPSTREAM)
    assert get_fusion_type(fusion, genes, 100) == "deletion/read-through"
    fusion = make_fusion(dir1=DOWNSTREAM, dir2=UPSTREAM, bp2=505000)
    assert get_fusion_type(fusion, genes, 100) == "deletion"
    # inversion (same contig, equal directions); same strands => 3'-3'
    fusion = make_fusion(dir1=DOWNSTREAM, dir2=DOWNSTREAM)
    assert get_fusion_type(fusion, genes, 100) == "inversion/3'-3'"
    genes.strand[1] = False
    fusion = make_fusion(dir1=DOWNSTREAM, dir2=DOWNSTREAM)
    assert get_fusion_type(fusion, genes, 100) == "inversion"
    genes.strand[1] = True
    # duplication (upstream->downstream)
    fusion = make_fusion(dir1=UPSTREAM, dir2=DOWNSTREAM)
    assert get_fusion_type(fusion, genes, 100) == "duplication"
    # translocation (different contigs)
    fusion = make_fusion(dir1=DOWNSTREAM, dir2=UPSTREAM)
    fusion.contig2 = 1
    assert get_fusion_type(fusion, genes, 100).startswith("translocation")
    # antisense deletions (opposite gene strands)
    genes.strand[0] = False  # gene1 on reverse strand => 3'-3'
    fusion = make_fusion(dir1=DOWNSTREAM, dir2=UPSTREAM)
    assert get_fusion_type(fusion, genes, 100) == "deletion/read-through/3'-3'"
    genes.strand[0] = True
    genes.strand[1] = False
    fusion = make_fusion(dir1=DOWNSTREAM, dir2=UPSTREAM)
    assert get_fusion_type(fusion, genes, 100) == "deletion/read-through/5'-5'"


def test_get_fusion_strand_rendering():
    from arriba_tpu.output.writer import get_fusion_strand

    genes = make_genes(2)
    assert get_fusion_strand(True, 0, False, genes) == "+/+"
    assert get_fusion_strand(False, 0, False, genes) == "+/-"
    assert get_fusion_strand(True, 0, True, genes) == "+/."
    genes.strand[1] = False
    assert get_fusion_strand(False, 1, False, genes) == "-/-"
    genes.is_dummy[1] = True
    assert get_fusion_strand(True, 1, False, genes) == "./+"


def test_is_in_frame():
    from arriba_tpu.output.protein import is_in_frame

    # uppercase = codon in reading frame, lowercase = out of frame
    assert is_in_frame("MKT|GH") == "in-frame"
    assert is_in_frame("MKT|gh") == "out-of-frame"   # downstream out of frame
    assert is_in_frame("MKt*t|GH") == "stop-codon"   # stop before junction,
    #                                                  nothing in frame after it
    assert is_in_frame("MKT|") == "."                # nothing after junction
    assert is_in_frame(".") == "."


def test_gene_to_name_and_fusion_site():
    from arriba_tpu.annotation.index import IntervalIndex
    from arriba_tpu.annotation.tables import ExonTable
    from arriba_tpu.output.writer import gene_to_name, get_fusion_site

    genes = make_genes(3)
    # gene2 becomes a dummy between GENE0 (0-10000) and GENE1 (100000-110000)
    genes.start[2] = 50000
    genes.end[2] = 50100
    genes.is_dummy[2] = True
    gene_index = IntervalIndex(genes.contig, genes.start, genes.end, 1)

    # real gene: plain name
    assert gene_to_name(0, 0, 5000, genes, gene_index) == "GENE0"
    # dummy gene: flanking real genes with distances
    name = gene_to_name(2, 0, 50050, genes, gene_index)
    assert "GENE0(40050)" in name and "GENE1(49950)" in name

    # exon table: GENE0 with one coding exon 1000-2999 and one 4000-4999
    exons = ExonTable()
    exons.contig = np.zeros(2, np.int32)
    exons.start = np.array([1000, 4000], np.int64)
    exons.end = np.array([2999, 4999], np.int64)
    exons.gene = np.array([0, 0], np.int64)
    exons.prev_exon = np.array([-1, 0], np.int64)
    exons.next_exon = np.array([1, -1], np.int64)
    exons.coding_region_start = np.array([1000, 4000], np.int64)
    exons.coding_region_end = np.array([2999, 4999], np.int64)
    exon_index = IntervalIndex(exons.contig, exons.start, exons.end, 1)

    # intergenic (outside the gene), intron, and CDS classifications
    assert get_fusion_site(0, False, False, 0, 20000, genes, exons,
                           exon_index) == "intergenic"
    assert get_fusion_site(0, False, False, 0, 3500, genes, exons,
                           exon_index) == "intron"
    site = get_fusion_site(0, False, True, 0, 2000, genes, exons, exon_index)
    assert site == "CDS"
    # spliced breakpoint at an exon boundary
    site = get_fusion_site(0, True, True, 0, 2999, genes, exons, exon_index)
    assert "splice-site" in site


def test_stdmap_order_emulation_matches_libstdcxx():
    """output/stdmap_order.py must reproduce the exact iteration order of a
    real libstdc++ unordered_map (validated via the native probe) across
    rehash boundaries, including the discarded-row hash."""
    import numpy as np
    pytest.importorskip("arriba_tpu._native")
    from arriba_tpu import _native
    from arriba_tpu.output.stdmap_order import (reference_fusion_hash,
                                                stdmap_iteration_order)

    rng = np.random.default_rng(42)
    for n in (0, 1, 5, 13, 14, 29, 30, 100, 1000, 6000):
        hashes = rng.integers(0, 2 ** 63, n, dtype=np.uint64)
        hashes = np.unique(hashes)[rng.permutation(len(np.unique(hashes)))] \
            if n else hashes
        native_order = np.frombuffer(
            _native.ev_stdmap_probe(hashes.tobytes()), np.int64)
        py_order = stdmap_iteration_order([int(h) for h in hashes])
        assert list(native_order) == py_order, n

    # the fusion-key hash follows the reference formula exactly
    key = (7, 11, 1, 2, 1234, 5678, True, False)
    h = 0
    for v in (7, 11, 1, 2, 1234, 5678, 1, 0):
        h = v ^ ((h << 4) & ((1 << 64) - 1))
        h &= (1 << 64) - 1
    # recompute nested form independently
    def nested(vals):
        if not vals:
            return 0
        return (vals[0] ^ ((nested(vals[1:]) << 4))) & ((1 << 64) - 1)
    assert reference_fusion_hash(key) == nested([7, 11, 1, 2, 1234, 5678, 1, 0])
