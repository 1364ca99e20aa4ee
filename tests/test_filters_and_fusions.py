"""Read-level filter + candidate-generation tests on the synthetic scenario."""

import numpy as np
import pytest

from arriba_tpu.annotation.queries import annotate_alignments
from arriba_tpu.constants import (DOWNSTREAM, FILTER_NONE, FILTER_READ_THROUGH,
                                  FILTER_SAME_GENE, FORWARD, MATE1, REVERSE,
                                  SPLIT_READ, UPSTREAM)
from arriba_tpu.filters.read_level import (calculate_binomial_coefficient,
                                           filter_duplicates,
                                           filter_proximal_read_through,
                                           filter_same_gene,
                                           filter_uninteresting_contigs,
                                           kmer_to_int)
from arriba_tpu.fusion import Fusions
from arriba_tpu.fusions_finder import find_fusions
from arriba_tpu.ingest.chimeric import read_chimeric_alignments
from arriba_tpu.ingest.stats import Coverage
from arriba_tpu.model import sort_chimeric_alignments

from .test_ingest import scenario  # reuse fixture  # noqa: F401


def _ingest(scenario):
    sam_path, assembly, contigs, ann, gene_index = scenario
    chimeric = {}
    coverage = Coverage()
    read_chimeric_alignments(
        sam_path, assembly, chimeric, contigs, "1 2", "AC_* NC_*",
        ann.genes, gene_index, coverage, [],
        separate_chimeric_bam_file=False, is_rna_bam_file=True,
        external_duplicate_marking=False, max_itd_length=100)
    return sort_chimeric_alignments(chimeric), ann, contigs, assembly, coverage


def test_filters_and_find_fusions(scenario):
    from .util import make_indices
    chimeric, ann, contigs, assembly, coverage = _ingest(scenario)
    gene_index, exon_index = make_indices(ann, len(contigs))

    # annotate alignments first (pipeline order)
    for mates in chimeric.values():
        annotate_alignments(mates, ann.exons, ann.genes, exon_index)

    assert filter_duplicates(chimeric, False) == 3  # no duplicates among r1-r3
    assert filter_uninteresting_contigs(chimeric, [True, True]) == 3

    # read-through filter: r3 spans G1->G2 with distance ~8000 < 10000 → filtered
    remaining = filter_proximal_read_through(chimeric, ann.genes, 10000)
    assert remaining == 2
    assert chimeric["r3,1"].filter == FILTER_READ_THROUGH
    # with a smaller distance threshold it would survive (re-run on fresh copy
    # is not possible since filters are sticky; assert the others passed)
    assert chimeric["r1,1"].filter == FILTER_NONE
    assert chimeric["r2,1"].filter == FILTER_NONE

    assert filter_same_gene(chimeric) == 2  # r1/r2 span different genes

    fusions: Fusions = {}
    total = find_fusions(chimeric, fusions, ann.genes, ann.exons, exon_index,
                         max_mate_gap=200, subsampling_threshold=300)
    # r1 (split read) and r2 (discordant) support G1->G3 fusions; r3 filtered
    assert total >= 1
    unfiltered = [f for f in fusions.values() if f.filter == FILTER_NONE]
    assert len(unfiltered) >= 1
    # the split-read fusion: breakpoint1 at end of split read segment on contig 1
    split_fusions = [f for f in unfiltered if f.split_reads1 + f.split_reads2 > 0]
    assert len(split_fusions) == 1
    f = split_fusions[0]
    assert f.contig1 == 0 and f.contig2 == 1
    # split read REVERSE: breakpoint = end = 1229; supplementary REVERSE: start = 5000
    assert f.breakpoint1 == 1229
    assert f.breakpoint2 == 5000
    assert f.direction1 == DOWNSTREAM and f.direction2 == UPSTREAM
    assert f.split_reads1 + f.split_reads2 == 1
    # the discordant mate supports both the split-read fusion (within
    # tolerance of its breakpoints) and its own discordant-only fusion
    disc_fusions = [f for f in unfiltered if f.discordant_mates > 0]
    assert len(disc_fusions) == 2
    assert all(f.discordant_mates == 1 for f in disc_fusions)


def test_kmer_to_int():
    # T=0, G=1, C=2, other=3
    assert kmer_to_int("TGCA", 0, 4) == 0b00011011
    assert kmer_to_int("AAAA", 0, 4) == 0b11111111


def test_binomial_coefficient():
    assert calculate_binomial_coefficient(2, 5) == pytest.approx(10.0)
    assert calculate_binomial_coefficient(0, 7) == pytest.approx(1.0)
    # k > n degenerates to 0 via multiplication by zero (reference semantics)
    assert calculate_binomial_coefficient(5, 3) == 0.0


def test_device_offload_gating(monkeypatch):
    """ARRIBA_TPU_DEVICE=1 forces offload, =0 forces host, unset defers to
    the local-chip probe plus the batch-size crossover
    (read_level._device_offload_enabled)."""
    from arriba_tpu.filters import read_level

    monkeypatch.setenv("ARRIBA_TPU_DEVICE", "1")
    assert read_level._device_offload_enabled(1)
    monkeypatch.setenv("ARRIBA_TPU_DEVICE", "0")
    assert not read_level._device_offload_enabled(1)
    monkeypatch.delenv("ARRIBA_TPU_DEVICE", raising=False)
    monkeypatch.setattr(read_level, "_local_tpu_present", lambda: True)
    # auto mode: only batches big enough to amortize dispatch offload
    big = read_level._AUTO_OFFLOAD_MIN_ROWS
    assert read_level._device_offload_enabled(big)
    assert not read_level._device_offload_enabled(big - 1)
    monkeypatch.setenv("ARRIBA_TPU_DEVICE_MIN_ROWS", "10")
    assert read_level._device_offload_enabled(10)
    assert not read_level._device_offload_enabled(9)
    monkeypatch.delenv("ARRIBA_TPU_DEVICE_MIN_ROWS", raising=False)
    monkeypatch.setattr(read_level, "_local_tpu_present", lambda: False)
    assert not read_level._device_offload_enabled(big)
