"""User-defined tags annotation (e.g. Mitelman / cancer gene lists).

Reference parity: source/annotate_tags.{cpp,hpp} — loads a 3-column file
(range1, range2, tag) into the 100 kb genome-bin hash and reuses the
blacklist matching machinery to annotate fusions 5'/3'-aware.
"""

from __future__ import annotations

import sys
from collections import defaultdict
from typing import Dict, List, Tuple

from ..annotation.tables import GeneTable
from ..constants import TRANSCRIPT_START_GENE1
from ..contigs import ContigRegistry
from ..filters.blacklist import (BlacklistItem, GenomeBin,
                                 get_genome_bins_from_range,
                                 matches_blacklist_item, parse_blacklist_item)
from ..fusion import Fusion
from ..io.compressed import iter_lines

Tags = Dict[GenomeBin, List[Tuple[BlacklistItem, BlacklistItem, str]]]


def load_tags(tags_file_path: str, contigs: ContigRegistry,
              gene_names: Dict[str, int], genes: GeneTable) -> Tags:
    """annotate_tags.cpp:11-43."""
    tags: Tags = defaultdict(list)
    for line in iter_lines(tags_file_path):
        if not line or line[0] == "#":
            continue
        columns = line.split("\t")
        tag = columns[2] if len(columns) > 2 else ""
        if not tag:
            print("WARNING: encountered a line with an empty tag => skipped",
                  file=sys.stderr)
            continue
        item1 = parse_blacklist_item(columns[0], contigs, gene_names, genes, False)
        if item1 is None:
            continue
        item2 = parse_blacklist_item(columns[1] if len(columns) > 1 else "",
                                     contigs, gene_names, genes, False)
        if item2 is None:
            continue

        tag = "".join("_" if (c < "!" or c > "~" or c == ",") else c for c in tag)

        genome_bins: List[GenomeBin] = []
        get_genome_bins_from_range(item1.contig, item1.start, item1.end, genome_bins)
        get_genome_bins_from_range(item2.contig, item2.start, item2.end, genome_bins)
        for genome_bin in genome_bins:
            tags[genome_bin].append((item1, item2, tag))
    return tags


def annotate_tags(fusion: Fusion, tags: Tags, genes: GeneTable,
                  max_mate_gap: int) -> str:
    """annotate_tags.cpp:45-82."""
    genome_bins: List[GenomeBin] = []
    get_genome_bins_from_range(fusion.contig1, fusion.breakpoint1, fusion.breakpoint1,
                               genome_bins)
    get_genome_bins_from_range(fusion.contig2, fusion.breakpoint2, fusion.breakpoint2,
                               genome_bins)
    get_genome_bins_from_range(fusion.contig1, int(genes.start[fusion.gene1]),
                               int(genes.end[fusion.gene1]), genome_bins)
    get_genome_bins_from_range(fusion.contig2, int(genes.start[fusion.gene2]),
                               int(genes.end[fusion.gene2]), genome_bins)

    matching_tags = set()
    for genome_bin in genome_bins:
        for item1, item2, tag in tags.get(genome_bin, ()):
            gene_5 = 1 if fusion.transcript_start == TRANSCRIPT_START_GENE1 else 2
            gene_3 = 2 if fusion.transcript_start == TRANSCRIPT_START_GENE1 else 1
            if (matches_blacklist_item(item1, fusion, gene_5, genes, max_mate_gap)
                    and matches_blacklist_item(item2, fusion, gene_3, genes, max_mate_gap)):
                matching_tags.add(tag)

    return ",".join(sorted(matching_tags)) if matching_tags else "."
