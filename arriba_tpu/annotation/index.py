"""Interval index: sorted boundary arrays + CSR feature sets.

Reference parity: source/annotation.t.hpp:25-100. The reference splits
overlapping features into disjoint regions keyed by a std::map<position, set>.
The invariant of that structure reduces to: the set stored at boundary key k
is exactly {feature f on this contig : f.start <= k <= f.end}, where the keys
are the sorted union of all feature ends and starts-1.

We store, per contig:
  boundaries  — sorted unique int64 keys
  offsets     — CSR offsets (len = n_boundaries + 1)
  items       — feature row indices per boundary set, ascending

Point/range queries are np.searchsorted — O(log n) per query and trivially
vectorizable on host (numpy) and device (jnp.searchsorted).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

EMPTY = np.empty(0, np.int64)


def sorted_union(set1: np.ndarray, set2: np.ndarray) -> np.ndarray:
    """Union of two small sorted unique int arrays (fast path for the tiny
    gene/exon sets that dominate queries; equivalent to np.union1d)."""
    n1, n2 = len(set1), len(set2)
    if n1 == 0:
        return set2
    if n2 == 0:
        return set1
    merged = sorted(set(set1.tolist()) | set(set2.tolist()))
    return np.array(merged, np.int64)


def combine_annotations(set1: np.ndarray, set2: np.ndarray, make_union: bool = True) -> np.ndarray:
    """Intersection of two sorted feature sets; union if disjoint and
    make_union (annotation.t.hpp:47-53)."""
    n1, n2 = len(set1), len(set2)
    if n1 == 0 or n2 == 0:
        combined = EMPTY
    else:
        lookup = set(set2.tolist())
        inter = [value for value in set1.tolist() if value in lookup]
        combined = np.array(inter, np.int64) if inter else EMPTY
    if combined.size == 0 and make_union:
        combined = sorted_union(set1, set2)
    return combined


class IntervalIndex:
    """Immutable interval-stabbing index over (contig, start, end) features."""

    def __init__(self, contig: np.ndarray, start: np.ndarray, end: np.ndarray,
                 n_contigs: int) -> None:
        self.n_contigs = n_contigs
        self.boundaries: List[np.ndarray] = [EMPTY] * n_contigs
        self.offsets: List[np.ndarray] = [np.zeros(1, np.int64)] * n_contigs
        self.items: List[np.ndarray] = [EMPTY] * n_contigs

        contig = np.asarray(contig)
        start = np.asarray(start, np.int64)
        end = np.asarray(end, np.int64)
        feature_rows = np.arange(len(start), dtype=np.int64)
        for c in range(n_contigs):
            on_contig = contig == c
            if not on_contig.any():
                continue
            s = start[on_contig]
            e = end[on_contig]
            rows = feature_rows[on_contig]
            bounds = np.unique(np.concatenate([e, s - 1]))
            # feature row f covers boundaries in [searchsorted(bounds, s_f), idx(e_f)]
            lo = np.searchsorted(bounds, s, side="left")
            hi = np.searchsorted(bounds, e, side="left")  # e is a boundary => exact
            counts = np.zeros(len(bounds) + 1, np.int64)
            np.add.at(counts, lo, 1)
            np.add.at(counts, hi + 1, -1)
            per_boundary = np.cumsum(counts[:-1])
            offsets = np.concatenate([[0], np.cumsum(per_boundary)])
            # expand (feature, boundary) pairs; stable sort by boundary keeps
            # feature rows ascending within each set (the deterministic analog
            # of the reference's pointer-ordered sets)
            span = hi - lo + 1
            item_feature = np.repeat(rows, span)
            # multi-arange: boundary index for each expanded item
            item_boundary = np.repeat(lo, span) + (
                np.arange(span.sum(), dtype=np.int64)
                - np.repeat(np.concatenate([[0], np.cumsum(span)[:-1]]), span)
            )
            order = np.argsort(item_boundary, kind="stable")
            self.boundaries[c] = bounds
            self.offsets[c] = offsets
            self.items[c] = item_feature[order]

    # -- queries ---------------------------------------------------------------

    def set_at(self, contig: int, boundary_idx: int) -> np.ndarray:
        off = self.offsets[contig]
        return self.items[contig][off[boundary_idx]:off[boundary_idx + 1]]

    def point_query(self, contig: int, pos: int) -> np.ndarray:
        """Features overlapping the region containing pos
        (annotation.t.hpp:61-68)."""
        if contig >= self.n_contigs:
            return EMPTY
        bounds = self.boundaries[contig]
        idx = int(np.searchsorted(bounds, pos, side="left"))
        if idx >= len(bounds):
            return EMPTY
        return self.set_at(contig, idx)

    def range_query(self, contig: int, start: int, end: int) -> np.ndarray:
        """Features overlapping [start, end] with 2 bp slack at each end;
        intersection of start/end result sets, union if disjoint
        (annotation.t.hpp:70-99)."""
        if contig >= self.n_contigs:
            return EMPTY
        if start == end:
            return self.point_query(contig, start)
        if start > end:
            start, end = end, start
        bounds = self.boundaries[contig]
        n = len(bounds)

        result_start = EMPTY
        idx = int(np.searchsorted(bounds, start, side="left"))
        if idx < n:
            result_start = self.set_at(contig, idx)
            if bounds[idx] - start <= 2 and idx + 1 < n:
                result_start = sorted_union(result_start, self.set_at(contig, idx + 1))

        result_end = EMPTY
        idx = int(np.searchsorted(bounds, end, side="left"))
        if idx < n:
            result_end = self.set_at(contig, idx)
        if idx > 0 and n > 0:
            prev = min(idx, n) - 1
            if end - bounds[prev] <= 2:
                result_end = sorted_union(result_end, self.set_at(contig, prev))

        return combine_annotations(result_start, result_end)

    # -- bulk vectorized queries (device-friendly) ------------------------------

    def point_query_many(self, contig: np.ndarray, pos: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Vectorized point query: returns (offsets, items) in CSR form, one
        set per query, preserving the single-query semantics."""
        contig = np.asarray(contig)
        pos = np.asarray(pos, np.int64)
        sets: List[np.ndarray] = []
        lengths = np.zeros(len(pos), np.int64)
        # group queries by contig so each contig does one searchsorted batch
        for c in np.unique(contig):
            mask = contig == c
            if c >= self.n_contigs:
                continue
            bounds = self.boundaries[c]
            idx = np.searchsorted(bounds, pos[mask], side="left")
            off = self.offsets[c]
            valid = idx < len(bounds)
            idx_clipped = np.minimum(idx, max(len(bounds) - 1, 0))
            starts = np.where(valid, off[idx_clipped], 0)
            ends = np.where(valid, off[np.minimum(idx_clipped + 1, len(off) - 1)], 0)
            lengths[mask] = ends - starts
            query_rows = np.nonzero(mask)[0]
            for row, s_, e_ in zip(query_rows, starts, ends):
                sets.append((row, self.items[c][s_:e_]))
        offsets = np.zeros(len(pos) + 1, np.int64)
        offsets[1:] = np.cumsum(lengths)
        items = np.zeros(int(offsets[-1]), np.int64)
        for row, values in sets:
            items[offsets[row]:offsets[row] + len(values)] = values
        return offsets, items


def make_gene_index(genes, n_contigs: int) -> IntervalIndex:
    return IntervalIndex(genes.contig, genes.start, genes.end, n_contigs)


def make_exon_index(exons, n_contigs: int) -> IntervalIndex:
    return IntervalIndex(exons.contig, exons.start, exons.end, n_contigs)
