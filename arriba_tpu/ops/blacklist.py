"""Device-side blacklist range triage.

The host blacklist (filters/blacklist.py, parity with
filter_blacklisted_ranges.cpp:17-300) evaluates rich per-item semantics
(keywords, gene matches, 5'/3' awareness) over a 100 kb genome-bin hash
(`get_genome_bins_from_range()`, filter_blacklisted_ranges.cpp:226-230).
The device analog replaces the bin hash with sorted interval arrays and
answers the hot containment question — "does this breakpoint fall inside
any blacklisted range?" — for whole batches at once:

  contigs are laid out end-to-end in a uint32 global coordinate space
  (human + viral decoys fit comfortably in 2^32); ranges sorted by global
  start with a running prefix-max of global ends make point containment a
  single searchsorted per query.

This is a triage prefilter for the massively-parallel path: breakpoints
that hit no range can skip the host's per-item matching entirely; hits are
re-checked on the host where the full keyword semantics live.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def contig_offsets(contig_lengths) -> np.ndarray:
    """uint32 global-coordinate offset per contig (exclusive prefix sum)."""
    lengths = np.asarray(contig_lengths, np.uint64)
    offsets = np.zeros(len(lengths), np.uint64)
    np.cumsum(lengths[:-1], out=offsets[1:])
    if len(lengths) and int(offsets[-1] + lengths[-1]) >= 1 << 32:
        raise ValueError("genome too large for uint32 global coordinates")
    return offsets.astype(np.uint32)


def build_range_index(contig, start, end, offsets: np.ndarray):
    """Sorted global-start array + running prefix-max of global ends."""
    contig = np.asarray(contig, np.int64)
    start = np.asarray(start, np.uint64) + offsets[contig]
    end = np.asarray(end, np.uint64) + offsets[contig]
    order = np.argsort(start, kind="stable")
    start = start[order].astype(np.uint32)
    prefix_max_end = np.maximum.accumulate(end[order]).astype(np.uint32)
    return jnp.asarray(start), jnp.asarray(prefix_max_end)


@jax.jit
def query_points(sorted_starts, prefix_max_end, query_global):
    """bool[N]: does each global-coordinate point fall inside any range?

    A point is covered iff some range with start <= point has end >= point;
    the running maximum of ends over the start-sorted ranges answers that
    with one binary search. Ranges never span contig boundaries, so the
    global layout cannot create cross-contig false positives as long as
    queries use the same offsets.
    """
    idx = jnp.searchsorted(sorted_starts, query_global, side="right")
    best_end = jnp.where(idx > 0,
                         prefix_max_end[jnp.maximum(idx - 1, 0)],
                         jnp.uint32(0))
    return (idx > 0) & (best_end >= query_global)


@jax.jit
def query_intervals(sorted_starts, prefix_max_end, query_lo, query_hi):
    """bool[N]: does each global-coordinate interval [lo, hi] overlap any
    range? Overlap iff some range with start <= hi has end >= lo — the
    same prefix-max argument as query_points with the interval's two ends."""
    idx = jnp.searchsorted(sorted_starts, query_hi, side="right")
    best_end = jnp.where(idx > 0,
                         prefix_max_end[jnp.maximum(idx - 1, 0)],
                         jnp.uint32(0))
    return (idx > 0) & (best_end >= query_lo)
