"""Device-side annotation index queries.

The host IntervalIndex (annotation/index.py) stores, per contig, sorted
region boundaries plus CSR feature sets — exactly the layout jnp.searchsorted
consumes. These functions are the device formulation of the reference's
get_annotation_by_coordinate point query (annotation.t.hpp:55-68): one
searchsorted per query batch, then fixed-width gathers of the CSR sets.
Replicated across the mesh (the index is small), queried shard-locally.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def point_query_spans(boundaries: jnp.ndarray, offsets: jnp.ndarray,
                      positions: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[Q] positions -> (csr_start [Q], csr_len [Q]) of the feature set of
    the region containing each position (empty set past the last boundary)."""
    idx = jnp.searchsorted(boundaries, positions, side="left")
    in_range = idx < boundaries.shape[0]
    idx_clipped = jnp.minimum(idx, jnp.maximum(boundaries.shape[0] - 1, 0))
    starts = jnp.where(in_range, offsets[idx_clipped], 0)
    ends = jnp.where(in_range, offsets[idx_clipped + 1], 0)
    return starts, ends - starts


@functools.partial(jax.jit, static_argnames=("max_items",))
def gather_sets(items: jnp.ndarray, csr_start: jnp.ndarray, csr_len: jnp.ndarray,
                max_items: int) -> jnp.ndarray:
    """Materialize CSR sets as a fixed-width [Q, max_items] matrix padded
    with -1 (sets longer than max_items are truncated — callers size
    max_items to the index's max set size)."""
    lanes = jnp.arange(max_items)[None, :]
    indices = csr_start[:, None] + lanes
    valid = lanes < csr_len[:, None]
    indices = jnp.where(valid, indices, 0)
    gathered = items[indices]
    return jnp.where(valid, gathered, -1)


@functools.partial(jax.jit, static_argnames=("max_items",))
def point_query_batch(boundaries: jnp.ndarray, offsets: jnp.ndarray,
                      items: jnp.ndarray, positions: jnp.ndarray,
                      max_items: int) -> jnp.ndarray:
    """Fused point query: [Q] positions -> [Q, max_items] feature rows
    (-1 padded)."""
    starts, lengths = point_query_spans(boundaries, offsets, positions)
    return gather_sets(items, starts, lengths, max_items)


def interval_overlap_triage(queries, feature_contig, feature_start,
                            feature_end, n_contigs: int, slack: int = 2):
    """bool[len(queries)] per (contig, start, end) query: could any feature
    lie within `slack` bp of the interval? A sound emptiness prefilter for
    IntervalIndex.range_query (annotation.t.hpp:70-99): every feature that
    query can return overlaps [start-slack, end+slack], so a False here
    means the host query is guaranteed EMPTY and can be skipped. Batched
    over the whole mate set via the same sorted-global-coordinate ranges
    as the blacklist triage (ops/blacklist.py). Returns None when the
    coordinate space overflows uint32 (caller falls back to the host)."""
    import numpy as np

    from .blacklist import build_range_index, contig_offsets, query_intervals

    if not queries:
        return np.zeros(0, bool)
    q_contig = np.asarray([q[0] for q in queries], np.int64)
    q_lo = np.maximum(np.asarray([q[1] for q in queries], np.int64)
                      - slack, 0)
    q_hi = np.asarray([q[2] for q in queries], np.int64) + slack
    feature_contig = np.asarray(feature_contig, np.int64)
    feature_start = np.asarray(feature_start, np.int64)
    feature_end = np.asarray(feature_end, np.int64)

    lengths = np.zeros(n_contigs, np.int64)
    for contig, hi in ((feature_contig, feature_end), (q_contig, q_hi)):
        if len(contig):
            np.maximum.at(lengths, contig, hi + 8)
    try:
        offsets = contig_offsets(lengths)
    except ValueError:
        return None
    starts, prefix_max_end = build_range_index(
        feature_contig, feature_start, feature_end, offsets)
    q_global_lo = (q_lo.astype(np.uint64) + offsets[q_contig]).astype(np.uint32)
    q_global_hi = (q_hi.astype(np.uint64) + offsets[q_contig]).astype(np.uint32)
    return np.asarray(query_intervals(starts, prefix_max_end,
                                      q_global_lo, q_global_hi))
