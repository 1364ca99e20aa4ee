"""Device-side fusion-candidate clustering.

The counting core of find_fusions (fusions.cpp:203-366): every chimeric
fragment contributes one breakpoint-pair candidate per (gene1, gene2)
combination; candidates with identical (gene1, gene2, contig1, contig2,
breakpoint1, breakpoint2, direction1, direction2) keys aggregate into one
fusion with per-kind support counts. The host implementation uses a hash
map; on TPU the same aggregation is a fixed-shape sort + segment-reduce:

  1. pack the key into int32 words (int64 is off by default under jax),
  2. multi-pass stable sort from least- to most-significant word — a
     lexicographic radix sort out of XLA's sort primitive,
  3. run-boundary detection + segment ids via cumsum,
  4. per-kind support via segment_sum.

Shapes are static: N candidate slots in, N cluster slots out (empty slots
masked). Subsampling, anchors, and read-name lists stay on the host — this
op serves the massively-parallel cohort path where only the aggregate
support matters for candidate triage.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SUPPORT_KINDS = 3  # split_reads1, split_reads2, discordant_mates
_SENTINEL = jnp.int32(0x7FFFFFFF)


def pack_keys(gene1, gene2, contig1, contig2, breakpoint1, breakpoint2,
              direction1, direction2):
    """Pack the 8-tuple fusion key into 6 int32 words, most significant
    first: (gene1, gene2, contig-pair, breakpoint1, breakpoint2,
    direction-pair)."""
    contig_pair = (contig1.astype(jnp.int32) << 16) | contig2.astype(jnp.int32)
    direction_pair = ((direction1.astype(jnp.int32) << 1)
                      | direction2.astype(jnp.int32))
    return (gene1.astype(jnp.int32), gene2.astype(jnp.int32), contig_pair,
            breakpoint1.astype(jnp.int32), breakpoint2.astype(jnp.int32),
            direction_pair)


def cluster_candidates(words, kind, valid):
    """Aggregate candidates with equal keys.

    Args:
      words: tuple of int32[N] key words, most significant first.
      kind: int32[N] in [0, SUPPORT_KINDS) — which support counter the
        candidate feeds.
      valid: bool[N] — candidate slots in use.

    Returns dict with, per output slot (same N, sorted by key, empty slots
    at the end):
      words: tuple of int32[N] cluster key words,
      support: int32[N, SUPPORT_KINDS],
      cluster_valid: bool[N],
      n_clusters: int32 scalar.
    """
    n = words[0].shape[0]
    words = [jnp.where(valid, word, _SENTINEL) for word in words]

    # lexicographic sort: stable passes from least to most significant word
    for word_index in range(len(words) - 1, -1, -1):
        order = jnp.argsort(words[word_index], stable=True)
        words = [word[order] for word in words]
        kind = kind[order]
    valid = words[-1] != _SENTINEL
    for word in words[:-1]:
        valid = valid | (word != _SENTINEL)

    # run boundaries -> segment ids
    changed = jnp.zeros(n - 1, jnp.bool_)
    for word in words:
        changed = changed | (word[1:] != word[:-1])
    first = jnp.concatenate([jnp.ones(1, jnp.bool_), changed]) & valid
    segment = jnp.cumsum(first.astype(jnp.int32)) - 1
    segment = jnp.where(valid, segment, n - 1)  # park invalid in last slot

    one_hot = jax.nn.one_hot(kind, SUPPORT_KINDS, dtype=jnp.int32)
    one_hot = one_hot * valid[:, None].astype(jnp.int32)
    support = jax.ops.segment_sum(one_hot, segment, num_segments=n)

    # cluster keys: first element of each run; non-first rows scatter to an
    # out-of-bounds slot and are dropped
    slot = jnp.where(first, segment, n)
    out_words = tuple(
        jnp.full((n,), _SENTINEL).at[slot].set(word, mode="drop")
        for word in words)
    n_clusters = jnp.sum(first.astype(jnp.int32))
    cluster_valid = jnp.arange(n) < n_clusters
    return {
        "words": out_words, "support": support,
        "cluster_valid": cluster_valid, "n_clusters": n_clusters,
    }


cluster_candidates_jit = jax.jit(cluster_candidates)


def merge_cluster_tables(words, support, valid):
    """Merge already-aggregated cluster tables (e.g. gathered from DP
    shards): rows with equal keys sum their support vectors. Same mechanism
    as cluster_candidates, but summing int32 support rows instead of
    one-hot kinds."""
    n = words[0].shape[0]
    words = [jnp.where(valid, word, _SENTINEL) for word in words]
    for word_index in range(len(words) - 1, -1, -1):
        order = jnp.argsort(words[word_index], stable=True)
        words = [word[order] for word in words]
        support = support[order]
    valid = words[-1] != _SENTINEL
    for word in words[:-1]:
        valid = valid | (word != _SENTINEL)

    changed = jnp.zeros(n - 1, jnp.bool_)
    for word in words:
        changed = changed | (word[1:] != word[:-1])
    first = jnp.concatenate([jnp.ones(1, jnp.bool_), changed]) & valid
    segment = jnp.cumsum(first.astype(jnp.int32)) - 1
    segment = jnp.where(valid, segment, n - 1)

    support = support * valid[:, None].astype(support.dtype)
    out_support = jax.ops.segment_sum(support, segment, num_segments=n)

    slot = jnp.where(first, segment, n)
    out_words = tuple(
        jnp.full((n,), _SENTINEL).at[slot].set(word, mode="drop")
        for word in words)
    n_clusters = jnp.sum(first.astype(jnp.int32))
    cluster_valid = jnp.arange(n) < n_clusters
    return {
        "words": out_words, "support": out_support,
        "cluster_valid": cluster_valid, "n_clusters": n_clusters,
    }
