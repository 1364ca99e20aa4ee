"""Iteration-order emulation of the reference's fusions_t hash map.

The reference stores fusions in an `unordered_map` keyed by the tuple
(gene1, gene2, contig1, contig2, breakpoint1, breakpoint2, direction1,
direction2) (common.hpp:286) and writes the discarded-fusions file in raw
map iteration order (output_fusions.cpp:1052: "don't sort the discarded
fusions"). Byte-equal output therefore requires reproducing libstdc++'s
_Hashtable iteration order for the reference's exact tuple hash
(common.hpp:294-310).

libstdc++ keeps all nodes in one singly-linked list with buckets pointing
into it: inserting into an empty bucket splices the node at the global
head; inserting into a non-empty bucket makes the node that bucket's first
element. A rehash walks the old list in order and re-inserts every node
with the same rules. With max_load_factor 1.0 and one-at-a-time inserts,
the rehash trigger and prime bucket-count growth follow the fixed schedule
below (verified empirically against this toolchain's libstdc++, which is
also the one the oracle binary links against).

The native twin (`_native.ev_map_order`, native/event.cpp) replays the
insertions into a real `unordered_map`; tests cross-check both.
"""

from __future__ import annotations

from typing import Iterable, List, Sequence, Tuple

_U64 = (1 << 64) - 1

# bucket counts in growth order; each rehash advances one step and fires
# when the element count would exceed the current bucket count
# (load factor 1.0). Probed from this toolchain's libstdc++.
_BUCKET_SCHEDULE = [
    13, 29, 59, 127, 257, 541, 1109, 2357, 5087, 10273, 20753, 42043,
    85229, 172933, 351061, 712697, 1447153, 2938679, 5967347,
]

FusionKey = Tuple[int, int, int, int, int, int, bool, bool]


def reference_fusion_hash(key: FusionKey) -> int:
    """common.hpp:300-309: h(e0..e7) = hash(e0) ^ (h(e1..e7) << 4), with
    std::hash the identity cast to size_t on every (integral) element."""
    gene1, gene2, contig1, contig2, breakpoint1, breakpoint2, d1, d2 = key
    h = 1 if d2 else 0
    for value in (1 if d1 else 0, int(breakpoint2), int(breakpoint1),
                  int(contig2), int(contig1), int(gene2), int(gene1)):
        h = (value & _U64) ^ ((h << 4) & _U64)
    return h


def stdmap_iteration_order(hashes: Sequence[int]) -> List[int]:
    """Indices 0..n-1 in the iteration order of a libstdc++ unordered_map
    (max_load_factor 1.0) after inserting unique keys with these hash
    codes, one per insert, in sequence order."""
    n_items = len(hashes)
    if n_items > _BUCKET_SCHEDULE[-1]:
        raise OverflowError("bucket schedule exhausted; extend _BUCKET_SCHEDULE")

    groups: List[List] = []  # head->tail: [bucket_id, [items, first..last]]
    by_bucket = {}
    bucket_count = 1
    next_resize = 0
    level = -1

    def place(item: int) -> None:
        bucket = hashes[item] % bucket_count
        group = by_bucket.get(bucket)
        if group is None:
            group = [bucket, [item]]
            by_bucket[bucket] = group
            groups.insert(0, group)  # empty bucket: node becomes global head
        else:
            group[1].insert(0, item)  # becomes the bucket's first element

    for i in range(n_items):
        if i + 1 > next_resize:  # _M_need_rehash before the insert
            level += 1
            bucket_count = _BUCKET_SCHEDULE[level]
            next_resize = bucket_count
            old_order = [item for _, items in groups for item in items]
            groups.clear()
            by_bucket.clear()
            for item in old_order:  # _M_rehash_aux: re-insert in list order
                place(item)
        place(i)

    return [item for _, items in groups for item in items]


def fusion_map_order(keys: Iterable[FusionKey]) -> List[int]:
    """Fusion indices (creation order in, which equals the reference's
    first-insert order) permuted into the oracle's map iteration order."""
    return stdmap_iteration_order([reference_fusion_hash(k) for k in keys])
