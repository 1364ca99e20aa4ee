"""Sharded mid-cascade global statistics over the device mesh.

The e-value model and the in-vitro artifact filter consume *global*
statistics of the candidate table and of per-read gene expression
(filter_relative_support.cpp:20-83, filter_in_vitro.cpp:48-83). In the
reference these are single-threaded host passes; here they are the
multi-host determinism crux (SURVEY §2.7): the candidate table is sharded
over the 'dp' mesh axis, per-shard partial sums are reduced with psum, and
the small dedup'd tables (fusion-partner edges) are all-gathered and
reduced identically on every device. Every reduced quantity is an integer,
so the result is bit-identical for any shard count — the host multiply
chain that consumes them then produces a byte-identical fusions.tsv.

Layout: candidate rows ride P('dp'); dense per-gene vectors (expression
counts, partner counts) are replicated outputs of psum/all_gather, so the
collectives ride ICI.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import numpy as np

from ..filters.event_level import CascadeStats


def _pad_rows(array: np.ndarray, n_rows: int, fill) -> np.ndarray:
    if array.shape[0] == n_rows:
        return array
    widths = [(0, n_rows - array.shape[0])]
    return np.pad(array, widths, constant_values=fill)


def _stats_step(n_genes: int, cols, gene_hits, hits_valid):
    """Per-shard body (runs under shard_map): psum-reduced scalar counters,
    all-gathered partner edges, dense expression bincount."""
    import jax
    import jax.numpy as jnp

    valid = cols["valid"]
    none = cols["none"] & valid
    gene1, gene2 = cols["gene1"], cols["gene2"]
    bp1, bp2 = cols["bp1"], cols["bp2"]
    contig1, contig2 = cols["contig1"], cols["contig2"]
    dir1, dir2 = cols["dir1"], cols["dir2"]
    split, sup = cols["split"], cols["sup"]
    spliced1, spliced2 = cols["spliced1"], cols["spliced2"]
    exonic1, exonic2 = cols["exonic1"], cols["exonic2"]
    dummy1, dummy2 = cols["dummy1"], cols["dummy2"]
    index = cols["index"]

    read_through = ((contig1 == contig2) & (bp2 - bp1 < 400000)
                    & ~dir1 & dir2)

    def count(mask):
        return jax.lax.psum(jnp.sum(mask & valid), "dp")

    # breakpoint-location distribution (filter_relative_support.cpp:44-66)
    located = (none & ((contig1 != contig2) | (bp2 - bp1 > 500000))
               & (sup >= 2) & (split > 0) & ~dummy1 & ~dummy2)
    any_spliced = spliced1 | spliced2
    spliced_bp = count(located & any_spliced)
    exonic_bp = count(located & ~any_spliced & exonic1 & exonic2)
    intronic_bp = count(located & ~any_spliced & ~exonic1 & ~exonic2)
    mixed_bp = count(located & ~any_spliced & (exonic1 != exonic2))

    # intragenic duplication/inversion ratio
    intragenic = none & (gene1 == gene2) & (split >= 2)
    intragenic_dup = count(intragenic & dir1 & ~dir2)
    intragenic_inv = count(intragenic & (dir1 == dir2))

    # intragenic : intergenic spliced ratio
    both_spliced = spliced1 & spliced2
    spliced_same = count(both_spliced & (gene1 == gene2))
    spliced_diff = count(both_spliced & (gene1 != gene2))

    # genes involved in fusions / read-through: dense indicators, psum, count
    with_fusion = valid & ~dummy1 & ~dummy2 & (split > 0)
    rt = with_fusion & read_through

    def gene_indicator(mask):
        dense = jnp.zeros(n_genes, jnp.int32)
        dense = dense.at[jnp.where(mask, gene1, n_genes)].add(
            1, mode="drop")
        dense = dense.at[jnp.where(mask, gene2, n_genes)].add(
            1, mode="drop")
        return jax.lax.psum(dense, "dp")

    genes_with_fusions = jnp.sum(gene_indicator(with_fusion) > 0)
    genes_with_read_through = jnp.sum(gene_indicator(rt) > 0)

    # fusion partners per gene: the interleaved key2/key1 stream of
    # filter_relative_support.cpp:20-41. Each row i contributes entries
    # 2i (key=gene2, partner=gene1) and 2i+1 (key=gene1, partner=gene2);
    # dedup by (key, bp1, bp2) keeps the smallest interleaved index —
    # the reference's first-insertion-wins map semantics.
    eligible = none & (gene1 != gene2)
    n_local = gene1.shape[0]
    kg = jnp.concatenate([gene2, gene1])
    pt = jnp.concatenate([gene1, gene2])
    b1 = jnp.concatenate([bp1, bp1])
    b2 = jnp.concatenate([bp2, bp2])
    stream_index = jnp.concatenate([2 * index, 2 * index + 1])
    entry_valid = jnp.concatenate([eligible, eligible])

    kg = jax.lax.all_gather(kg, "dp", tiled=True)
    pt = jax.lax.all_gather(pt, "dp", tiled=True)
    b1 = jax.lax.all_gather(b1, "dp", tiled=True)
    b2 = jax.lax.all_gather(b2, "dp", tiled=True)
    stream_index = jax.lax.all_gather(stream_index, "dp", tiled=True)
    entry_valid = jax.lax.all_gather(entry_valid, "dp", tiled=True)

    # sort invalid-last, then (kg, b1, b2, stream_index) ascending
    order = jnp.lexsort((stream_index, b2, b1, kg, ~entry_valid))
    kg, pt, b1, b2 = kg[order], pt[order], b1[order], b2[order]
    entry_valid = entry_valid[order]
    same_key = jnp.concatenate([
        jnp.zeros(1, bool),
        (kg[1:] == kg[:-1]) & (b1[1:] == b1[:-1]) & (b2[1:] == b2[:-1])
        & entry_valid[1:] & entry_valid[:-1]])
    kept = entry_valid & ~same_key

    # dedup (kg, pt) edges among kept entries
    order2 = jnp.lexsort((pt, kg, ~kept))
    kg2, pt2, kept2 = kg[order2], pt[order2], kept[order2]
    same_edge = jnp.concatenate([
        jnp.zeros(1, bool),
        (kg2[1:] == kg2[:-1]) & (pt2[1:] == pt2[:-1])
        & kept2[1:] & kept2[:-1]])
    edge = kept2 & ~same_edge

    out_degree = jnp.zeros(n_genes, jnp.int32).at[
        jnp.where(edge, kg2, n_genes)].add(1, mode="drop")
    keep_edge = edge & (out_degree[jnp.minimum(kg2, n_genes - 1)]
                        >= out_degree[jnp.minimum(pt2, n_genes - 1)])
    partner_count = jnp.zeros(n_genes, jnp.int32).at[
        jnp.where(keep_edge, kg2, n_genes)].add(1, mode="drop")

    # per-gene chimeric-read expression counts (filter_in_vitro.cpp:48-62)
    expression = jnp.zeros(n_genes, jnp.int32).at[
        jnp.where(hits_valid, gene_hits, n_genes)].add(1, mode="drop")
    expression = jax.lax.psum(expression, "dp")

    return {
        "spliced_bp": spliced_bp, "exonic_bp": exonic_bp,
        "intronic_bp": intronic_bp, "mixed_bp": mixed_bp,
        "intragenic_dup": intragenic_dup, "intragenic_inv": intragenic_inv,
        "spliced_same": spliced_same, "spliced_diff": spliced_diff,
        "genes_with_fusions": genes_with_fusions,
        "genes_with_read_through": genes_with_read_through,
        "partner_count": partner_count,
        "expression": expression,
    }


_step_cache: Dict[Tuple[int, int, str], object] = {}


def sharded_stats_step(mesh, n_genes: int):
    """Build (and cache) the jitted shard_map stats step for `mesh`."""
    import jax
    from jax.sharding import PartitionSpec as P

    key = (id(mesh), n_genes, str(mesh.shape))
    cached = _step_cache.get(key)
    if cached is not None:
        return cached

    vec = P("dp")
    col_specs = {name: vec for name in (
        "valid", "none", "gene1", "gene2", "bp1", "bp2", "contig1",
        "contig2", "dir1", "dir2", "split", "sup", "spliced1", "spliced2",
        "exonic1", "exonic2", "dummy1", "dummy2", "index")}
    out_specs = {name: P() for name in (
        "spliced_bp", "exonic_bp", "intronic_bp", "mixed_bp",
        "intragenic_dup", "intragenic_inv", "spliced_same", "spliced_diff",
        "genes_with_fusions", "genes_with_read_through", "partner_count",
        "expression")}
    sharded = jax.shard_map(
        partial(_stats_step, n_genes), mesh=mesh,
        in_specs=(col_specs, vec, vec),
        out_specs=out_specs,
        # outputs are psum/all-gather results (replicated); the static vma
        # checker cannot prove replication through the sort/dedup chain
        check_vma=False,
    )
    step = jax.jit(sharded)
    _step_cache[key] = step
    return step


def expression_quantile_threshold(dense_counts: np.ndarray,
                                  quantile: float) -> int:
    """filter_in_vitro.cpp:63-83 from a dense per-gene count vector: sort
    genes with >=1 read by (count, gene id) ascending; threshold = count at
    floor(quantile * n). Shard-count independent because the dense vector
    is a psum."""
    nonzero = np.nonzero(dense_counts)[0]
    if len(nonzero) == 0:
        return 0
    counts = dense_counts[nonzero]
    order = np.lexsort((nonzero, counts))
    index = int(np.floor(quantile * len(nonzero)))
    if index >= len(nonzero):
        index = len(nonzero) - 1
    return int(counts[order[index]])


def candidate_cluster_inputs(fusion_list, n_dp: int
                             ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One clustering candidate row per supporting read of the fusion
    table — the raw stream fusions.cpp:203-366 aggregates. Returns
    (key_columns int32[8, N], kind int32[N], valid bool[N]) padded to a
    multiple of 8*n_dp. Merging these rows over the mesh must reproduce
    the host fusion table's per-kind support counts exactly."""
    rows = []
    for f in fusion_list:
        key = (f.gene1, f.gene2, f.contig1, f.contig2,
               f.breakpoint1, f.breakpoint2,
               int(f.direction1), int(f.direction2))
        rows.extend((key, 0) for _ in f.split_read1_list)
        rows.extend((key, 1) for _ in f.split_read2_list)
        rows.extend((key, 2) for _ in f.discordant_mate_list)
    n_cand = len(rows)
    N = -(-max(n_cand, 1) // (8 * n_dp)) * 8 * n_dp
    cols = np.zeros((8, N), np.int32)
    kind = np.zeros(N, np.int32)
    for i, (key, k) in enumerate(rows):
        cols[:, i] = key
        kind[i] = k
    valid = np.arange(N) < n_cand
    return cols, kind, valid


def build_stats_host_inputs(fusion_list, genes, gene_hits: np.ndarray,
                            n_dp: int) -> Dict[str, np.ndarray]:
    """Marshal the fusion table and read-gene incidence into the padded
    numpy arrays the sharded step consumes (row count a multiple of n_dp).
    Shared by the single-process path (compute_stats_sharded) and the
    multi-process workers (parallel/multihost.py), which ship these arrays
    to every process."""
    from ..filters.event_level import extract_fusion_columns

    host = extract_fusion_columns(fusion_list, genes)
    n_fusions = len(fusion_list)
    n_rows = max(n_dp, -(-max(n_fusions, 1) // n_dp) * n_dp)

    cols = {
        "valid": _pad_rows(np.ones(n_fusions, bool), n_rows, False),
        "none": _pad_rows(host["none"], n_rows, False) if n_fusions
        else np.zeros(n_rows, bool),
        "index": np.arange(n_rows, dtype=np.int32),
    }
    for name in ("gene1", "gene2", "bp1", "bp2", "contig1", "contig2",
                 "split", "sup"):
        cols[name] = _pad_rows(
            np.asarray(host[name] if n_fusions else np.zeros(0, np.int64),
                       np.int32), n_rows, 0)
    for name in ("dir1", "dir2", "spliced1", "spliced2", "exonic1",
                 "exonic2", "dummy1", "dummy2"):
        cols[name] = _pad_rows(
            np.asarray(host[name] if n_fusions else np.zeros(0, bool), bool),
            n_rows, False)

    n_hits = len(gene_hits)
    n_hit_rows = max(n_dp, -(-max(n_hits, 1) // n_dp) * n_dp)
    inputs = {f"col_{k}": v for k, v in cols.items()}
    inputs["hits"] = _pad_rows(np.asarray(gene_hits, np.int32), n_hit_rows, 0)
    inputs["hits_valid"] = _pad_rows(np.ones(n_hits, bool), n_hit_rows, False)
    inputs["n_genes"] = np.int64(len(genes.start))
    return inputs


def run_stats_step(mesh, inputs: Dict[str, np.ndarray], put):
    """Execute the jitted stats step over `mesh` on pre-marshalled inputs.
    `put(array)` places a host array onto the mesh with P('dp') row
    sharding — jax.device_put single-process, make_array_from_callback
    multi-process."""
    import jax

    n_genes = int(inputs["n_genes"])
    cols = {k[len("col_"):]: put(v) for k, v in inputs.items()
            if k.startswith("col_")}
    step = sharded_stats_step(mesh, n_genes)
    return jax.device_get(step(cols, put(inputs["hits"]),
                               put(inputs["hits_valid"])))


def stats_from_outputs(out, high_expression_quantile: float
                       ) -> Tuple[CascadeStats, Tuple[np.ndarray, int]]:
    """Convert the device outputs into (CascadeStats, expression pair)."""
    stats = CascadeStats(
        partner_count=np.asarray(out["partner_count"], np.int64),
        spliced_breakpoints=int(out["spliced_bp"]),
        exonic_breakpoints=int(out["exonic_bp"]),
        intronic_breakpoints=int(out["intronic_bp"]),
        exonic_intronic_breakpoints=int(out["mixed_bp"]),
        intragenic_duplications=int(out["intragenic_dup"]),
        intragenic_inversions=int(out["intragenic_inv"]),
        spliced_same_gene=int(out["spliced_same"]),
        spliced_different_genes=int(out["spliced_diff"]),
        genes_with_fusions=int(out["genes_with_fusions"]),
        genes_with_read_through=int(out["genes_with_read_through"]),
    )
    dense = np.asarray(out["expression"], np.int64)
    threshold = expression_quantile_threshold(dense,
                                              high_expression_quantile)
    return stats, (dense, threshold)


def compute_stats_sharded(fusion_list, genes, gene_hits: np.ndarray,
                          high_expression_quantile: float, mesh
                          ) -> Tuple[CascadeStats, Tuple[np.ndarray, int]]:
    """Run the sharded reduction over `mesh` and return
    (CascadeStats, (dense expression counts, high-expression threshold)).

    Bit-identical to the host passes (event_level.compute_cascade_stats,
    in_vitro.find_top_expressed_genes) for every shard count: all reduced
    quantities are integers combined with associative integer reductions.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    inputs = build_stats_host_inputs(fusion_list, genes, gene_hits,
                                     mesh.devices.size)
    vec = NamedSharding(mesh, P("dp"))
    out = run_stats_step(mesh, inputs,
                         lambda array: jax.device_put(array, vec))
    return stats_from_outputs(out, high_expression_quantile)
