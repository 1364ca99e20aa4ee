"""Data-parallel execution over a device mesh.

The reference is single-threaded (SURVEY §2.7); parallelism is a new
first-class component here. The natural axis for a post-aligner is DP over
reads: per-read filter stages are embarrassingly parallel, while the
cascade's global statistics (mapped-read scaling for the e-value model,
expression quantiles, coverage) are cross-shard reductions — expressed as
psum over the mesh so XLA lowers them to ICI all-reduces.

Shardings are set up so collectives ride ICI: reads are sharded on the
leading batch axis ('dp'); annotation arrays and thresholds are replicated.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import readfilters, realign
from ..ops.encode import ReadBatch, round_up


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    """1-D device mesh over the read/data-parallel axis."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def shard_batch(batch: ReadBatch, mesh: Mesh) -> ReadBatch:
    """Pad the row axis to the mesh size and device_put with row sharding."""
    n_dp = mesh.devices.size
    N = round_up(batch.bases.shape[0], n_dp * 8)

    def pad_rows(array: np.ndarray, fill) -> np.ndarray:
        if array.shape[0] == N:
            return array
        widths = [(0, N - array.shape[0])] + [(0, 0)] * (array.ndim - 1)
        return np.pad(array, widths, constant_values=fill)

    row_sharding = NamedSharding(mesh, P("dp"))
    row2d_sharding = NamedSharding(mesh, P("dp", None))
    from ..ops.encode import PAD_CODE
    return ReadBatch(
        bases=jax.device_put(pad_rows(batch.bases, PAD_CODE), row2d_sharding),
        ref=jax.device_put(pad_rows(batch.ref, PAD_CODE), row2d_sharding),
        match_mask=jax.device_put(pad_rows(batch.match_mask, False), row2d_sharding),
        length=jax.device_put(pad_rows(batch.length, 0), row_sharding),
        aligned_start=jax.device_put(pad_rows(batch.aligned_start, 0), row_sharding),
        aligned_end=jax.device_put(pad_rows(batch.aligned_end, 0), row_sharding),
        n_reads=batch.n_reads,
    )


def sharded_read_filter_step(mesh: Mesh, mismatch_probability: float = 0.01,
                             pvalue_cutoff: float = 0.01,
                             kmer_content: float = 0.6):
    """Build the jitted DP filter step for `mesh`: per-read filter stats
    computed shard-locally, global statistics (total mismatches / aligned
    bases / discard counts) all-reduced over ICI.

    Returns a function (bases, ref, match_mask, length, aligned_start,
    aligned_end, extra_mismatches) -> (per_read dict, globals dict).
    """

    def step(bases, ref, match_mask, length, aligned_start, aligned_end,
             extra_mismatches):
        per_read = readfilters.read_filter_step(
            bases, ref, match_mask, length, aligned_start, aligned_end,
            extra_mismatches, mismatch_probability=mismatch_probability,
            pvalue_cutoff=pvalue_cutoff, kmer_content=kmer_content)
        # cross-shard reductions: the DP analog of the reference's global
        # counters (mapped_reads scaling filter_relative_support.cpp:140-143)
        valid = length > 0
        globals_ = {
            "total_reads": jax.lax.psum(jnp.sum(valid), "dp"),
            "total_mismatches": jax.lax.psum(
                jnp.sum(jnp.where(valid, per_read["mismatches"], 0)), "dp"),
            "total_aligned": jax.lax.psum(
                jnp.sum(jnp.where(valid, per_read["alignment_length"], 0)), "dp"),
            "discarded_mismatch": jax.lax.psum(
                jnp.sum(per_read["mismatch_discard"] & valid), "dp"),
            "discarded_entropy": jax.lax.psum(
                jnp.sum(per_read["low_entropy_discard"] & valid), "dp"),
        }
        return per_read, globals_

    row = P("dp", None)
    vec = P("dp")
    sharded = jax.shard_map(
        step, mesh=mesh,
        in_specs=(row, row, row, vec, vec, vec, vec),
        out_specs=({"mismatches": vec, "alignment_length": vec, "pvalue": vec,
                    "mismatch_discard": vec, "low_entropy_discard": vec},
                   {"total_reads": P(), "total_mismatches": P(),
                    "total_aligned": P(), "discarded_mismatch": P(),
                    "discarded_entropy": P()}),
    )
    return jax.jit(sharded)


def sharded_realign_step(mesh: Mesh, min_score_fraction: float = 0.8):
    """DP-sharded realignment prefilter+scoring step: each shard runs the
    seed test and wavefront SW on its rows; the global accept count is
    psum'd (the reference's count_mismappers tally,
    filter_mismappers.cpp:338-356)."""

    def step(reads, windows, length):
        result = realign.realign_step(reads, windows, length,
                                      min_score_fraction=min_score_fraction)
        total_alignable = jax.lax.psum(jnp.sum(result["can_align"]), "dp")
        return result, total_alignable

    row = P("dp", None)
    vec = P("dp")
    sharded = jax.shard_map(
        step, mesh=mesh,
        in_specs=(row, row, vec),
        out_specs=({"seed_hit": vec, "sw_score": vec, "can_align": vec}, P()),
    )
    return jax.jit(sharded)


def sharded_cluster_step(mesh: Mesh):
    """Distributed fusion-candidate clustering: each shard aggregates its
    candidates locally (sort + segment-reduce, ops/cluster.py), the compact
    per-shard cluster tables are all-gathered over ICI, and a second
    aggregation pass merges them — the DP analog of merging per-host fusion
    candidate tables before the global cascade stages (SURVEY §2.7;
    fusions.cpp:203-366 is the single-threaded original).

    Returns a jitted function (words tuple, kind, valid) -> global cluster
    dict (replicated on every device).
    """
    from ..ops import cluster

    def step(words, kind, valid):
        local = cluster.cluster_candidates(words, kind, valid)
        # compact per-shard tables -> every device, then merge. The gathered
        # arrays are small (clusters, not candidates), so the all-gather is
        # cheap relative to re-sorting raw candidates globally.
        gathered_words = tuple(
            jax.lax.all_gather(word, "dp", tiled=True)
            for word in local["words"])
        gathered_valid = jax.lax.all_gather(local["cluster_valid"], "dp",
                                            tiled=True)
        gathered_support = jax.lax.all_gather(local["support"], "dp",
                                              tiled=True)
        merged = cluster.merge_cluster_tables(gathered_words, gathered_support,
                                              gathered_valid)
        return merged

    vec = P("dp")
    out_rep = {"words": (P(), P(), P(), P(), P(), P()), "support": P(),
               "cluster_valid": P(), "n_clusters": P()}
    sharded = jax.shard_map(
        step, mesh=mesh,
        in_specs=((vec, vec, vec, vec, vec, vec), vec, vec),
        out_specs=out_rep,
        # outputs mix all-gathered (replicated) data with shard-invariant
        # constants; the static vma checker cannot prove replication here
        check_vma=False,
    )
    return jax.jit(sharded)
