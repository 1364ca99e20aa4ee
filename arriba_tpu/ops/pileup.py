"""Device pileup consensus: per-position base histograms as segment ops.

The reference assembles each fusion transcript by piling supporting reads
into per-position base-frequency maps and taking a 75 %-majority consensus
(output_fusions.cpp:25-240). The host implementation in output/writer.py is
the byte-exact oracle; this module is the batched device reformulation:
scatter-add one-hot base codes into a [n_fusions, window, n_symbols]
histogram, then reduce to the consensus per column — the shape XLA lowers
to vectorized segment sums on the VPU.

Symbols: 0-3 = T/G/C/A-style 2-bit codes (encode.KMER_CODE_LUT), 4 = PAD,
5 = deletion, 6 = intron. Insertions (multi-base keys) stay host-side — they
are rare and inherently ragged.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .encode import PAD_CODE

N_SYMBOLS = 7
SYMBOL_DELETION = 5
SYMBOL_INTRON = 6


def _histogram(codes, positions, fusion_ids, n_fusions: int, window: int):
    """Scatter-add base observations ([M] symbol / column / row) into
    [n_fusions, window, N_SYMBOLS] histograms; out-of-window or invalid
    observations are dropped."""
    valid = (positions >= 0) & (positions < window) & (codes < N_SYMBOLS)
    flat_index = (fusion_ids * window + positions) * N_SYMBOLS + codes
    flat_index = jnp.where(valid, flat_index, 0)
    updates = valid.astype(jnp.int32)
    histogram = jnp.zeros(n_fusions * window * N_SYMBOLS, jnp.int32)
    # invalid observations scatter a zero update to slot 0 (no effect)
    histogram = histogram.at[flat_index].add(updates)
    return histogram.reshape(n_fusions, window, N_SYMBOLS)


@functools.partial(jax.jit, static_argnames=("n_rows", "window"))
def pileup_histogram(codes: jnp.ndarray, positions: jnp.ndarray,
                     row_ids: jnp.ndarray, n_rows: int,
                     window: int) -> jnp.ndarray:
    """Batched per-position symbol counts: the segment-op core shared by
    pileup_consensus, exposed for the writer's device path
    (output/writer.py build_device_pileups) — the host keeps the reference's
    exact consensus/trimming semantics and consumes these integer counts
    in place of its per-base dict increments."""
    return _histogram(codes, positions, row_ids, n_rows, window)


@functools.partial(jax.jit, static_argnames=("n_fusions", "window",
                                             "majority_fraction"))
def pileup_consensus(codes: jnp.ndarray, positions: jnp.ndarray,
                     fusion_ids: jnp.ndarray, n_fusions: int, window: int,
                     majority_fraction: float = 0.75
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched majority consensus over scattered base observations.

    Returns (consensus [n_fusions, window] symbol or PAD_CODE where no
    coverage, confident [n_fusions, window] bool per the 75 % rule,
    coverage [n_fusions, window] non-intron observation counts).
    """
    histogram = _histogram(codes, positions, fusion_ids, n_fusions, window)
    base_counts = histogram[:, :, :SYMBOL_DELETION + 1]
    coverage = jnp.sum(base_counts, axis=-1)
    best_symbol = jnp.argmax(histogram, axis=-1)
    best_count = jnp.max(histogram, axis=-1)
    confident = (best_count >= majority_fraction * coverage) & (coverage > 0)
    consensus = jnp.where(coverage + histogram[:, :, SYMBOL_INTRON] > 0,
                          best_symbol, PAD_CODE)
    return consensus.astype(jnp.uint8), confident, coverage
