"""Batched realignment scoring: the TPU reformulation of filter_mismappers.

The reference re-aligns each clipped segment / discordant mate against the
partner gene with a recursive 8-mer-seeded seed-and-extend aligner
(filter_mismappers.cpp:86-230). That recursion is inherently data-dependent;
the TPU path splits it into two fixed-shape stages over (read, window) pairs:

1. `shared_kmer_mask` — a *sound prefilter*: align() can only accept a read
   if at least one 8-mer of the read occurs in the padded gene window
   (the seed lookup at filter_mismappers.cpp:97-99). Rows without a shared
   8-mer are definitively rejected without any DP.
2. `smith_waterman_scores` — banded-free local alignment over the surviving
   pairs via an anti-diagonal wavefront (match +1, mismatch/gap -1, floor 0),
   vectorized over the batch on the VPU; a Pallas kernel keeps the two
   carry diagonals in VMEM for the TPU path.

The exact accept/reject decision of the reference (including splice-site
recursion) stays with the host oracle in filters/mismappers.py; under
ARRIBA_TPU_DEVICE=1 filter_mismappers batches its candidate (read, window)
pairs through `screen_pairs` below, so the recursion only runs on pairs
that can possibly pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .encode import PAD_CODE

SEED_KMER_LENGTH = 8  # arriba.cpp:549


def _packed_kmers(codes: jnp.ndarray, k: int) -> jnp.ndarray:
    """[N, L] 2-bit-packable codes -> [N, L] k-mer values (positions whose
    k-mer would run off the end or cover PAD yield -1)."""
    clamped = jnp.minimum(codes, 3).astype(jnp.int32)
    values = jnp.zeros_like(clamped)
    any_pad = jnp.zeros(codes.shape, bool)
    for j in range(k):
        shifted = jnp.roll(codes, -j, axis=1)
        values = (values << 2) | jnp.minimum(shifted, 3).astype(jnp.int32)
        any_pad = any_pad | (shifted == PAD_CODE)
    L = codes.shape[1]
    in_range = jnp.arange(L)[None, :] <= L - k
    return jnp.where(in_range & ~any_pad, values, -1)


def shared_kmer_mask(reads: jnp.ndarray, windows: jnp.ndarray,
                     k: int = SEED_KMER_LENGTH) -> jnp.ndarray:
    """[N] bool: does any k-mer of read n occur in window n?

    Sorted-membership formulation: sort the window k-mer values per row,
    then searchsorted the read k-mers — O(L log W) comparisons per row,
    all dense and batched.
    """
    read_kmers = _packed_kmers(reads, k)            # [N, L]
    window_kmers = jnp.sort(_packed_kmers(windows, k), axis=1)  # [N, W]

    idx = jax.vmap(jnp.searchsorted)(window_kmers, read_kmers)  # [N, L]
    idx = jnp.minimum(idx, window_kmers.shape[1] - 1)
    found = jnp.take_along_axis(window_kmers, idx, axis=1) == read_kmers
    return jnp.any(found & (read_kmers >= 0), axis=1)


def smith_waterman_scores(reads: jnp.ndarray, windows: jnp.ndarray,
                          match: int = 1, mismatch: int = -1,
                          gap: int = -1) -> jnp.ndarray:
    """Best local-alignment score per (read, window) row via anti-diagonal
    wavefront: L+W-1 steps, each a [N, L] VPU op; carries are the two
    previous diagonals."""
    n, L = reads.shape
    W = windows.shape[1]
    # reversed+padded windows so diagonal d reads wrev[:, W-1-d : W-1-d+L]
    wrev = jnp.flip(windows, axis=1)
    wrev = jnp.pad(wrev, ((0, 0), (L, L)), constant_values=PAD_CODE)

    read_valid = reads != PAD_CODE
    neg_inf = jnp.int32(-(2 ** 20))

    def body(d, state):
        h_prev, h_prev2, best = state                      # [N, L], [N, L], [N]
        window_diag = jax.lax.dynamic_slice(
            wrev, (0, W - 1 - d + L), (n, L))              # [N, L]: windows[d - i]
        substitution = jnp.where(reads == window_diag, match, mismatch)
        valid = (read_valid & (window_diag != PAD_CODE))
        # shift previous diagonals by one read position for the i-1 terms
        h_prev_shift = jnp.pad(h_prev, ((0, 0), (1, 0)))[:, :L]
        h_prev2_shift = jnp.pad(h_prev2, ((0, 0), (1, 0)))[:, :L]
        h = jnp.maximum(
            jnp.maximum(h_prev2_shift + substitution, 0),
            jnp.maximum(h_prev_shift + gap, h_prev + gap))
        h = jnp.where(valid, h, 0)
        best = jnp.maximum(best, jnp.max(h, axis=1))
        return h, h_prev, best

    # input-derived zeros keep the carry device-varying under shard_map
    zeros = (reads * 0).astype(jnp.int32)
    _, _, best = jax.lax.fori_loop(
        0, L + W - 1, body, (zeros, zeros, (reads[:, 0] * 0).astype(jnp.int32)))
    return best


def smith_waterman_scores_pallas(reads: jnp.ndarray, windows: jnp.ndarray,
                                 match: int = 1, mismatch: int = -1,
                                 gap: int = -1, block_n: int = 256,
                                 interpret: bool = False) -> jnp.ndarray:
    """Pallas version of the wavefront: one grid step per block of reads;
    the carry diagonals and the running best live in VMEM scratch so the
    whole DP runs without HBM round-trips.

    The window diagonal is maintained as a SHIFT REGISTER: at step d the
    register holds window_diag_d[i] = windows[d - i], and step d+1 rotates
    it one lane and injects windows[d + 1] at lane 0. Window elements are
    consumed sequentially from 128-aligned block loads (Mosaic cannot
    prove alignment of the per-diagonal dynamic slice the previous version
    used — it failed to compile on real TPU hardware; caught in round 3)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, L = reads.shape
    W = windows.shape[1]
    n_steps = L + W - 1
    n_wblocks = (n_steps + 127) // 128
    padded_w = n_wblocks * 128
    windows_padded = jnp.pad(windows, ((0, 0), (0, padded_w - W)),
                             constant_values=PAD_CODE)

    def kernel(reads_ref, windows_ref, out_ref, h_prev, h_prev2, best, wd):
        h_prev[:] = jnp.zeros((block_n, L), jnp.int32)
        h_prev2[:] = jnp.zeros((block_n, L), jnp.int32)
        best[:] = jnp.zeros((block_n, L), jnp.int32)
        wd[:] = jnp.full((block_n, L), PAD_CODE, jnp.int32)
        read_block = reads_ref[:].astype(jnp.int32)
        read_valid = read_block != PAD_CODE
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (block_n, 128), 1)
        lane_l = jax.lax.broadcasted_iota(jnp.int32, (block_n, L), 1)

        def outer(b, _):
            wblock = windows_ref[:, pl.ds(pl.multiple_of(b * 128, 128),
                                          128)].astype(jnp.int32)

            def inner(s, _):
                # inject windows[b*128 + s] at lane 0 of the rotated register
                elem = jnp.sum(jnp.where(lane128 == s, wblock, 0),
                               axis=1, keepdims=True)       # [bn, 1]
                rotated = pltpu.roll(wd[:], 1, 1)
                window_diag = jnp.where(lane_l == 0, elem, rotated)
                wd[:] = window_diag
                substitution = jnp.where(read_block == window_diag,
                                         match, mismatch)
                valid = read_valid & (window_diag != PAD_CODE)
                # h_prev holds h_{d-1}; h_prev2 holds roll(h_{d-2}) with
                # lane 0 already zeroed, so only ONE fresh roll per step
                hp = h_prev[:]
                hp2_shift = h_prev2[:]
                hp_shift = jnp.where(lane_l == 0, 0, pltpu.roll(hp, 1, 1))
                h = jnp.maximum(
                    jnp.maximum(hp2_shift + substitution, 0),
                    jnp.maximum(hp_shift + gap, hp + gap))
                h = jnp.where(valid, h, 0)
                h_prev2[:] = hp_shift
                h_prev[:] = h
                best[:] = jnp.maximum(best[:], h)
                return 0

            # full blocks: steps past n_steps only feed PAD elements, which
            # decode as invalid columns and leave the DP and best unchanged
            jax.lax.fori_loop(0, 128, inner, 0)
            return 0

        jax.lax.fori_loop(0, n_wblocks, outer, 0)
        out_ref[:] = jnp.broadcast_to(jnp.max(best[:], axis=1, keepdims=True),
                                      (block_n, 128))

    grid = ((n + block_n - 1) // block_n,)
    result = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, padded_w), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_n, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 128), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((block_n, L), jnp.int32),
            pltpu.VMEM((block_n, L), jnp.int32),
            pltpu.VMEM((block_n, L), jnp.int32),
            pltpu.VMEM((block_n, L), jnp.int32),
        ],
        interpret=interpret,
    )(reads, windows_padded)
    return result[:, 0]


@functools.partial(jax.jit, static_argnames=("min_score_fraction",))
def realign_step(reads: jnp.ndarray, windows: jnp.ndarray, length: jnp.ndarray,
                 min_score_fraction: float = 0.8):
    """The fused prefilter+scoring step for a batch of (read, window) pairs:
    returns per-row seed hits, SW scores, and whether the row can possibly
    be accepted by the reference aligner (seed present AND local score
    >= min_align_fraction * read length)."""
    seeds = shared_kmer_mask(reads, windows)
    scores = smith_waterman_scores(reads, windows)
    min_score = (min_score_fraction * length.astype(jnp.float32) + 0.5).astype(jnp.int32)
    can_align = seeds & (scores >= min_score)
    return {"seed_hit": seeds, "sw_score": scores, "can_align": can_align}


# ---------------------------------------------------------------------------
# host-facing batching for the mismappers prefilter (filters/mismappers.py)

# native kmer semantics (filter_mismappers.cpp:33-45): T=0, G=1, C=2,
# everything else (incl. A and N) = 3 — so device read k-mers are a superset
# of the native seed lookups and window k-mers a superset of the native
# index (which drops N-start positions): the screen can only err permissive.
_SCREEN_LUT = np.full(256, 3, np.uint8)
_SCREEN_LUT[ord("T")] = 0
_SCREEN_LUT[ord("G")] = 1
_SCREEN_LUT[ord("C")] = 2

# codes of the reverse complement must match _SCREEN_LUT applied to
# reverse_complement_str(seq): complement the CHARACTER first (N stays N and
# keeps code 3; a bare `code ^ 3` would wrongly send N -> code 0).
from ..seq import COMPLEMENT_LUT as _COMPLEMENT_LUT  # noqa: E402

_SCREEN_RC_LUT = _SCREEN_LUT[_COMPLEMENT_LUT]


@functools.partial(jax.jit, static_argnames=())
def _screen_kernel(reads: jnp.ndarray, windows: jnp.ndarray) -> jnp.ndarray:
    return shared_kmer_mask(reads, windows)


def screen_pairs(read_seqs, window_views, window_chunk: int = 2048,
                 batch_rows: int = 2048) -> np.ndarray:
    """[n] bool per (read, window) pair: the pair shares an 8-mer in either
    read orientation (a sound prefilter for the reference aligner — a pair
    without a shared seed can never be accepted by align()).

    Only the seed criterion is used for the production screen: the SW score
    (smith_waterman_scores) is NOT a sound upper bound on the reference's
    accept score, because align() grants free gaps at splice sites / on its
    single-deletion recursion and double credit when re-covering skipped
    leading bases (filter_mismappers.cpp:117-170), so a plain -1-gap local
    alignment can score below min_score for a read the recursion accepts.

    read_seqs: list of str (the sequences align_both_strands would try);
    window_views: list of uint8 numpy views into the assembly (the padded
    gene windows). Long windows are split into overlapping chunks so rows
    stay fixed-shape for the device.
    """
    n = len(read_seqs)
    if n == 0:
        return np.zeros(0, bool)
    k = SEED_KMER_LENGTH
    max_read = max(len(seq) for seq in read_seqs)
    # bucket the row length so repeat calls reuse the jit cache
    L = -(-max(k, max_read) // 64) * 64

    rows_reads = []
    rows_windows = []
    row_pair = []
    for i, (seq, window) in enumerate(zip(read_seqs, window_views)):
        raw = np.frombuffer(seq.encode("latin-1"), np.uint8)
        codes = _SCREEN_LUT[raw]
        fwd = np.full(L, PAD_CODE, np.uint8)
        fwd[:len(codes)] = codes
        rc = np.full(L, PAD_CODE, np.uint8)
        rc[:len(codes)] = _SCREEN_RC_LUT[raw[::-1]]
        for start in range(0, max(1, len(window)), window_chunk - (k - 1)):
            chunk = window[start:start + window_chunk]
            if len(chunk) < k:
                if start > 0:
                    break
            padded = np.full(window_chunk, PAD_CODE, np.uint8)
            padded[:len(chunk)] = _SCREEN_LUT[chunk]
            rows_reads.append(fwd)
            rows_windows.append(padded)
            row_pair.append(i)
            rows_reads.append(rc)
            rows_windows.append(padded)
            row_pair.append(i)
            if start + window_chunk >= len(window):
                break

    result = np.zeros(n, bool)
    row_pair_arr = np.asarray(row_pair, np.int64)
    for base in range(0, len(rows_reads), batch_rows):
        chunk_reads = rows_reads[base:base + batch_rows]
        chunk_windows = rows_windows[base:base + batch_rows]
        rows = len(chunk_reads)
        # pad the trailing batch to a fixed shape (PAD rows screen to False)
        if rows < batch_rows and base > 0:
            pad = batch_rows - rows
            chunk_reads = chunk_reads + [np.full(L, PAD_CODE, np.uint8)] * pad
            chunk_windows = (chunk_windows
                             + [np.full(window_chunk, PAD_CODE, np.uint8)] * pad)
        hits = np.asarray(_screen_kernel(jnp.asarray(np.stack(chunk_reads)),
                                         jnp.asarray(np.stack(chunk_windows))))[:rows]
        np.logical_or.at(result, row_pair_arr[base:base + rows], hits)
    return result
