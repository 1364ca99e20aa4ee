"""Batched device implementations of the per-read filter math.

These are the embarrassingly-parallel-over-reads stages of the cascade
(SURVEY §2.7): mismatch counting + binomial test (filter_mismatches.cpp),
recurrent k-mer content (filter_low_entropy.cpp:77-100), and homopolymer
runs (filter_homopolymer.cpp:38-52), reformulated as fixed-shape masked
array ops over a ReadBatch. jnp element-wise ops map onto the VPU; the
greedy k-mer selection scan carries two bits of per-row state through a
chunked scan (sequential depth ~chunk + n_chunks instead of L), and the
per-k-mer counters come from chunked one-hot reductions.

The host implementations in filters/read_level.py are the semantic oracle;
tests/test_device_ops.py checks agreement.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .encode import PAD_CODE

KMER_LENGTH = 3          # filter_low_entropy k (arriba.cpp:408)
N_KMERS = 4 ** KMER_LENGTH


def count_mismatches_batch(bases: jnp.ndarray, ref: jnp.ndarray,
                           match_mask: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Vectorized core of count_mismatches (filter_mismatches.cpp:12-53):
    returns (mismatches, alignment_length) per read over the M/=/X positions.
    Positions where the read base is PAD/N are excluded like the reference's
    'N' exclusion."""
    valid = match_mask & (bases != PAD_CODE) & (ref != PAD_CODE)
    mismatches = jnp.sum(valid & (bases != ref), axis=1, dtype=jnp.int32)
    alignment_length = jnp.sum(valid, axis=1, dtype=jnp.int32)
    return mismatches, alignment_length


def binomial_pvalue(mismatches: jnp.ndarray, alignment_length: jnp.ndarray,
                    mismatch_probability: float) -> jnp.ndarray:
    """Point binomial probability C(n,k) p^k (1-p)^(n-k), the reference's
    test statistic (filter_mismatches.cpp:66-79), via log-gamma."""
    n = alignment_length.astype(jnp.float32)
    k = mismatches.astype(jnp.float32)
    log_choose = (jax.lax.lgamma(n + 1) - jax.lax.lgamma(k + 1)
                  - jax.lax.lgamma(n - k + 1))
    log_p = (log_choose + k * jnp.log(mismatch_probability)
             + (n - k) * jnp.log1p(-mismatch_probability))
    return jnp.exp(log_p)


@functools.partial(jax.jit, static_argnames=("mismatch_probability",
                                              "pvalue_cutoff"))
def mismatch_filter_batch(bases: jnp.ndarray, ref: jnp.ndarray,
                          match_mask: jnp.ndarray, extra_mismatches: jnp.ndarray,
                          mismatch_probability: float,
                          pvalue_cutoff: float) -> jnp.ndarray:
    """Per-read discard mask for the mismatches filter's binomial branch."""
    mismatches, alignment_length = count_mismatches_batch(bases, ref, match_mask)
    mismatches = mismatches + extra_mismatches
    pvalue = binomial_pvalue(mismatches, alignment_length, mismatch_probability)
    return pvalue < pvalue_cutoff


def _kmer_values(bases: jnp.ndarray) -> jnp.ndarray:
    """[N, L] -> [N, L] 2-bit-packed 3-mer values starting at each position
    (clamping non-ACGT codes to 3 like kmer_to_int's default branch)."""
    codes = jnp.minimum(bases, 3).astype(jnp.int32)
    c0 = codes
    c1 = jnp.roll(codes, -1, axis=1)
    c2 = jnp.roll(codes, -2, axis=1)
    return (c0 << 4) | (c1 << 2) | c2


def low_entropy_batch(bases: jnp.ndarray, length: jnp.ndarray,
                      aligned_start1: jnp.ndarray, aligned_end1: jnp.ndarray,
                      aligned_start2: jnp.ndarray, aligned_end2: jnp.ndarray,
                      kmer_content: float) -> jnp.ndarray:
    """Host wrapper: the reference's float32 threshold arithmetic is
    computed in numpy (bit-exact float32 — XLA fusion may contract the
    multiply/divide differently at the rounding boundary) and handed to the
    jitted core as arrays."""
    import numpy as _np

    def _threshold(segment_length):
        seg = _np.asarray(segment_length)
        q = (seg.astype(_np.float32) * _np.float32(kmer_content)) \
            / _np.float32(KMER_LENGTH)
        base = _np.floor(q)
        t = (base + (q - base >= _np.float32(0.5))).astype(_np.int32)
        return _np.where(_np.asarray(seg) < 0, _np.int32(1) << 30, t)

    th_all = _threshold(length)
    th_a1 = _threshold(_np.asarray(aligned_end1) - _np.asarray(aligned_start1))
    th_a2 = _threshold(_np.asarray(aligned_end2) - _np.asarray(aligned_start2))
    return _low_entropy_core(bases, jnp.asarray(_np.asarray(length)),
                             jnp.asarray(_np.asarray(aligned_start1)),
                             jnp.asarray(_np.asarray(aligned_end1)),
                             jnp.asarray(_np.asarray(aligned_start2)),
                             jnp.asarray(_np.asarray(aligned_end2)),
                             jnp.asarray(th_all), jnp.asarray(th_a1),
                             jnp.asarray(th_a2))


def low_entropy_batch_chunked(codes, lengths, a1s, a1e, a2s, a2e,
                              kmer_content: float, chunk_rows: int = 131072):
    """Dispatch low_entropy_batch in fixed-size row chunks (last chunk
    zero-padded): one compiled executable shape regardless of batch size,
    so cold-compile cost is paid once and transfers pipeline. Padded rows
    have length 0 and can never flag."""
    import numpy as _np

    n = len(lengths)
    if n == 0:
        return _np.zeros(0, bool)
    if n <= chunk_rows:
        chunk_rows = n  # small batches keep their natural shape
    out = _np.zeros(n, bool)
    for lo in range(0, n, chunk_rows):
        hi = min(n, lo + chunk_rows)
        if hi - lo == chunk_rows:
            c, ln = codes[lo:hi], lengths[lo:hi]
            w = (a1s[lo:hi], a1e[lo:hi], a2s[lo:hi], a2e[lo:hi])
        else:
            pad = chunk_rows - (hi - lo)
            c = _np.concatenate(
                [codes[lo:hi],
                 _np.full((pad, codes.shape[1]), 3, codes.dtype)])
            ln = _np.concatenate([lengths[lo:hi],
                                  _np.zeros(pad, lengths.dtype)])
            w = tuple(_np.concatenate([arr[lo:hi],
                                       _np.zeros(pad, arr.dtype)])
                      for arr in (a1s, a1e, a2s, a2e))
        # 2-bit-pack the code matrix for transfer (4 bases/byte): through a
        # remote tunnel the host->device copy is the dominant per-dispatch
        # cost; the device unpacks with two vector ops. Codes > 3 (PAD/N)
        # clamp to 3 — exactly what the kmer recurrence does anyway.
        L = c.shape[1]
        L4 = (L + 3) // 4 * 4
        cp = _np.empty((c.shape[0], L4), _np.uint8)
        _np.minimum(c, 3, out=cp[:, :L])
        cp[:, L:] = 3
        packed = (cp[:, 0::4] | (cp[:, 1::4] << 2) | (cp[:, 2::4] << 4)
                  | (cp[:, 3::4] << 6))
        flags = _np.asarray(_low_entropy_batch_packed(
            jnp.asarray(packed), L, jnp.asarray(ln), jnp.asarray(w[0]),
            jnp.asarray(w[1]), jnp.asarray(w[2]), jnp.asarray(w[3]),
            kmer_content))
        out[lo:hi] = flags[:hi - lo]
    return out


def _low_entropy_batch_packed(packed, L: int, length, a1s, a1e, a2s, a2e,
                              kmer_content: float):
    """low_entropy_batch over a 2-bit-packed code matrix: unpack on device
    (shifts + interleave), then run the identical recurrence."""
    import numpy as _np

    def _threshold(segment_length):
        seg = _np.asarray(segment_length)
        q = (seg.astype(_np.float32) * _np.float32(kmer_content)) \
            / _np.float32(KMER_LENGTH)
        base = _np.floor(q)
        t = (base + (q - base >= _np.float32(0.5))).astype(_np.int32)
        return _np.where(_np.asarray(seg) < 0, _np.int32(1) << 30, t)

    th_all = _threshold(length)
    th_a1 = _threshold(_np.asarray(a1e) - _np.asarray(a1s))
    th_a2 = _threshold(_np.asarray(a2e) - _np.asarray(a2s))
    return _low_entropy_core_packed(
        packed, L, jnp.asarray(_np.asarray(length)),
        jnp.asarray(_np.asarray(a1s)), jnp.asarray(_np.asarray(a1e)),
        jnp.asarray(_np.asarray(a2s)), jnp.asarray(_np.asarray(a2e)),
        jnp.asarray(th_all), jnp.asarray(th_a1), jnp.asarray(th_a2))


@functools.partial(jax.jit, static_argnames=("L",))
def _low_entropy_core_packed(packed, L, length, a1s, a1e, a2s, a2e,
                             th_all, th_a1, th_a2):
    quarters = jnp.stack([(packed >> 0) & 3, (packed >> 2) & 3,
                          (packed >> 4) & 3, (packed >> 6) & 3],
                         axis=2)                       # [N, L4/4, 4]
    bases = quarters.reshape(packed.shape[0], -1)[:, :L].astype(jnp.uint8)
    return _low_entropy_core(bases, length, a1s, a1e, a2s, a2e, th_all,
                             th_a1, th_a2)


def _low_entropy_thresholds_traced(length, a1s, a1e, a2s, a2e,
                                   kmer_content: float):
    """In-graph float32 threshold math for traced callers
    (read_filter_step); the stand-alone wrapper computes these on the host
    for bit-exact float32 at the rounding boundary."""
    def threshold(segment_length):
        q = (segment_length.astype(jnp.float32)
             * jnp.float32(kmer_content)) / jnp.float32(KMER_LENGTH)
        base = jnp.floor(q)
        t = (base + (q - base >= jnp.float32(0.5))).astype(jnp.int32)
        return jnp.where(segment_length < 0, jnp.int32(1) << 30, t)

    return threshold(length), threshold(a1e - a1s), threshold(a2e - a2s)


@jax.jit
def _low_entropy_core(bases: jnp.ndarray, length: jnp.ndarray,
                      aligned_start1: jnp.ndarray, aligned_end1: jnp.ndarray,
                      aligned_start2: jnp.ndarray, aligned_end2: jnp.ndarray,
                      th_all: jnp.ndarray, th_a1: jnp.ndarray,
                      th_a2: jnp.ndarray) -> jnp.ndarray:
    """filter_low_entropy.cpp:60-100 vectorized: per read, does any 3-mer
    recur (non-overlapping) often enough to cover >= kmer_content of the
    read or of either aligned segment?

    The reference's greedy non-overlapping selection has a key property for
    K=3: whether position p is selected depends only on whether the SAME
    k-mer was selected at p-1 or p-2. Selection therefore carries two bits
    of state (selected at p-1, selected at p) through the read — computed
    here as an ASSOCIATIVE scan over per-position 4-state transition tables
    (each table packed as 4 x 2 bits of one int32), so the whole selection
    is O(log L) depth of dense [N, L] int32 ops with perfect (8, 128)
    tiling, followed by chunked one-hot reductions into [N, 64] per-k-mer
    counters. The early-exit check of the reference is
    monotone in the counters, so evaluating it on the final counters
    (restricted to k-mers counted at least once) is equivalent.
    """
    assert KMER_LENGTH == 3
    n_reads, L = bases.shape
    kmer_values = _kmer_values(bases)

    # thresholds with the reference's exact types
    # (filter_low_entropy.cpp:67-69): float32 product/quotient, +0.5 in
    # double, truncation — computed as floor(q) + (frac(q) >= 0.5), which
    # is exact for float32 q without needing f64 on device; inverted
    # windows (end < start) get a huge threshold (the reference converts
    # the negative product to unsigned and never filters)
    positions = jnp.arange(L, dtype=jnp.int32)[None, :]            # [1, L]
    eligible = positions < (length - KMER_LENGTH)[:, None]         # [N, L]
    false_col = jnp.zeros((n_reads, 1), jnp.bool_) & (length[:, None] < 0)
    same1 = jnp.concatenate(
        [false_col, kmer_values[:, 1:] == kmer_values[:, :-1]], axis=1)
    same2 = jnp.concatenate(
        [false_col, false_col, kmer_values[:, 2:] == kmer_values[:, :-2]],
        axis=1)

    # per-position transition table over state s = (sel[p-2] << 1) | sel[p-1]:
    # new bit nb(s) = eligible & !(sel[p-1] & same1) & !(sel[p-2] & same2),
    # next state = ((s & 1) << 1) | nb(s). Entry s lives at bits [2s+1 : 2s].
    e = eligible.astype(jnp.int32)
    ns1 = (~same1).astype(jnp.int32)
    ns2 = (~same2).astype(jnp.int32)
    nb0 = e                      # s=0: no neighbor selected
    nb1 = e & ns1                # s=1: sel[p-1]
    nb2 = e & ns2                # s=2: sel[p-2]
    nb3 = e & ns1 & ns2          # s=3: both
    tables = (nb0 | ((2 | nb1) << 2) | (nb2 << 4) | ((2 | nb3) << 6))

    def compose(f, g):
        """(g o f): entrywise table lookup, vectorized over [N, L] int32."""
        out = jnp.zeros_like(f)
        for s in range(4):
            fs = (f >> (2 * s)) & 3
            gs = (g >> (fs << 1)) & 3
            out = out | (gs << (2 * s))
        return out

    prefix = jax.lax.associative_scan(compose, tables, axis=1)
    # initial state 0 (nothing selected before the read): entry 0, low bit
    selected = (prefix & 1).astype(jnp.bool_)

    # per-k-mer counters: chunked one-hot reductions over the 64-k-mer axis
    # (scatter-add lowers poorly on TPU; masked reductions ride the VPU).
    # The three counters (whole read / aligned segment 1 / aligned segment 2)
    # ride 10-bit lanes of ONE int32 accumulator so the [N, S, 64] one-hot
    # plane is touched once, not three times: a non-overlapping 3-mer count
    # is at most ceil(L/3), which fits a 10-bit lane iff L <= 3069 — longer
    # rows (long-read data) take the unpacked three-counter path below.
    in_a1 = ((positions + 1 >= aligned_start1[:, None])
             & (positions < aligned_end1[:, None]))
    in_a2 = ((positions + 1 >= aligned_start2[:, None])
             & (positions < aligned_end2[:, None]))
    kmer_iota = jnp.arange(N_KMERS, dtype=jnp.int32)[None, None, :]
    # chunked via lax.fori_loop (NOT an unrolled Python loop): integer adds
    # commute exactly, and a rolled loop keeps the HLO small — the unrolled
    # form made this the most expensive compile in the repo (~100 s through
    # a remote-compile tunnel; seconds rolled)
    chunk = 16
    L_pad = ((L + chunk - 1) // chunk) * chunk
    pad = [(0, 0), (0, L_pad - L)]
    kv_pad = jnp.pad(kmer_values, pad)
    if L <= 3069:
        weight = jnp.where(
            selected,
            1 + (in_a1.astype(jnp.int32) << 10)
            + (in_a2.astype(jnp.int32) << 20),
            0)                                                  # [N, L]
        w_pad = jnp.pad(weight, pad)

        def packed_body(i, c_acc):
            sl = i * chunk
            kv = jax.lax.dynamic_slice(kv_pad, (0, sl), (n_reads, chunk))
            wt = jax.lax.dynamic_slice(w_pad, (0, sl), (n_reads, chunk))
            one_hot = (kv[:, :, None] == kmer_iota)             # [N, S, 64]
            return c_acc + jnp.sum(
                jnp.where(one_hot, wt[:, :, None], 0), axis=1,
                dtype=jnp.int32)

        # derive the carry init from an input so its sharding varyance
        # matches the body output under shard_map (scan-vma rule)
        c_init = jnp.zeros((n_reads, N_KMERS), jnp.int32) | (w_pad[:, :1] & 0)
        c_packed = jax.lax.fori_loop(0, L_pad // chunk, packed_body, c_init)
        c_all = c_packed & 0x3FF
        c_a1 = (c_packed >> 10) & 0x3FF
        c_a2 = (c_packed >> 20) & 0x3FF
    else:
        sel_pad = jnp.pad(selected, pad)
        a1_pad = jnp.pad(selected & in_a1, pad)
        a2_pad = jnp.pad(selected & in_a2, pad)

        def unpacked_body(i, accs):
            c_all, c_a1, c_a2 = accs
            sl = i * chunk
            kv = jax.lax.dynamic_slice(kv_pad, (0, sl), (n_reads, chunk))
            one_hot = (kv[:, :, None] == kmer_iota)
            def count(mask_pad):
                m = jax.lax.dynamic_slice(mask_pad, (0, sl),
                                          (n_reads, chunk))
                return jnp.sum(one_hot & m[:, :, None], axis=1,
                               dtype=jnp.int32)
            return (c_all + count(sel_pad), c_a1 + count(a1_pad),
                    c_a2 + count(a2_pad))

        zeros = jnp.zeros((n_reads, N_KMERS), jnp.int32) | (kv_pad[:, :1] & 0)
        c_all, c_a1, c_a2 = jax.lax.fori_loop(
            0, L_pad // chunk, unpacked_body, (zeros, zeros, zeros))

    counted = c_all >= 1
    crossed = counted & ((c_all >= th_all[:, None])
                         | (c_a1 >= th_a1[:, None])
                         | (c_a2 >= th_a2[:, None]))
    applicable = length >= KMER_LENGTH  # reference skips shorter sequences
    return jnp.any(crossed, axis=1) & applicable


@jax.jit
def homopolymer_run_batch(windows: jnp.ndarray) -> jnp.ndarray:
    """Longest run of identical non-PAD codes per row ([N, W] -> [N]).
    The host builds the two breakpoint-adjacent windows with a PAD separator
    (filter_homopolymer.cpp:22-40 concatenates them with ' ')."""
    same = (windows[:, 1:] == windows[:, :-1]) & (windows[:, 1:] != PAD_CODE)

    def body(i, state):
        run, best = state
        run = jnp.where(same[:, i], run + 1, 1)
        return run, jnp.maximum(best, run)

    n = windows.shape[1] - 1
    init = (jnp.ones(windows.shape[0], jnp.int32),
            jnp.ones(windows.shape[0], jnp.int32))
    _, best = jax.lax.fori_loop(0, n, body, init)
    return best


@functools.partial(jax.jit, static_argnames=("mismatch_probability",
                                             "pvalue_cutoff", "kmer_content"))
def read_filter_step(bases: jnp.ndarray, ref: jnp.ndarray,
                     match_mask: jnp.ndarray, length: jnp.ndarray,
                     aligned_start: jnp.ndarray, aligned_end: jnp.ndarray,
                     extra_mismatches: jnp.ndarray,
                     mismatch_probability: float = 0.01,
                     pvalue_cutoff: float = 0.01,
                     kmer_content: float = 0.6):
    """The fused per-read device step: one pass over a ReadBatch computing
    all read-level filter statistics. XLA fuses the element-wise work into
    a handful of VPU loops over the [N, L] tiles."""
    mismatches, alignment_length = count_mismatches_batch(bases, ref, match_mask)
    pvalue = binomial_pvalue(mismatches + extra_mismatches, alignment_length,
                             mismatch_probability)
    mismatch_discard = pvalue < pvalue_cutoff
    le_th = _low_entropy_thresholds_traced(length, aligned_start,
                                           aligned_end, aligned_start,
                                           aligned_end, kmer_content)
    low_entropy_discard = _low_entropy_core(bases, length, aligned_start,
                                            aligned_end, aligned_start,
                                            aligned_end, *le_th)
    return {
        "mismatches": mismatches,
        "alignment_length": alignment_length,
        "pvalue": pvalue,
        "mismatch_discard": mismatch_discard,
        "low_entropy_discard": low_entropy_discard,
    }
