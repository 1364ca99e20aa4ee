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

Round 4 adds the EXACT device accept: `_accept_wavefront_kernel` (XLA) and
`_accept_wavefront_pallas` (VMEM-resident carries) evaluate every
single-seed align() path — seed 8-mer, left extension with <=1 mismatch,
right extension at +1/-1 with the 4-consecutive-mismatch break, free
leading skips, the outer-loop seed bound and k-mer-index range — as a
per-diagonal automaton riding the SW anti-diagonal wavefront. A device
ACCEPT is sound (align() necessarily accepts) and lets filter_mismappers
skip the host recursion for that (read, gene); splice/deletion recursion
chains stay host-only, so a device reject decides nothing.

The recursion itself stays with the host oracle in filters/mismappers.py;
under ARRIBA_TPU_DEVICE=1 filter_mismappers batches its candidate
(read, window) pairs through `screen_pairs` + `accept_pairs` below into a
tri-state verdict, so the recursion only runs on undecided pairs.
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


@functools.partial(jax.jit, static_argnames=("k", "w_chunk"))
def mxu_shared_kmer_mask(reads: jnp.ndarray, windows: jnp.ndarray,
                         k: int = SEED_KMER_LENGTH,
                         w_chunk: int = 512) -> jnp.ndarray:
    """shared_kmer_mask reformulated for the MXU: each k-mer is encoded as a
    one-hot-per-base vector of 4*k int8 lanes, so the dot product of two
    k-mer encodings counts matching positions and equals k iff the k-mers
    are identical (a k-mer covering PAD one-hots to zero rows and can never
    reach k). The [B, R, 4k] x [B, Wc, 4k] batched int8 matmul rides the
    systolic array in w_chunk window tiles with a fused any(dot == k)
    reduction — the canonical MXU shape the sort/searchsorted screen never
    uses. Bit-identical verdicts to shared_kmer_mask (tests/test_device_ops
    .py); published as the chip_mxu_seed_screen bench row either way the
    crossover falls. Ref: filter_mismappers.cpp:97-99,
    filter_homologs.cpp:13-63."""
    n, L = reads.shape
    W = windows.shape[1]
    R = L - k + 1
    WK = W - k + 1
    WK_pad = ((WK + w_chunk - 1) // w_chunk) * w_chunk

    def onehot(codes, n_pos):
        segs = [codes[:, j:j + n_pos] for j in range(k)]
        stacked = jnp.stack(segs, axis=-1)                    # [B, P, k]
        clamped = jnp.where(stacked <= 3, stacked.astype(jnp.int32), 4)
        oh = jax.nn.one_hot(clamped, 4, dtype=jnp.int8)       # [B, P, k, 4]
        return oh.reshape(codes.shape[0], n_pos, 4 * k)

    read_oh = onehot(reads, R)                                # [B, R, 4k]
    win_pad = jnp.pad(windows, ((0, 0), (0, WK_pad + k - 1 - W)),
                      constant_values=PAD_CODE)

    def body(i, acc):
        lo = i * w_chunk
        chunk = jax.lax.dynamic_slice(
            win_pad, (0, lo), (n, w_chunk + k - 1))
        win_oh = onehot(chunk, w_chunk)                       # [B, Wc, 4k]
        dots = jax.lax.dot_general(
            read_oh, win_oh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)                 # [B, R, Wc]
        return acc | jnp.any(dots == k, axis=(1, 2))

    init = jnp.zeros(n, bool) | (reads[:, 0] > 255)  # varying-safe zeros
    return jax.lax.fori_loop(0, WK_pad // w_chunk, body, init)


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


# ---------------------------------------------------------------------------
# exact device ACCEPT: align()'s single-seed (no-recursion) paths
#
# align() (filter_mismappers.cpp:86-187) accepts a read iff SOME search path
# reaches min_score. Its paths decompose into single-seed paths (seed 8-mer,
# left extension with <= 1 mismatch, right extension at +1/-1 with a break
# after 4 consecutive mismatches, free leading skips at the top level) and
# recursion-chained paths (re-seeding after a splice-site boundary or one
# deletion). The kernel below evaluates EVERY single-seed path exactly, so
# `accept=True` is sound: align() necessarily returns True for that pair
# (it tries every read position p within its while-bound and every indexed
# window hit >= gene_start, and the single-seed scoring below reproduces its
# arithmetic exactly). `accept=False` decides nothing — the pair falls back
# to the host recursion (which alone can accept via splice/deletion chains).
#
# Seed discovery mirrors the host's k-mer index: window 8-mers are sorted
# per row, read 8-mers binary-searched; the first H hits per read position
# define candidate diagonals, deduplicated into D slots, and every seed on a
# selected diagonal is then evaluated densely (the H-cap and D-cap only cost
# coverage, never soundness). Bytes are compared raw (the reference compares
# characters, filter_mismappers.cpp:117,160), k-mers in the T=0/G=1/C=2/
# other=3 code of kmer_to_int (filter_mismappers.cpp:33-45).

_PAD_READ = 0     # never a sequence byte
_PAD_WIN = 1
_NEG = jnp.int32(-(2 ** 20))


def _kmer_codes_bytes(raw: jnp.ndarray) -> jnp.ndarray:
    """Raw sequence bytes -> kmer_to_int base codes (T0 G1 C2 other 3)."""
    return jnp.where(raw == ord("T"), 0,
                     jnp.where(raw == ord("G"), 1,
                               jnp.where(raw == ord("C"), 2, 3))).astype(jnp.int32)


def _rolling8(codes: jnp.ndarray) -> jnp.ndarray:
    """[N, L] base codes -> [N, L] 8-mer values starting at each position
    (positions whose 8-mer runs off the row wrap; callers mask them)."""
    values = jnp.zeros_like(codes)
    for j in range(8):
        values = (values << 2) | jnp.roll(codes, -j, axis=1)
    return values


@functools.partial(jax.jit, static_argnames=())
def _accept_wavefront_kernel(reads: jnp.ndarray, windows: jnp.ndarray,
                             read_len: jnp.ndarray, win_len: jnp.ndarray,
                             min_score: jnp.ndarray, seed_lo: jnp.ndarray,
                             seed_hi: jnp.ndarray) -> jnp.ndarray:
    """[N] bool: EVERY diagonal evaluated by an anti-diagonal wavefront with
    per-cell carries — no gathers, no seed capping (TPU gathers serialize;
    this formulation is dense [N, L]-plane ops like the SW wavefront).

    Per-diagonal automaton (cell (i, j), predecessor (i-1, j-1) = two
    wavefront steps back, lane-shifted):
      a     consecutive byte-matches ending here
      b     byte-matches scanning left until the 2nd mismatch (the left
            extension value of a seed starting at i+1)
      q     consecutive code-matches (8-mer streak detector)
      bsave b at the cell before the current code streak began (= the left
            extension of the streak-START seed)
      sok   streak-start eligibility (outer-loop p bound, window k-mer
            range, window start char != 'N') latched at streak start
      cons  consecutive byte-mismatches of the active right-extension walk
      sc    best active walk score (max over fired seeds on this diagonal,
            all sharing the same +1/-1 increments and 4-mismatch break)
    A seed fires when q == 8 & sok with candidate 8 + bsave; accept when a
    candidate is >= min_score at fire time or an active walk reaches
    min_score on a byte-match. Only streak-START seeds fire: later seeds
    of the same streak are dominated except via rare N-byte collisions
    (code-match but byte-mismatch), so this under-accepts vs align() —
    sound, never wrong."""
    N, L = reads.shape
    W = windows.shape[1]
    NEG = _NEG

    # reversed+padded windows: at step d, lane i reads wrev[W-1-d+L+i],
    # i.e. windows[:, d-i] (the SW wavefront indexing)
    wrev = jnp.flip(windows, axis=1)
    wrev = jnp.pad(wrev, ((0, 0), (L, L)), constant_values=_PAD_WIN)

    read_b = reads.astype(jnp.int32)
    kc_r = _kmer_codes_bytes(read_b)
    lane = jnp.arange(L, dtype=jnp.int32)[None, :]
    r_valid = lane < read_len[:, None]
    # outer-loop seed bound for a seed STARTING at lane i
    p_eligible = ((lane + 8 < read_len[:, None])
                  & (2 * lane <= (read_len + 16 - min_score)[:, None]))
    ms = min_score[:, None]
    wl = win_len[:, None]
    slo = seed_lo[:, None]
    shi = seed_hi[:, None]

    def body(d, state):
        prev, prev2, accept = state
        a_p, b_p, q_p, bs_p, sok_p, cons_p, sc_p = prev2
        window_diag = jax.lax.dynamic_slice(
            wrev, (0, W - 1 - d + L), (N, L)).astype(jnp.int32)
        j = d - lane                                   # window pos per lane
        v = r_valid & (j >= 0) & (j < wl)
        m = (read_b == window_diag) & v
        cm = (kc_r == _kmer_codes_bytes(window_diag)) & v

        def shift(p, fill):
            return jnp.concatenate(
                [jnp.full((N, 1), fill, p.dtype), p[:, :-1]], axis=1)

        # diagonal predecessor (i-1, j-1) lives TWO wavefront steps back,
        # one lane up (the SW kernel's h_prev2_shift)
        a_in = shift(a_p, 0)
        b_in = shift(b_p, 0)
        q_in = shift(q_p, 0)
        bs_in = shift(bs_p, 0)
        sok_in = shift(sok_p, False)
        cons_in = shift(cons_p, 0)
        sc_in = shift(sc_p, NEG)

        a = jnp.where(m, a_in + 1, 0)
        b = jnp.where(v, jnp.where(m, b_in + 1, a_in), 0)
        q = jnp.where(cm, q_in + 1, 0)
        # streak starts at this cell when cm and the predecessor streak len
        # was 0; latch eligibility of (p=i, g=j) and b at p-1
        starts = cm & (q_in == 0)
        elig = (p_eligible & (j >= jnp.maximum(slo, 0)) & (j <= shi)
                & (j <= wl - 10) & (window_diag != ord("N")))
        sok = jnp.where(cm, jnp.where(starts, elig, sok_in), False)
        bsave = jnp.where(cm, jnp.where(starts, b_in, bs_in), 0)

        fired = (q == 8) & sok
        candidate = 8 + bsave

        # active right-extension walk: +1/-1, dies after the 4th
        # consecutive byte-mismatch or at the window/read boundary
        cons = jnp.where(v, jnp.where(m, 0, cons_in + 1), 0)
        sc_step = jnp.where(m, sc_in + 1, sc_in - 1)
        sc_step = jnp.where(v & (jnp.where(m, 0, cons) < 4), sc_step, NEG)
        accept = accept | jnp.any(m & (sc_step >= ms), axis=1) \
            | jnp.any(fired & (candidate >= ms), axis=1)
        sc = jnp.maximum(sc_step, jnp.where(fired, candidate, NEG))
        return ((a, b, q, bsave, sok, cons, sc), prev, accept)

    zeros = jnp.zeros((N, L), jnp.int32)
    falses = jnp.zeros((N, L), bool)
    negs = jnp.full((N, L), NEG, jnp.int32)
    empty = (zeros, zeros, zeros, zeros, falses, zeros, negs)
    state = (empty, empty, jnp.zeros(N, bool))
    state = jax.lax.fori_loop(0, L + W - 1, body, state)
    return state[-1]


def _accept_wavefront_pallas(reads: jnp.ndarray, windows: jnp.ndarray,
                             params: jnp.ndarray, block_n: int = 256,
                             interpret: bool = False) -> jnp.ndarray:
    """Pallas version of the accept wavefront: carries live in VMEM scratch
    (the XLA version round-trips ~14 [N, L] planes through HBM per step and
    is bandwidth-bound), window bytes consumed through the 128-lane shift
    register of the SW kernel (Mosaic-safe block loads). params is
    [N, 128] int32 with columns (read_len, win_len, min_score, seed_lo,
    seed_hi) broadcast-padded."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, L = reads.shape
    W = windows.shape[1]
    n_steps = L + W - 1
    n_wblocks = (n_steps + 127) // 128
    padded_w = n_wblocks * 128
    windows_padded = jnp.pad(windows, ((0, 0), (0, padded_w - W)),
                             constant_values=_PAD_WIN)
    NEG = int(_NEG)

    def kmer_code(x):
        return jnp.where(x == ord("T"), 0,
                         jnp.where(x == ord("G"), 1,
                                   jnp.where(x == ord("C"), 2, 3)))

    def kernel(reads_ref, windows_ref, params_ref, out_ref,
               p2, bs2, sc2, p1, bs1, sc1, wd, acc):
        # small counters ride ONE packed int32 plane per pipeline stage:
        # a (bits 0-8), b (9-17), q (18-21, capped at 9), cons (22-24,
        # capped at 5), sok (25) — halving the per-step roll/copy traffic
        zero = jnp.zeros((block_n, L), jnp.int32)
        for ref in (p2, bs2, p1, bs1):
            ref[:] = zero
        sc2[:] = jnp.full((block_n, L), NEG, jnp.int32)
        sc1[:] = jnp.full((block_n, L), NEG, jnp.int32)
        wd[:] = jnp.full((block_n, L), _PAD_WIN, jnp.int32)
        acc[:] = jnp.zeros((block_n, L), jnp.int32)

        read_b = reads_ref[:].astype(jnp.int32)
        kc_r = kmer_code(read_b)
        lane_l = jax.lax.broadcasted_iota(jnp.int32, (block_n, L), 1)
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (block_n, 128), 1)
        read_len = params_ref[:, 0:1]
        wl = params_ref[:, 1:2]
        ms = params_ref[:, 2:3]
        slo = jnp.maximum(params_ref[:, 3:4], 0)
        shi = params_ref[:, 4:5]
        r_valid = lane_l < read_len
        p_eligible = ((lane_l + 8 < read_len)
                      & (2 * lane_l <= read_len + 16 - ms))

        def outer(blk, _):
            wblock = windows_ref[:, pl.ds(pl.multiple_of(blk * 128, 128),
                                          128)].astype(jnp.int32)

            def inner(s, _):
                d = blk * 128 + s
                elem = jnp.sum(jnp.where(lane128 == s, wblock, 0),
                               axis=1, keepdims=True)
                window_diag = jnp.where(lane_l == 0, elem,
                                        pltpu.roll(wd[:], 1, 1))
                wd[:] = window_diag
                j = d - lane_l
                v = r_valid & (j >= 0) & (j < wl)
                m = (read_b == window_diag) & v
                cm = (kc_r == kmer_code(window_diag)) & v

                def shift(x, fill):
                    return jnp.where(lane_l == 0, fill, pltpu.roll(x, 1, 1))

                p_in = shift(p2[:], 0)
                bs_in = shift(bs2[:], 0)
                sc_in = shift(sc2[:], NEG)
                a_in = p_in & 511
                b_in = (p_in >> 9) & 511
                q_in = (p_in >> 18) & 15
                cons_in = (p_in >> 22) & 7
                sok_in = (p_in >> 25) & 1

                a = jnp.where(m, a_in + 1, 0)
                b = jnp.where(v, jnp.where(m, b_in + 1, a_in), 0)
                q = jnp.where(cm, jnp.minimum(q_in + 1, 9), 0)
                starts = cm & (q_in == 0)
                elig = (p_eligible & (j >= slo) & (j <= shi)
                        & (j <= wl - 10)
                        & (window_diag != ord("N"))).astype(jnp.int32)
                sok = jnp.where(cm, jnp.where(starts, elig, sok_in), 0)
                bsave = jnp.where(cm, jnp.where(starts, b_in, bs_in), 0)
                fired = (q == 8) & (sok != 0)
                candidate = 8 + bsave
                cons = jnp.where(v, jnp.where(m, 0,
                                              jnp.minimum(cons_in + 1, 5)), 0)
                sc_step = jnp.where(m, sc_in + 1, sc_in - 1)
                sc_step = jnp.where(v & (jnp.where(m, 0, cons) < 4),
                                    sc_step, NEG)
                acc[:] = acc[:] | ((m & (sc_step >= ms))
                                   | (fired & (candidate >= ms))
                                   ).astype(jnp.int32)
                sc = jnp.maximum(sc_step,
                                 jnp.where(fired, candidate, NEG))
                # rotate the two-deep diagonal pipeline
                p2[:] = p1[:]
                bs2[:] = bs1[:]
                sc2[:] = sc1[:]
                p1[:] = (a | (b << 9) | (q << 18) | (cons << 22)
                         | (sok << 25))
                bs1[:] = bsave
                sc1[:] = sc
                return 0

            jax.lax.fori_loop(0, 128, inner, 0)
            return 0

        jax.lax.fori_loop(0, n_wblocks, outer, 0)
        out_ref[:] = jnp.broadcast_to(
            jnp.max(acc[:], axis=1, keepdims=True), (block_n, 128))

    grid = ((n + block_n - 1) // block_n,)
    plane = lambda: pltpu.VMEM((block_n, L), jnp.int32)  # noqa: E731
    result = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, padded_w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_n, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 128), jnp.int32),
        scratch_shapes=[plane() for _ in range(8)],
        interpret=interpret,
    )(reads, windows_padded, params)
    return result[:, 0] != 0


def accept_pairs(read_seqs, window_views, min_scores,
                 window_chunk: int = 8192, batch_rows: int = 512,
                 n_hits: int = 4, n_diags: int = 64) -> np.ndarray:
    """[n] bool per (read, window) pair: a single-seed align() path in
    EITHER read orientation reaches min_score (sound accept — see
    _accept_wavefront_kernel). read_seqs: list of str; window_views: list of uint8
    views into the assembly (exactly the [gene_start, gene_end] windows
    align() searches); min_scores: list of int (the reference's
    min_align_fraction arithmetic, computed by the caller)."""
    n = len(read_seqs)
    if n == 0:
        return np.zeros(0, bool)
    from ..seq import reverse_complement_str

    max_read = max(len(seq) for seq in read_seqs)
    L = -(-max(16, max_read) // 64) * 64
    stride = window_chunk - 2 * L
    assert stride > 0

    rows_reads: list = []
    rows_windows: list = []
    row_meta: list = []   # (pair, win_len, min_score, seed_lo, seed_hi)

    def add_rows(fwd: np.ndarray, rc: np.ndarray, window: np.ndarray,
                 i: int, ms: int) -> None:
        w_global = len(window)
        c = 0
        while True:
            offset = c * stride
            chunk = window[offset:offset + window_chunk]
            lo = 0 if c == 0 else L
            hi = lo + stride - 1 if c > 0 else stride + L - 1
            if lo > len(chunk) - 10 and c > 0:
                break
            padded = np.full(window_chunk, _PAD_WIN, np.uint8)
            padded[:len(chunk)] = chunk
            for read_row in (fwd, rc):
                rows_reads.append(read_row)
                rows_windows.append(padded)
                row_meta.append((i, len(chunk), ms, lo, hi))
            c += 1
            if offset + window_chunk >= w_global:
                break

    for i, (seq, window) in enumerate(zip(read_seqs, window_views)):
        raw = np.frombuffer(seq.encode("latin-1"), np.uint8)
        fwd = np.full(L, _PAD_READ, np.uint8)
        fwd[:len(raw)] = raw
        rc_raw = np.frombuffer(
            reverse_complement_str(seq).encode("latin-1"), np.uint8)
        rc = np.full(L, _PAD_READ, np.uint8)
        rc[:len(rc_raw)] = rc_raw
        add_rows(fwd, rc, window, i, int(min_scores[i]))

    result = np.zeros(n, bool)
    meta = np.asarray(row_meta, np.int32).reshape(-1, 5)
    read_lens = np.array([len(s) for s in read_seqs], np.int32)
    for base in range(0, len(rows_reads), batch_rows):
        chunk_r = rows_reads[base:base + batch_rows]
        chunk_w = rows_windows[base:base + batch_rows]
        rows = len(chunk_r)
        if rows < batch_rows and base > 0:
            pad = batch_rows - rows
            chunk_r = chunk_r + [np.full(L, _PAD_READ, np.uint8)] * pad
            chunk_w = chunk_w + [np.full(window_chunk, _PAD_WIN, np.uint8)] * pad
        mrows = meta[base:base + rows]
        read_len = np.zeros(len(chunk_r), np.int32)
        read_len[:rows] = read_lens[mrows[:, 0]]
        win_len = np.zeros(len(chunk_r), np.int32)
        win_len[:rows] = mrows[:, 1]
        ms = np.full(len(chunk_r), 2 ** 20, np.int32)
        ms[:rows] = mrows[:, 2]
        seed_lo = np.zeros(len(chunk_r), np.int32)
        seed_lo[:rows] = mrows[:, 3]
        seed_hi = np.zeros(len(chunk_r), np.int32)
        seed_hi[:rows] = mrows[:, 4]
        reads_d = jnp.asarray(np.stack(chunk_r))
        wins_d = jnp.asarray(np.stack(chunk_w))
        hits = None
        if jax.devices()[0].platform not in ("cpu", "gpu"):
            # TPU-class device: the VMEM-resident Pallas wavefront
            params = np.zeros((len(chunk_r), 128), np.int32)
            params[:, 0] = read_len
            params[:, 1] = win_len
            params[:, 2] = ms
            params[:, 3] = seed_lo
            params[:, 4] = seed_hi
            try:
                hits = np.asarray(_accept_wavefront_pallas(
                    reads_d, wins_d, jnp.asarray(params),
                    block_n=min(256, len(chunk_r))))[:rows]
            except Exception:  # pragma: no cover - Mosaic-version dependent
                hits = None
        if hits is None:
            hits = np.asarray(_accept_wavefront_kernel(
                reads_d, wins_d,
                jnp.asarray(read_len), jnp.asarray(win_len), jnp.asarray(ms),
                jnp.asarray(seed_lo), jnp.asarray(seed_hi)))[:rows]
        np.logical_or.at(result, mrows[:, 0], hits)
    return result


def screen_pairs(read_seqs, window_views, window_chunk: int = 8192,
                 batch_rows: int = 4096) -> np.ndarray:
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
