"""Device-op tests: batched filter math vs the host oracle, SW wavefront vs a
plain-Python DP, and the DP-sharded step on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from arriba_tpu.ops import readfilters, realign
from arriba_tpu.ops.encode import PAD_CODE, random_read_batch
from arriba_tpu.parallel.dp import (make_mesh, shard_batch,
                                    sharded_read_filter_step,
                                    sharded_realign_step)


def _ref_kmer_threshold(segment_length, kmer_content, k):
    """Exact reference arithmetic (filter_low_entropy.cpp:67-69): the
    segment length and kmer_content multiply and divide in float32, +0.5
    promotes to double, and the sum truncates into an unsigned int."""
    q = (np.float32(segment_length) * np.float32(kmer_content)) / np.float32(k)
    return int(float(q) + 0.5)


def reference_low_entropy(codes, length, a1s, a1e, a2s, a2e, kmer_content, k=3):
    """Direct port of filter_low_entropy.cpp:60-100 for one sequence."""
    if length < k:
        return False
    kmer_count = [0] * (4 ** k)
    kmer_count_a1 = [0] * (4 ** k)
    kmer_count_a2 = [0] * (4 ** k)
    prev = [0] * (4 ** k)
    max_c = _ref_kmer_threshold(length, kmer_content, k)
    max_c1 = _ref_kmer_threshold(a1e - a1s, kmer_content, k)
    max_c2 = _ref_kmer_threshold(a2e - a2s, kmer_content, k)
    for pos in range(0, length - k):
        v = 0
        for j in range(k):
            v = (v << 2) | min(int(codes[pos + j]), 3)
        if prev[v] <= pos:
            prev[v] = pos + k
            kmer_count[v] += 1
            if pos + 1 >= a1s and pos < a1e:
                kmer_count_a1[v] += 1
            if pos + 1 >= a2s and pos < a2e:
                kmer_count_a2[v] += 1
            if (kmer_count[v] >= max_c or kmer_count_a1[v] >= max_c1
                    or kmer_count_a2[v] >= max_c2):
                return True
    return False


def reference_smith_waterman(read, window):
    """Plain local-alignment DP (match +1, mismatch -1, gap -1)."""
    L, W = len(read), len(window)
    H = np.zeros((L + 1, W + 1), np.int32)
    best = 0
    for i in range(1, L + 1):
        for j in range(1, W + 1):
            s = 1 if read[i - 1] == window[j - 1] else -1
            H[i, j] = max(0, H[i - 1, j - 1] + s, H[i - 1, j] - 1, H[i, j - 1] - 1)
            best = max(best, H[i, j])
    return best


def test_count_mismatches_batch():
    rng = np.random.default_rng(0)
    batch = random_read_batch(rng, 64, 100, mismatch_rate=0.05)
    mismatches, aligned = readfilters.count_mismatches_batch(
        jnp.asarray(batch.bases), jnp.asarray(batch.ref), jnp.asarray(batch.match_mask))
    mismatches = np.asarray(mismatches)
    aligned = np.asarray(aligned)
    for row in range(batch.n_reads):
        mask = batch.match_mask[row]
        expected = np.count_nonzero(mask & (batch.bases[row] != batch.ref[row]))
        assert mismatches[row] == expected
        assert aligned[row] == np.count_nonzero(mask)
    assert (mismatches[batch.n_reads:] == 0).all()


def test_low_entropy_batch_matches_reference():
    rng = np.random.default_rng(1)
    n, length = 48, 80
    codes = rng.integers(0, 4, size=(n, 128), dtype=np.uint8)
    codes[:, length:] = PAD_CODE
    # make some rows low-entropy: repeat a 3-mer
    for row in range(0, n, 5):
        codes[row, :length] = np.tile([0, 1, 2], length // 3 + 1)[:length]
    lengths = np.full(n, length, np.int32)
    a1s = np.zeros(n, np.int32)
    a1e = np.full(n, 50, np.int32)
    a2s = np.full(n, 30, np.int32)
    a2e = np.full(n, length, np.int32)

    result = np.asarray(readfilters.low_entropy_batch(
        jnp.asarray(codes), jnp.asarray(lengths), jnp.asarray(a1s),
        jnp.asarray(a1e), jnp.asarray(a2s), jnp.asarray(a2e), 0.6))
    for row in range(n):
        expected = reference_low_entropy(codes[row], length, a1s[row], a1e[row],
                                         a2s[row], a2e[row], 0.6)
        assert result[row] == expected, f"row {row}"


def _recurrent_kmer_counts(codes, length, k=3):
    """Non-overlapping k-mer occurrence counts, the reference's counting
    rule (filter_low_entropy.cpp:77-100): an instance only counts if it
    starts at or after the end of the previously counted instance, and the
    final k-mer start position (length - k) is never visited."""
    prev, cnt = {}, {}
    for pos in range(0, length - k):
        v = tuple(int(x) for x in codes[pos:pos + k])
        if prev.get(v, 0) <= pos:
            prev[v] = pos + k
            cnt[v] = cnt.get(v, 0) + 1
    return cnt


def _boundary_read(length):
    """A read whose maximum recurrent-k-mer count is EXACTLY 10: ten
    isolated code-0 triples (fenced by code 1 so no extra triple forms) in
    AA-free filler. With -K 0.175 at 180nt the reference's float32
    threshold is 11 (float64 math says 10); with -K 0.105 at 300nt it is
    10 (float64 says 11) — so this read sits exactly on the float32-vs-
    float64 decision boundary in both configurations."""
    rng = np.random.default_rng(1)
    codes = np.zeros(length, np.uint8)
    motif = set()
    for i in range(10):
        p = 5 + i * 16
        motif.update(range(p - 1, p + 4))
    prev_zero = True
    for pos in range(length):
        if pos in motif:
            prev_zero = False
            continue
        while True:
            c = int(rng.integers(0, 4))
            if not (c == 0 and prev_zero):
                break
        codes[pos] = c
        prev_zero = c == 0
    for i in range(10):
        p = 5 + i * 16
        codes[p - 1] = 1
        codes[p:p + 3] = 0
        codes[p + 3] = 1
    counts = _recurrent_kmer_counts(codes, length)
    assert counts[(0, 0, 0)] == 10 and max(counts.values()) == 10
    return codes


@pytest.mark.parametrize("kmer_content,length,expect_discard",
                         [(0.175, 180, False), (0.105, 300, True)])
def test_low_entropy_float32_threshold_boundary(kmer_content, length,
                                                expect_discard):
    """The k-mer thresholds must use the reference's float32 arithmetic
    (filter_low_entropy.cpp:67-69, verified against compiled C): computing
    them in float64 flips the keep/discard decision for a read with exactly
    10 recurrent k-mers at these -K settings. All engines — the numpy
    batch scan, the jax device op, and the native C++ scans — must agree
    with the float32 semantics."""
    from arriba_tpu.filters.read_level import _low_entropy_flags

    f32, f64 = (_ref_kmer_threshold(length, kmer_content, 3),
                int(length * kmer_content / 3 + 0.5))
    assert (10 >= f32) == expect_discard and (10 >= f64) != expect_discard

    codes = _boundary_read(length)[None, :]
    lengths = np.array([length], np.int32)
    zeros = np.zeros(1, np.int32)
    ends = np.array([length], np.int32)

    flags = _low_entropy_flags(codes, lengths, zeros, ends, zeros, ends,
                               kmer_content, 3)
    assert bool(flags[0]) == expect_discard, "numpy engine"

    result = np.asarray(readfilters.low_entropy_batch(
        jnp.asarray(codes), jnp.asarray(lengths), jnp.asarray(zeros),
        jnp.asarray(ends), jnp.asarray(zeros), jnp.asarray(ends),
        kmer_content))
    assert bool(result[0]) == expect_discard, "jax device op"

    from arriba_tpu.ingest.chimeric import _native
    if _native is not None and hasattr(_native, "low_entropy_scan"):
        out = np.zeros(1, np.uint8)
        _native.low_entropy_scan(
            np.ascontiguousarray(codes), lengths, zeros, ends, zeros, ends,
            out, 1, length, kmer_content, 3)
        assert bool(out[0]) == expect_discard, "native padded engine"
    if _native is not None and hasattr(_native, "low_entropy_scan_flat"):
        seq = bytes(b"TGCA"[c] for c in codes[0])
        offsets = np.array([0, length], np.int64)
        out = np.zeros(1, np.uint8)
        _native.low_entropy_scan_flat(seq, offsets, zeros, ends, zeros,
                                      ends, out, kmer_content, 3)
        assert bool(out[0]) == expect_discard, "native flat engine"


def test_homopolymer_run_batch():
    windows = np.full((4, 16), PAD_CODE, np.uint8)
    windows[0, :6] = [0, 0, 0, 0, 0, 0]              # run of 6
    windows[1, :6] = [0, 1, 0, 1, 0, 1]              # no run
    windows[2, :8] = [2, 2, 2, PAD_CODE, 3, 3, 3, 3]  # separator breaks run
    windows[3, :2] = [1, 1]
    runs = np.asarray(readfilters.homopolymer_run_batch(jnp.asarray(windows)))
    assert runs[0] == 6
    assert runs[1] == 1
    assert runs[2] == 4
    assert runs[3] == 2


def test_smith_waterman_matches_reference_dp():
    rng = np.random.default_rng(2)
    n, L, W = 8, 32, 64
    reads = rng.integers(0, 4, size=(n, L), dtype=np.uint8)
    windows = rng.integers(0, 4, size=(n, W), dtype=np.uint8)
    # plant an exact copy of read 0 inside window 0
    windows[0, 10:10 + L] = reads[0]
    # plant a mutated copy of read 1
    mutated = reads[1].copy()
    mutated[::7] = (mutated[::7] + 1) % 4
    windows[1, 3:3 + L] = mutated

    scores = np.asarray(realign.smith_waterman_scores(
        jnp.asarray(reads), jnp.asarray(windows)))
    for row in range(n):
        expected = reference_smith_waterman(reads[row], windows[row])
        assert scores[row] == expected, f"row {row}"
    assert scores[0] == L


def test_smith_waterman_pallas_interpret_matches_jnp():
    rng = np.random.default_rng(3)
    n, L, W = 8, 128, 256
    reads = rng.integers(0, 4, size=(n, L), dtype=np.uint8)
    windows = rng.integers(0, 4, size=(n, W), dtype=np.uint8)
    windows[2, 50:50 + L] = reads[2]
    jnp_scores = np.asarray(realign.smith_waterman_scores(
        jnp.asarray(reads), jnp.asarray(windows)))
    pallas_scores = np.asarray(realign.smith_waterman_scores_pallas(
        jnp.asarray(reads), jnp.asarray(windows), interpret=True))
    np.testing.assert_array_equal(jnp_scores, pallas_scores)


def test_shared_kmer_mask():
    rng = np.random.default_rng(4)
    n, L, W = 6, 64, 128
    reads = rng.integers(0, 4, size=(n, L), dtype=np.uint8)
    windows = rng.integers(0, 4, size=(n, W), dtype=np.uint8)
    # row 0: window contains an 8-mer of the read
    windows[0, 20:28] = reads[0, 5:13]
    mask = np.asarray(realign.shared_kmer_mask(jnp.asarray(reads),
                                               jnp.asarray(windows)))
    assert mask[0]
    # exact check against brute force
    for row in range(n):
        read_kmers = {tuple(reads[row, i:i + 8]) for i in range(L - 7)}
        window_kmers = {tuple(windows[row, i:i + 8]) for i in range(W - 7)}
        assert mask[row] == bool(read_kmers & window_kmers), f"row {row}"


def test_mxu_seed_screen_matches_sorted_screen():
    """The one-hot int8 matmul screen (MXU formulation) must produce
    bit-identical verdicts to the sort/searchsorted screen on random,
    planted-seed, padded, and no-seed rows (incl. tiles crossing the
    w_chunk boundary)."""
    from arriba_tpu.ops.encode import PAD_CODE

    rng = np.random.default_rng(9)
    n, L, W = 12, 96, 1200
    reads = rng.integers(0, 4, size=(n, L), dtype=np.uint8)
    windows = rng.integers(0, 4, size=(n, W), dtype=np.uint8)
    windows[0, 40:48] = reads[0, 11:19]          # planted early
    windows[1, 600:608] = reads[1, 0:8]          # planted past chunk edge
    windows[2, W - 8:] = reads[2, L - 8:]        # planted at the tail
    reads[3, 50:] = PAD_CODE                     # padded read tail
    windows[4, 100:] = PAD_CODE                  # padded window tail
    windows[4, 20:28] = reads[4, 2:10]
    reads[5] = PAD_CODE                          # fully padded read
    baseline = np.asarray(realign.shared_kmer_mask(jnp.asarray(reads),
                                                   jnp.asarray(windows)))
    mxu = np.asarray(realign.mxu_shared_kmer_mask(jnp.asarray(reads),
                                                  jnp.asarray(windows),
                                                  w_chunk=512))
    np.testing.assert_array_equal(baseline, mxu)
    assert mxu[0] and mxu[1] and mxu[2] and mxu[4] and not mxu[5]


def test_sharded_filter_step_on_mesh():
    rng = np.random.default_rng(5)
    mesh = make_mesh(8)
    batch = random_read_batch(rng, 100, 128, mismatch_rate=0.02)
    sharded = shard_batch(batch, mesh)
    step = sharded_read_filter_step(mesh)
    per_read, globals_ = step(sharded.bases, sharded.ref, sharded.match_mask,
                              sharded.length, sharded.aligned_start,
                              sharded.aligned_end,
                              jnp.zeros(sharded.bases.shape[0], jnp.int32))
    assert int(globals_["total_reads"]) == batch.n_reads
    # global mismatch tally equals the unsharded sum
    unsharded_mm, _ = readfilters.count_mismatches_batch(
        jnp.asarray(batch.bases), jnp.asarray(batch.ref),
        jnp.asarray(batch.match_mask))
    assert int(globals_["total_mismatches"]) == int(np.asarray(unsharded_mm).sum())
    assert per_read["mismatches"].shape[0] == sharded.bases.shape[0]


def test_sharded_realign_step_on_mesh():
    rng = np.random.default_rng(6)
    mesh = make_mesh(8)
    n, L, W = 32, 128, 256
    reads = np.full((n, L), PAD_CODE, np.uint8)
    windows = rng.integers(0, 4, size=(n, W), dtype=np.uint8)
    read_len = 100
    reads[:, :read_len] = rng.integers(0, 4, size=(n, read_len), dtype=np.uint8)
    windows[0, 64:64 + read_len] = reads[0, :read_len]  # row 0 aligns perfectly
    lengths = np.full(n, read_len, np.int32)
    step = sharded_realign_step(mesh)
    result, total = step(jnp.asarray(reads), jnp.asarray(windows),
                         jnp.asarray(lengths))
    can_align = np.asarray(result["can_align"])
    assert can_align[0]
    assert int(total) == int(can_align.sum())


def test_pileup_histogram_matches_numpy():
    """ops/pileup.pileup_histogram (the writer device path's core) must
    count exactly like a host bincount over (row, column, symbol)."""
    import numpy as np

    from arriba_tpu.ops.pileup import N_SYMBOLS, pileup_histogram

    rng = np.random.default_rng(3)
    n_rows, window, n_obs = 5, 64, 4000
    codes = rng.integers(0, N_SYMBOLS, n_obs).astype(np.int32)
    cols = rng.integers(-4, window + 4, n_obs).astype(np.int32)  # some invalid
    rows = rng.integers(0, n_rows, n_obs).astype(np.int32)
    device = np.asarray(pileup_histogram(codes, cols, rows, n_rows, window))
    expected = np.zeros((n_rows, window, N_SYMBOLS), np.int32)
    for c, p, r in zip(codes, cols, rows):
        if 0 <= p < window:
            expected[r, p, c] += 1
    assert np.array_equal(device, expected)


def test_pileup_consensus():
    from arriba_tpu.ops.pileup import pileup_consensus

    # fusion 0: column 0 unanimous A(3); column 1 split 2:1 (not confident at
    # 75%); column 2 covered by one deletion; fusion 1: column 0 one base
    codes = np.array([3, 3, 3, 0, 0, 1, 5, 2], np.uint8)
    positions = np.array([0, 0, 0, 1, 1, 1, 2, 0], np.int32)
    fusion_ids = np.array([0, 0, 0, 0, 0, 0, 0, 1], np.int32)
    consensus, confident, coverage = pileup_consensus(
        jnp.asarray(codes), jnp.asarray(positions), jnp.asarray(fusion_ids),
        n_fusions=2, window=4)
    consensus = np.asarray(consensus)
    confident = np.asarray(confident)
    coverage = np.asarray(coverage)
    assert consensus[0, 0] == 3 and confident[0, 0] and coverage[0, 0] == 3
    assert consensus[0, 1] == 0 and not confident[0, 1] and coverage[0, 1] == 3
    assert consensus[0, 2] == 5 and coverage[0, 2] == 1  # deletion symbol
    assert consensus[0, 3] == PAD_CODE and coverage[0, 3] == 0
    assert consensus[1, 0] == 2 and confident[1, 0]
    # out-of-window observations are dropped without corrupting column 0
    codes2 = np.array([1, 1], np.uint8)
    positions2 = np.array([0, 99], np.int32)
    fusion_ids2 = np.array([0, 0], np.int32)
    consensus2, _, coverage2 = pileup_consensus(
        jnp.asarray(codes2), jnp.asarray(positions2), jnp.asarray(fusion_ids2),
        n_fusions=1, window=4)
    assert np.asarray(coverage2)[0, 0] == 1
    assert np.asarray(consensus2)[0, 0] == 1


def test_device_point_query_matches_host_index():
    from arriba_tpu.annotation.index import IntervalIndex
    from arriba_tpu.ops.annotation import point_query_batch

    rng = np.random.default_rng(8)
    n_features = 40
    starts = rng.integers(0, 5000, n_features)
    ends = starts + rng.integers(50, 800, n_features)
    contigs = np.zeros(n_features, np.int32)
    index = IntervalIndex(contigs, starts.astype(np.int64), ends.astype(np.int64), 1)

    positions = rng.integers(0, 6500, 200).astype(np.int64)
    max_items = max((len(index.set_at(0, i)) for i in range(len(index.boundaries[0]))),
                    default=1)
    result = np.asarray(point_query_batch(
        jnp.asarray(index.boundaries[0]), jnp.asarray(index.offsets[0]),
        jnp.asarray(index.items[0]), jnp.asarray(positions), max_items))
    for q, pos in enumerate(positions):
        expected = sorted(index.point_query(0, int(pos)).tolist())
        got = sorted(int(v) for v in result[q] if v >= 0)
        assert got == expected, f"query {q} at {pos}"


def test_tensorize_matches_host_mismatch_counts():
    """ReadBatch CIGAR-walk encoding: device mismatch counts over M/=/X
    positions equal a direct host walk."""
    import random
    from arriba_tpu.model import Alignment
    from arriba_tpu.ops.encode import tensorize
    from arriba_tpu.io.bam import cigar_from_string

    rng = np.random.default_rng(9)
    pyrng = random.Random(9)
    contig_seq = np.frombuffer(
        "".join(pyrng.choice("ACGT") for _ in range(5000)).encode(), np.uint8).copy()
    assembly = {0: contig_seq}

    chimeric = {}
    expected = []
    for i in range(20):
        start = pyrng.randrange(100, 4000)
        matched = pyrng.randrange(30, 80)
        clip = pyrng.choice([0, 10, 25])
        seq = contig_seq[start:start + matched].tobytes().decode()
        # plant some mismatches
        seq = list(seq)
        n_mm = pyrng.randrange(0, 4)
        for _ in range(n_mm):
            p = pyrng.randrange(len(seq))
            seq[p] = "ACGT"[(("ACGT".index(seq[p]) + 1) % 4)]
        seq = "".join(seq)
        cigar = f"{matched}M{clip}S" if clip else f"{matched}M"
        full_seq = seq + "A" * clip
        alignment = Alignment(contig=0, start=start, end=start + matched - 1,
                              cigar=cigar_from_string(cigar), sequence=full_seq)
        from arriba_tpu.model import Fragment
        frag = Fragment()
        frag.append(alignment)
        frag.append(Alignment())  # empty mate (no sequence => not tensorized)
        chimeric[f"r{i}"] = frag
        actual_mm = sum(1 for j in range(matched)
                        if full_seq[j] != chr(contig_seq[start + j]))
        expected.append(actual_mm)

    batch = tensorize(chimeric, assembly)
    mismatches, aligned = readfilters.count_mismatches_batch(
        jnp.asarray(batch.bases), jnp.asarray(batch.ref),
        jnp.asarray(batch.match_mask))
    mismatches = np.asarray(mismatches)
    for i in range(20):
        assert mismatches[i] == expected[i], f"read {i}"


def test_cluster_candidates_matches_host():
    """Device sort+segment clustering == host dict aggregation."""
    import numpy as np
    from arriba_tpu.ops.cluster import (SUPPORT_KINDS, cluster_candidates_jit,
                                        pack_keys)
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    n = 512
    n_used = 400
    gene1 = rng.integers(0, 20, n)
    gene2 = rng.integers(0, 20, n)
    contig1 = rng.integers(0, 3, n)
    contig2 = rng.integers(0, 3, n)
    bp1 = rng.integers(0, 10, n) * 1000        # few distinct values => clusters
    bp2 = rng.integers(0, 10, n) * 1000
    d1 = rng.integers(0, 2, n)
    d2 = rng.integers(0, 2, n)
    kind = rng.integers(0, SUPPORT_KINDS, n).astype(np.int32)
    valid = np.arange(n) < n_used

    expected = {}
    for i in range(n_used):
        key = (gene1[i], gene2[i], contig1[i], contig2[i], bp1[i], bp2[i],
               d1[i], d2[i])
        expected.setdefault(key, [0] * SUPPORT_KINDS)[kind[i]] += 1

    words = pack_keys(*(jnp.asarray(x) for x in
                        (gene1, gene2, contig1, contig2, bp1, bp2, d1, d2)))
    out = cluster_candidates_jit(words, jnp.asarray(kind), jnp.asarray(valid))
    n_clusters = int(out["n_clusters"])
    assert n_clusters == len(expected)
    got = {}
    out_words = [np.asarray(w) for w in out["words"]]
    for i in range(n_clusters):
        g1, g2, contig_pair, b1, b2, dir_pair = (int(w[i]) for w in out_words)
        unpacked = (g1, g2, contig_pair >> 16, contig_pair & 0xFFFF,
                    b1, b2, (dir_pair >> 1) & 1, dir_pair & 1)
        got[unpacked] = list(np.asarray(out["support"][i]))
    expected_typed = {tuple(int(v) for v in key): counts
                      for key, counts in expected.items()}
    assert got == expected_typed


def test_sharded_cluster_matches_host():
    """DP-sharded clustering (local aggregate -> all_gather -> merge) equals
    host dict aggregation, independent of the shard count."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from arriba_tpu.ops.cluster import SUPPORT_KINDS, pack_keys
    from arriba_tpu.parallel.dp import make_mesh, sharded_cluster_step
    from jax.sharding import NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 2:
        import pytest
        pytest.skip("needs a multi-device (virtual CPU) mesh")

    mesh = make_mesh()
    rng = np.random.default_rng(23)
    n = 64 * mesh.devices.size
    gene1 = rng.integers(0, 6, n)
    gene2 = rng.integers(0, 6, n)
    contig1 = np.zeros(n, np.int64)
    contig2 = np.zeros(n, np.int64)
    bp1 = rng.integers(0, 4, n) * 100
    bp2 = rng.integers(0, 4, n) * 100
    d1 = rng.integers(0, 2, n)
    d2 = rng.integers(0, 2, n)
    kind = rng.integers(0, SUPPORT_KINDS, n).astype(np.int32)
    valid = rng.random(n) < 0.9

    expected = {}
    for i in range(n):
        if not valid[i]:
            continue
        key = (gene1[i], gene2[i], 0, 0, bp1[i], bp2[i], d1[i], d2[i])
        expected.setdefault(tuple(int(v) for v in key),
                            [0] * SUPPORT_KINDS)[kind[i]] += 1

    words = pack_keys(*(jnp.asarray(x) for x in
                        (gene1, gene2, contig1, contig2, bp1, bp2, d1, d2)))
    vec = NamedSharding(mesh, P("dp"))
    words = tuple(jax.device_put(w, vec) for w in words)
    step = sharded_cluster_step(mesh)
    out = step(words, jax.device_put(jnp.asarray(kind), vec),
               jax.device_put(jnp.asarray(valid), vec))

    n_clusters = int(out["n_clusters"])
    assert n_clusters == len(expected)
    got = {}
    out_words = [np.asarray(w) for w in out["words"]]
    for i in range(n_clusters):
        g1, g2, contig_pair, b1, b2, dir_pair = (int(w[i]) for w in out_words)
        key = (g1, g2, contig_pair >> 16, contig_pair & 0xFFFF, b1, b2,
               (dir_pair >> 1) & 1, dir_pair & 1)
        got[key] = list(int(v) for v in np.asarray(out["support"][i]))
    assert got == expected


def test_blacklist_range_triage_matches_bruteforce():
    import numpy as np
    import jax.numpy as jnp
    from arriba_tpu.ops.blacklist import (build_range_index, contig_offsets,
                                          query_points)

    rng = np.random.default_rng(7)
    lengths = [100000, 50000, 200000]
    offsets = contig_offsets(lengths)
    n_ranges = 300
    contig = rng.integers(0, 3, n_ranges)
    start = np.array([rng.integers(0, lengths[c] - 100) for c in contig])
    end = start + rng.integers(1, 5000, n_ranges)
    end = np.minimum(end, np.array([lengths[c] - 1 for c in contig]))
    starts_d, ends_d = build_range_index(contig, start, end, offsets)

    n_queries = 2000
    q_contig = rng.integers(0, 3, n_queries)
    q_pos = np.array([rng.integers(0, lengths[c]) for c in q_contig])
    q_global = jnp.asarray((offsets[q_contig].astype(np.uint64)
                            + q_pos.astype(np.uint64)).astype(np.uint32))
    got = np.asarray(query_points(starts_d, ends_d, q_global))

    for i in range(n_queries):
        expected = bool(np.any((contig == q_contig[i]) & (start <= q_pos[i])
                               & (q_pos[i] <= end)))
        assert got[i] == expected, i


def test_shard_count_invariance():
    """Same per-read outputs and global statistics at 1, 2, and 8 shards
    (SURVEY §4: multi-host determinism — same output for 1 vs N shards)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from arriba_tpu.ops.encode import random_read_batch
    from arriba_tpu.parallel.dp import (make_mesh, shard_batch,
                                        sharded_read_filter_step)

    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs the virtual 8-device CPU mesh")

    rng = np.random.default_rng(5)
    batch = random_read_batch(rng, 128, 96, mismatch_rate=0.02)

    results = {}
    for n_devices in (1, 2, 8):
        mesh = make_mesh(n_devices)
        sharded = shard_batch(batch, mesh)
        step = sharded_read_filter_step(mesh)
        per_read, globals_ = step(
            sharded.bases, sharded.ref, sharded.match_mask, sharded.length,
            sharded.aligned_start, sharded.aligned_end,
            jnp.zeros(sharded.bases.shape[0], jnp.int32))
        results[n_devices] = (
            {k: np.asarray(v)[:batch.n_reads] for k, v in per_read.items()},
            {k: int(v) for k, v in globals_.items()})

    base_per_read, base_globals = results[1]
    for n_devices in (2, 8):
        per_read, globals_ = results[n_devices]
        assert globals_ == base_globals, n_devices
        for key in base_per_read:
            np.testing.assert_array_equal(per_read[key], base_per_read[key],
                                          err_msg=f"{key}@{n_devices}")


def test_screen_pairs_sound_vs_exact_recursion():
    """The device shared-8-mer screen (realign.screen_pairs) must be a SOUND
    prefilter for the reference recursion: no (read, window) pair it rejects
    may be accepted by filters.mismappers.align on either strand. Effectiveness
    is asserted too: exact substrings of the window must pass the screen."""
    from arriba_tpu.filters.mismappers import (KMER_BASE_LUT, align,
                                               kmer_to_int)
    from arriba_tpu.seq import reverse_complement_str

    rng = np.random.default_rng(1234)
    bases = np.frombuffer(b"ACGT", np.uint8)

    def random_seq(n, with_n=False):
        seq = rng.choice(bases, n)
        if with_n:
            idx = rng.integers(0, n, max(1, n // 20))
            seq = seq.copy()
            seq[idx] = ord("N")
        return seq

    window = random_seq(3000, with_n=True)
    window_str = window.tobytes().decode()

    # reference-style kmer index over the whole window (one "gene")
    k = 8
    kmer_index = {}
    for pos in range(len(window_str) - k):
        if window_str[pos] == "N":
            continue
        kmer_index.setdefault(kmer_to_int(window_str, pos, k), []).append(pos)
    kmer_index = {v: np.asarray(p, np.int64) for v, p in kmer_index.items()}

    reads = []
    exact_substrings = []
    for i in range(40):
        kind = i % 5
        if kind == 0:  # exact substring
            start = int(rng.integers(0, len(window) - 60))
            seq = window_str[start:start + 50]
            exact_substrings.append(len(reads))
        elif kind == 1:  # rc substring
            start = int(rng.integers(0, len(window) - 60))
            seq = reverse_complement_str(window_str[start:start + 50])
            exact_substrings.append(len(reads))
        elif kind == 2:  # mutated substring
            start = int(rng.integers(0, len(window) - 60))
            arr = window[start:start + 50].copy()
            for j in rng.integers(0, 50, 6):
                arr[j] = rng.choice(bases)
            seq = arr.tobytes().decode()
        elif kind == 3:  # random read
            seq = random_seq(50).tobytes().decode()
        else:  # random read with Ns
            seq = random_seq(50, with_n=True).tobytes().decode()
        reads.append(seq)

    screen = realign.screen_pairs(reads, [window] * len(reads))

    for i in exact_substrings:
        assert screen[i], f"screen must pass exact substring row {i}"

    for i, seq in enumerate(reads):
        if screen[i]:
            continue
        min_score = int(0.8 * len(seq) + 0.5)
        for strand_seq in (seq, reverse_complement_str(seq)):
            accepted = align(0, strand_seq, 0, window, 0, 0, len(window) - 1,
                             kmer_index, k, [], min_score, 1)
            assert not accepted, \
                f"screen rejected row {i} but exact recursion accepts"


def test_accept_pairs_sound_and_effective_vs_exact_recursion():
    """The device single-seed accept (realign.accept_pairs) must be SOUND:
    every pair it accepts is accepted by the exact recursion
    (filters.mismappers.align, either strand). Effectiveness: embedded
    (near-)copies of window segments must be device-accepted, so the host
    recursion is genuinely skippable for plain mismappers."""
    from arriba_tpu.filters.mismappers import align, kmer_to_int
    from arriba_tpu.seq import reverse_complement_str

    rng = np.random.default_rng(777)
    bases = np.frombuffer(b"ACGT", np.uint8)

    def build_index(window):
        k = 8
        window_str = window.tobytes().decode()
        idx = {}
        for pos in range(len(window_str) - k):
            if window_str[pos] == "N":
                continue
            idx.setdefault(kmer_to_int(window_str, pos, k), []).append(pos)
        return {v: np.asarray(p, np.int64) for v, p in idx.items()}

    reads, windows, min_scores, expect_accept = [], [], [], []
    for t in range(48):
        L = int(rng.integers(20, 151))
        W = int(rng.integers(300, 9000))  # spans the 8192 chunking path
        win = rng.choice(bases, W).copy()
        if t % 6 == 0:
            win[rng.integers(0, W, 4)] = ord("N")
        kind = t % 4
        if kind == 0:
            read = rng.choice(bases, L)             # random: mostly reject
        elif kind == 1:
            p = int(rng.integers(0, W - L))
            read = win[p:p + L].copy()              # exact embedded copy
            expect_accept.append(t)
        elif kind == 2:
            p = int(rng.integers(0, W - L))
            read = win[p:p + L].copy()              # scattered mismatches
            for j in rng.integers(0, L, 3):
                read[j] = rng.choice(bases)
        else:
            p = int(rng.integers(0, W - L))
            read = np.frombuffer(reverse_complement_str(
                win[p:p + L].tobytes().decode()).encode(), np.uint8)
            expect_accept.append(t)
        seq = read.tobytes().decode()
        reads.append(seq)
        windows.append(win)
        min_scores.append(int(0.8 * len(seq) + 0.5))

    accepted = realign.accept_pairs(reads, windows, min_scores)

    for t in expect_accept:
        assert accepted[t], f"device must accept embedded copy row {t}"

    for t in range(len(reads)):
        if not accepted[t]:
            continue
        win = windows[t]
        idx = build_index(win)
        host = any(
            align(0, s, 0, win, 0, 0, len(win) - 1, idx, 8, [],
                  min_scores[t], 1)
            for s in (reads[t], reverse_complement_str(reads[t])))
        assert host, f"UNSOUND device accept at row {t}"


def test_accept_pairs_respects_min_score_and_bounds():
    """Boundary semantics of the accept kernel: the outer-loop seed bound
    (2p <= len + 16 - min_score), the k-mer index upper bound
    (g <= window_len - 10), and window-edge extension stops must all match
    align() — checked via adversarial constructions near each bound."""
    from arriba_tpu.filters.mismappers import align, kmer_to_int
    from arriba_tpu.seq import reverse_complement_str

    rng = np.random.default_rng(31)
    bases = np.frombuffer(b"ACGT", np.uint8)

    def host(seq, win, ms):
        k = 8
        ws = win.tobytes().decode()
        idx = {}
        for pos in range(len(ws) - k):
            if ws[pos] == "N":
                continue
            idx.setdefault(kmer_to_int(ws, pos, k), []).append(pos)
        idx = {v: np.asarray(p, np.int64) for v, p in idx.items()}
        return any(align(0, s, 0, win, 0, 0, len(win) - 1, idx, k, [], ms, 1)
                   for s in (seq, reverse_complement_str(seq)))

    cases = []
    # (a) copy only matchable at the very END of the window (index bound)
    win = rng.choice(bases, 400).copy()
    read = win[400 - 40:].tobytes().decode()
    cases.append((read, win))
    # (b) copy at the very START (left-edge extension stop)
    win2 = rng.choice(bases, 400).copy()
    read2 = win2[:40].tobytes().decode()
    cases.append((read2, win2))
    # (c) read whose matching segment sits in its own TAIL (seed-position
    # bound: seeds beyond (L + 16 - ms) / 2 are ineligible)
    win3 = rng.choice(bases, 600).copy()
    tail = win3[100:160]
    read3 = (rng.choice(bases, 90).tobytes().decode()
             + tail.tobytes().decode())
    cases.append((read3, win3))
    for i, (seq, win) in enumerate(cases):
        ms = int(0.8 * len(seq) + 0.5)
        dev = bool(realign.accept_pairs([seq], [win], [ms])[0])
        ref = host(seq, win, ms)
        # soundness always; for these single-diagonal constructions the
        # device must agree exactly with the recursion
        assert dev == ref, f"case {i}: device={dev} host={ref}"

    # (d) 4 consecutive mismatches mid-read: the simple-path walk breaks at
    # the run, but align() still accepts through its DELETION recursion
    # (filter_mismappers.cpp:163-171) — the device must stay sound (False
    # or a sound True via another seed), never claim an unsound accept
    win4 = rng.choice(bases, 500).copy()
    arr = win4[50:170].copy()
    arr[40:44] = (arr[40:44] + 1) % 4
    seq4 = arr.tobytes().decode()
    ms4 = int(0.8 * len(seq4) + 0.5)
    dev4 = bool(realign.accept_pairs([seq4], [win4], [ms4])[0])
    assert host(seq4, win4, ms4), "recursion should accept via deletion"
    if dev4:  # acceptable only because the host accepts too
        pass


def test_screen_pairs_chunks_long_windows():
    """Seeds straddling the 2048-column chunk boundary are still found
    (chunks overlap by k-1)."""
    rng = np.random.default_rng(9)
    bases = np.frombuffer(b"ACGT", np.uint8)
    window = rng.choice(bases, 5000)
    for anchor in (2041, 2044, 2047, 4082, 4089):
        seq = window[anchor:anchor + 12].tobytes().decode()
        hit = realign.screen_pairs([seq], [window])
        assert hit[0], anchor


def test_platform_env_guard_leaves_plugin_platforms_alone(monkeypatch):
    """_apply_jax_platform_env must not force (and clear backends for) a
    JAX_PLATFORMS request naming a non-built-in platform: such platforms
    are registered dynamically by site hooks (e.g. a tunneled-chip PJRT
    plugin), and re-initialization after clear_backends() loses the
    registration, killing every later device call in the process."""
    import jax

    from arriba_tpu.filters.read_level import _apply_jax_platform_env

    before = jax.config.jax_platforms
    monkeypatch.setenv("JAX_PLATFORMS", "someplugin")
    _apply_jax_platform_env()
    assert jax.config.jax_platforms == before

    # built-in requests still force (the virtual-CPU test meshes rely on
    # it); here the config already matches, so it must stay a no-op too
    monkeypatch.setenv("JAX_PLATFORMS", before or "cpu")
    _apply_jax_platform_env()
    assert jax.config.jax_platforms == before or jax.config.jax_platforms in (None, "cpu")


def test_accept_wavefront_pallas_matches_xla():
    """The Pallas accept wavefront (VMEM-resident carries, interpret mode
    here) must agree with the XLA wavefront exactly — embedded copies,
    random rejects, short windows, and per-row bounds."""
    import jax.numpy as jnp

    rng = np.random.default_rng(17)
    N, L, W = 16, 128, 512
    reads = rng.integers(65, 85, (N, L)).astype(np.uint8)
    wins = rng.integers(65, 85, (N, W)).astype(np.uint8)
    for i in range(0, N, 2):
        p = int(rng.integers(0, W - 100))
        reads[i, :100] = wins[i, p:p + 100]
        reads[i, rng.integers(0, 100, 2)] = rng.integers(65, 85, 2)
    read_len = np.full(N, 100, np.int32)
    win_len = rng.integers(200, W + 1, N).astype(np.int32)
    ms = np.full(N, 80, np.int32)
    lo = np.zeros(N, np.int32)
    hi = win_len.copy()
    params = np.zeros((N, 128), np.int32)
    params[:, 0] = read_len
    params[:, 1] = win_len
    params[:, 2] = ms
    params[:, 3] = lo
    params[:, 4] = hi

    ref = np.asarray(realign._accept_wavefront_kernel(
        jnp.asarray(reads), jnp.asarray(wins), jnp.asarray(read_len),
        jnp.asarray(win_len), jnp.asarray(ms), jnp.asarray(lo),
        jnp.asarray(hi)))
    out = np.asarray(realign._accept_wavefront_pallas(
        jnp.asarray(reads), jnp.asarray(wins), jnp.asarray(params),
        block_n=16, interpret=True))
    assert ref.sum() > 0  # embedded copies accepted
    np.testing.assert_array_equal(ref, out)
