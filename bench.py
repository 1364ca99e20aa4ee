"""Benchmark: chimeric reads/s through the device read-filter step.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline derivation (BASELINE.md): the reference processes a full RNA-Seq
sample in "typically ~2 minutes" single-threaded post-alignment
(README.md:4); a typical sample has 1-10% chimeric reads of ~20M mapped
(documentation/10-Current-limitations.md:18), i.e. ~1M chimeric reads in
~120 s ≈ 8,000 chimeric reads/s single core. vs_baseline is measured
throughput over that estimate; the BASELINE.json target is >=10x on one
v5e chip.

The measured step is the fused per-read filter math (mismatch counting +
binomial test + recurrent-3-mer content scan) over [N, L] read tensors —
the embarrassingly-parallel core of the cascade that the TPU accelerates.
"""

from __future__ import annotations

import json
import time

import numpy as np

ARRIBA_BASELINE_READS_PER_S = 8000.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from arriba_tpu.ops.encode import random_read_batch
    from arriba_tpu.ops.readfilters import read_filter_step

    n_reads = 65536
    read_length = 152
    rng = np.random.default_rng(0)
    batch = random_read_batch(rng, n_reads, read_length, mismatch_rate=0.01)

    args = (
        jnp.asarray(batch.bases), jnp.asarray(batch.ref),
        jnp.asarray(batch.match_mask), jnp.asarray(batch.length),
        jnp.asarray(batch.aligned_start), jnp.asarray(batch.aligned_end),
        jnp.zeros(batch.bases.shape[0], jnp.int32),
    )

    # warmup/compile
    out = read_filter_step(*args)
    jax.block_until_ready(out)
    float(np.asarray(out["pvalue"])[0])  # force a host round-trip

    iters = 30
    start = time.perf_counter()
    extra = args[-1]
    for _ in range(iters):
        out = read_filter_step(*args[:-1], extra)
        # chain each iteration on the previous result so dispatches serialize
        extra = out["mismatches"] * 0
    # a (tiny) host transfer is the only reliable completion barrier on all
    # backends; reduce on device so the tunnel moves 4 bytes, not the batch
    checksum = float(jnp.sum(out["pvalue"]))
    elapsed = time.perf_counter() - start
    assert checksum >= 0.0

    reads_per_s = n_reads * iters / elapsed
    print(json.dumps({
        "metric": "device_read_filter_chimeric_reads_per_s",
        "value": round(reads_per_s, 1),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_s / ARRIBA_BASELINE_READS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
