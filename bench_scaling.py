"""Scaling benchmark: chimeric reads/s of the DP-sharded filter step at
1..N devices (BASELINE.md: chimeric-reads/s scaling at 1 chip / 1 host /
more hosts).

On real multi-chip hardware this measures ICI scaling directly. In a
single-chip or CPU environment, run with
`JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8`
to measure the sharded program over a virtual mesh (demonstrates the
sharding works and the collectives are sublinear; absolute numbers are
host-bound). Prints one JSON line per mesh size.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import os

    import jax

    # the environment may register a tunneled single-chip TPU platform that
    # overrides JAX_PLATFORMS; honor an explicit request for the CPU mesh
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        import jax.extend.backend
        jax.extend.backend.clear_backends()
    import jax.numpy as jnp

    from arriba_tpu.ops.encode import random_read_batch
    from arriba_tpu.parallel.dp import (make_mesh, shard_batch,
                                        sharded_read_filter_step)

    n_available = len(jax.devices())
    mesh_sizes = [n for n in (1, 2, 4, 8, 16) if n <= n_available]
    on_cpu = jax.devices()[0].platform == "cpu"
    n_reads = 8192 if on_cpu else 65536
    rng = np.random.default_rng(0)
    batch = random_read_batch(rng, n_reads, 152, mismatch_rate=0.01)

    for n_devices in mesh_sizes:
        mesh = make_mesh(n_devices)
        sharded = shard_batch(batch, mesh)
        step = sharded_read_filter_step(mesh)
        args = (sharded.bases, sharded.ref, sharded.match_mask, sharded.length,
                sharded.aligned_start, sharded.aligned_end,
                jnp.zeros(sharded.bases.shape[0], jnp.int32))
        per_read, globals_ = step(*args)
        jax.block_until_ready((per_read, globals_))

        iters = 10
        start = time.perf_counter()
        for _ in range(iters):
            per_read, globals_ = step(*args)
        checksum = int(globals_["total_mismatches"])  # host barrier
        elapsed = time.perf_counter() - start
        assert checksum >= 0

        print(json.dumps({
            "metric": "sharded_filter_reads_per_s",
            "devices": n_devices,
            "value": round(n_reads * iters / elapsed, 1),
            "unit": "reads/s",
        }))

    _pipeline_scaling(mesh_sizes)


def _pipeline_scaling(mesh_sizes) -> None:
    """Second metric: the PRODUCT pipeline with its mid-cascade global
    statistics computed as sharded device reductions
    (ARRIBA_TPU_SHARDED_STATS=n) at each mesh size — chimeric reads/s of
    the full run, outputs byte-identical to the host path (the BASELINE
    scaling row measured on real pipeline data structures)."""
    import os
    import pathlib
    import re
    import subprocess
    import sys
    import tempfile
    import time as time_mod

    repo = pathlib.Path(__file__).resolve().parent
    sys.path.insert(0, str(repo))
    from tests.scenario import multi_event_sample

    sample_dir = pathlib.Path(tempfile.mkdtemp(prefix="arriba_scaling_"))
    args = multi_event_sample(sample_dir)
    reference_bytes = None
    for n_devices in mesh_sizes:
        out = sample_dir / f"fusions_{n_devices}.tsv"
        env = dict(os.environ)
        env["PYTHONPATH"] = str(repo)
        env["ARRIBA_TPU_SHARDED_STATS"] = str(n_devices)
        start = time_mod.perf_counter()
        result = subprocess.run(
            [sys.executable, "-m", "arriba_tpu"] + args + ["-o", str(out)],
            env=env, capture_output=True, text=True)
        elapsed = time_mod.perf_counter() - start
        if result.returncode != 0:
            print(json.dumps({"metric": "sharded_pipeline_reads_per_s",
                              "devices": n_devices, "error": True}))
            continue
        total_match = re.search(r"\(total=(\d+)\)", result.stdout)
        total = int(total_match.group(1)) if total_match else 0
        content = out.read_bytes()
        if reference_bytes is None:
            reference_bytes = content
        print(json.dumps({
            "metric": "sharded_pipeline_reads_per_s",
            "devices": n_devices,
            "value": round(total / elapsed, 1),
            "unit": "chimeric reads/s",
            "byte_equal": content == reference_bytes,
        }))

    _multiprocess_merge_bench()


def _multiprocess_merge_bench(n_rows: int = 1 << 18, iters: int = 20) -> None:
    """The >=2-hosts tier (BASELINE.md scaling row): 2 jax.distributed
    processes x 4 virtual devices run the candidate all-gather merge over
    the process boundary (Gloo = the DCN analog on the CPU fixture) on a
    synthetic candidate table; reports merged rows/s and cross-process
    bit-equality of the merged table."""
    import json
    import os
    import re
    import socket
    import subprocess
    import sys
    import tempfile
    from pathlib import Path

    import numpy as np

    repo = Path(__file__).resolve().parent
    tmp = Path(tempfile.mkdtemp(prefix="arriba_tpu_dcn_bench_"))
    rng = np.random.default_rng(12)
    # candidate rows shaped like candidate_cluster_inputs (8 key columns)
    ckey = np.stack([
        rng.integers(0, 400, n_rows).astype(np.int32),       # gene1
        rng.integers(0, 400, n_rows).astype(np.int32),       # gene2
        rng.integers(0, 4, n_rows).astype(np.int32),         # contig1
        rng.integers(0, 4, n_rows).astype(np.int32),         # contig2
        rng.integers(0, 1 << 20, n_rows).astype(np.int32),   # bp1
        rng.integers(0, 1 << 20, n_rows).astype(np.int32),   # bp2
        rng.integers(0, 2, n_rows).astype(np.int32),         # direction1
        rng.integers(0, 2, n_rows).astype(np.int32),         # direction2
    ])
    kind = rng.integers(0, 3, n_rows).astype(np.int32)
    valid = np.ones(n_rows, bool)
    # the worker also runs the stats step; feed it a tiny gene table
    from arriba_tpu.annotation.tables import GeneTable
    from arriba_tpu.parallel.stats import build_stats_host_inputs
    genes = GeneTable()
    genes.contig = np.zeros(1, np.int64)
    genes.start = np.zeros(1, np.int64)
    genes.end = np.full(1, 1000, np.int64)
    genes.strand = np.zeros(1, np.bool_)
    genes.exonic_length = np.full(1, 1000, np.int64)
    genes.is_dummy = np.zeros(1, np.bool_)
    genes.is_protein_coding = np.zeros(1, np.bool_)
    inputs = build_stats_host_inputs([], genes, np.zeros(0, np.int64), 8)
    inputs.update(cluster_keys=ckey, cluster_kind=kind, cluster_valid=valid,
                  quantile=np.float64(0.998))
    input_path = tmp / "inputs.npz"
    np.savez(input_path, **inputs)

    with socket.socket() as sock:
        sock.bind(("localhost", 0))
        port = sock.getsockname()[1]
    workers = []
    for pid in (0, 1):
        env = dict(os.environ,
                   JAX_PLATFORMS="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count=4",
                   PYTHONPATH=str(repo) + os.pathsep
                   + os.environ.get("PYTHONPATH", ""))
        workers.append(subprocess.Popen(
            [sys.executable, "-m", "arriba_tpu.parallel.multihost",
             "--coordinator", f"localhost:{port}",
             "--num-processes", "2", "--process-id", str(pid),
             "--input", str(input_path),
             "--output", str(tmp / f"out_{pid}.npz"),
             "--bench-iters", str(iters)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True))
    logs = [w.communicate(timeout=600) for w in workers]
    if any(w.returncode != 0 for w in workers):
        print(json.dumps({"metric": "multiprocess_cluster_merge_rows_per_s",
                          "processes": 2, "error": True}))
        print(logs[0][1][-500:], file=sys.stderr)
        return
    outs = [dict(np.load(tmp / f"out_{pid}.npz")) for pid in (0, 1)]
    seconds = max(float(out["bench_cluster_seconds"]) for out in outs)
    equal = all(np.array_equal(outs[0][k], outs[1][k])
                for k in ("cluster_words", "cluster_support", "n_clusters"))
    print(json.dumps({
        "metric": "multiprocess_cluster_merge_rows_per_s",
        "processes": 2, "devices_per_process": 4,
        "value": round(n_rows * iters / seconds, 1),
        "unit": "candidate rows/s (all-gather merge across the process "
                "boundary)",
        "clusters": int(outs[0]["n_clusters"]),
        "cross_process_bit_equal": bool(equal),
    }))


if __name__ == "__main__":
    main()
