"""Multi-process (DCN) execution of the sharded candidate merge and
mid-cascade statistics.

The single-process mesh (parallel/dp.py, parallel/stats.py) scales reads
and candidates over one host's devices with ICI collectives. This module
is the ≥2-host tier: each process owns a slice of the global device mesh
(`jax.distributed.initialize`), candidate rows are laid out process-local,
and the all_gather/psum collectives of the cluster-merge and statistics
steps cross the process boundary (DCN; Gloo on the CPU test fixture). The
merged cluster table and every statistic are replicated on all processes
and bit-identical to the single-process result — the BASELINE.md scaling
row ("candidates merged via all-gather over ICI/DCN").

Worker entry point (one per process):

    python -m arriba_tpu.parallel.multihost \
        --coordinator localhost:PORT --num-processes 2 --process-id I \
        --input inputs.npz --output out_I.npz

`inputs.npz` carries the pre-marshalled arrays
(parallel/stats.py:build_stats_host_inputs + candidate_cluster_inputs);
every process loads the full file and contributes the shards its local
devices own via make_array_from_callback. tests/test_multihost.py drives
two workers end-to-end and diffs their outputs against the local mesh.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def run_multiprocess_stats(fusion_list, genes, gene_hits, quantile: float,
                           n_processes: int = 2, devices_per_process: int = 4,
                           timeout: float = 600.0):
    """Drive the full sharded reduction (candidate cluster merge +
    mid-cascade statistics) across `n_processes` genuine jax.distributed
    processes (Gloo/DCN collectives) from within the pipeline, returning
    (CascadeStats, (dense expression, threshold), n_clusters) — the
    multi-host execution path of the production cascade
    (ARRIBA_TPU_SHARDED_STATS=<n>procs). Raises on worker failure or
    cross-process divergence; the caller falls back to the host pass."""
    import socket
    import subprocess
    import sys
    import tempfile

    from ..filters.event_level import CascadeStats
    from .stats import build_stats_host_inputs, candidate_cluster_inputs

    n_dp = n_processes * devices_per_process
    inputs = build_stats_host_inputs(fusion_list, genes, gene_hits, n_dp)
    ckey, kind, valid = candidate_cluster_inputs(fusion_list, n_dp)
    inputs.update(cluster_keys=ckey, cluster_kind=kind, cluster_valid=valid,
                  quantile=np.float64(quantile))

    def _fresh_port() -> int:
        with socket.socket() as sock:
            sock.bind(("localhost", 0))
            return sock.getsockname()[1]

    def _launch(tmp: str, input_path: str, repo: str, port: int):
        workers = []
        for pid in range(n_processes):
            env = dict(os.environ,
                       JAX_PLATFORMS="cpu",
                       XLA_FLAGS=f"--xla_force_host_platform_device_count="
                                 f"{devices_per_process}",
                       PYTHONPATH=repo + os.pathsep
                       + os.environ.get("PYTHONPATH", ""))
            env.pop("PALLAS_AXON_POOL_IPS", None)
            workers.append(subprocess.Popen(
                [sys.executable, "-m", "arriba_tpu.parallel.multihost",
                 "--coordinator", f"localhost:{port}",
                 "--num-processes", str(n_processes),
                 "--process-id", str(pid),
                 "--input", input_path,
                 "--output", os.path.join(tmp, f"out_{pid}.npz")],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True))
        try:
            logs = [w.communicate(timeout=timeout) for w in workers]
        finally:
            # a hung/failed worker must not outlive the tempdir (it could
            # still be writing into it) or linger as an orphan process
            for worker in workers:
                if worker.poll() is None:
                    worker.kill()
                    try:
                        worker.communicate(timeout=30)
                    except Exception:  # noqa: BLE001
                        pass
        for pid, worker in enumerate(workers):
            if worker.returncode != 0:
                raise RuntimeError(f"multihost worker {pid} failed: "
                                   f"{logs[pid][1][-2000:]}")

    with tempfile.TemporaryDirectory(prefix="arriba_tpu_mh_") as tmp:
        input_path = os.path.join(tmp, "inputs.npz")
        np.savez(input_path, **inputs)
        repo = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        try:
            _launch(tmp, input_path, repo, _fresh_port())
        except RuntimeError as error:
            # the ephemeral port is picked bind-then-close, so another
            # process can steal it before the rank-0 coordinator binds it;
            # retry exactly once with a fresh port on a bind-class failure
            text = str(error).lower()
            if not any(s in text for s in ("bind", "address already in use",
                                           "failed to connect",
                                           "deadline exceeded")):
                raise
            _launch(tmp, input_path, repo, _fresh_port())
        outs = [dict(np.load(os.path.join(tmp, f"out_{pid}.npz")))
                for pid in range(n_processes)]
    for key in outs[0]:
        for other in outs[1:]:
            if not np.array_equal(outs[0][key], other[key]):
                raise RuntimeError(f"process outputs diverge at {key}")

    out = outs[0]
    stats = CascadeStats(
        partner_count=np.asarray(out["partner_count"], np.int64),
        spliced_breakpoints=int(out["spliced_breakpoints"]),
        exonic_breakpoints=int(out["exonic_breakpoints"]),
        intronic_breakpoints=int(out["intronic_breakpoints"]),
        exonic_intronic_breakpoints=int(out["exonic_intronic_breakpoints"]),
        intragenic_duplications=int(out["intragenic_duplications"]),
        intragenic_inversions=int(out["intragenic_inversions"]),
        spliced_same_gene=int(out["spliced_same_gene"]),
        spliced_different_genes=int(out["spliced_different_genes"]),
        genes_with_fusions=int(out["genes_with_fusions"]),
        genes_with_read_through=int(out["genes_with_read_through"]),
    )
    expression = (np.asarray(out["expression"], np.int64),
                  int(out["expression_threshold"]))
    return stats, expression, int(out["n_clusters"])


def worker_main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--coordinator", required=True)
    parser.add_argument("--num-processes", type=int, required=True)
    parser.add_argument("--process-id", type=int, required=True)
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--platform",
                        default=os.environ.get(
                            "ARRIBA_TPU_MULTIHOST_PLATFORM", "cpu"))
    parser.add_argument("--bench-iters", type=int, default=0,
                        help="repeat the cluster merge N timed iterations "
                             "and record bench_cluster_seconds")
    args = parser.parse_args(argv)

    import jax
    # env var alone is not enough where a platform plugin overrides it
    jax.config.update("jax_platforms", args.platform)
    jax.distributed.initialize(coordinator_address=args.coordinator,
                               num_processes=args.num_processes,
                               process_id=args.process_id)

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from .dp import sharded_cluster_step
    from .stats import run_stats_step, stats_from_outputs

    devices = jax.devices()
    mesh = Mesh(np.array(devices), ("dp",))
    vec = NamedSharding(mesh, P("dp"))

    loaded = dict(np.load(args.input))

    def put(array: np.ndarray):
        """Global row-sharded array; this process materializes only the
        shards its local devices address."""
        return jax.make_array_from_callback(
            array.shape, vec, lambda index: array[index])

    # ---- candidate merge across the process boundary ---------------------
    from ..ops.cluster import pack_keys
    ckey = loaded.pop("cluster_keys")
    kind = loaded.pop("cluster_kind")
    valid = loaded.pop("cluster_valid")
    words = pack_keys(*(jnp.asarray(row) for row in ckey))
    words = tuple(put(np.asarray(w)) for w in words)
    cluster_step = sharded_cluster_step(mesh)
    clusters = cluster_step(words, put(kind), put(valid))
    n_clusters = int(clusters["n_clusters"])

    bench_seconds = 0.0
    if args.bench_iters:
        import time
        kind_arr, valid_arr = put(kind), put(valid)
        jax.block_until_ready(cluster_step(words, kind_arr, valid_arr))
        start = time.perf_counter()
        for _ in range(args.bench_iters):
            jax.block_until_ready(cluster_step(words, kind_arr, valid_arr))
        bench_seconds = time.perf_counter() - start

    # ---- sharded mid-cascade statistics ----------------------------------
    quantile = float(loaded.pop("quantile"))
    out = run_stats_step(mesh, loaded, put)
    stats, (expression, threshold) = stats_from_outputs(out, quantile)

    result = {
        "cluster_words": np.stack(
            [np.asarray(w)[:n_clusters] for w in clusters["words"]]),
        "cluster_support": np.asarray(clusters["support"])[:n_clusters],
        "n_clusters": np.int64(n_clusters),
        "expression": expression,
        "expression_threshold": np.int64(threshold),
        "partner_count": stats.partner_count,
        "bench_cluster_seconds": np.float64(bench_seconds),
    }
    for name in ("spliced_breakpoints", "exonic_breakpoints",
                 "intronic_breakpoints", "exonic_intronic_breakpoints",
                 "intragenic_duplications", "intragenic_inversions",
                 "spliced_same_gene", "spliced_different_genes",
                 "genes_with_fusions", "genes_with_read_through"):
        result[name] = np.int64(getattr(stats, name))
    np.savez(args.output, **result)
    print(f"multihost worker {args.process_id}/{args.num_processes}: "
          f"{len(devices)} global devices "
          f"({len(jax.local_devices())} local), "
          f"clusters={n_clusters}, threshold={threshold}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(worker_main())
