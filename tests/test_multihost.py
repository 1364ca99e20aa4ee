"""Genuine multi-process execution: 2 jax.distributed processes x 4
virtual CPU devices run the candidate merge (all_gather across the
process boundary over Gloo — the DCN analog) and the sharded mid-cascade
statistics on real pipeline data, and must match the single-process
8-device mesh bit for bit (BASELINE.md scaling row)."""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as sock:
        sock.bind(("localhost", 0))
        return sock.getsockname()[1]


def test_two_process_candidate_merge(tmp_path):
    from arriba_tpu.filters.in_vitro import expression_gene_incidence
    from arriba_tpu.parallel.dp import make_mesh, sharded_cluster_step
    from arriba_tpu.parallel.stats import (build_stats_host_inputs,
                                           candidate_cluster_inputs,
                                           compute_stats_sharded,
                                           run_stats_step)
    from .test_sharded_stats import _run_pipeline_state

    # real data: the full pipeline on a multi-event sample
    state = _run_pipeline_state(tmp_path)
    fusion_list = list(state.fusions.values())
    genes = state.annotation.genes
    quantile = state.options.high_expression_quantile
    incidence = expression_gene_incidence(state.chimeric_alignments)

    # pre-marshalled inputs shipped to every process
    inputs = build_stats_host_inputs(fusion_list, genes, incidence, 8)
    ckey, kind, valid = candidate_cluster_inputs(fusion_list, 8)
    inputs.update(cluster_keys=ckey, cluster_kind=kind, cluster_valid=valid,
                  quantile=np.float64(quantile))
    input_path = tmp_path / "inputs.npz"
    np.savez(input_path, **inputs)

    # single-process reference on the local 8-device mesh
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from arriba_tpu.ops.cluster import pack_keys

    mesh = make_mesh(8)
    vec = NamedSharding(mesh, P("dp"))
    words = pack_keys(*(jnp.asarray(row) for row in ckey))
    words = tuple(jax.device_put(np.asarray(w), vec) for w in words)
    clusters = sharded_cluster_step(mesh)(
        words, jax.device_put(kind, vec), jax.device_put(valid, vec))
    n_ref = int(clusters["n_clusters"])
    ref_words = np.stack([np.asarray(w)[:n_ref] for w in clusters["words"]])
    ref_support = np.asarray(clusters["support"])[:n_ref]
    ref_stats, (ref_expression, ref_threshold) = compute_stats_sharded(
        fusion_list, genes, incidence, quantile, mesh)
    assert n_ref > 0

    # two worker processes, 4 virtual devices each, Gloo collectives
    port = _free_port()
    workers = []
    for pid in (0, 1):
        env = dict(os.environ,
                   JAX_PLATFORMS="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count=4",
                   PYTHONPATH=str(REPO) + os.pathsep
                   + os.environ.get("PYTHONPATH", ""))
        workers.append(subprocess.Popen(
            [sys.executable, "-m", "arriba_tpu.parallel.multihost",
             "--coordinator", f"localhost:{port}",
             "--num-processes", "2", "--process-id", str(pid),
             "--input", str(input_path),
             "--output", str(tmp_path / f"out_{pid}.npz")],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True))
    logs = [w.communicate(timeout=300) for w in workers]
    for pid, worker in enumerate(workers):
        assert worker.returncode == 0, \
            f"worker {pid} failed:\n{logs[pid][1][-3000:]}"

    outs = [dict(np.load(tmp_path / f"out_{pid}.npz")) for pid in (0, 1)]
    # both processes hold the identical replicated result
    for key in outs[0]:
        assert np.array_equal(outs[0][key], outs[1][key]), \
            f"process outputs diverge at {key}"

    # ... and it matches the single-process mesh bit for bit
    out = outs[0]
    assert int(out["n_clusters"]) == n_ref
    assert np.array_equal(out["cluster_words"], ref_words)
    assert np.array_equal(out["cluster_support"], ref_support)
    assert np.array_equal(out["partner_count"], ref_stats.partner_count)
    assert np.array_equal(out["expression"], ref_expression)
    assert int(out["expression_threshold"]) == ref_threshold
    for name in ("spliced_breakpoints", "exonic_breakpoints",
                 "intronic_breakpoints", "exonic_intronic_breakpoints",
                 "intragenic_duplications", "intragenic_inversions",
                 "spliced_same_gene", "spliced_different_genes",
                 "genes_with_fusions", "genes_with_read_through"):
        assert int(out[name]) == getattr(ref_stats, name), name
