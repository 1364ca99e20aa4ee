"""Sharded mid-cascade global statistics (parallel/stats.py): shard-count
invariance of the e-value/in-vitro reductions and byte-identical
fusions.tsv through the ARRIBA_TPU_SHARDED_STATS pipeline mode
(SURVEY §2.7 deterministic global reductions;
filter_relative_support.cpp:20-83, filter_in_vitro.cpp:48-83)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from .scenario import fuzz_sample, multi_event_sample


def _run_pipeline_state(tmp_path):
    """Run the full pipeline in-process on a multi-event sample and return
    (fusion list, genes, chimeric alignments, options)."""
    from arriba_tpu.cli import parse_arguments
    from arriba_tpu.pipeline import run

    args = multi_event_sample(tmp_path)
    options = parse_arguments(args + ["-o", str(tmp_path / "fusions.tsv")])
    # the native event cascade materializes only passing fusions; the unit
    # test wants the whole candidate table, so force the Python cascade
    os.environ["ARRIBA_TPU_NO_NATIVE_EVENT"] = "1"
    try:
        state = run(options)
    finally:
        del os.environ["ARRIBA_TPU_NO_NATIVE_EVENT"]
    return state


def test_stats_shard_invariance(tmp_path, capsys):
    """The device reduction equals the host pass bit-for-bit at every shard
    count (1, 2, 8) — partner counts, location distribution, read-through
    gene sets, and the expression quantile."""
    from arriba_tpu.filters.event_level import (compute_cascade_stats,
                                                extract_fusion_columns)
    from arriba_tpu.filters.in_vitro import (expression_gene_incidence,
                                             find_top_expressed_genes)
    from arriba_tpu.parallel.dp import make_mesh
    from arriba_tpu.parallel.stats import compute_stats_sharded

    state = _run_pipeline_state(tmp_path)
    fusion_list = list(state.fusions.values())
    assert len(fusion_list) > 3, "sample produced too few candidates"
    genes = state.annotation.genes
    ca = state.chimeric_alignments
    quantile = state.options.high_expression_quantile

    host_stats = compute_cascade_stats(
        extract_fusion_columns(fusion_list, genes), genes)
    host_counts, host_threshold = find_top_expressed_genes(ca, quantile)
    incidence = expression_gene_incidence(ca)

    results = {}
    for n in (1, 2, 8):
        mesh = make_mesh(n)
        stats, (dense, threshold) = compute_stats_sharded(
            fusion_list, genes, incidence, quantile, mesh)
        results[n] = (stats, dense, threshold)

        assert stats == host_stats, f"stats diverge at {n} shards"
        assert threshold == host_threshold, f"threshold diverges at {n} shards"
        dense_dict = {g: int(c) for g, c in enumerate(dense) if c}
        assert dense_dict == dict(host_counts), \
            f"expression counts diverge at {n} shards"

    # partner counts are a nontrivial reduction — make sure the sample
    # actually exercises them
    assert host_stats.partner_count.sum() > 0


@pytest.mark.parametrize("scenario_builder,seed", [
    (multi_event_sample, 13),
    (fuzz_sample, 207),
    (fuzz_sample, 314),
])
def test_sharded_stats_pipeline_byte_parity(tmp_path, scenario_builder, seed):
    """ARRIBA_TPU_SHARDED_STATS=n produces byte-identical fusions.tsv,
    discarded output, and stage counters for n in {1, 8} vs the host path."""
    args = scenario_builder(tmp_path, seed)
    outputs = {}
    for label, env_extra in (("host", {}),
                             ("shard1", {"ARRIBA_TPU_SHARDED_STATS": "1"}),
                             ("shard8", {"ARRIBA_TPU_SHARDED_STATS": "8"})):
        out = str(tmp_path / f"fusions_{label}.tsv")
        discarded = str(tmp_path / f"discarded_{label}.tsv")
        env = dict(os.environ, JAX_PLATFORMS=os.environ.get(
            "ARRIBA_TPU_TEST_PLATFORM", "cpu"), **env_extra)
        result = subprocess.run(
            [sys.executable, "-m", "arriba_tpu"] + args
            + ["-o", out, "-O", discarded],
            env=env, capture_output=True, text=True, timeout=900)
        assert result.returncode == 0, result.stderr[-2000:]
        counters = [line.split("remaining=")[-1]
                    for line in result.stdout.splitlines()
                    if "remaining=" in line]
        outputs[label] = (open(out, "rb").read(),
                          open(discarded, "rb").read(), counters)
    assert outputs["host"] == outputs["shard1"]
    assert outputs["host"] == outputs["shard8"]
