"""Sample-sharded ingest (ARRIBA_TPU_SHARDS): byte-equality across process
counts.

ARRIBA_TPU_SHARDS=N forks N worker processes that each scan an interleaved
byte-stripe slice of the SAM (native shard_spec "worker"); the master
saturating-sums their private coverage planes, merges partial same-name
fragments in file order, replays cross-boundary leftover records through the
exact handle path, and runs the normal sort/mark tail (shard_spec "merge").
These tests force tiny stripes so every boundary mechanism (split boring
pairs, split chimeric fragments, partial-fragment merge, replay ordering)
is exercised even on small samples, and require byte-identical fusions.tsv,
discarded file, AND per-stage counters against the unsharded run.

Reference: read_chimeric_alignments.cpp:611-749 (the record loop being
sharded); SURVEY §2.7 "DP sharding of reads".
"""
import os
import re
import subprocess
import sys

import pytest

from .scenario import fuzz_sample, multi_event_sample

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, out_dir, shards=None, stripe_kb=None, threads=1):
    env = dict(os.environ, PYTHONPATH=REPO)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("ARRIBA_TPU_SHARDS", None)
    env.pop("ARRIBA_TPU_SHARD_STRIPE_KB", None)
    if shards:
        env["ARRIBA_TPU_SHARDS"] = str(shards)
    if stripe_kb:
        env["ARRIBA_TPU_SHARD_STRIPE_KB"] = str(stripe_kb)
    tag = f"s{shards or 0}"
    out = out_dir / f"fusions.{tag}.tsv"
    disc = out_dir / f"fusions.{tag}.discarded.tsv"
    result = subprocess.run(
        [sys.executable, "-m", "arriba_tpu"] + args
        + ["-o", str(out), "-O", str(disc), "-@", str(threads)],
        env=env, capture_output=True, text=True, timeout=600)
    assert result.returncode == 0, result.stdout + result.stderr
    counters = "\n".join(re.sub(r"^\[[^]]*\] ", "", line)
                         for line in result.stdout.splitlines()
                         if "Writing" not in line and "Done" not in line
                         and "Launching" not in line)
    return out.read_bytes(), disc.read_bytes(), counters


@pytest.mark.parametrize("shards", [2, 3, 4])
def test_multi_event_sharded_byte_equal(tmp_path, shards):
    args = multi_event_sample(tmp_path)
    host = _run(args, tmp_path)
    sharded = _run(args, tmp_path, shards=shards, stripe_kb=4)
    assert sharded[0] == host[0]
    assert sharded[1] == host[1]
    assert sharded[2] == host[2]


@pytest.mark.parametrize("seed", [5, 11, 29])
def test_fuzz_sharded_byte_equal(tmp_path, seed):
    args = fuzz_sample(tmp_path, seed)
    host = _run(args, tmp_path)
    sharded = _run(args, tmp_path, shards=3, stripe_kb=4)
    assert sharded[0] == host[0]
    assert sharded[1] == host[1]
    assert sharded[2] == host[2]


def test_sharded_multithreaded_workers(tmp_path):
    """Workers themselves may run the threaded scan (threads split across
    processes); output must not depend on the combination."""
    args = multi_event_sample(tmp_path)
    host = _run(args, tmp_path, threads=4)
    sharded = _run(args, tmp_path, shards=2, stripe_kb=4, threads=4)
    assert sharded[0] == host[0]
    assert sharded[1] == host[1]
    assert sharded[2] == host[2]


def test_sharded_worker_failure_falls_back(tmp_path):
    """A crashing shard worker must not abort the run: the pipeline falls
    back to the single-process scan with byte-identical output (and resets
    any partial plane sums)."""
    args = multi_event_sample(tmp_path)
    host = _run(args, tmp_path)
    env = dict(os.environ, PYTHONPATH=REPO, ARRIBA_TPU_SHARDS="2",
               ARRIBA_TPU_SHARD_STRIPE_KB="4", ARRIBA_TPU_SHARD_FAIL="1")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    out = tmp_path / "fusions.fail.tsv"
    disc = tmp_path / "fusions.fail.discarded.tsv"
    result = subprocess.run(
        [sys.executable, "-m", "arriba_tpu"] + args
        + ["-o", str(out), "-O", str(disc)],
        env=env, capture_output=True, text=True, timeout=600)
    assert result.returncode == 0, result.stdout + result.stderr
    assert "sharded ingest failed" in result.stderr
    assert out.read_bytes() == host[0]
    assert disc.read_bytes() == host[1]


def test_sharded_ingest_composes_with_sharded_stats(tmp_path):
    """Both distribution tiers at once: byte-range ingest workers
    (ARRIBA_TPU_SHARDS) + the multi-process mid-cascade statistics
    reduction (ARRIBA_TPU_SHARDED_STATS=2procs) — byte-identical output."""
    args = multi_event_sample(tmp_path)
    host = _run(args, tmp_path)
    env = dict(os.environ, PYTHONPATH=REPO, ARRIBA_TPU_SHARDS="2",
               ARRIBA_TPU_SHARD_STRIPE_KB="4",
               ARRIBA_TPU_SHARDED_STATS="2procs")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    out = tmp_path / "fusions.both.tsv"
    disc = tmp_path / "fusions.both.discarded.tsv"
    result = subprocess.run(
        [sys.executable, "-m", "arriba_tpu"] + args
        + ["-o", str(out), "-O", str(disc)],
        env=env, capture_output=True, text=True, timeout=600)
    assert result.returncode == 0, result.stdout + result.stderr
    assert out.read_bytes() == host[0]
    assert disc.read_bytes() == host[1]
