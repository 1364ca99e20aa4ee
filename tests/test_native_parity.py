"""Differential tests: native fast paths vs the pure-Python parity reference,
compared on in-memory structures (sharper than end-to-end TSV equality)."""

import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(os.path.dirname(__file__), "..",
                                    "arriba_tpu")),
    reason="repo layout")


def _ingest(options, no_native_extract=False):
    """Run the pipeline front half (through annotation) in-process and return
    (chimeric_alignments dict, per-mate snapshots)."""
    env_key = "ARRIBA_TPU_NO_NATIVE"
    code = f"""
import json, sys, os
sys.path.insert(0, {repr(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))})
import numpy as np
from arriba_tpu.cli import parse_arguments
from arriba_tpu import pipeline

options = parse_arguments({options!r})
state = {{}}

# monkeypatch: capture the annotated fragments right before find_fusions
# (patch the cascade facade method so both native and Python paths hit it)
from arriba_tpu.filters import native_cascade
def capture(self, *args, **kwargs):
    ca = self.ca
    rows = []
    for name, mates in ca.items():
        for m in mates:
            rows.append([name, int(mates.single_end), int(mates.duplicate),
                         int(m.supplementary), int(m.first_in_pair),
                         int(m.strand), int(m.predicted_strand),
                         int(m.predicted_strand_ambiguous), int(m.exonic),
                         int(m.contig), int(m.start), int(m.end),
                         [int(x) for x in m.cigar],
                         m.sequence, [int(g) for g in m.genes]])
    print("\\nCAPTURE\\t" + json.dumps(rows))
    raise SystemExit(0)
native_cascade.ReadLevelCascade.find_fusions = capture
try:
    pipeline.run(options)
except SystemExit:
    pass
"""
    env = dict(os.environ)
    env.pop("ARRIBA_TPU_NO_NATIVE", None)
    env.pop("ARRIBA_TPU_NO_NATIVE_EXTRACT", None)
    if no_native_extract:
        env["ARRIBA_TPU_NO_NATIVE"] = "1"
    result = subprocess.run([sys.executable, "-c", code], env=env,
                            capture_output=True, text=True, timeout=300)
    assert result.returncode == 0, result.stderr[-3000:]
    import json
    for line in result.stdout.splitlines():
        if line.startswith("CAPTURE\t"):
            return json.loads(line[len("CAPTURE\t"):])
    raise AssertionError("capture line missing: " + result.stdout[-500:])


@pytest.mark.parametrize("seed", [501, 502, 503])
def test_native_ingest_and_annotation_structures_match(tmp_path, seed):
    """The full native front half (extraction + bulk annotation) produces
    fragment/alignment structures identical to the pure-Python path —
    every field, including gene sets and resolved strands."""
    from .scenario import fuzz_sample
    args = fuzz_sample(tmp_path, seed)
    argv = args + ["-o", str(tmp_path / "f.tsv")]

    native_rows = _ingest(argv, no_native_extract=False)
    python_rows = _ingest(argv, no_native_extract=True)
    # both paths sort fragments by read name before annotation, so row
    # order is comparable directly
    assert len(native_rows) == len(python_rows)
    for native, python in zip(native_rows, python_rows):
        assert native == python


@pytest.mark.parametrize("kill_switch", [
    "ARRIBA_TPU_NO_NATIVE", "ARRIBA_TPU_NO_NATIVE_EXTRACT",
    "ARRIBA_TPU_NO_NATIVE_CASCADE"])
def test_fallback_paths_stay_equivalent(tmp_path, kill_switch):
    """Each native kill switch falls back to a path that produces identical
    output and stage counters (guards fallback rot)."""
    import re

    from .scenario import fuzz_sample

    args = fuzz_sample(tmp_path, 777)
    results = {}
    for label, env_extra in (("native", {}), ("fallback", {kill_switch: "1"})):
        out = str(tmp_path / f"f_{label}.tsv")
        env = dict(os.environ)
        for key in ("ARRIBA_TPU_NO_NATIVE", "ARRIBA_TPU_NO_NATIVE_EXTRACT",
                    "ARRIBA_TPU_NO_NATIVE_CASCADE"):
            env.pop(key, None)
        env.update(env_extra)
        result = subprocess.run(
            [sys.executable, "-m", "arriba_tpu"] + args + ["-o", out],
            env=env, capture_output=True, text=True, timeout=300,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        assert result.returncode == 0, result.stderr[-2000:]
        counters = re.findall(r"\((?:remaining|total|marked)=\d+\)", result.stdout)
        results[label] = (open(out, "rb").read(), counters)
    assert results["native"] == results["fallback"]


def test_subsampling_parity_native_vs_python(tmp_path):
    """The 300-read subsampling logic (here forced low with -U) behaves
    identically in the native and Python find_fusions, including the
    warning and the discarded-support bookkeeping."""
    from .scenario import SampleBuilder

    builder = SampleBuilder(tmp_path, {"1": 30000, "2": 30000}, 13)
    builder.add_gene("1", 1000, 4999, "+", "G1", "GENE1", "T1")
    builder.add_gene("2", 11000, 14999, "+", "G2", "GENE2", "T2")
    for i in range(20):
        builder.add_split_fragment(f"s{i}", "1", 2800, 2950, 25, 25, "2", 11000)
    for i in range(15):
        builder.add_discordant_fragment(f"d{i}", "1", 2800, "2", 11100)
    for i in range(40):
        builder.add_proper_pair(f"n{i}", "1", 1200 + i * 31)
    args = builder.write() + ["-U", "5"]

    outputs = {}
    for label, env_extra in (("native", {}),
                             ("python", {"ARRIBA_TPU_NO_NATIVE_CASCADE": "1"})):
        out = str(tmp_path / f"f_{label}.tsv")
        env = dict(os.environ, **env_extra)
        result = subprocess.run(
            [sys.executable, "-m", "arriba_tpu"] + args + ["-o", out],
            env=env, capture_output=True, text=True, timeout=300,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        assert result.returncode == 0, result.stderr[-2000:]
        assert "subsampled" in result.stderr, label
        outputs[label] = open(out, "rb").read()
    assert outputs["native"] == outputs["python"]


@pytest.mark.parametrize("seed,as_bam", [(207, False), (314, False),
                                         (314, True)])
def test_sharded_scan_thread_parity(tmp_path, seed, as_bam):
    """-@ N shards the native extraction scan by read-name hash
    (native/ingest.cpp handle_record_extract); every output artifact must be
    byte-identical to the serial scan at any shard count, for SAM and BAM
    input (coverage planes use commutative atomic updates; the fragment
    table is name-sorted downstream)."""
    from .scenario import fuzz_sample

    args = fuzz_sample(tmp_path, seed)
    if as_bam:
        from arriba_tpu.io.bam import open_alignment_file
        from .util import write_bam
        sam_path = args[args.index("-x") + 1]
        header, records = open_alignment_file(sam_path, reference_by_name={})
        bam_path = str(tmp_path / "aligned.bam")
        write_bam(bam_path, header, list(records))
        args[args.index("-x") + 1] = bam_path
    outputs = {}
    for threads in (1, 2, 4):
        out = str(tmp_path / f"f_t{threads}.tsv")
        discarded = str(tmp_path / f"d_t{threads}.tsv")
        result = subprocess.run(
            [sys.executable, "-m", "arriba_tpu"] + args
            + ["-o", out, "-O", discarded, "-@", str(threads)],
            env=dict(os.environ), capture_output=True, text=True, timeout=300,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        assert result.returncode == 0, result.stderr[-2000:]
        counters = [line.split("remaining=")[-1]
                    for line in result.stdout.splitlines()
                    if "remaining=" in line]
        outputs[threads] = (open(out, "rb").read(),
                            open(discarded, "rb").read(), counters)
    assert outputs[1] == outputs[2]
    assert outputs[1] == outputs[4]
