"""Streaming (pipe) input: the reference's recommended workflow pipes STAR's
stdout straight into arriba (`STAR ... | arriba -x /dev/stdin`, htslib
streams it in read_chimeric_alignments.cpp:560).  Here scan_open() consumes
only the header from the one-shot stream and scan_sam(resume=1) continues
from where it left the pipe positioned; fusions.tsv must be byte-equal to
the regular-file run for every container format and thread count."""

import gzip
import os
import subprocess
import sys
from pathlib import Path

import pytest

from .scenario import SampleBuilder
from .util import write_bam

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def sample(tmp_path_factory):
    """Translocation sample written as SAM, SAM.gz, and BAM, plus the
    baseline fusions.tsv produced from the regular SAM file."""
    tmp_path = tmp_path_factory.mktemp("stream_sample")
    b = SampleBuilder(tmp_path, {"1": 20000, "2": 20000}, seed=7)
    b.add_gene("1", 1000, 1999, "+", "G1", "GENE1", "T1")
    b.add_gene("2", 5000, 5999, "+", "G2", "GENE2", "T2")
    for i, mate1_pos in enumerate([1104, 1114, 1124, 1134]):
        b.add_split_fragment(f"split{i}", "1", mate1_pos, 1204, 30, 40,
                             "2", 5000)
    for i, (p1, p2) in enumerate([(1100, 5050), (1150, 5030)]):
        b.add_discordant_fragment(f"disc{i}", "1", p1, "2", p2)
    for i, (contig, pos) in enumerate([("1", 1150), ("1", 1180),
                                       ("2", 5020), ("2", 5060)]):
        b.add_proper_pair(f"norm{i}", contig, pos)
    args = b.write()

    sam_path = tmp_path / "aligned.sam"
    gz_path = tmp_path / "aligned.sam.gz"
    gz_path.write_bytes(gzip.compress(sam_path.read_bytes()))
    bam_path = tmp_path / "aligned.bam"
    write_bam(bam_path, b.header, b.records)

    baseline = _run(tmp_path / "baseline", args, str(sam_path))
    assert baseline[0], "baseline run produced no fusions.tsv"
    return args, {"sam": str(sam_path), "sam.gz": str(gz_path),
                  "bam": str(bam_path)}, baseline


def _run(outdir, args, input_path, threads=None, env_extra=None,
         via_fifo=False):
    """Run the CLI on `input_path` (through a FIFO when via_fifo) and return
    (fusions_bytes, discarded_bytes, stdout)."""
    outdir.mkdir(parents=True, exist_ok=True)
    feeder = None
    if via_fifo:
        fifo = str(outdir / "input.fifo")
        os.mkfifo(fifo)
        feeder = subprocess.Popen(
            ["sh", "-c", f"cat '{input_path}' > '{fifo}'"])
        input_path = fifo
    cli_args = list(args)
    cli_args[cli_args.index("-x") + 1] = str(input_path)
    out = outdir / "fusions.tsv"
    discarded = outdir / "fusions.discarded.tsv"
    cli_args += ["-o", str(out), "-O", str(discarded)]
    if threads:
        cli_args += ["-@", str(threads)]
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("PALLAS_AXON_POOL_IPS", None)  # skip TPU-tunnel registration
    if env_extra:
        env.update(env_extra)
    try:
        result = subprocess.run(
            [sys.executable, "-m", "arriba_tpu"] + cli_args,
            capture_output=True, text=True, timeout=420, env=env)
    finally:
        if feeder is not None:
            feeder.wait(timeout=60)
    assert result.returncode == 0, (result.stderr[-3000:], result.stdout[-500:])
    return out.read_bytes(), discarded.read_bytes(), result.stdout


@pytest.mark.parametrize("fmt", ["sam", "sam.gz", "bam"])
def test_fifo_matches_file(sample, tmp_path, fmt):
    args, paths, baseline = sample
    got = _run(tmp_path / fmt, args, paths[fmt], via_fifo=True)
    assert got[0] == baseline[0]
    assert got[1] == baseline[1]


@pytest.mark.parametrize("fmt", ["sam", "bam"])
def test_fifo_threaded_matches_file(sample, tmp_path, fmt):
    """-@ 4 through a pipe: the sharded SAM scan must consume the header
    carry, and BAM must fall back to serial BGZF inflate (reopening the
    path would steal bytes from the pipe)."""
    args, paths, baseline = sample
    got = _run(tmp_path / fmt, args, paths[fmt], threads=4, via_fifo=True)
    assert got[0] == baseline[0]
    assert got[1] == baseline[1]


def test_fifo_pure_python_spools(sample, tmp_path):
    """Without the native engine the stream is spooled to a temporary file
    and the regular seekable path runs on that."""
    args, paths, baseline = sample
    got = _run(tmp_path / "pure", args, paths["sam"], via_fifo=True,
               env_extra={"ARRIBA_TPU_NO_NATIVE": "1"})
    assert got[0] == baseline[0]
    assert got[1] == baseline[1]


@pytest.mark.parametrize("seed", [17, 401])
def test_fifo_fuzz_family(tmp_path, seed):
    """Randomized fuzz samples must be stream-invariant too (the pipe path
    only changes how bytes reach the scanner, never what they mean)."""
    from .scenario import fuzz_sample2
    args = fuzz_sample2(tmp_path, seed)
    input_path = args[args.index("-x") + 1]
    baseline = _run(tmp_path / "file", args, input_path)
    got = _run(tmp_path / "fifo", args, input_path, threads=4, via_fifo=True)
    assert got[0] == baseline[0]
    assert got[1] == baseline[1]


def test_dev_stdin(sample, tmp_path):
    """`... | arriba_tpu -x /dev/stdin` — the documented STAR pipe."""
    args, paths, baseline = sample
    outdir = tmp_path / "stdin"
    outdir.mkdir()
    out = outdir / "fusions.tsv"
    discarded = outdir / "fusions.discarded.tsv"
    cli_args = list(args)
    cli_args[cli_args.index("-x") + 1] = "/dev/stdin"
    cli_args += ["-o", str(out), "-O", str(discarded)]
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    # a real shell pipe (not a file redirect) so /dev/stdin is a FIFO
    quoted = " ".join(f"'{a}'" for a in cli_args)
    result = subprocess.run(
        ["sh", "-c",
         f"cat '{paths['sam']}' | '{sys.executable}' -m arriba_tpu {quoted}"],
        capture_output=True, text=True, timeout=420, env=env)
    assert result.returncode == 0, result.stderr[-3000:]
    assert out.read_bytes() == baseline[0]
    assert discarded.read_bytes() == baseline[1]
