"""SAM parsing, CIGAR handling, and record accessor tests."""

import numpy as np

from arriba_tpu.io.bam import (BamRecord, SamHeader, cigar_from_string,
                               cigar_to_string, read_sam_text, write_sam)


def test_cigar_roundtrip():
    cigar = cigar_from_string("10S90M2I3D100N5M")
    assert cigar_to_string(cigar) == "10S90M2I3D100N5M"
    rec = BamRecord(pos=1000, cigar=cigar, seq="A" * 107)
    # reference consumed: 90M + 3D + 100N + 5M = 198
    assert rec.endpos() == 1198
    # query consumed: 10S + 90M + 2I + 5M = 107
    assert rec.cigar2qlen() == 107
    assert rec.cigar2rlen(2) == 90  # first two ops: 10S + 90M


def test_sam_roundtrip(tmp_path):
    header = SamHeader(target_names=["1", "2"], target_lengths=[1000, 2000])
    records = [
        BamRecord(qname="r1", flag=99, tid=0, pos=100, mapq=60,
                  cigar=cigar_from_string("50M"), mtid=0, mpos=200, tlen=150,
                  seq="A" * 50, qual="I" * 50, tags={"HI": 1, "SA": "2,1,+,50M,60,0;"}),
        BamRecord(qname="r2", flag=147, tid=1, pos=500, mapq=60,
                  cigar=cigar_from_string("25S25M"), mtid=1, mpos=400, tlen=-150,
                  seq="C" * 50, qual="I" * 50),
    ]
    path = str(tmp_path / "test.sam")
    write_sam(path, header, records)
    header2, parsed = read_sam_text(path)
    parsed = list(parsed)
    assert header2.target_names == ["1", "2"]
    assert len(parsed) == 2
    assert parsed[0].qname == "r1"
    assert parsed[0].pos == 100
    assert parsed[0].tags["HI"] == 1
    assert parsed[0].tags["SA"] == "2,1,+,50M,60,0;"
    assert cigar_to_string(parsed[1].cigar) == "25S25M"
    assert parsed[1].seq == "C" * 50


def test_bam_bgzf_roundtrip_and_native_parity(tmp_path):
    """BGZF BAM input: Python reader parses it, and the native loader (serial
    and 4-thread BGZF decompression) produces identical pipeline output."""
    import subprocess
    import sys
    import os
    from .scenario import translocation_sample
    from .util import write_bam
    from arriba_tpu.io.bam import open_alignment_file, read_sam_text

    args = translocation_sample(tmp_path)
    sam_path = args[args.index("-x") + 1]
    header, records = read_sam_text(sam_path)
    records = list(records)
    bam_path = tmp_path / "aligned.bam"
    write_bam(bam_path, header, records)

    header2, parsed = open_alignment_file(str(bam_path))
    parsed = list(parsed)
    assert header2.target_names == header.target_names
    assert len(parsed) == len(records)
    assert parsed[0].qname == records[0].qname
    assert parsed[0].seq == records[0].seq

    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outputs = []
    for tag, extra in (("t1", ["-@", "1"]), ("t4", ["-@", "4"])):
        out = tmp_path / f"fusions_{tag}.tsv"
        bam_args = list(args)
        bam_args[bam_args.index("-x") + 1] = str(bam_path)
        result = subprocess.run(
            [sys.executable, "-m", "arriba_tpu"] + bam_args + ["-o", str(out)] + extra,
            capture_output=True, text=True, env=env)
        assert result.returncode == 0, result.stderr
        outputs.append(out.read_text())
    assert outputs[0] == outputs[1]
    assert "GENE1\tGENE2" in outputs[0]


def test_gzipped_sam_input(tmp_path):
    """A gzip-compressed SAM is gzip like BAM is, so format detection must
    sniff the decompressed magic (htslib parity); outputs must match the
    plain-text run at any thread count."""
    import gzip
    import os
    import subprocess
    import sys

    from .oracle_util import REPO
    from .scenario import translocation_sample

    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    args = translocation_sample(tmp_path)
    sam = tmp_path / "aligned.sam"
    gz = tmp_path / "aligned.sam.gz"
    gz.write_bytes(gzip.compress(sam.read_bytes()))
    outputs = {}
    for label, path, threads in (("plain", sam, "1"), ("gz1", gz, "1"),
                                 ("gz4", gz, "4")):
        run_args = list(args)
        run_args[run_args.index("-x") + 1] = str(path)
        out = tmp_path / f"fusions_{label}.tsv"
        result = subprocess.run(
            [sys.executable, "-m", "arriba_tpu"] + run_args
            + ["-o", str(out), "-@", threads],
            capture_output=True, text=True, timeout=300,
            cwd=str(tmp_path), env=env)
        assert result.returncode == 0, result.stderr[-1500:]
        outputs[label] = out.read_bytes()
    assert outputs["plain"] == outputs["gz1"] == outputs["gz4"]
    assert b"GENE1" in outputs["plain"]


def test_convert_sam_to_bam_script(tmp_path):
    """scripts/convert_sam_to_bam.py produces a BAM the pipeline decodes to
    byte-identical outputs (same stage counters, same fusions.tsv)."""
    import os
    import pathlib
    import subprocess
    import sys

    from .scenario import multi_event_sample

    args = multi_event_sample(tmp_path)
    sam = tmp_path / "aligned.sam"
    bam = tmp_path / "aligned.bam"
    repo = pathlib.Path(__file__).resolve().parent.parent
    result = subprocess.run(
        [sys.executable, str(repo / "scripts" / "convert_sam_to_bam.py"),
         str(sam), str(bam)],
        capture_output=True, text=True, timeout=300)
    assert result.returncode == 0, result.stderr

    outputs = {}
    for label, xfile in (("sam", sam), ("bam", bam)):
        out = tmp_path / f"conv_{label}.tsv"
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        run = subprocess.run(
            [sys.executable, "-m", "arriba_tpu"]
            + [a if a != str(sam) else str(xfile) for a in args]
            + ["-o", str(out)],
            env=env, capture_output=True, text=True, timeout=420)
        assert run.returncode == 0, run.stdout + run.stderr
        outputs[label] = out.read_bytes()
    assert outputs["bam"] == outputs["sam"]
