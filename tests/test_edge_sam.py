"""Edge-shaped but valid SAM records: oracle parity on constructs that
stress parser limits rather than biology — very long QNAMEs, records with
more tab-separated fields than the AVX tab sweep's 96-offset buffer (its
memchr fallback path), huge HI values, and long many-op CIGARs."""

import pytest

from .oracle_util import oracle_available
from .scenario import fuzz_sample
from .test_oracle_parity import assert_parity

pytestmark = pytest.mark.skipif(not oracle_available(),
                                reason="reference oracle not buildable")


def _edge_records():
    lines = []

    # 200-char QNAME proper pair
    name = "Q" * 200
    seq = "A" * 50
    lines.append(f"{name}\t99\t1\t3001\t60\t50M\t=\t3101\t150\t{seq}\t*\tHI:i:1")
    lines.append(f"{name}\t147\t1\t3101\t60\t50M\t=\t3001\t-150\t{seq}\t*\tHI:i:1")

    # >96 tab-separated fields (the one-pass AVX tab collector caps at 96
    # offsets and must fall back to the per-field memchr splitter)
    aux = "\t".join(f"X{chr(65 + i % 26)}:i:{i}" for i in range(100))
    lines.append(f"manyaux\t99\t1\t3201\t60\t50M\t=\t3301\t150\t{seq}\t*\t"
                 f"HI:i:1\t{aux}")
    lines.append(f"manyaux\t147\t1\t3301\t60\t50M\t=\t3201\t-150\t{seq}\t*\t"
                 f"HI:i:1\t{aux}")

    # HI near INT32_MAX
    lines.append(f"hugehi\t99\t1\t3401\t60\t50M\t=\t3501\t150\t{seq}\t*\t"
                 f"HI:i:2000000000")
    lines.append(f"hugehi\t147\t1\t3501\t60\t50M\t=\t3401\t-150\t{seq}\t*\t"
                 f"HI:i:2000000000")

    # long many-op CIGAR: 40x(1M1I) + 10M + 10S; qlen = 40+40+10+10 = 100
    cigar = "1M1I" * 40 + "10M10S"
    long_seq = "C" * 100
    lines.append(f"manyops\t99\t1\t3601\t60\t{cigar}\t=\t3701\t200\t"
                 f"{long_seq}\t*\tHI:i:1")
    lines.append(f"manyops\t147\t1\t3701\t60\t100M\t=\t3601\t-200\t"
                 f"{'G' * 100}\t*\tHI:i:1")

    # single-base read
    lines.append(f"tiny\t99\t1\t3801\t60\t1M\t=\t3802\t2\tA\t*\tHI:i:1")
    lines.append(f"tiny\t147\t1\t3802\t60\t1M\t=\t3801\t-2\tT\t*\tHI:i:1")
    return lines


@pytest.mark.parametrize("threads", ["1", "4"])
def test_edge_records_parity(tmp_path, threads):
    args = fuzz_sample(tmp_path, 17)
    sam = args[args.index("-x") + 1]
    with open(sam, "a") as out:
        out.write("\n".join(_edge_records()) + "\n")
    assert_parity(tmp_path, args, our_extra_args=("-@", threads))


def test_adversarial_records_no_crash(tmp_path):
    """Hostile records must not corrupt memory or crash the scan: negative
    POS (the coverage start-flag store previously wrote to starts[-1]),
    CIGAR op lengths that would truncate in the 28-bit packed word, and a
    final line without a trailing newline ending in a numeric field (the
    mmap parse path previously read past the mapping). The scan either
    processes or rejects them; the process must survive and still find the
    real fusion."""
    import subprocess
    import sys
    import os

    from .scenario import translocation_sample

    args = translocation_sample(tmp_path)
    sam = args[args.index("-x") + 1]
    seq = "A" * 50
    hostile = [
        f"negpos\t99\t1\t-100\t60\t50M\t=\t3101\t150\t{seq}\t*\tHI:i:1",
        f"negpos\t147\t1\t3101\t60\t50M\t=\t-100\t-150\t{seq}\t*\tHI:i:1",
        f"hugecigar\t99\t1\t3001\t60\t300000000M\t=\t3101\t150\t{seq}\t*\tHI:i:1",
        f"hugecigar\t147\t1\t3101\t60\t50M\t=\t3001\t-150\t{seq}\t*\tHI:i:1",
        # SEQ '*' with a >=12 bp soft clip (the ITD scan previously
        # crashed on the empty clipped slice in the pure-Python path)
        f"noseq\t99\t1\t3401\t60\t20S30M\t=\t3501\t150\t*\t*\tHI:i:1",
        f"noseq\t147\t1\t3501\t60\t50M\t=\t3401\t-150\t{seq}\t*\tHI:i:1",
        # RNAME '*' without FUNMAP (tid -1 previously negative-indexed the
        # LAST contig's coverage planes in the pure-Python path)
        f"notid\t97\t*\t100\t60\t50M\t1\t3601\t0\t{seq}\t*\tHI:i:1",
        f"notid\t145\t1\t3601\t60\t50M\t*\t100\t0\t{seq}\t*\tHI:i:1",
        # final record ends mid-number with NO trailing newline (below)
        f"lastline\t99\t1\t3201\t60\t50M\t=\t3301\t150\t{seq}\t*\tHI:i:7",
    ]
    with open(sam, "a") as out:
        out.write("\n".join(hostile))  # note: no trailing newline
    outputs = {}
    for label, extra_env in (("native", {}),
                             ("python", {"ARRIBA_TPU_NO_NATIVE": "1"})):
        env = dict(os.environ, PYTHONPATH=os.getcwd(), **extra_env)
        out_path = tmp_path / f"fusions_hostile_{label}.tsv"
        result = subprocess.run(
            [sys.executable, "-m", "arriba_tpu"] + args
            + ["-o", str(out_path), "-@", "4"],
            env=env, capture_output=True, text=True, timeout=300)
        assert result.returncode == 0, (label, result.stderr[-2000:])
        outputs[label] = out_path.read_bytes()
        assert b"GENE1" in outputs[label], label
    assert outputs["native"] == outputs["python"]


def test_corrupt_bam_record_rejected(tmp_path):
    """A BAM record whose aux region carries an unknown type byte is
    corruption; the scan must fail loudly (htslib errors on it too), never
    silently drop the record — a dropped chimeric mate would erase fusion
    evidence."""
    import subprocess
    import sys
    import os

    from arriba_tpu.io.bam import BamRecord, SamHeader, cigar_from_string
    from .scenario import translocation_sample
    from .util import write_bam

    args = translocation_sample(tmp_path)
    header = SamHeader(target_names=["1", "2"],
                       target_lengths=[20000, 20000])
    records = [BamRecord(qname="corrupt", flag=99, tid=0, pos=3000, mapq=60,
                         cigar=cigar_from_string("50M"), mtid=0, mpos=3100,
                         tlen=150, seq="A" * 50, tags={"HI": 1})]
    bam_path = tmp_path / "plain.bam"
    write_bam(str(bam_path), header, records)
    # the BAM payload is BGZF-compressed: inflate, flip the HI tag's aux
    # type byte to an unknown one, re-deflate
    import gzip
    from .util import bgzf_compress
    raw = bytearray(gzip.decompress(bam_path.read_bytes()))
    marker = raw.find(b"HI")
    assert marker > 0
    raw[marker + 2] = ord("?")
    bam_path = tmp_path / "corrupt.bam"
    bam_path.write_bytes(bgzf_compress(bytes(raw)))

    env = dict(os.environ, PYTHONPATH=os.getcwd())
    args[args.index("-x") + 1] = str(bam_path)
    result = subprocess.run(
        [sys.executable, "-m", "arriba_tpu"] + args
        + ["-o", str(tmp_path / "f.tsv")],
        env=env, capture_output=True, text=True, timeout=300)
    assert result.returncode != 0
    assert "corrupt BAM record" in (result.stderr + result.stdout)
