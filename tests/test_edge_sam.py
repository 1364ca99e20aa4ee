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
