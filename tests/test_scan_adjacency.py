"""Mate-adjacency robustness of the sharded scan.

The parse phase consumes adjacent boring proper pairs in place
(native/ingest.cpp consume_adjacent_boring_pair); records whose mate is
not the next line must take the exact pending-slot/collator path instead.
These tests reorder a fuzz sample's records so that mates are never
adjacent (dispersed) or arrive in swapped order, and require full oracle
parity on the reordered file — proving the fast path and the fallback
agree with the reference regardless of record layout."""

import pytest

from .oracle_util import oracle_available
from .scenario import fuzz_sample
from .test_oracle_parity import assert_parity

pytestmark = pytest.mark.skipif(not oracle_available(),
                                reason="reference oracle not buildable")


def _rewrite_sam(args, tmp_path, transform, suffix):
    """Apply `transform(record_lines) -> record_lines` to the -x SAM."""
    sam_index = args.index("-x") + 1
    text = open(args[sam_index]).read().splitlines()
    header = [line for line in text if line.startswith("@")]
    records = [line for line in text if line and not line.startswith("@")]
    out = tmp_path / f"reordered_{suffix}.sam"
    out.write_text("\n".join(header + transform(records)) + "\n")
    new_args = list(args)
    new_args[sam_index] = str(out)
    return new_args


def _disperse(records):
    """Round-robin stride so no two mates stay adjacent."""
    return records[0::3] + records[1::3] + records[2::3]


def _swap_adjacent_mates(records):
    """Swap each adjacent same-QNAME duo (mate2 arrives first)."""
    swapped = []
    i = 0
    while i < len(records):
        if (i + 1 < len(records)
                and records[i].split("\t", 1)[0]
                == records[i + 1].split("\t", 1)[0]):
            swapped.append(records[i + 1])
            swapped.append(records[i])
            i += 2
        else:
            swapped.append(records[i])
            i += 1
    return swapped


@pytest.mark.parametrize("seed", [11, 12])
def test_dispersed_mates_parity(tmp_path, seed):
    args = fuzz_sample(tmp_path, seed)
    args = _rewrite_sam(args, tmp_path, _disperse, f"dispersed{seed}")
    assert_parity(tmp_path, args, our_extra_args=("-@", "4"))


@pytest.mark.parametrize("seed", [11, 12])
def test_swapped_adjacent_mates_parity(tmp_path, seed):
    args = fuzz_sample(tmp_path, seed)
    args = _rewrite_sam(args, tmp_path, _swap_adjacent_mates,
                        f"swapped{seed}")
    assert_parity(tmp_path, args, our_extra_args=("-@", "4"))
