"""Extended oracle fuzz sweep (not collected by pytest — run directly).

Runs every fuzz scenario family against the in-tree reference oracle over
an arbitrary seed band and reports divergences. Used throughout round 1 to
bank ~1000 byte-equal runs beyond the fixed suite seeds.

    python tests/extended_fuzz.py [first_seed [last_seed]]
"""

import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import tests.conftest  # noqa: F401  (platform setup)
from tests.scenario import (breakpoint_sharing_sample, fuzz_aux_sample,
                            fuzz_sample, fuzz_sample2, homolog_tie_sample,
                            merge_adjacent_chain_sample,
                            select_best_tie_sample)
from tests.test_oracle_parity import assert_parity


def main() -> int:
    """usage: extended_fuzz.py [first [last [threads]]] — threads > 1 runs
    our side with -@ N (sharded scan + parallel event stages)."""
    first = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    last = int(sys.argv[2]) if len(sys.argv) > 2 else first + 25
    threads = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    extra = ("-@", str(threads)) if threads > 1 else ()
    failures = []
    runs = 0
    for family, builder in (("fuzz", fuzz_sample), ("fuzz2", fuzz_sample2),
                            ("aux", fuzz_aux_sample),
                            ("bp_sharing", breakpoint_sharing_sample),
                            ("homolog_tie", homolog_tie_sample),
                            ("merge_chain", merge_adjacent_chain_sample),
                            ("select_tie", select_best_tie_sample)):
        for seed in range(first, last):
            tmp = pathlib.Path(tempfile.mkdtemp(prefix="arriba_fuzz_"))
            runs += 1
            try:
                assert_parity(tmp, builder(tmp, seed), extra)
            except Exception as error:  # noqa: BLE001 - report and continue
                failures.append((family, seed))
                print(f"FAIL {family} seed={seed}: {str(error)[:300]}")
    print(f"done: {len(failures)} failures / {runs} runs"
          + (f" (threads={threads})" if threads > 1 else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
