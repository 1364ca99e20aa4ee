"""Golden parity tests: run the reference arriba (built against the htslib
shim) and our pipeline on the same synthetic samples and require byte-equal
fusions.tsv plus identical per-stage remaining-counts.

The discarded-fusions file is compared byte-for-byte too: the reference
writes it in its fusions_t unordered_map iteration order
(output_fusions.cpp:1052), which we replay exactly (native/event.cpp
reference_map_order, arriba_tpu/output/stdmap_order.py)."""

import re

import pytest

from .oracle_util import oracle_available, run_oracle, run_ours
from .scenario import multi_event_sample, translocation_sample

pytestmark = pytest.mark.skipif(not oracle_available(),
                                reason="reference oracle not buildable")

COUNTER = re.compile(r"\((?:remaining|total|marked)=(\d+)\)")


def run_both(tmp_path, args, our_extra_args=()):
    oracle_dir = tmp_path / "oracle_out"
    ours_dir = tmp_path / "ours_out"
    oracle_dir.mkdir()
    ours_dir.mkdir()
    oracle = run_oracle(args + ["-o", str(oracle_dir / "fusions.tsv"),
                                "-O", str(oracle_dir / "discarded.tsv")], tmp_path)
    ours = run_ours(args + ["-o", str(ours_dir / "fusions.tsv"),
                            "-O", str(ours_dir / "discarded.tsv")]
                    + list(our_extra_args), tmp_path)
    assert oracle.returncode == 0, oracle.stderr + oracle.stdout
    assert ours.returncode == 0, ours.stderr + ours.stdout
    return oracle, ours, oracle_dir, ours_dir


def assert_parity(tmp_path, args, our_extra_args=()):
    oracle, ours, oracle_dir, ours_dir = run_both(tmp_path, args,
                                                  our_extra_args)

    # per-stage counters must match exactly
    oracle_counts = COUNTER.findall(oracle.stdout)
    our_counts = COUNTER.findall(ours.stdout)
    assert oracle_counts == our_counts, (
        f"stage counters diverge:\noracle: {oracle_counts}\nours:   {our_counts}\n"
        f"--- oracle log ---\n{oracle.stdout}\n--- our log ---\n{ours.stdout}")

    oracle_main = (oracle_dir / "fusions.tsv").read_text()
    our_main = (ours_dir / "fusions.tsv").read_text()
    assert oracle_main == our_main, (
        f"fusions.tsv differs:\n--- oracle ---\n{oracle_main}\n--- ours ---\n{our_main}")

    oracle_discarded = (oracle_dir / "discarded.tsv").read_text()
    our_discarded = (ours_dir / "discarded.tsv").read_text()
    assert oracle_discarded == our_discarded, (
        f"discarded.tsv differs:\n--- oracle ---\n{oracle_discarded}\n"
        f"--- ours ---\n{our_discarded}")


def test_translocation_parity(tmp_path):
    assert_parity(tmp_path, translocation_sample(tmp_path))


def test_multi_event_parity(tmp_path):
    assert_parity(tmp_path, multi_event_sample(tmp_path))


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5, 6, 7, 8])
def test_fuzz_parity(tmp_path, seed):
    from .scenario import fuzz_sample
    assert_parity(tmp_path, fuzz_sample(tmp_path, seed))


def test_itd_parity(tmp_path):
    from .scenario import itd_sample
    assert_parity(tmp_path, itd_sample(tmp_path))


def test_aux_files_parity(tmp_path):
    from .scenario import aux_files_sample
    assert_parity(tmp_path, aux_files_sample(tmp_path))


def test_viral_parity(tmp_path):
    from .scenario import viral_sample
    assert_parity(tmp_path, viral_sample(tmp_path))


@pytest.mark.parametrize("seed", list(range(1, 9)))
def test_fuzz2_parity(tmp_path, seed):
    from .scenario import fuzz_sample2
    assert_parity(tmp_path, fuzz_sample2(tmp_path, seed))


def test_separate_chimeric_parity(tmp_path):
    from .scenario import separate_chimeric_sample
    assert_parity(tmp_path, separate_chimeric_sample(tmp_path))


def test_single_end_parity(tmp_path):
    from .scenario import single_end_sample
    assert_parity(tmp_path, single_end_sample(tmp_path))


@pytest.mark.parametrize("strandedness", ["yes", "reverse", "auto"])
def test_stranded_parity(tmp_path, strandedness):
    from .scenario import stranded_sample
    assert_parity(tmp_path, stranded_sample(tmp_path, strandedness=strandedness))


def test_duplicates_marked_parity(tmp_path):
    from .scenario import duplicates_marked_sample
    assert_parity(tmp_path, duplicates_marked_sample(tmp_path))


def test_subsampling_parity(tmp_path):
    from .scenario import subsampled_sample
    assert_parity(tmp_path, subsampled_sample(tmp_path))


def test_spliced_homolog_parity(tmp_path):
    from .scenario import spliced_homolog_sample
    assert_parity(tmp_path, spliced_homolog_sample(tmp_path))


def test_overlapping_genes_parity(tmp_path):
    from .scenario import overlapping_genes_sample
    assert_parity(tmp_path, overlapping_genes_sample(tmp_path))


def test_artifact_zoo_parity(tmp_path):
    from .scenario import artifact_zoo_sample
    assert_parity(tmp_path, artifact_zoo_sample(tmp_path))


@pytest.mark.parametrize("seed", [1, 2, 3, 4])
def test_fuzz_aux_parity(tmp_path, seed):
    from .scenario import fuzz_aux_sample
    assert_parity(tmp_path, fuzz_aux_sample(tmp_path, seed))


def test_gene_id_fallback_parity(tmp_path):
    from .scenario import gene_id_fallback_sample
    assert_parity(tmp_path, gene_id_fallback_sample(tmp_path))


def test_no_chimeric_reads_error_parity(tmp_path):
    """Error-path parity: an input with only normal pairs fails with the
    reference's exact message and exit code."""
    from .scenario import SampleBuilder
    b = SampleBuilder(tmp_path, {"1": 20000}, 3)
    b.add_gene("1", 1000, 1999, "+", "G1", "GENE1", "T1")
    for i in range(4):
        b.add_proper_pair(f"n{i}", "1", 1100 + i * 30)
    args = b.write()
    oracle = run_oracle(args + ["-o", str(tmp_path / "of.tsv")], tmp_path)
    ours = run_ours(args + ["-o", str(tmp_path / "uf.tsv")], tmp_path)
    assert oracle.returncode == ours.returncode == 1
    assert (oracle.stderr.strip().splitlines()[-1]
            == ours.stderr.strip().splitlines()[-1])


@pytest.mark.parametrize("seed", [9001])
def test_large_sample_parity(tmp_path, seed):
    """Stress-scale oracle parity: hundreds of events (with subsampling
    pressure) and thousands of background pairs, run with the sharded
    scan (-@ 4) — sizes the small fuzz families never reach."""
    from .scenario import large_fuzz_sample
    assert_parity(tmp_path, large_fuzz_sample(tmp_path, seed), ("-@", "4"))


def test_contig_start_clip_parity(tmp_path):
    """Negative keep-clip pileup positions (breakpoint near a contig start
    with leading soft clips) must match the oracle byte-for-byte — the
    reference resolves negative reference-base lookups as 'N' through its
    unsigned-cast bounds check (output_fusions.cpp:155)."""
    from .scenario import contig_start_clip_sample
    assert_parity(tmp_path, contig_start_clip_sample(tmp_path))


def test_marginal_read_through_float32_boundary_parity(tmp_path):
    """EXACTLY 14 supporting reads at EXACTLY 200x coverage sit on
    filter_marginal_read_through's threshold: the reference's float32
    0.07f*200 == 14.0f keeps the fusion, float64's 14.000000000000002
    would filter it — byte parity here pins the engine to the
    reference's float32 semantics (filter_marginal_read_through.cpp:10)."""
    from .scenario import marginal_boundary_sample
    assert_parity(tmp_path, marginal_boundary_sample(tmp_path))
    assert "DONOR\tACCEPT" in (tmp_path / "ours_out" / "fusions.tsv").read_text()


def test_ig_tr_dux4_parity(tmp_path):
    """IG/TCR enhancer hijacking + DUX4-style translocation: the IG
    exception inside filter_end_to_end (filter_end_to_end.cpp:47-72) must
    spare the distal discordant-only IGHLIKE::DUX4L event (>=10 discordant
    mates, intron-poor partner) and filter the few-mates / close-breakpoint
    / exonic-in-intron-rich-genes variants — byte-equal outputs and
    counters against the reference binary, plus explicit branch pinning."""
    from .scenario import ig_tr_dux4_sample
    assert_parity(tmp_path, ig_tr_dux4_sample(tmp_path))
    main = (tmp_path / "ours_out" / "fusions.tsv").read_text()
    discarded = (tmp_path / "ours_out" / "discarded.tsv").read_text()
    # the DUX4-shaped event is spared by the many-discordant-mates branch
    assert ("IGHLIKE\tDUX4L" in main) or ("DUX4L\tIGHLIKE" in main), main
    # the sceptical variants die in end_to_end
    for pair in ("PAX5L", "CLOSE", "INTRON1"):
        assert pair not in main, main
    assert "end_to_end" in discarded


@pytest.mark.parametrize("seed", [70007, 70015, 70030])
def test_large_fuzz_partner_order_parity(tmp_path, seed):
    """Regression: the fusion-partner dedup of the e-value model
    (filter_relative_support.cpp:21-29) is first-insertion-wins in the
    reference's unordered_map ITERATION order — when two gene pairs share
    breakpoints, which partner enters a gene's set depends on that order,
    shifting e-values (a factor of max(count-1,1)) and thereby the output
    sort. These 60-event samples produced exactly that collision; all
    engines must walk the emulated map order (caught in round 4 by a
    large-fuzz band: 3/40 seeds diverged only in row ORDER of
    fusions.tsv)."""
    from .scenario import large_fuzz_sample
    assert_parity(tmp_path, large_fuzz_sample(tmp_path, seed),
                  our_extra_args=("-@", "4"))


# ---- adversarial iteration-order families (VERDICT r4 item 7): inputs
# constructed to expose hash/map-walk-order dependencies instead of waiting
# for a lucky fuzz seed ----

@pytest.mark.parametrize("seed", [1, 2, 3, 4])
def test_breakpoint_sharing_parity(tmp_path, seed):
    """Overlapping gene pairs make every event two fusions with IDENTICAL
    breakpoints — the class that hid the round-4 e-value partner-dedup bug
    (filter_relative_support.cpp:21-29) — at ~10x fuzz density."""
    from .scenario import breakpoint_sharing_sample
    assert_parity(tmp_path, breakpoint_sharing_sample(tmp_path, seed))


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_homolog_tie_parity(tmp_path, seed):
    """Literal genome copies as 3' partners with EXACTLY equal support:
    filter_homologs' keep-the-better-supported arbitration
    (filter_homologs.cpp:90-130) ties and resolves by map walk order."""
    from .scenario import homolog_tie_sample
    assert_parity(tmp_path, homolog_tie_sample(tmp_path, seed))


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_merge_adjacent_chain_parity(tmp_path, seed):
    """Breakpoint chains at 2-3 bp steps inside the 5 bp merge distance:
    which fusion absorbs which in merge_adjacent_fusions
    (merge_adjacent_fusions.cpp:19-108) depends on walk order."""
    from .scenario import merge_adjacent_chain_sample
    assert_parity(tmp_path, merge_adjacent_chain_sample(tmp_path, seed))


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_select_best_tie_parity(tmp_path, seed):
    """One gene pair, several breakpoints with exactly equal support and
    anchors: select_best's survivor (select_best.cpp:43-58) is decided by
    iteration order alone."""
    from .scenario import select_best_tie_sample
    assert_parity(tmp_path, select_best_tie_sample(tmp_path, seed))
