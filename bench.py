"""Benchmark: end-to-end pipeline throughput (chimeric reads/s).

Prints ONE JSON line to stdout:
  {"metric": "end_to_end_chimeric_reads_per_s", "value": N,
   "unit": "chimeric reads/s", "vs_baseline": R, ...}

The measured quantity is the full arriba_tpu pipeline (CLI surface, native
engine, default offload policy) on the GENOME-SCALE tier: ~365 Mb assembly
across 25 contigs, 20,016 genes / 200,160 exons, 150 bp reads, ~10 M
alignment records with ~3.5 % chimeric (bench_samples.build_tier2 — the
read length and annotation scale of the reference's published workloads,
documentation/02-Quickstart.md:33, test/read1.fastq.gz).

vs_baseline is the MEASURED head-to-head against the reference arriba
binary (v2.5.1, compiled in-tree) on the SAME sample with byte-equal
fusions.tsv required — not a prose-derived figure. When the oracle binary
cannot be built, it falls back to the derived 8,000 chimeric reads/s
single-core estimate (BASELINE.md) and says so in "vs_baseline_source".

stderr carries the secondary rows: the round-1..3 continuity tier (tier 1,
50 bp dense sample), per-stage wall-time breakdown, device-on vs device-off
e2e, chip-truth per wired device op (executed on the real accelerator with
host-equality asserts), the realignment-engine crossover table
(C++ / Python / device), and the head-to-head methodology note.
"""

from __future__ import annotations

import json
import os
import pathlib
import re
import subprocess
import sys
import time

import numpy as np

ARRIBA_BASELINE_READS_PER_S = 8000.0
REPO = pathlib.Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

from bench_samples import (TIER1_DIR, TIER2_DIR, build_tier2,  # noqa: E402
                           tier2_cli_args)

SAMPLE_DIR = TIER1_DIR  # tier-1 builder below (round-1..3 continuity)

N_PROPER_PAIRS = 4_500_000
N_SPLIT_FRAGMENTS = 275_000
N_DISCORDANT = 60_000
CONTIG_LEN = 5_000_000
READ_LEN = 50
N_JUNCTIONS = 400


def _genome(rng: np.random.Generator) -> dict:
    bases = np.frombuffer(b"ACGT", np.uint8)
    return {name: bases[rng.integers(0, 4, CONTIG_LEN)]
            for name in ("1", "2")}


def _build_tier1() -> None:
    """Deterministic ~10M-record SAM with ~3.5% chimeric records (50 bp)."""
    SAMPLE_DIR.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(20260817)
    genome = _genome(rng)

    with open(SAMPLE_DIR / "genome.fa", "w") as fa:
        for name, seq in genome.items():
            fa.write(f">{name}\n")
            text = seq.tobytes().decode()
            for i in range(0, len(text), 80):
                fa.write(text[i:i + 80] + "\n")

    gtf_lines = []
    gene_row = 0
    gene_starts = {}
    for contig in ("1", "2"):
        starts = []
        for g in range(200):
            start = 100_000 + g * 20_000
            end = start + 8_000
            gid = f"G{gene_row}"
            attrs = (f'gene_id "{gid}"; gene_name "GENE{gene_row}"; '
                     f'transcript_id "T{gene_row}";')
            for feat, fs, fe in (("exon", start, start + 2999),
                                 ("CDS", start, start + 2999),
                                 ("exon", end - 2999, end),
                                 ("CDS", end - 2999, end)):
                gtf_lines.append(f"{contig}\tbench\t{feat}\t{fs + 1}\t{fe + 1}"
                                 f"\t.\t+\t0\t{attrs}")
            starts.append(start)
            gene_row += 1
        gene_starts[contig] = starts
    (SAMPLE_DIR / "genes.gtf").write_text("\n".join(gtf_lines) + "\n")
    (SAMPLE_DIR / "blacklist.tsv").write_text("1:4900000\t1:4950000\n")

    def seq(contig: str, pos: int, length: int) -> str:
        return genome[contig][pos:pos + length].tobytes().decode()

    lines = ["@HD\tVN:1.6\tSO:unsorted",
             f"@SQ\tSN:1\tLN:{CONTIG_LEN}", f"@SQ\tSN:2\tLN:{CONTIG_LEN}"]

    positions = rng.integers(1000, CONTIG_LEN - 1000, N_PROPER_PAIRS)
    contigs = rng.integers(0, 2, N_PROPER_PAIRS)
    for i in range(N_PROPER_PAIRS):
        c = "1" if contigs[i] == 0 else "2"
        p = int(positions[i])
        s1 = seq(c, p, READ_LEN)
        s2 = seq(c, p + 80, READ_LEN)
        lines.append(f"n{i}\t99\t{c}\t{p + 1}\t60\t{READ_LEN}M\t=\t{p + 81}"
                     f"\t130\t{s1}\t*\tHI:i:1")
        lines.append(f"n{i}\t147\t{c}\t{p + 81}\t60\t{READ_LEN}M\t=\t{p + 1}"
                     f"\t-130\t{s2}\t*\tHI:i:1")

    junction_pairs = [(int(rng.integers(0, 200)), int(rng.integers(0, 200)))
                      for _ in range(N_JUNCTIONS)]
    splits_per_junction = N_SPLIT_FRAGMENTS // N_JUNCTIONS
    fid = 0
    for g1, g2 in junction_pairs:
        bp1 = gene_starts["1"][g1] + 1500
        bp2 = gene_starts["2"][g2] + 1500
        for k in range(splits_per_junction):
            m1_pos = bp1 - 120 - (k % 40)
            sr_pos = bp1 - 30
            clipped = seq("2", bp2, 40)
            lines.append(f"f{fid}\t99\t1\t{m1_pos + 1}\t60\t{READ_LEN}M\t=\t"
                         f"{sr_pos + 1}\t150\t{seq('1', m1_pos, READ_LEN)}"
                         f"\t*\tHI:i:1")
            lines.append(f"f{fid}\t147\t1\t{sr_pos + 1}\t60\t30M40S\t=\t"
                         f"{m1_pos + 1}\t-150\t{seq('1', sr_pos, 30)}{clipped}"
                         f"\t*\tHI:i:1\tSA:Z:2,{bp2 + 1},-,30S40M,60,0;")
            lines.append(f"f{fid}\t2195\t2\t{bp2 + 1}\t60\t30H40M\t1\t"
                         f"{m1_pos + 1}\t0\t{clipped}\t*\tHI:i:1")
            fid += 1
    for d in range(N_DISCORDANT):
        g1, g2 = junction_pairs[d % N_JUNCTIONS]
        bp1 = gene_starts["1"][g1] + 1500
        bp2 = gene_starts["2"][g2] + 1500
        p1 = bp1 - 100 - (d % 30)
        lines.append(f"d{d}\t97\t1\t{p1 + 1}\t60\t{READ_LEN}M\t2\t{bp2 + 31}"
                     f"\t0\t{seq('1', p1, READ_LEN)}\t*\tHI:i:1")
        lines.append(f"d{d}\t145\t2\t{bp2 + 31}\t60\t{READ_LEN}M\t1\t{p1 + 1}"
                     f"\t0\t{seq('2', bp2 + 30, READ_LEN)}\t*\tHI:i:1")

    with open(SAMPLE_DIR / "aligned.sam", "w") as out:
        out.write("\n".join(lines) + "\n")
    (SAMPLE_DIR / ".complete").write_text("v3\n")


def _ensure_samples() -> None:
    if not (SAMPLE_DIR / ".complete").exists():
        print("building tier-1 benchmark sample (one-time, cached) ...",
              file=sys.stderr)
        _build_tier1()
    build_tier2()


def _ensure_oracle() -> pathlib.Path | None:
    oracle = pathlib.Path("/tmp/arriba_oracle/arriba")
    if oracle.exists():
        return oracle
    build = REPO / "oracle" / "build_oracle.sh"
    if not build.exists() or not pathlib.Path("/root/reference").exists():
        return None
    try:
        subprocess.run(["bash", str(build)], check=True, capture_output=True,
                       timeout=600)
    except Exception:
        return None
    return oracle if oracle.exists() else None


def _pipeline_cmd(sample_args, out_dir: pathlib.Path, threads: int,
                  suffix: str = "") -> list:
    return ([sys.executable, "-m", "arriba_tpu"] + sample_args
            + ["-o", str(out_dir / f"fusions{suffix}.tsv"),
               "-O", str(out_dir / f"fusions{suffix}.discarded.tsv"),
               "-@", str(threads)])


def _run_pipeline(sample_args, out_dir: pathlib.Path, threads: int,
                  env_extra: dict | None = None, suffix: str = "") -> tuple:
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    # host-only runs skip the accelerator-tunnel PJRT registration (costs
    # seconds of jax import + device discovery per process)
    if not env_extra or env_extra.get("ARRIBA_TPU_DEVICE") != "1":
        env.pop("PALLAS_AXON_POOL_IPS", None)
    if env_extra:
        env.update(env_extra)
    cmd = _pipeline_cmd(sample_args, out_dir, threads, suffix)
    start = time.perf_counter()
    result = subprocess.run(cmd, env=env, capture_output=True, text=True)
    elapsed = time.perf_counter() - start
    if result.returncode != 0:
        raise RuntimeError(f"pipeline failed:\n{result.stdout}\n{result.stderr}")
    total = int(re.search(r"Reading chimeric alignments.*\(total=(\d+)\)",
                          result.stdout).group(1))
    rss = re.search(r"peak memory=([0-9.]+)gb", result.stdout)
    return elapsed, total, result.stdout, float(rss.group(1)) if rss else None


def _stage_breakdown(sample_args, out_dir: pathlib.Path, threads: int) -> list:
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    env["ARRIBA_TPU_STAGE_TIMES"] = "1"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    traced = subprocess.run(_pipeline_cmd(sample_args, out_dir, threads),
                            env=env, capture_output=True, text=True,
                            timeout=600)
    stages = []
    pending = None
    for line in traced.stderr.splitlines():
        if line.startswith("[stage] "):
            pending = line[len("[stage] "):].strip()
        elif line.startswith("[stage +") and pending is not None:
            stages.append((float(line[len("[stage +"):-2]), pending))
    stages.sort(reverse=True)
    return stages


def _oracle_run(oracle: pathlib.Path, sample_args, out_dir: pathlib.Path,
                repeats: int = 2) -> float:
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    cmd = ([str(oracle)] + sample_args
           + ["-o", str(out_dir / "fusions.reference.tsv"),
              "-O", str(out_dir / "fusions.reference.discarded.tsv")])
    times = []
    for _ in range(repeats):
        start = time.perf_counter()
        result = subprocess.run(cmd, env=env, capture_output=True, text=True)
        times.append(time.perf_counter() - start)
        if result.returncode != 0:
            raise RuntimeError(f"reference binary failed: {result.stderr}")
    return min(times)


def secondary(payload: dict) -> None:
    print(f"secondary: {json.dumps(payload)}", file=sys.stderr, flush=True)


def _warm_page_cache(*paths) -> None:
    for path in paths:
        try:
            with open(path, "rb") as fh:
                while fh.read(1 << 24):
                    pass
        except OSError:
            pass


def main() -> None:
    _ensure_samples()
    import compileall
    compileall.compile_dir(str(REPO / "arriba_tpu"), quiet=2, workers=0)
    threads = os.cpu_count() or 1
    t2_args = tier2_cli_args()
    _warm_page_cache(TIER2_DIR / "aligned.sam", TIER2_DIR / "genome.fa",
                     TIER2_DIR / "genes.gtf")

    # ---- headline: tier-2 e2e (best-of-3) + measured head-to-head ----
    runs = [_run_pipeline(t2_args, TIER2_DIR, threads) for _ in range(3)]
    runs.sort(key=lambda r: r[0])
    elapsed, total, _stdout, peak_rss = runs[0]
    reads_per_s = total / elapsed

    oracle = _ensure_oracle()
    vs_baseline = None
    vs_source = "derived_8k_reads_per_s"
    head_to_head = None
    if oracle is not None:
        try:
            ref_elapsed = _oracle_run(oracle, t2_args, TIER2_DIR)
            ours = (TIER2_DIR / "fusions.tsv").read_bytes()
            theirs = (TIER2_DIR / "fusions.reference.tsv").read_bytes()
            byte_equal = ours == theirs
            head_to_head = {
                "metric": "head_to_head_speedup_vs_reference_binary",
                "tier": "genome-scale-150bp",
                "value": round(ref_elapsed / elapsed, 2),
                "unit": "x (reference wall / ours, same sample)",
                "reference_s": round(ref_elapsed, 2),
                "ours_s": round(elapsed, 2),
                "fusions_byte_equal": byte_equal,
                "methodology": (
                    "reference v2.5.1 built -O2 against the clean-room "
                    "zlib htslib shim; input is PLAIN SAM, so the "
                    "libdeflate-vs-zlib BGZF difference of production "
                    "builds does not apply; same machine, reference is "
                    "single-threaded by design (its -@ only affects BAM "
                    "decompression), ours uses -@ "
                    f"{threads}; see the ours_single_thread row for the "
                    "pinned-core comparison")}
            if byte_equal:
                vs_baseline = round(ref_elapsed / elapsed, 2)
                vs_source = "measured_head_to_head_same_sample"
        except Exception as error:  # noqa: BLE001
            print(f"oracle head-to-head failed: {error}", file=sys.stderr)
    if vs_baseline is None:
        vs_baseline = round(reads_per_s / ARRIBA_BASELINE_READS_PER_S, 2)

    primary = {
        "metric": "end_to_end_chimeric_reads_per_s",
        "value": round(reads_per_s, 1),
        "unit": "chimeric reads/s",
        "vs_baseline": vs_baseline,
        "vs_baseline_source": vs_source,
        "tier": "genome-scale-150bp",
        "peak_rss_gb": peak_rss,
    }
    # Printed immediately (so a later hang cannot lose the headline) AND
    # re-printed as the very last line of main() — the driver records only
    # a tail of combined output, and round 4's artifact lost the primary
    # row because ~15 secondary lines followed it.
    print(json.dumps(primary), flush=True)

    if head_to_head:
        secondary(head_to_head)

    # ---- single-thread pinned comparison ----
    try:
        st_elapsed, st_total, _, _ = _run_pipeline(t2_args, TIER2_DIR, 1,
                                                   suffix=".st")
        secondary({"metric": "tier2_ours_single_thread",
                   "value": round(st_total / st_elapsed, 1),
                   "unit": "chimeric reads/s", "ours_s": round(st_elapsed, 2)})
    except Exception as error:  # noqa: BLE001
        print(f"single-thread row skipped: {error}", file=sys.stderr)

    # ---- per-stage breakdown (instrumented tier-2 run) ----
    try:
        stages = _stage_breakdown(t2_args, TIER2_DIR, threads)
        print("tier-2 per-stage breakdown (instrumented run):", file=sys.stderr)
        for seconds, stage in stages[:8]:
            if seconds >= 0.02:
                print(f"  {seconds:6.2f}s  {stage[:68]}", file=sys.stderr)
        for name, key in (("Loading annotation", "gtf_load_s"),
                          ("Loading assembly", "assembly_load_s"),
                          ("Indexing gene sequences", "kmer_index_build_s")):
            val = next((s for s, st in stages if st.startswith(name)), None)
            if val is not None:
                secondary({"metric": key, "value": round(val, 3), "unit": "s"})
    except Exception as error:  # noqa: BLE001
        print(f"stage breakdown skipped: {error}", file=sys.stderr)

    # ---- device-on vs device-off e2e (same sample, byte-equal asserted) ----
    try:
        off_elapsed, off_total, _, _ = _run_pipeline(
            t2_args, TIER2_DIR, threads, {"ARRIBA_TPU_DEVICE": "0"},
            suffix=".devoff")
        on_elapsed, on_total, _, _ = _run_pipeline(
            t2_args, TIER2_DIR, threads, {"ARRIBA_TPU_DEVICE": "1"},
            suffix=".devon")
        equal = ((TIER2_DIR / "fusions.devoff.tsv").read_bytes()
                 == (TIER2_DIR / "fusions.devon.tsv").read_bytes())
        secondary({
            "metric": "e2e_device_on_vs_off",
            "device_off_reads_per_s": round(off_total / off_elapsed, 1),
            "device_on_reads_per_s": round(on_total / on_elapsed, 1),
            "device_off_s": round(off_elapsed, 2),
            "device_on_s": round(on_elapsed, 2),
            "fusions_byte_equal": equal,
            "note": ("ARRIBA_TPU_DEVICE=1 is HYBRID since round 5: the "
                     "C++ cascade keeps every host-optimal stage and the "
                     "batched low-entropy scan is decided on the "
                     "accelerator at the stage-13 boundary "
                     "(cascade_low_entropy_rows -> "
                     "ops.readfilters.low_entropy_batch -> "
                     "cascade_set_filters), byte-equal either way. The "
                     "remaining device_on gap is fixed per-run overhead "
                     "through this environment's remote tunnel: jax+axon "
                     "backend init (~5-8 s), one cold XLA compile "
                     "(~4 s; was ~100 s before the op was wrapped in a "
                     "single jit), and ~100 MB of code-matrix transfer "
                     "at 0.1-1 GB/s. On a locally-attached chip those "
                     "terms are ~1 s import + cacheable compile + "
                     "PCIe-speed transfer, i.e. device_on ~= device_off. "
                     "The auto policy (DEVICE unset) still offloads only "
                     "on a local chip above the batch-size crossover")})
    except Exception as error:  # noqa: BLE001
        print(f"device on/off rows skipped: {error}", file=sys.stderr)

    # ---- production-input (BAM) head-to-head ----
    try:
        bam_path = TIER2_DIR / "aligned.bam"
        if not bam_path.exists():
            subprocess.run(
                [sys.executable, str(REPO / "scripts/convert_sam_to_bam.py"),
                 str(TIER2_DIR / "aligned.sam"), str(bam_path)],
                check=True, timeout=1800)
        _warm_page_cache(bam_path)
        bam_args = ["-x", str(bam_path)] + t2_args[2:]
        bam_runs = [_run_pipeline(bam_args, TIER2_DIR, threads,
                                  suffix=".bam_run") for _ in range(2)]
        bam_runs.sort(key=lambda r: r[0])
        bam_elapsed = bam_runs[0][0]
        row = {"metric": "bam_head_to_head",
               "tier": "genome-scale-150bp",
               "ours_s": round(bam_elapsed, 2),
               "fusions_byte_equal_to_sam_run": (
                   (TIER2_DIR / "fusions.bam_run.tsv").read_bytes()
                   == (TIER2_DIR / "fusions.tsv").read_bytes())}
        if oracle is not None:
            try:
                ref_bam = _oracle_run(oracle, bam_args, TIER2_DIR, repeats=2)
                row["reference_s"] = round(ref_bam, 2)
                row["value"] = round(ref_bam / bam_elapsed, 2)
                row["unit"] = "x (reference wall / ours, same BAM)"
                row["note"] = ("both binaries reading the same BGZF BAM "
                               "(the production input); the reference here "
                               "is the in-tree zlib build — production "
                               "arriba links libdeflate, which narrows "
                               "its decompression share")
            except Exception as error:  # noqa: BLE001
                row["reference_error"] = str(error)[:200]
        secondary(row)
    except Exception as error:  # noqa: BLE001
        print(f"bam head-to-head skipped: {error}", file=sys.stderr)

    # ---- sample-sharded ingest scaling (ARRIBA_TPU_SHARDS) ----
    try:
        host_bytes = (TIER2_DIR / "fusions.tsv").read_bytes()
        host_disc = (TIER2_DIR / "fusions.discarded.tsv").read_bytes()
        shard_rows = []
        for procs in (2, 4):
            env = {"ARRIBA_TPU_SHARDS": str(procs),
                   "ARRIBA_TPU_SHARD_TIMING": "1"}
            elapsed, total, _, _ = _run_pipeline(
                t2_args, TIER2_DIR, threads, env, suffix=f".shards{procs}")
            traced = subprocess.run(
                _pipeline_cmd(t2_args, TIER2_DIR, 1, f".shards{procs}"),
                env=dict(os.environ, PYTHONPATH=str(REPO), **env),
                capture_output=True, text=True, timeout=600)
            worker_scans = [float(m) for m in re.findall(
                r"\[shard\] worker \d+ scan ([0-9.]+)s", traced.stderr)]
            equal = ((TIER2_DIR / f"fusions.shards{procs}.tsv").read_bytes()
                     == host_bytes
                     and (TIER2_DIR / f"fusions.shards{procs}.discarded.tsv")
                     .read_bytes() == host_disc)
            shard_rows.append({
                "processes": procs,
                "e2e_s": round(elapsed, 2),
                "worker_scan_max_s": round(max(worker_scans), 2)
                if worker_scans else None,
                "byte_equal": equal})
        secondary({
            "metric": "sample_sharded_ingest_scaling",
            "tier": "genome-scale-150bp",
            "rows": shard_rows,
            "note": ("ARRIBA_TPU_SHARDS=N forks N ingest workers over "
                     "interleaved 16MB byte stripes of the SAM; the master "
                     "merges coverage planes (saturating sum), partial "
                     "fragments, and replays cross-boundary pairs — "
                     "byte-equal at every process count. worker_scan_max_s "
                     "is the sharded portion (halves with 2x processes); "
                     "on this one 4-core host the in-process threaded scan "
                     "is faster end-to-end, so the process tier exists for "
                     "multi-host scale-out: the merge traffic (planes + "
                     "fragment blobs) is exactly what would ride DCN")})
    except Exception as error:  # noqa: BLE001
        print(f"sharded-sample rows skipped: {error}", file=sys.stderr)

    # ---- tier-3 human-scale spot check (3.1 Gb / 62k genes / 744k exons) --
    try:
        from bench_samples import TIER3_DIR, build_tier3
        build_tier3()
        t3_args = ["-x", str(TIER3_DIR / "aligned.sam"),
                   "-g", str(TIER3_DIR / "genes.gtf"),
                   "-a", str(TIER3_DIR / "genome.fa"),
                   "-b", str(TIER3_DIR / "blacklist.tsv"), "-s", "no"]
        _warm_page_cache(TIER3_DIR / "aligned.sam", TIER3_DIR / "genome.fa",
                         TIER3_DIR / "genes.gtf")
        t3_elapsed, _, _, t3_rss = _run_pipeline(t3_args, TIER3_DIR, threads)
        row = {"metric": "tier3_human_scale",
               "assembly_gb": 3.1, "genes": 62016, "exons": 744192,
               "ours_s": round(t3_elapsed, 2), "peak_rss_gb": t3_rss,
               "rss_under_10gb_envelope": (t3_rss or 99) < 10.0}
        stages = _stage_breakdown(t3_args, TIER3_DIR, threads)
        for name, key in (("Loading annotation", "gtf_load_s"),
                          ("Loading assembly", "assembly_load_s"),
                          ("Reading chimeric alignments", "ingest_s")):
            val = next((sec for sec, st in stages if st.startswith(name)),
                       None)
            if val is not None:
                row[key] = round(val, 2)
        if oracle is not None:
            try:
                ref3 = _oracle_run(oracle, t3_args, TIER3_DIR, repeats=1)
                row["reference_s"] = round(ref3, 2)
                row["value"] = round(ref3 / t3_elapsed, 2)
                row["unit"] = "x (reference wall / ours, same sample)"
                row["fusions_byte_equal"] = (
                    (TIER3_DIR / "fusions.tsv").read_bytes()
                    == (TIER3_DIR / "fusions.reference.tsv").read_bytes())
                row["discarded_byte_equal"] = (
                    (TIER3_DIR / "fusions.discarded.tsv").read_bytes()
                    == (TIER3_DIR / "fusions.reference.discarded.tsv")
                    .read_bytes())
            except Exception as error:  # noqa: BLE001
                row["reference_error"] = str(error)[:200]
        secondary(row)
    except Exception as error:  # noqa: BLE001
        print(f"tier-3 row skipped: {error}", file=sys.stderr)

    # ---- tier-1 continuity row ----
    try:
        t1_args = ["-x", str(SAMPLE_DIR / "aligned.sam"),
                   "-g", str(SAMPLE_DIR / "genes.gtf"),
                   "-a", str(SAMPLE_DIR / "genome.fa"),
                   "-b", str(SAMPLE_DIR / "blacklist.tsv"),
                   "-i", "1 2", "-s", "no"]
        t1_runs = [_run_pipeline(t1_args, SAMPLE_DIR, threads)
                   for _ in range(3)]
        t1_runs.sort(key=lambda r: r[0])
        t1_elapsed, t1_total, _, _ = t1_runs[0]
        row = {"metric": "tier1_end_to_end_chimeric_reads_per_s",
               "value": round(t1_total / t1_elapsed, 1),
               "unit": "chimeric reads/s",
               "vs_derived_8k_baseline": round(
                   t1_total / t1_elapsed / ARRIBA_BASELINE_READS_PER_S, 2)}
        if oracle is not None:
            try:
                ref1 = _oracle_run(oracle, t1_args, SAMPLE_DIR, repeats=2)
                row["head_to_head_x"] = round(ref1 / t1_elapsed, 2)
                row["fusions_byte_equal"] = (
                    (SAMPLE_DIR / "fusions.tsv").read_bytes()
                    == (SAMPLE_DIR / "fusions.reference.tsv").read_bytes())
            except Exception:  # noqa: BLE001
                pass
        secondary(row)
    except Exception as error:  # noqa: BLE001
        print(f"tier-1 row skipped: {error}", file=sys.stderr)

    # ---- chip-truth: wired device ops on the real accelerator ----
    try:
        child = subprocess.run(
            [sys.executable, __file__, "--chip-truth"],
            capture_output=True, text=True, timeout=600)
        for line in child.stdout.splitlines():
            if line.strip():
                print(f"secondary: {line.strip()}", file=sys.stderr)
        if child.returncode != 0:
            print(f"chip-truth rows incomplete: "
                  f"{child.stderr.strip()[-400:]}", file=sys.stderr)
    except subprocess.TimeoutExpired:
        print("chip-truth skipped: accelerator unreachable (600s timeout)",
              file=sys.stderr)

    # ---- realignment-engine crossover table ----
    try:
        child = subprocess.run(
            [sys.executable, __file__, "--realign-crossover"],
            capture_output=True, text=True, timeout=900)
        for line in child.stdout.splitlines():
            if line.strip():
                print(f"secondary: {line.strip()}", file=sys.stderr)
        if child.returncode != 0:
            print(f"realign crossover incomplete: "
                  f"{child.stderr.strip()[-400:]}", file=sys.stderr)
    except subprocess.TimeoutExpired:
        print("realign crossover skipped (600s timeout)", file=sys.stderr)

    # Final line of combined output = the primary JSON row (see above).
    if head_to_head:
        secondary(head_to_head)
    sys.stderr.flush()
    print(json.dumps(primary), flush=True)


# ---------------------------------------------------------------------------
# chip-truth: every production-wired device op executed on the accelerator
# with host-equality asserts (run as a child so a wedged tunnel can't hang
# the headline)

def chip_truth() -> None:
    import jax
    import jax.numpy as jnp

    rows = []
    dev = jax.devices()[0]
    rng = np.random.default_rng(11)
    bases = np.frombuffer(b"ACGT", np.uint8)

    def timed(fn, *args):
        # fetch results to host: through a remote tunnel block_until_ready
        # can return before the computation actually completes, so only a
        # host round-trip of the (small) outputs bounds the true wall time
        fetch = lambda out: jax.tree_util.tree_map(np.asarray, out)  # noqa: E731
        out = fetch(fn(*args))
        t0 = time.perf_counter()
        out = fetch(fn(*args))
        return out, time.perf_counter() - t0

    # 1. low-entropy scan (wired: filters/read_level.py filter_low_entropy)
    from arriba_tpu.filters.read_level import _low_entropy_flags
    from arriba_tpu.ops.readfilters import low_entropy_batch
    n, L = 32768, 152
    codes = rng.integers(0, 4, (n, L)).astype(np.uint8)
    lengths = np.full(n, 150, np.int32)
    a1s = np.full(n, 10, np.int32)
    a1e = np.full(n, 140, np.int32)
    out, secs = timed(low_entropy_batch,
                      jnp.asarray(codes), jnp.asarray(lengths),
                      jnp.asarray(a1s), jnp.asarray(a1e),
                      jnp.asarray(a1s), jnp.asarray(a1e), 0.6)
    host = _low_entropy_flags(codes, lengths, a1s, a1e, a1s, a1e, 0.6, 3)
    equal = bool(np.array_equal(np.asarray(out), host))
    rows.append({"metric": "chip_low_entropy", "device": str(dev),
                 "rows_per_s": round(n / secs, 1), "host_equal": equal,
                 "note": "device-resident rate (inputs committed before "
                         "timing; host<->device transfer excluded)"})

    # 2. realign screen + accept (wired: filters/mismappers.py device_screen)
    from arriba_tpu.ops.realign import accept_pairs, screen_pairs
    n_pairs, W, RL = 256, 4096, 150
    reads, windows, mss = [], [], []
    for i in range(n_pairs):
        win = rng.choice(bases, W)
        if i % 2 == 0:
            p = int(rng.integers(0, W - RL))
            read = win[p:p + RL].copy()
            read[rng.integers(0, RL, 3)] = rng.choice(bases, 3)
        else:
            read = rng.choice(bases, RL)
        reads.append(read.tobytes().decode())
        windows.append(win)
        mss.append(int(0.8 * RL + 0.5))
    screen_pairs(reads, windows)          # compile (shape-bucketed jit)
    accept_pairs(reads, windows, mss)
    t0 = time.perf_counter()
    scr = screen_pairs(reads, windows)
    acc = accept_pairs(reads, windows, mss)
    secs = time.perf_counter() - t0
    sound = bool(np.all(~acc | scr))  # accept implies shared seed
    effective = bool(acc[::2].mean() > 0.9)  # embedded copies accepted
    rows.append({"metric": "chip_realign_screen_accept", "device": str(dev),
                 "pairs_per_s": round(n_pairs / secs, 1),
                 "accept_implies_seed": sound,
                 "embedded_copies_accepted": effective})

    # 2b. MXU seed screen (the systolic-array formulation of the realign
    #     seed screen / homolog identity test — one-hot int8 matmul,
    #     dot == 8 <=> shared 8-mer; VERDICT r4 item 3). Host-equality is
    #     asserted against the sorted screen (itself brute-force-tested).
    try:
        from arriba_tpu.ops.realign import (mxu_shared_kmer_mask,
                                            shared_kmer_mask)
        b_pairs, read_len, window_len = 512, 152, 8008
        m_reads = rng.integers(0, 4, (b_pairs, read_len)).astype(np.uint8)
        m_wins = rng.integers(0, 4, (b_pairs, window_len)).astype(np.uint8)
        for row in range(0, b_pairs, 2):  # plant seeds in half the pairs
            at = int(rng.integers(0, window_len - 8))
            m_wins[row, at:at + 8] = m_reads[row, 40:48]
        mxu_out, mxu_secs = timed(mxu_shared_kmer_mask,
                                  jnp.asarray(m_reads), jnp.asarray(m_wins))
        sort_out, sort_secs = timed(shared_kmer_mask,
                                    jnp.asarray(m_reads),
                                    jnp.asarray(m_wins))
        equal = bool(np.array_equal(np.asarray(mxu_out),
                                    np.asarray(sort_out)))
        # dispatch-excluded rate via a DEPENDENT chain inside one jit (each
        # iteration's input depends on the previous verdicts, so the chain
        # cannot be elided or overlapped)
        K = 8

        @jax.jit
        def mxu_chain(r, w):
            def body(carry, _):
                r2 = r.at[:, 0].set((r[:, 0] + carry) % 4)
                v = mxu_shared_kmer_mask(r2, w)
                return v.astype(jnp.uint8), jnp.sum(v)
            _, outs = jax.lax.scan(body, jnp.zeros(r.shape[0], jnp.uint8),
                                   None, length=K)
            return outs

        _, chain_secs = timed(mxu_chain, jnp.asarray(m_reads),
                              jnp.asarray(m_wins))
        macs = b_pairs * (read_len - 7) * (window_len - 7) * 32
        rows.append({
            "metric": "chip_mxu_seed_screen", "device": str(dev),
            "pairs_per_s_one_dispatch": round(b_pairs / mxu_secs, 1),
            "pairs_per_s_device_resident": round(b_pairs * K / chain_secs,
                                                 1),
            "achieved_int8_tops": round(2 * macs * K / chain_secs / 1e12,
                                        2),
            "sorted_screen_pairs_per_s": round(b_pairs / sort_secs, 1),
            "host_equal_to_sorted_screen": equal,
            "note": ("one-hot int8 matmul [B,145,32]x[B,32,Wc] tiles on "
                     "the MXU with fused any(dot==8); compare "
                     "cpp_seed_index pairs/s in realign_engine_crossover "
                     "for the host-vs-chip verdict on this op")})
    except Exception as error:  # noqa: BLE001
        rows.append({"metric": "chip_mxu_seed_screen",
                     "error": str(error)[:300]})

    # 3. pileup histogram (wired: output/writer.py build_device_pileups)
    from arriba_tpu.ops.pileup import N_SYMBOLS, pileup_histogram
    m_obs, n_rows, window = 200_000, 64, 512
    codes = rng.integers(0, N_SYMBOLS, m_obs).astype(np.int32)
    positions = rng.integers(-4, window + 4, m_obs).astype(np.int32)
    row_ids = rng.integers(0, n_rows, m_obs).astype(np.int32)
    out, secs = timed(
        lambda c, p, r: pileup_histogram(c, p, r, n_rows, window),
        jnp.asarray(codes), jnp.asarray(positions), jnp.asarray(row_ids))
    host = np.zeros((n_rows, window, N_SYMBOLS), np.int32)
    valid = (positions >= 0) & (positions < window)
    np.add.at(host, (row_ids[valid], positions[valid], codes[valid]), 1)
    equal = bool(np.array_equal(np.asarray(out), host))
    rows.append({"metric": "chip_pileup_histogram", "device": str(dev),
                 "observations_per_s": round(m_obs / secs, 1),
                 "host_equal": equal})

    # 4. interval triage (wired: pipeline.py gene annotation fallback +
    #    filters/blacklist.py) — a SOUND emptiness prefilter: every query
    #    with a real overlap (within 2 bp slack) must triage True
    from arriba_tpu.ops.annotation import interval_overlap_triage
    n_q = 65536
    starts = np.sort(rng.integers(0, 10_000_000, 3000)).astype(np.int64)
    ends = starts + rng.integers(100, 10_000, 3000)
    contigs = np.zeros(3000, np.int64)
    queries = [(0, int(p), int(p + 150))
               for p in rng.integers(0, 10_000_000, n_q)]
    t0 = time.perf_counter()
    hits = interval_overlap_triage(queries, contigs, starts, ends, 1)
    secs = time.perf_counter() - t0
    if hits is None:
        rows.append({"metric": "chip_interval_triage", "device": str(dev),
                     "note": "coordinate overflow fallback"})
    else:
        q_lo = np.asarray([s for _, s, _ in queries], np.int64) - 2
        q_hi = np.asarray([e for _, _, e in queries], np.int64) + 2
        overlap = np.zeros(n_q, bool)
        for i in range(n_q):
            overlap[i] = bool(np.any((starts <= q_hi[i])
                                     & (ends >= q_lo[i])))
        sound = bool(np.all(~overlap | np.asarray(hits)))
        rows.append({"metric": "chip_interval_triage", "device": str(dev),
                     "queries_per_s": round(n_q / secs, 1),
                     "sound_vs_host_overlap": sound,
                     "pruned_fraction": round(
                         1.0 - float(np.mean(hits)), 3)})

    # 5. accept wavefront (wired: accept_pairs Pallas path) — the exact
    #    single-seed align() automaton, device-resident rate
    from arriba_tpu.ops.realign import _accept_wavefront_pallas
    wn, wl_, ww = 512, 192, 8192
    wreads = jnp.asarray(rng.integers(65, 85, (wn, wl_)).astype(np.uint8))
    wwins = jnp.asarray(rng.integers(65, 85, (wn, ww)).astype(np.uint8))
    wparams = np.zeros((wn, 128), np.int32)
    wparams[:, 0] = 150
    wparams[:, 1] = ww
    wparams[:, 2] = 120
    wparams[:, 4] = ww
    try:
        fn = jax.jit(lambda r, w, p: _accept_wavefront_pallas(r, w, p))
        out, secs = timed(fn, wreads, wwins, jnp.asarray(wparams))
        cells = wn * 150 * ww
        # dispatch/transfer-excluded device-resident rate (the
        # chip_low_entropy methodology): K kernel iterations inside ONE
        # jitted scan over inputs already resident on the chip — this is
        # the number a locally-attached chip would see per dispatch
        resident = None
        try:
            K = 8

            @jax.jit
            def repeated_accept(r, w, p):
                def body(carry, _):
                    r2 = r.at[:, 0].set((r[:, 0] + carry) % 4 + 65)
                    verdict = _accept_wavefront_pallas(r2, w, p)
                    return carry + 1, jnp.sum(verdict)
                _, outs = jax.lax.scan(body, jnp.int32(0), None, length=K)
                return outs

            _, res_secs = timed(repeated_accept, wreads, wwins,
                                jnp.asarray(wparams))
            resident = round(wn * K / res_secs, 1)
        except Exception:  # noqa: BLE001
            pass
        rows.append({"metric": "chip_accept_wavefront", "device": str(dev),
                     "rows_per_s": round(wn / secs, 1),
                     "rows_per_s_device_resident": resident,
                     "gcups_equivalent": round(cells / secs / 1e9, 1),
                     "note": "exact single-seed align() automaton (Pallas, "
                             "VMEM carries), the kernel accept_pairs "
                             "dispatches on TPU-class devices; the "
                             "device_resident field excludes dispatch + "
                             "transfer (local-chip projection: compare "
                             "cpp_accept_heavy_pairs_per_s in "
                             "realign_engine_crossover)"})
    except Exception as error:  # noqa: BLE001 - Mosaic-version dependent
        rows.append({"metric": "chip_accept_wavefront",
                     "error": str(error)[:160]})

    # 6. fused read-filter step (bench/dryrun + low-entropy product path)
    from arriba_tpu.ops.encode import random_read_batch
    from arriba_tpu.ops.readfilters import read_filter_step
    batch = random_read_batch(np.random.default_rng(0), 65536, 152,
                              mismatch_rate=0.01)
    args = (jnp.asarray(batch.bases), jnp.asarray(batch.ref),
            jnp.asarray(batch.match_mask), jnp.asarray(batch.length),
            jnp.asarray(batch.aligned_start), jnp.asarray(batch.aligned_end),
            jnp.zeros(batch.bases.shape[0], jnp.int32))
    iters = 50

    @jax.jit
    def repeated(bases, ref, match_mask, length, start_, end_, extra0):
        def body(carry, _):
            col0 = (bases[:, 0] ^ (carry & 1).astype(bases.dtype)) & 3
            b = bases.at[:, 0].set(col0)
            out = read_filter_step(b, ref, match_mask, length,
                                   start_, end_, extra0)
            carry = (out["mismatches"]
                     + out["mismatch_discard"].astype(jnp.int32)
                     + out["low_entropy_discard"].astype(jnp.int32))
            return carry, None
        carry, _ = jax.lax.scan(body, extra0, None, length=iters)
        out = read_filter_step(bases, ref, match_mask, length,
                               start_, end_, extra0)
        return out, carry

    out, _ = jax.block_until_ready(repeated(*args))
    t0 = time.perf_counter()
    out, _ = jax.block_until_ready(repeated(*args))
    secs = time.perf_counter() - t0
    rows.append({
        "metric": "chip_fused_read_filter_step", "device": str(dev),
        "reads_per_s": round(65536 * (iters + 1) / secs, 1),
        "note": "VPU compute-bound; see BENCH_r03 roofline (0.6 VPU frac)"})

    for row in rows:
        print(json.dumps(row))


def realign_crossover() -> None:
    """The realignment-engine comparison table: the C++ seed-index engine,
    the Python recursion, and the device kernels on identical workloads.
    Published as the honest answer to 'should the realigner run on the
    chip': the seed-index algorithm (hash lookup + early-exit extension,
    filter_mismappers.cpp:86-187) is structurally host-optimal for short
    reads — dense device evaluation pays O(read x window) where the index
    pays O(hits); the device accept kernel is EXACT and wired
    (filters/mismappers.py device_screen) and pays off only in Python-only
    installs (no native toolchain) with large batches on a locally-attached
    chip."""
    rng = np.random.default_rng(5)
    bases = np.frombuffer(b"ACGT", np.uint8)
    # single-chunk device shape (W <= 8192) and a modest pair count: the
    # device kernel compile + dispatch crosses the accelerator tunnel and
    # must fit the child timeout even when the tunnel crawls
    W, L, n_pairs = 8000, 150, 128
    contig = rng.choice(bases, W * 8)

    def make_tasks(accept_heavy: bool):
        tasks = []
        for i in range(n_pairs):
            ws = (i % 8) * W
            if accept_heavy:
                p = ws + int(rng.integers(0, W - L))
                read = contig[p:p + L].copy()
                read[rng.integers(0, L, 4)] = rng.choice(bases, 4)
            else:
                read = rng.choice(bases, L)
            tasks.append((read, ws))
        return tasks

    results = {}
    # C++ engine
    try:
        from arriba_tpu import _native
        _native.realign_reset()
        _native.realign_set_contig(0, contig)
        _native.realign_add_kmers(0, 0, len(contig) - 1)
        _native.realign_finalize()
        _native.realign_set_splice_sites(1, np.asarray([], np.int64).tobytes())
        for label, heavy in (("accept_heavy", True), ("reject_heavy", False)):
            tasks = make_tasks(heavy)
            t0 = time.perf_counter()
            for read, ws in tasks:
                _native.realign_align(read.tobytes(), 0, ws, ws + W - 1, 1,
                                      int(0.8 * L + 0.5), 1)
            results[f"cpp_{label}_pairs_per_s"] = round(
                n_pairs / (time.perf_counter() - t0), 1)
    except Exception as error:  # noqa: BLE001
        results["cpp_error"] = str(error)[:120]

    # Python recursion (subset, extrapolated by rate)
    from arriba_tpu.filters.mismappers import align, kmer_to_int
    sub = 48
    ws0 = contig[:W]
    ws0_str = ws0.tobytes().decode()
    idx = {}
    for pos in range(len(ws0_str) - 8):
        idx.setdefault(kmer_to_int(ws0_str, pos, 8), []).append(pos)
    idx = {v: np.asarray(p, np.int64) for v, p in idx.items()}
    for label, heavy in (("accept_heavy", True), ("reject_heavy", False)):
        tasks = make_tasks(heavy)[:sub]
        t0 = time.perf_counter()
        for read, _ in tasks:
            align(0, read.tobytes().decode(), 0, ws0, 0, 0, W - 1, idx, 8,
                  [], int(0.8 * L + 0.5), 1)
        results[f"python_{label}_pairs_per_s"] = round(
            sub / (time.perf_counter() - t0), 1)

    # device accept kernel (wired)
    from arriba_tpu.ops.realign import accept_pairs
    compiled = False
    for label, heavy in (("accept_heavy", True), ("reject_heavy", False)):
        tasks = make_tasks(heavy)
        reads = [r.tobytes().decode() for r, _ in tasks]
        wins = [contig[ws:ws + W] for _, ws in tasks]
        mss = [int(0.8 * L + 0.5)] * len(tasks)
        if not compiled:
            accept_pairs(reads, wins, mss)  # compile + warm (one shape)
            compiled = True
        t0 = time.perf_counter()
        accept_pairs(reads, wins, mss)
        results[f"device_{label}_pairs_per_s"] = round(
            n_pairs / (time.perf_counter() - t0), 1)

    results["metric"] = "realign_engine_crossover"
    results["window_bp"] = W
    results["read_bp"] = L
    results["finding"] = (
        "the seed-index algorithm (hash lookup + early-exit extension) is "
        "structurally host-optimal for short reads: the C++ engine wins at "
        "every batch size, and through this environment's remote "
        "accelerator tunnel the device kernel trails even the Python "
        "engine. The device accept verdicts are EXACT and wired "
        "(differential-tested, tests/test_device_ops.py); the offload "
        "policy keeps them off unless explicitly requested "
        "(ARRIBA_TPU_DEVICE=1) or a local chip with a large batch is "
        "present. This row exists so the tradeoff is measured, not "
        "asserted.")
    print(json.dumps(results))

    # the per-op comparison where the chip genuinely wins per core: the
    # batched low-entropy scan (pure sequence math, no index)
    try:
        from arriba_tpu import _native
        n, RL = 131072, 152
        seqs = rng.choice(bases, (n, RL))
        flat = seqs.reshape(-1).tobytes()
        offs = (np.arange(n + 1, dtype=np.int64) * RL)
        w0 = np.zeros(n, np.int32)
        w1 = np.full(n, RL, np.int32)
        flags = np.zeros(n, np.uint8)
        t0 = time.perf_counter()
        _native.low_entropy_scan_flat(flat, offs, w0, w1, w0, w1, flags,
                                      0.6, 3)
        cpp_rate = n / (time.perf_counter() - t0)
        print(json.dumps({
            "metric": "low_entropy_chip_vs_cpp",
            "cpp_single_core_reads_per_s": round(cpp_rate, 1),
            "chip_reads_per_s_see": "chip_low_entropy row",
            "note": "the chip wins this op per core; e2e it is hidden "
                    "behind ingest either way"}))
    except Exception as error:  # noqa: BLE001
        print(json.dumps({"metric": "low_entropy_chip_vs_cpp",
                          "error": str(error)[:120]}))


if __name__ == "__main__":
    if "--chip-truth" in sys.argv:
        chip_truth()
    elif "--realign-crossover" in sys.argv:
        realign_crossover()
    else:
        main()
