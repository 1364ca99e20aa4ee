"""Deterministic synthetic benchmark samples, shared by bench.py and the
measurement scripts.

Two tiers (BASELINE.md workloads; reference scale anchors:
documentation/02-Quickstart.md:33 — published numbers are for a ~3 Gb
assembly with a ~60 k-gene GTF and 150 bp reads; test/read1.fastq.gz reads
are 150 bp):

- tier 1 ("dense"): 2 x 5 Mb contigs, 400 two-exon genes, 50 bp reads —
  the round-1..3 continuity sample (small static inputs, ingest-dominated).
- tier 2 ("genome-scale"): 24 host contigs + 1 viral contig (~365 Mb),
  20,000 genes x 10 exons = 200,000 exons on both strands, 150 bp reads,
  0.4% base-error rate on chimeric reads, ~10 M alignment records with
  ~3.5% chimeric. This tier exercises GTF load, interval-index build, and
  annotation at realistic scale and is the tier README claims cite.

Both builders are deterministic (fixed seeds) and cache to /tmp keyed by a
version marker.
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np

TIER1_DIR = pathlib.Path("/tmp/arriba_tpu_bench_sample_v3")
TIER2_DIR = pathlib.Path("/tmp/arriba_tpu_bench_genome_scale_v3")

# ---------------------------------------------------------------------------
# tier 2: genome-scale, 150 bp
# ---------------------------------------------------------------------------

T2_HOST_CONTIGS = [str(i) for i in range(1, 23)] + ["X", "Y"]
T2_VIRAL_CONTIG = "AC_1"
T2_GENES_PER_CONTIG = 834          # 24 x 834 = 20,016 genes
T2_EXONS_PER_GENE = 10             # 200,160 exons
T2_GENE_SPACING = 18_000
T2_EXON_PITCH = 1_500              # exon i starts at gene_start + i*pitch
T2_EXON_LEN = 300
T2_CONTIG_MARGIN = 100_000
T2_CONTIG_LEN = T2_CONTIG_MARGIN * 2 + T2_GENES_PER_CONTIG * T2_GENE_SPACING
T2_VIRAL_LEN = 200_000
T2_READ_LEN = 150
T2_N_PROPER_PAIRS = 4_500_000
T2_N_JUNCTIONS = 400
T2_N_SPLIT_FRAGMENTS = 275_000     # 3 records each
T2_N_DISCORDANT = 60_000           # 2 records each
T2_N_VIRAL_FRAGMENTS = 120         # host<->virus chimeric fragments
T2_ERROR_RATE = 0.004              # base-error rate on chimeric reads

# tier 3 ("human-scale"): hg38 + GENCODE proportions — 3.1 Gb assembly,
# 62,016 genes x 12 exons = 744,192 exons, same read chemistry as tier 2.
# Spot-check tier (VERDICT r4 item 5): load times, peak RSS vs the
# reference's <10 GB envelope (documentation/10-Current-limitations.md:16),
# and byte-equal head-to-head, run once per bench.
TIER3_DIR = pathlib.Path("/tmp/arriba_tpu_bench_human_scale_v1")
T3_GENES_PER_CONTIG = 2_584        # 24 x 2584 = 62,016 genes
T3_EXONS_PER_GENE = 12             # 744,192 exons
T3_GENE_SPACING = 50_000           # 24 x ~129.3 Mb = ~3.10 Gb
T3_SEED = 20260821

_BASES = np.frombuffer(b"ACGT", np.uint8)


def _write_fasta(path: pathlib.Path, contigs: dict) -> None:
    with open(path, "wb") as fa:
        for name, seq in contigs.items():
            fa.write(b">" + name.encode() + b"\n")
            n = len(seq)
            full = n // 80 * 80
            body = seq[:full].reshape(-1, 80)
            wrapped = np.concatenate(
                [body, np.full((body.shape[0], 1), ord("\n"), np.uint8)],
                axis=1)
            fa.write(wrapped.tobytes())
            if full < n:
                fa.write(seq[full:].tobytes() + b"\n")


def _tier2_gene_start(gene_in_contig: int) -> int:
    return T2_CONTIG_MARGIN + gene_in_contig * T2_GENE_SPACING


def build_tier2(out_dir: pathlib.Path = TIER2_DIR, quiet: bool = False) -> pathlib.Path:
    """Build (or reuse) the genome-scale 150 bp sample. Returns out_dir."""
    return _build_genome_tier(
        out_dir, "v3", 20260820, T2_GENES_PER_CONTIG, T2_EXONS_PER_GENE,
        T2_GENE_SPACING,
        "~365 Mb genome + ~10 M-record SAM", quiet)


def build_tier3(out_dir: pathlib.Path = TIER3_DIR, quiet: bool = False) -> pathlib.Path:
    """Build (or reuse) the human-scale (hg38+GENCODE proportion) sample:
    3.1 Gb assembly, 62,016 genes, 744,192 exons."""
    return _build_genome_tier(
        out_dir, "v1", T3_SEED, T3_GENES_PER_CONTIG, T3_EXONS_PER_GENE,
        T3_GENE_SPACING,
        "~3.1 Gb genome + ~10 M-record SAM (human scale)", quiet)


def _build_genome_tier(out_dir: pathlib.Path, version: str, seed: int,
                       genes_per_contig: int, exons_per_gene: int,
                       gene_spacing: int, label: str,
                       quiet: bool = False) -> pathlib.Path:
    marker = out_dir / ".complete"
    if marker.exists() and marker.read_text().strip() == version:
        return out_dir
    if not quiet:
        print(f"building benchmark sample (one-time, cached; {label}) ...",
              file=sys.stderr)
    out_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    contig_len = T2_CONTIG_MARGIN * 2 + genes_per_contig * gene_spacing

    def _gene_start(gene_in_contig: int) -> int:
        return T2_CONTIG_MARGIN + gene_in_contig * gene_spacing

    genome = {name: _BASES[rng.integers(0, 4, contig_len)]
              for name in T2_HOST_CONTIGS}
    genome[T2_VIRAL_CONTIG] = _BASES[rng.integers(0, 4, T2_VIRAL_LEN)]
    _write_fasta(out_dir / "genome.fa", genome)

    # ---- GTF: 20k genes x 10 exons, alternating strands ----
    gtf = []
    gene_row = 0
    for contig in T2_HOST_CONTIGS:
        for g in range(genes_per_contig):
            start = _gene_start(g)
            strand = "+" if gene_row % 2 == 0 else "-"
            gid = f"G{gene_row}"
            attrs = (f'gene_id "{gid}"; gene_name "GENE{gene_row}"; '
                     f'transcript_id "T{gene_row}";')
            for e in range(exons_per_gene):
                es = start + e * T2_EXON_PITCH
                ee = es + T2_EXON_LEN - 1
                gtf.append(f"{contig}\tbench\texon\t{es + 1}\t{ee + 1}"
                           f"\t.\t{strand}\t.\t{attrs}")
                gtf.append(f"{contig}\tbench\tCDS\t{es + 1}\t{ee + 1}"
                           f"\t.\t{strand}\t0\t{attrs}")
            gene_row += 1
    (out_dir / "genes.gtf").write_text("\n".join(gtf) + "\n")
    del gtf
    (out_dir / "blacklist.tsv").write_text(
        "1:14000000\t1:14100000\n5:2000000\t5:2100000\n")

    def seq_bytes(contig: str, pos: int, length: int) -> np.ndarray:
        return genome[contig][pos:pos + length]

    def with_errors(arr: np.ndarray, err_rng: np.random.Generator) -> str:
        arr = arr.copy()
        n_err = err_rng.binomial(len(arr), T2_ERROR_RATE)
        if n_err:
            idx = err_rng.integers(0, len(arr), n_err)
            arr[idx] = _BASES[err_rng.integers(0, 4, n_err)]
        return arr.tobytes().decode()

    sam = open(out_dir / "aligned.sam", "w", buffering=1 << 22)
    sam.write("@HD\tVN:1.6\tSO:unsorted\n")
    for name in T2_HOST_CONTIGS:
        sam.write(f"@SQ\tSN:{name}\tLN:{contig_len}\n")
    sam.write(f"@SQ\tSN:{T2_VIRAL_CONTIG}\tLN:{T2_VIRAL_LEN}\n")

    # ---- proper pairs (background coverage), chunked + vectorized ----
    L = T2_READ_LEN
    gap = 180  # mate2 offset within the fragment
    chunk = 250_000
    n_contigs = len(T2_HOST_CONTIGS)
    written = 0
    while written < T2_N_PROPER_PAIRS:
        m = min(chunk, T2_N_PROPER_PAIRS - written)
        cidx = rng.integers(0, n_contigs, m)
        pos = rng.integers(1000, contig_len - 1000 - gap - L, m)
        offs = np.arange(L)
        parts = []
        for ci in range(n_contigs):
            sel = np.nonzero(cidx == ci)[0]
            if len(sel) == 0:
                continue
            p = pos[sel]
            s1 = genome[T2_HOST_CONTIGS[ci]][p[:, None] + offs]
            s2 = genome[T2_HOST_CONTIGS[ci]][(p + gap)[:, None] + offs]
            name = T2_HOST_CONTIGS[ci]
            for row, pp, a, b in zip(sel, p, s1, s2):
                i = written + int(row)
                pp = int(pp)
                parts.append(
                    f"n{i}\t99\t{name}\t{pp + 1}\t60\t{L}M\t=\t{pp + gap + 1}"
                    f"\t{gap + L}\t{a.tobytes().decode()}\t*\tHI:i:1\n"
                    f"n{i}\t147\t{name}\t{pp + gap + 1}\t60\t{L}M\t=\t{pp + 1}"
                    f"\t-{gap + L}\t{b.tobytes().decode()}\t*\tHI:i:1\n")
        sam.write("".join(parts))
        written += m

    # ---- chimeric junctions: gene pairs across random contigs ----
    # split fragments: mate1 150M upstream of bp1; split read 100M50S at
    # bp1-100 with 50 bp clipped from the partner breakpoint; supplementary
    # 100H50M at bp2. Junction breakpoints sit at exon boundaries (the end
    # of exon 4) so a realistic share of breakpoints is spliced.
    err_rng = np.random.default_rng(777)
    junctions = []
    for _ in range(T2_N_JUNCTIONS):
        c1, c2 = rng.integers(0, n_contigs, 2)
        g1, g2 = int(rng.integers(0, genes_per_contig)), int(
            rng.integers(0, genes_per_contig))
        if c1 == c2 and g1 == g2:
            g2 = (g1 + 7) % genes_per_contig
        bp1 = _gene_start(g1) + 4 * T2_EXON_PITCH + T2_EXON_LEN  # end of exon 5
        bp2 = _gene_start(g2) + 5 * T2_EXON_PITCH                # start of exon 6
        junctions.append((T2_HOST_CONTIGS[c1], bp1, T2_HOST_CONTIGS[c2], bp2))

    # anchors and mate offsets vary per read so fragments are NOT PCR
    # duplicates of each other (the duplicates filter keys on clip-adjusted
    # fragment end coordinates, filter_duplicates.cpp:8-55): anchor in
    # [40, 110), mate gap in [20, 150)
    splits_per_junction = T2_N_SPLIT_FRAGMENTS // T2_N_JUNCTIONS
    fid = 0
    parts = []
    geom_rng = np.random.default_rng(4242)
    for contig1, bp1, contig2, bp2 in junctions:
        anchors = geom_rng.integers(40, 110, splits_per_junction)
        gaps = geom_rng.integers(20, 150, splits_per_junction)
        for k in range(splits_per_junction):
            anchor = int(anchors[k])
            clip = L - anchor
            sr_pos = bp1 - anchor
            m1_pos = sr_pos - L - int(gaps[k])
            clipped = seq_bytes(contig2, bp2, clip)
            s_m1 = with_errors(seq_bytes(contig1, m1_pos, L), err_rng)
            s_sr = with_errors(
                np.concatenate([seq_bytes(contig1, sr_pos, anchor), clipped]),
                err_rng)
            s_sup = s_sr[anchor:]
            parts.append(
                f"f{fid}\t99\t{contig1}\t{m1_pos + 1}\t60\t{L}M\t=\t"
                f"{sr_pos + 1}\t{sr_pos - m1_pos + L}\t{s_m1}\t*\tHI:i:1\n"
                f"f{fid}\t147\t{contig1}\t{sr_pos + 1}\t60\t{anchor}M{clip}S"
                f"\t=\t{m1_pos + 1}\t-{sr_pos - m1_pos + L}\t{s_sr}\t*\t"
                f"HI:i:1\tSA:Z:{contig2},{bp2 + 1},-,{anchor}S{clip}M,60,0;\n"
                f"f{fid}\t2195\t{contig2}\t{bp2 + 1}\t60\t{anchor}H{clip}M\t"
                f"{contig1}\t{m1_pos + 1}\t0\t{s_sup}\t*\tHI:i:1\n")
            fid += 1
            if len(parts) >= 30_000:
                sam.write("".join(parts))
                parts = []
    for d in range(T2_N_DISCORDANT):
        contig1, bp1, contig2, bp2 = junctions[d % T2_N_JUNCTIONS]
        p1 = bp1 - 180 - (d // T2_N_JUNCTIONS) % 140 - 3 * (d % 47)
        s1 = with_errors(seq_bytes(contig1, p1, L), err_rng)
        s2 = with_errors(seq_bytes(contig2, bp2 + 30, L), err_rng)
        parts.append(
            f"d{d}\t97\t{contig1}\t{p1 + 1}\t60\t{L}M\t{contig2}\t{bp2 + 31}"
            f"\t0\t{s1}\t*\tHI:i:1\n"
            f"d{d}\t145\t{contig2}\t{bp2 + 31}\t60\t{L}M\t{contig1}\t{p1 + 1}"
            f"\t0\t{s2}\t*\tHI:i:1\n")
        if len(parts) >= 30_000:
            sam.write("".join(parts))
            parts = []

    # ---- host<->virus chimeric fragments (viral-filter coverage) ----
    vg = int(rng.integers(0, genes_per_contig))
    host_bp = _gene_start(vg) + 2 * T2_EXON_PITCH + T2_EXON_LEN
    for v in range(T2_N_VIRAL_FRAGMENTS):
        vpos = 50_000 + (v % 50) * 13
        p1 = host_bp - 280 - (v % 40)
        s1 = with_errors(seq_bytes("7", p1, L), err_rng)
        s2 = with_errors(seq_bytes(T2_VIRAL_CONTIG, vpos, L), err_rng)
        parts.append(
            f"v{v}\t97\t7\t{p1 + 1}\t60\t{L}M\t{T2_VIRAL_CONTIG}\t{vpos + 1}"
            f"\t0\t{s1}\t*\tHI:i:1\n"
            f"v{v}\t145\t{T2_VIRAL_CONTIG}\t{vpos + 1}\t60\t{L}M\t7\t{p1 + 1}"
            f"\t0\t{s2}\t*\tHI:i:1\n")
    sam.write("".join(parts))
    sam.close()
    marker.write_text(version + "\n")
    return out_dir


def tier2_cli_args(out_dir: pathlib.Path = TIER2_DIR) -> list:
    """CLI arguments for the tier-2 sample (default interesting/viral
    contig wildcards, like a production run)."""
    return ["-x", str(out_dir / "aligned.sam"),
            "-g", str(out_dir / "genes.gtf"),
            "-a", str(out_dir / "genome.fa"),
            "-b", str(out_dir / "blacklist.tsv"),
            "-s", "no"]


if __name__ == "__main__":
    build_tier2()
    print(TIER2_DIR)
