"""Utility-tool tests: VCF conversion, exon numbers, virus quantification,
supporting-read extraction — driven off a real pipeline run."""

import subprocess
import sys

import pytest

from .oracle_util import REPO, run_ours
from .scenario import translocation_sample, viral_sample


@pytest.fixture(scope="module")
def pipeline_output(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("tools")
    args = translocation_sample(tmp)
    result = run_ours(args + ["-o", str(tmp / "fusions.tsv")], tmp)
    assert result.returncode == 0, result.stderr
    return tmp


def run_tool(module, args):
    import os
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run([sys.executable, "-m", module] + [str(a) for a in args],
                          capture_output=True, text=True, env=env)


def test_convert_fusions_to_vcf(pipeline_output):
    tmp = pipeline_output
    result = run_tool("arriba_tpu.tools.convert_fusions_to_vcf",
                      [tmp / "genome.fa", tmp / "fusions.tsv", tmp / "fusions.vcf"])
    assert result.returncode == 0, result.stderr
    vcf = (tmp / "fusions.vcf").read_text().splitlines()
    assert vcf[0] == "##fileformat=VCFv4.3"
    records = [line for line in vcf if not line.startswith("#")]
    assert len(records) == 2  # one BND pair
    chrom1, pos1, id1, ref1, alt1, qual1, filter1, info1 = records[0].split("\t")
    assert (chrom1, pos1, id1) == ("1", "1234", "1a")
    assert "SVTYPE=BND" in info1 and "MATEID=1b" in info1
    assert "GENE_NAME=GENE1" in info1
    # direction1 downstream + direction2 upstream => t[mate[ notation
    assert alt1 == f"{ref1}[2:5001["


def test_annotate_exon_numbers(pipeline_output):
    tmp = pipeline_output
    result = run_tool("arriba_tpu.tools.annotate_exon_numbers",
                      [tmp / "fusions.tsv", tmp / "genes.gtf", tmp / "annotated.tsv"])
    assert result.returncode == 0, result.stderr
    lines = (tmp / "annotated.tsv").read_text().splitlines()
    assert lines[0].endswith("\texon_number1\texon_number2")
    # our synthetic GTF has no exon_number attributes => '.'
    assert lines[1].endswith("\t.\t.")


def test_extract_fusion_supporting_alignments(pipeline_output):
    tmp = pipeline_output
    result = run_tool("arriba_tpu.tools.extract_fusion_supporting_alignments",
                      [tmp / "fusions.tsv", tmp / "aligned.sam", tmp / "support"])
    assert result.returncode == 0, result.stderr
    sam = (tmp / "support_1.sam").read_text().splitlines()
    read_lines = [line for line in sam if not line.startswith("@")]
    names = {line.split("\t")[0] for line in read_lines}
    assert names == {"split0", "split1", "split2", "split3", "disc0", "disc1"}


def test_quantify_virus_expression(tmp_path):
    args = viral_sample(tmp_path)
    sam_path = args[args.index("-x") + 1]
    result = run_tool("arriba_tpu.tools.quantify_virus_expression",
                      [sam_path, tmp_path / "virus.tsv"])
    assert result.returncode == 0, result.stderr
    lines = (tmp_path / "virus.tsv").read_text().splitlines()
    assert lines[0].startswith("VIRUS\t")
    assert len(lines) == 2
    virus, size, covered, fraction, reads, rpkm = lines[1].split("\t")
    assert virus == "AC_012345.1"
    assert int(reads) >= 20  # 12 proper pairs (24 reads) are pristine


def test_draw_fusions(pipeline_output):
    tmp = pipeline_output
    result = run_tool("arriba_tpu.tools.draw_fusions",
                      [f"--fusions={tmp}/fusions.tsv",
                       f"--annotation={tmp}/genes.gtf",
                       f"--output={tmp}/fusions.pdf",
                       f"--alignments={tmp}/aligned.sam"])
    assert result.returncode == 0, result.stderr
    pdf = (tmp / "fusions.pdf").read_bytes()
    assert pdf.startswith(b"%PDF") and len(pdf) > 2000


def test_cohort_runner(tmp_path):
    from .scenario import translocation_sample
    sample_dir1 = tmp_path / "s1"
    sample_dir2 = tmp_path / "s2"
    sample_dir1.mkdir(), sample_dir2.mkdir()
    args1 = translocation_sample(sample_dir1, seed=7)
    args2 = translocation_sample(sample_dir2, seed=8)

    def common_of(args):
        # everything except -x (per-sample)
        out, skip = [], False
        it = iter(range(len(args)))
        i = 0
        while i < len(args):
            if args[i] == "-x":
                i += 2
                continue
            out.append(args[i]); i += 1
        return out

    manifest = tmp_path / "cohort.tsv"
    manifest.write_text(
        f"s1\t{sample_dir1}/aligned.sam\t{tmp_path}/out1\n"
        f"s2\t{sample_dir2}/aligned.sam\t{tmp_path}/out2\t-U\t100\n")
    # use sample 1's common flags for both (genomes differ by seed, so give
    # each sample its own -g/-a via extra args instead)
    manifest.write_text(
        f"s1\t{sample_dir1}/aligned.sam\t{tmp_path}/out1\t" +
        "\t".join(common_of(args1)) + "\n"
        f"s2\t{sample_dir2}/aligned.sam\t{tmp_path}/out2\t" +
        "\t".join(common_of(args2)) + "\n")

    import os
    import arriba_tpu
    os.environ["PYTHONPATH"] = str(REPO) + os.pathsep + os.environ.get("PYTHONPATH", "")
    from arriba_tpu.parallel.cohort import run_cohort
    results = run_cohort(str(manifest), [], processes=2)
    assert set(results) == {"s1", "s2"}
    assert all(rc == 0 for rc, _ in results.values())
    for out_dir in ("out1", "out2"):
        fusions = (tmp_path / out_dir / "fusions.tsv").read_text().splitlines()
        assert len(fusions) == 2  # header + one call


def test_draw_fusions_circos(pipeline_output, tmp_path):
    tmp = pipeline_output
    cytobands = tmp_path / "cytobands.tsv"
    cytobands.write_text(
        "contig\tstart\tend\tname\tgiemsa\n"
        "1\t0\t8000\tp11\tgneg\n1\t8000\t20000\tq11\tgpos50\n"
        "2\t0\t20000\tq\tgneg\n")
    result = run_tool("arriba_tpu.tools.draw_fusions",
                      [f"--fusions={tmp}/fusions.tsv",
                       f"--annotation={tmp}/genes.gtf",
                       f"--output={tmp_path}/circos.pdf",
                       f"--cytobands={cytobands}",
                       "--minConfidenceForCircosPlot=low"])
    assert result.returncode == 0, result.stderr
    assert (tmp_path / "circos.pdf").read_bytes().startswith(b"%PDF")


# ---------------------------------------------------------------------------
# draw_fusions content-level regression tests (draw_fusions.R:7-33 option
# surface; the renderer returns a per-page report of what was drawn)


@pytest.fixture(scope="module")
def draw_inputs(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("draw")
    gtf = []
    # GENE1 on contig 1: two transcripts; T1A is appris_principal_1 and has
    # the splice site at 2999 (breakpoint1 3000 in 1-based TSV => end 3000)
    for transcript, extra, spans in (
            ("T1A", ' tag "appris_principal_1";',
             [(1001, 1600), (2401, 3000), (4001, 4600)]),
            ("T1B", "", [(1001, 1600), (4001, 4600)])):
        for start, end in spans:
            for feature in ("exon", "CDS"):
                gtf.append(
                    f"1\ttest\t{feature}\t{start}\t{end}\t.\t+\t0\t"
                    f'gene_id "G1"; gene_name "GENE1"; '
                    f'transcript_id "{transcript}";{extra} '
                    f'exon_number "{spans.index((start, end)) + 1}";')
    # GENE2 on contig 2
    for start, end in [(5001, 5600), (6401, 7000)]:
        for feature in ("exon", "CDS"):
            gtf.append(
                f"2\ttest\t{feature}\t{start}\t{end}\t.\t+\t0\t"
                f'gene_id "G2"; gene_name "GENE2"; transcript_id "T2"; '
                f'exon_number "{1 + (start > 5001)}";')
    (tmp / "genes.gtf").write_text("\n".join(gtf) + "\n")

    (tmp / "fusions.tsv").write_text(
        "#gene1\tgene2\tstrand1(gene/fusion)\tstrand2(gene/fusion)\t"
        "breakpoint1\tbreakpoint2\tsite1\tsite2\ttype\tsplit_reads1\t"
        "split_reads2\tdiscordant_mates\tconfidence\treading_frame\t"
        "gene_id1\tgene_id2\ttranscript_id1\ttranscript_id2\t"
        "fusion_transcript\n"
        "GENE1\tGENE2\t+/+\t+/+\t1:3000\t2:5001\tsplice-site\tsplice-site\t"
        "translocation\t4\t2\t3\thigh\tin-frame\tG1\tG2\tT1A\tT2\t"
        "ACGTACGT|TTGCAA\n"
        "GENE2\tGENE1\t+/+\t+/+\t2:6400\t1:4001\tsplice-site\tsplice-site\t"
        "translocation\t1\t0\t1\tlow\tout-of-frame\tG2\tG1\tT2\tT1A\t.\n")

    (tmp / "domains.gff3").write_text(
        "1\tdb\tdomain\t1100\t1500\t.\t+\t.\t"
        'gene_name "GENE1"; Name "Kinase%20domain"; '
        'protein_domain_id "PF001"; color "#ff8888";\n'
        "2\tdb\tdomain\t6500\t6900\t.\t+\t.\t"
        'gene_name "GENE2"; Name "DNA-binding"; '
        'protein_domain_id "PF002"; color "#8888ff";\n')

    (tmp / "cytobands.tsv").write_text(
        "contig\tstart\tend\tname\tgiemsa\n"
        "1\t0\t4000\tp11\tgneg\n1\t4000\t10000\tq11\tgpos50\n"
        "2\t0\t10000\tq11\tgneg\n")

    sam = ["@HD\tVN:1.6", "@SQ\tSN:1\tLN:10000", "@SQ\tSN:2\tLN:10000"]
    for i in range(20):
        sam.append(f"r{i}\t0\t1\t{1001 + i * 20}\t60\t50M\t*\t0\t0\t"
                   + "A" * 50 + "\t*")
    for i in range(10):
        sam.append(f"s{i}\t0\t2\t{5001 + i * 30}\t60\t50M\t*\t0\t0\t"
                   + "A" * 50 + "\t*")
    (tmp / "aligned.sam").write_text("\n".join(sam) + "\n")
    return tmp


def _pdf_page_count(path) -> int:
    import re as _re
    return len(_re.findall(rb"/Type\s*/Page[^s]", path.read_bytes()))


def test_draw_fusions_full_report(draw_inputs, tmp_path):
    from arriba_tpu.tools.draw_fusions import draw_fusions
    out = tmp_path / "full.pdf"
    report = draw_fusions(
        str(draw_inputs / "fusions.tsv"), str(draw_inputs / "genes.gtf"),
        str(out), alignments_file=str(draw_inputs / "aligned.sam"),
        cytobands_file=str(draw_inputs / "cytobands.tsv"),
        protein_domains_file=str(draw_inputs / "domains.gff3"),
        sample_name="SAMPLE", min_confidence_for_circos_plot="low")
    assert len(report) == 2
    assert _pdf_page_count(out) == 2
    page1 = report[0]
    assert {"fusion", "coverage", "circos", "domains",
            "readcounts"} <= set(page1["panels"])
    assert page1["breakpoint_labels"] == ["breakpoint1 1:3000",
                                          "breakpoint2 2:5001"]
    assert page1["transcripts"] == ["T1A", "T2"]
    assert page1["scale_label"].split()[-1] in ("bp", "kbp")
    # the kinase domain is upstream of breakpoint1 => retained in gene1
    assert page1["domain_report"]["domains1"] == ["Kinase domain"]
    assert page1["domain_report"]["message"] == ""


def test_draw_fusions_plot_panels(draw_inputs, tmp_path):
    from arriba_tpu.tools.draw_fusions import draw_fusions
    out = tmp_path / "fusion_only.pdf"
    report = draw_fusions(
        str(draw_inputs / "fusions.tsv"), str(draw_inputs / "genes.gtf"),
        str(out), cytobands_file=str(draw_inputs / "cytobands.tsv"),
        protein_domains_file=str(draw_inputs / "domains.gff3"),
        plot_panels=["fusion"])
    assert all(page["panels"] == ["fusion"] for page in report)
    assert _pdf_page_count(out) == 2


def test_draw_fusions_transcript_selection(draw_inputs, tmp_path):
    from arriba_tpu.tools.draw_fusions import draw_fusions
    # canonical: appris_principal_1 beats the other transcript of GENE1
    report = draw_fusions(
        str(draw_inputs / "fusions.tsv"), str(draw_inputs / "genes.gtf"),
        str(tmp_path / "canonical.pdf"), transcript_selection="canonical",
        plot_panels=["fusion"])
    assert report[0]["transcripts"][0] == "T1A"
    # coverage mode without alignments: splice-site transcripts win;
    # breakpoint1 3000 is T1A's exon end => T1A
    report = draw_fusions(
        str(draw_inputs / "fusions.tsv"), str(draw_inputs / "genes.gtf"),
        str(tmp_path / "coverage.pdf"), transcript_selection="coverage",
        plot_panels=["fusion"])
    assert report[0]["transcripts"][0] == "T1A"


def test_draw_fusions_unsquished_and_geometry(draw_inputs, tmp_path):
    from arriba_tpu.tools.draw_fusions import draw_fusions
    out = tmp_path / "unsquished.pdf"
    report = draw_fusions(
        str(draw_inputs / "fusions.tsv"), str(draw_inputs / "genes.gtf"),
        str(out), squish_introns_option=False, pdf_width=8.0, pdf_height=6.0,
        font_size=1.3, fixed_scale=20000, plot_panels=["fusion"])
    assert _pdf_page_count(out) == 2
    assert report[0]["scale_label"]  # scale bar still drawn to-scale


def test_draw_fusions_option_validation():
    from arriba_tpu.tools.draw_fusions import OptionError, parse_options
    base = ["--fusions=f.tsv", "--annotation=a.gtf", "--output=o.pdf"]
    parsed = parse_options(base + ["--showIntergenicVicinity=closestGene",
                                   "--squishIntrons=FALSE"])
    assert parsed["showIntergenicVicinity"] == ["exon"] * 4
    parsed = parse_options(base + ["--coverageRange=100,250"])
    assert parsed["coverageRange"] == [100.0, 250.0]
    for bad in (["--squishIntrons=TRUE", "--showIntergenicVicinity=1000"],
                ["--minConfidenceForCircosPlot=maybe"],
                ["--plotPanels=fusion,bogus"],
                ["--transcriptSelection=best"],
                ["--coverageRange=-1"],
                ["--fixedScale=-5"],
                ["--squishIntrons=YES"]):
        with pytest.raises(OptionError):
            parse_options(base + bad)
    with pytest.raises(OptionError):
        parse_options(["--annotation=a.gtf", "--output=o.pdf"])


def test_draw_fusions_star_fusion_format(tmp_path, draw_inputs):
    from arriba_tpu.tools.draw_fusions import draw_fusions, read_fusions
    star = tmp_path / "star.tsv"
    star.write_text(
        "#FusionName\tJunctionReadCount\tSpanningFragCount\tLeftGene\t"
        "LeftBreakpoint\tRightGene\tRightBreakpoint\n"
        "GENE1--GENE2\t7\t3\tGENE1^G1\t1:3000:+\tGENE2^G2\t2:5001:+\n")
    fusions = read_fusions(str(star))
    assert fusions[0].gene1 == "GENE1" and fusions[0].gene_id2 == "G2"
    assert fusions[0].type == "translocation"
    assert fusions[0].split_reads == 7
    report = draw_fusions(str(star), str(draw_inputs / "genes.gtf"),
                          str(tmp_path / "star.pdf"),
                          plot_panels=["fusion", "readcounts"])
    assert len(report) == 1 and "readcounts" in report[0]["panels"]


def test_draw_fusions_intergenic_vicinity(draw_inputs, tmp_path):
    from arriba_tpu.tools.draw_fusions import draw_fusions
    fusions = tmp_path / "intergenic.tsv"
    fusions.write_text(
        "#gene1\tgene2\tstrand1(gene/fusion)\tstrand2(gene/fusion)\t"
        "breakpoint1\tbreakpoint2\tsite1\tsite2\ttype\tsplit_reads1\t"
        "split_reads2\tdiscordant_mates\tconfidence\treading_frame\t"
        "gene_id1\tgene_id2\ttranscript_id1\ttranscript_id2\t"
        "fusion_transcript\n"
        "1:3500\tGENE2\t./.\t+/+\t1:3500\t2:5001\tintergenic\tsplice-site\t"
        "translocation\t2\t1\t1\tmedium\t.\t.\tG2\t.\tT2\t.\n")
    report = draw_fusions(
        str(fusions), str(draw_inputs / "genes.gtf"),
        str(tmp_path / "intergenic.pdf"), squish_introns_option=False,
        show_intergenic_vicinity=[2000.0] * 4, plot_panels=["fusion"])
    assert len(report) == 1
    assert report[0]["breakpoint_labels"][0] == "breakpoint1 1:3500"
