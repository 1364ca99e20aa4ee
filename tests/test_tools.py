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
