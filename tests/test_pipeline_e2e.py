"""End-to-end pipeline test: synthetic genome + GTF + chimeric SAM through the
full cascade to fusions.tsv (reference flow arriba.cpp:79-612)."""

import numpy as np
import pytest

from arriba_tpu.config import Options
from arriba_tpu.constants import STRANDEDNESS_NO
from arriba_tpu.io.bam import BamRecord, SamHeader, cigar_from_string, write_sam
from arriba_tpu.pipeline import run

from .util import gtf_line, random_genome, write_fasta


@pytest.fixture
def sample(tmp_path):
    """A translocation between GENE1 (contig 1) and GENE2 (contig 2) with
    4 split reads and 2 discordant pairs, plus background coverage."""
    genome = random_genome({"1": 20000, "2": 20000}, seed=7)

    # make both CDS regions translatable: start codon + random stop-free codons
    import random
    rng = random.Random(11)
    stop_free = [a + b + c for a in "ACGT" for b in "ACGT" for c in "ACGT"
                 if a + b + c not in ("TAA", "TAG", "TGA", "ATG")]
    for contig, cds_start in (("1", 1000), ("2", 5000)):
        codons = "ATG" + "".join(rng.choice(stop_free) for _ in range(333))
        genome[contig][cds_start:cds_start + 999] = np.frombuffer(
            codons[:999].encode(), np.uint8)

    gtf = "\n".join([
        gtf_line("1", "exon", 1000, 1999, "+", "G1", "GENE1", "T1"),
        gtf_line("1", "CDS", 1000, 1999, "+", "G1", "GENE1", "T1"),
        gtf_line("2", "exon", 5000, 5999, "+", "G2", "GENE2", "T2"),
        gtf_line("2", "CDS", 5000, 5999, "+", "G2", "GENE2", "T2"),
    ]) + "\n"

    fasta_path = tmp_path / "genome.fa"
    write_fasta(fasta_path, genome)
    gtf_path = tmp_path / "genes.gtf"
    gtf_path.write_text(gtf)
    blacklist_path = tmp_path / "blacklist.tsv"
    blacklist_path.write_text("1:19000\t1:19500\n")

    def seq(contig, pos, length):
        return genome[contig][pos:pos + length].tobytes().decode()

    records = []
    # 4 split-read fragments: MATE1 forward + split read with a 40 bp clip
    # that maps to contig 2 (breakpoints 1:1234 -> 2:5001 one-based; the 5'
    # moiety 1000..1233 spans 234 bases = 78 codons, so the junction sits on
    # a codon boundary and meets gene2's CDS start => in-frame)
    for i, mate1_pos in enumerate([1104, 1114, 1124, 1134]):
        name = f"split{i}"
        records.append(BamRecord(
            qname=name, flag=99, tid=0, pos=mate1_pos, mapq=60,
            cigar=cigar_from_string("50M"), mtid=0, mpos=1204, tlen=150,
            seq=seq("1", mate1_pos, 50), tags={"HI": 1}))
        records.append(BamRecord(
            qname=name, flag=147, tid=0, pos=1204, mapq=60,
            cigar=cigar_from_string("30M40S"), mtid=0, mpos=mate1_pos, tlen=-150,
            seq=seq("1", 1204, 30) + seq("2", 5000, 40),
            tags={"HI": 1, "SA": "2,5001,-,30S40M,60,0;"}))
        records.append(BamRecord(
            qname=name, flag=2195, tid=1, pos=5000, mapq=60,
            cigar=cigar_from_string("30H40M"), mtid=0, mpos=mate1_pos, tlen=0,
            seq=seq("2", 5000, 40), tags={"HI": 1}))
    # 2 discordant pairs
    for i, (pos1, pos2) in enumerate([(1100, 5050), (1150, 5030)]):
        name = f"disc{i}"
        records.append(BamRecord(
            qname=name, flag=97, tid=0, pos=pos1, mapq=60,
            cigar=cigar_from_string("50M"), mtid=1, mpos=pos2, tlen=0,
            seq=seq("1", pos1, 50), tags={"HI": 1}))
        records.append(BamRecord(
            qname=name, flag=145, tid=1, pos=pos2, mapq=60,
            cigar=cigar_from_string("50M"), mtid=0, mpos=pos1, tlen=0,
            seq=seq("2", pos2, 50), tags={"HI": 1}))
    # background coverage: proper pairs near both breakpoints
    for i, (tid, pos) in enumerate([(0, 1150), (0, 1180), (1, 5020), (1, 5060)]):
        name = f"norm{i}"
        contig = "1" if tid == 0 else "2"
        records.append(BamRecord(
            qname=name, flag=99, tid=tid, pos=pos, mapq=60,
            cigar=cigar_from_string("50M"), mtid=tid, mpos=pos + 100, tlen=150,
            seq=seq(contig, pos, 50), tags={"HI": 1}))
        records.append(BamRecord(
            qname=name, flag=147, tid=tid, pos=pos + 100, mapq=60,
            cigar=cigar_from_string("50M"), mtid=tid, mpos=pos, tlen=-150,
            seq=seq(contig, pos + 100, 50), tags={"HI": 1}))

    sam_path = tmp_path / "aligned.sam"
    write_sam(str(sam_path), SamHeader(target_names=["1", "2"],
                                       target_lengths=[20000, 20000]), records)

    options = Options(
        rna_bam_file=str(sam_path),
        assembly_file=str(fasta_path),
        gene_annotation_file=str(gtf_path),
        blacklist_file=str(blacklist_path),
        output_file=str(tmp_path / "fusions.tsv"),
        discarded_output_file=str(tmp_path / "fusions.discarded.tsv"),
        interesting_contigs="1 2",
        strandedness=STRANDEDNESS_NO,
    )
    return options, tmp_path


def test_full_pipeline(sample, capsys):
    options, tmp_path = sample
    state = run(options)

    output = (tmp_path / "fusions.tsv").read_text().rstrip("\n").split("\n")
    assert output[0].startswith("#gene1\tgene2\t")
    assert len(output) == 2, f"expected exactly one fusion, got: {output[1:]}"

    columns = output[1].split("\t")
    assert len(columns) == 30
    (gene1, gene2, strand1, strand2, breakpoint1, breakpoint2, site1, site2,
     fusion_type, split_reads1, split_reads2, discordant_mates, coverage1,
     coverage2, confidence, reading_frame) = columns[:16]
    assert gene1 == "GENE1" and gene2 == "GENE2"
    assert strand1 == "+/+" and strand2 == "+/+"
    assert breakpoint1 == "1:1234" and breakpoint2 == "2:5001"
    # breakpoint2 coincides with the (single-exon coding) exon start => spliced
    assert site1 == "CDS" and site2 == "CDS/splice-site"
    assert fusion_type == "translocation"
    assert split_reads1 == "4" and split_reads2 == "0" and discordant_mates == "2"
    assert confidence in ("medium", "high")
    assert reading_frame == "in-frame"
    # direction columns
    assert columns[24] == "downstream" and columns[25] == "upstream"
    # transcript sequence contains the junction
    assert "|" in columns[27]
    # peptide was translated
    assert columns[28] != "."
    # read identifiers
    assert set(columns[29].split(",")) == {"split0", "split1", "split2", "split3",
                                           "disc0", "disc1"}

    # discarded output exists and has the header
    discarded = (tmp_path / "fusions.discarded.tsv").read_text().split("\n")
    assert discarded[0].startswith("#gene1")


def test_device_offload_equivalence(sample, tmp_path):
    """ARRIBA_TPU_DEVICE=1 (jax offload of the batched read filters) produces
    the same fusions.tsv as the host path."""
    import os
    import subprocess
    import sys

    options, sample_dir = sample
    args = ["-x", options.rna_bam_file, "-g", options.gene_annotation_file,
            "-a", options.assembly_file, "-b", options.blacklist_file,
            "-i", "1,2", "-s", "no"]
    outputs = {}
    for label, env_extra in (("host", {}), ("device", {"ARRIBA_TPU_DEVICE": "1"})):
        out_path = str(tmp_path / f"fusions_{label}.tsv")
        env = dict(os.environ, JAX_PLATFORMS=os.environ.get(
            "ARRIBA_TPU_TEST_PLATFORM", "cpu"), **env_extra)
        result = subprocess.run(
            [sys.executable, "-m", "arriba_tpu"] + args + ["-o", out_path],
            env=env, capture_output=True, text=True, timeout=420)
        assert result.returncode == 0, result.stderr[-2000:]
        outputs[label] = open(out_path, "rb").read()
    assert outputs["host"] == outputs["device"]



def test_hybrid_device_low_entropy_decides(sample, tmp_path):
    """ARRIBA_TPU_DEVICE=1 keeps the native cascade and routes stage-13 low
    entropy through the accelerator export path; with a working jax backend
    the device call must SUCCEED (no fallback warning) and output must stay
    byte-identical to the host run."""
    import os
    import subprocess
    import sys

    options, sample_dir = sample
    args = ["-x", options.rna_bam_file, "-g", options.gene_annotation_file,
            "-a", options.assembly_file, "-b", options.blacklist_file,
            "-i", "1,2", "-s", "no"]
    host_out = str(tmp_path / "fusions_host.tsv")
    env = dict(os.environ, JAX_PLATFORMS=os.environ.get(
        "ARRIBA_TPU_TEST_PLATFORM", "cpu"))
    env.pop("PALLAS_AXON_POOL_IPS", None)
    result = subprocess.run(
        [sys.executable, "-m", "arriba_tpu"] + args + ["-o", host_out],
        env=env, capture_output=True, text=True, timeout=420)
    assert result.returncode == 0, result.stderr[-2000:]
    dev_out = str(tmp_path / "fusions_dev.tsv")
    result = subprocess.run(
        [sys.executable, "-m", "arriba_tpu"] + args + ["-o", dev_out],
        env=dict(env, ARRIBA_TPU_DEVICE="1"), capture_output=True,
        text=True, timeout=420)
    assert result.returncode == 0, result.stderr[-2000:]
    assert "device offload failed" not in result.stderr, result.stderr
    assert open(dev_out, "rb").read() == open(host_out, "rb").read()

def test_device_blacklist_triage_scenario(tmp_path):
    """ARRIBA_TPU_DEVICE=1 routes the blacklist filter through the device
    range triage (ops/blacklist.query_intervals); a blacklist mixing
    matching ranges, gene names, keyword pairs and far-away decoys must
    produce identical fusions.tsv and stage counters to the host path."""
    import os
    import re
    import subprocess
    import sys

    from .scenario import multi_event_sample

    args = multi_event_sample(tmp_path)
    # overwrite the default no-op blacklist with a matching + decoy mix:
    # a range pair matching the ALPHA->GAMMA translocation breakpoints, a
    # gene/keyword pair, and decoys in empty bins (device-triaged away)
    (tmp_path / "blacklist.tsv").write_text(
        "1:900-3100\t2:4800-8100\n"             # covers ALPHA and GAMMA
        "DELTA\tany\n"                           # gene name + keyword
        "1:35000-36000\t2:35000-36000\n"        # decoy: empty bins
        "3:25000\t3:26000\n")                    # decoy: positions
    results = {}
    for label, env_extra in (("host", {}), ("device", {"ARRIBA_TPU_DEVICE": "1"})):
        out = str(tmp_path / f"bl_{label}.tsv")
        env = dict(os.environ, JAX_PLATFORMS=os.environ.get(
            "ARRIBA_TPU_TEST_PLATFORM", "cpu"), **env_extra)
        result = subprocess.run(
            [sys.executable, "-m", "arriba_tpu"] + args + ["-o", out],
            env=env, capture_output=True, text=True, timeout=420)
        assert result.returncode == 0, result.stderr[-2000:]
        counters = re.findall(r"\((?:remaining|total|marked)=\d+\)", result.stdout)
        results[label] = (open(out, "rb").read(), counters)
    assert results["host"] == results["device"]
    # the blacklist must actually have removed the translocation: only the
    # header line remains
    assert b"ALPHA" not in results["host"][0]


def test_device_annotation_triage_pure_python(tmp_path):
    """The pure-Python + device configuration (ARRIBA_TPU_NO_NATIVE=1 with
    ARRIBA_TPU_DEVICE=1, i.e. a Python-only install with an accelerator)
    routes the fallback gene annotation through the device emptiness triage
    (ops/annotation.interval_overlap_triage) AND the writer's per-base
    pileup accumulation through the batched device histogram
    (ops/pileup.pileup_histogram via writer.build_device_pileups); output
    and counters must be identical to the pure host path on a scenario
    with intergenic breakpoints (dummy genes = the empty-query case) and
    printed fusion transcripts (the pileup consensus path)."""
    import os
    import re
    import subprocess
    import sys

    from .scenario import multi_event_sample

    args = multi_event_sample(tmp_path)
    results = {}
    for label, env_extra in (
            ("host", {"ARRIBA_TPU_NO_NATIVE": "1"}),
            ("device", {"ARRIBA_TPU_NO_NATIVE": "1", "ARRIBA_TPU_DEVICE": "1"})):
        out = str(tmp_path / f"ann_{label}.tsv")
        env = dict(os.environ, JAX_PLATFORMS=os.environ.get(
            "ARRIBA_TPU_TEST_PLATFORM", "cpu"), **env_extra)
        result = subprocess.run(
            [sys.executable, "-m", "arriba_tpu"] + args + ["-o", out],
            env=env, capture_output=True, text=True, timeout=420)
        assert result.returncode == 0, result.stderr[-2000:]
        counters = re.findall(r"\((?:remaining|total|marked)=\d+\)", result.stdout)
        results[label] = (open(out, "rb").read(), counters)
    assert results["host"] == results["device"]


def test_device_screen_mismapper_scenario(tmp_path):
    """ARRIBA_TPU_DEVICE=1 routes filter_mismappers through the device seed
    screen (ops/realign.screen_pairs); fusions.tsv and every stage counter
    stay identical on a mismapper/homolog-heavy sample."""
    import os
    import re
    import subprocess
    import sys

    from .scenario import spliced_homolog_sample

    args = spliced_homolog_sample(tmp_path)
    results = {}
    for label, env_extra in (("host", {}), ("device", {"ARRIBA_TPU_DEVICE": "1"})):
        out = str(tmp_path / f"mm_{label}.tsv")
        env = dict(os.environ, JAX_PLATFORMS=os.environ.get(
            "ARRIBA_TPU_TEST_PLATFORM", "cpu"), **env_extra)
        result = subprocess.run(
            [sys.executable, "-m", "arriba_tpu"] + args + ["-o", out],
            env=env, capture_output=True, text=True, timeout=420)
        assert result.returncode == 0, result.stderr[-2000:]
        counters = re.findall(r"\((?:remaining|total|marked)=\d+\)", result.stdout)
        results[label] = (open(out, "rb").read(), counters)
    assert results["host"] == results["device"]


def test_device_backend_failure_falls_back_to_host(tmp_path):
    """A requested-but-unavailable accelerator backend must not crash the
    pipeline: every device call site (low-entropy, blacklist triage,
    annotation triage, realign screen, writer pileup) falls back to the
    host path with a single warning, and the output stays byte-identical
    to the plain host run."""
    import os
    import subprocess
    import sys

    from .scenario import multi_event_sample

    args = multi_event_sample(tmp_path)
    outputs = {}
    for label, env_extra in (
            ("host", {"JAX_PLATFORMS": "cpu"}),
            # 'axon' is never registered in this env (the PALLAS_AXON
            # pool var is dropped), so every device dispatch raises
            ("poisoned", {"JAX_PLATFORMS": "axon",
                          "ARRIBA_TPU_DEVICE": "1"})):
        out = tmp_path / f"fb_{label}.tsv"
        env = dict(os.environ, **env_extra)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        result = subprocess.run(
            [sys.executable, "-m", "arriba_tpu"] + args + ["-o", str(out)],
            env=env, capture_output=True, text=True, timeout=420)
        assert result.returncode == 0, result.stdout + result.stderr
        outputs[label] = out.read_bytes()
        if label == "poisoned":
            assert "device offload failed" in result.stdout + result.stderr
    assert outputs["poisoned"] == outputs["host"]
