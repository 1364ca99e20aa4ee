"""Synthetic-sample builders shared by the e2e and oracle-parity tests.

Fragments follow the STAR conventions the ingest expects: split reads are
(MATE1, clipped mate with SA tag, supplementary hard-clipped record);
discordant mates are paired records without the proper-pair flag.
"""

import random
from pathlib import Path
from typing import Dict, List

import numpy as np

from arriba_tpu.io.bam import BamRecord, SamHeader, cigar_from_string, write_sam

from .util import gtf_line, random_genome, write_fasta

STOP_CODONS = ("TAA", "TAG", "TGA")


def stop_free_cds(rng: random.Random, length: int) -> str:
    codons = [c for c in (a + b + c for a in "ACGT" for b in "ACGT" for c in "ACGT")
              if c not in STOP_CODONS + ("ATG",)]
    return ("ATG" + "".join(rng.choice(codons)
                            for _ in range(length // 3 + 1)))[:length]


class SampleBuilder:
    """Accumulates SAM records over a synthetic genome + GTF."""

    def __init__(self, tmp_path, contig_lengths: Dict[str, int], seed: int = 7):
        self.tmp_path = tmp_path
        self.rng = random.Random(seed)
        self.genome = random_genome(contig_lengths, seed=seed)
        self.contig_names = list(contig_lengths)
        self.gtf_lines: List[str] = []
        self.records: List[BamRecord] = []
        self.header = SamHeader(target_names=self.contig_names,
                                target_lengths=list(contig_lengths.values()))

    def tid(self, contig: str) -> int:
        return self.contig_names.index(contig)

    def seq(self, contig: str, pos: int, length: int) -> str:
        return self.genome[contig][pos:pos + length].tobytes().decode()

    def add_gene(self, contig: str, start: int, end: int, strand: str,
                 gene_id: str, name: str, transcript: str,
                 coding: bool = True, exons: List = None) -> None:
        exon_list = exons or [(start, end)]
        for exon_start, exon_end in exon_list:
            self.gtf_lines.append(gtf_line(contig, "exon", exon_start, exon_end,
                                           strand, gene_id, name, transcript))
            if coding:
                self.gtf_lines.append(gtf_line(contig, "CDS", exon_start, exon_end,
                                               strand, gene_id, name, transcript))
        if coding and strand == "+":
            # make the SPLICED CDS translatable from its 5' start: the
            # reading frame runs across exon junctions, so the stop-free
            # patch must be written piecewise into the exons (a contiguous
            # genomic patch leaves random — stop-containing — bases in
            # later exons and trips the early-stop-codon GTF warning)
            spliced_len = sum(e - s + 1 for s, e in exon_list)
            patch = stop_free_cds(self.rng, spliced_len)
            offset = 0
            for exon_start, exon_end in exon_list:
                if offset >= len(patch):
                    break
                piece = patch[offset:offset + (exon_end - exon_start + 1)]
                self.genome[contig][exon_start:exon_start + len(piece)] = \
                    np.frombuffer(piece.encode(), np.uint8)
                offset += len(piece)

    def add_split_fragment(self, name: str, contig1: str, mate1_pos: int,
                           split_pos: int, matched: int, clip: int,
                           contig2: str, supp_pos: int, hi: int = 1,
                           duplicate: bool = False) -> None:
        """MATE1 forward + split read (clip at the 3' end mapping to contig2)
        + hard-clipped supplementary. Breakpoints: contig1:split_pos+matched-1
        (downstream) -> contig2:supp_pos (upstream)."""
        tid1, tid2 = self.tid(contig1), self.tid(contig2)
        mate1_len = 50
        flag_extra = 1024 if duplicate else 0
        self.records.append(BamRecord(
            qname=name, flag=99 | flag_extra, tid=tid1, pos=mate1_pos, mapq=60,
            cigar=cigar_from_string(f"{mate1_len}M"), mtid=tid1, mpos=split_pos,
            tlen=150, seq=self.seq(contig1, mate1_pos, mate1_len), tags={"HI": hi}))
        self.records.append(BamRecord(
            qname=name, flag=147 | flag_extra, tid=tid1, pos=split_pos, mapq=60,
            cigar=cigar_from_string(f"{matched}M{clip}S"), mtid=tid1,
            mpos=mate1_pos, tlen=-150,
            seq=self.seq(contig1, split_pos, matched) + self.seq(contig2, supp_pos, clip),
            tags={"HI": hi, "SA": f"{contig2},{supp_pos + 1},-,{matched}S{clip}M,60,0;"}))
        self.records.append(BamRecord(
            qname=name, flag=2195 | flag_extra, tid=tid2, pos=supp_pos, mapq=60,
            cigar=cigar_from_string(f"{matched}H{clip}M"), mtid=tid1,
            mpos=mate1_pos, tlen=0, seq=self.seq(contig2, supp_pos, clip),
            tags={"HI": hi}))

    def add_discordant_fragment(self, name: str, contig1: str, pos1: int,
                                contig2: str, pos2: int, hi: int = 1,
                                length: int = 50, strand1: str = "+",
                                strand2: str = "-") -> None:
        """Discordant pair; breakpoint direction per mate follows its
        strand (fusions.cpp:302-316): forward mate -> breakpoint at its
        end (downstream), reverse mate -> at its start (upstream)."""
        tid1, tid2 = self.tid(contig1), self.tid(contig2)
        flag1 = 1 | 64 | (16 if strand1 == "-" else 0) \
            | (32 if strand2 == "-" else 0)
        flag2 = 1 | 128 | (16 if strand2 == "-" else 0) \
            | (32 if strand1 == "-" else 0)
        self.records.append(BamRecord(
            qname=name, flag=flag1, tid=tid1, pos=pos1, mapq=60,
            cigar=cigar_from_string(f"{length}M"), mtid=tid2, mpos=pos2, tlen=0,
            seq=self.seq(contig1, pos1, length), tags={"HI": hi}))
        self.records.append(BamRecord(
            qname=name, flag=flag2, tid=tid2, pos=pos2, mapq=60,
            cigar=cigar_from_string(f"{length}M"), mtid=tid1, mpos=pos1, tlen=0,
            seq=self.seq(contig2, pos2, length), tags={"HI": hi}))

    def add_proper_pair(self, name: str, contig: str, pos: int,
                        gap: int = 100, length: int = 50) -> None:
        tid = self.tid(contig)
        self.records.append(BamRecord(
            qname=name, flag=99, tid=tid, pos=pos, mapq=60,
            cigar=cigar_from_string(f"{length}M"), mtid=tid, mpos=pos + gap,
            tlen=gap + length, seq=self.seq(contig, pos, length), tags={"HI": 1}))
        self.records.append(BamRecord(
            qname=name, flag=147, tid=tid, pos=pos + gap, mapq=60,
            cigar=cigar_from_string(f"{length}M"), mtid=tid, mpos=pos,
            tlen=-(gap + length), seq=self.seq(contig, pos + gap, length),
            tags={"HI": 1}))

    def write(self):
        """Write genome.fa, genes.gtf, blacklist.tsv, aligned.sam; returns
        the common CLI arguments (without -o/-O)."""
        fasta = self.tmp_path / "genome.fa"
        write_fasta(fasta, self.genome)
        gtf = self.tmp_path / "genes.gtf"
        gtf.write_text("\n".join(self.gtf_lines) + "\n")
        blacklist = self.tmp_path / "blacklist.tsv"
        blacklist.write_text("1:19000\t1:19500\n")
        sam = self.tmp_path / "aligned.sam"
        write_sam(str(sam), self.header, self.records)
        return ["-x", str(sam), "-g", str(gtf), "-a", str(fasta),
                "-b", str(blacklist), "-i", " ".join(self.contig_names), "-s", "no"]


def translocation_sample(tmp_path, seed=7) -> List[str]:
    """4 split reads + 2 discordant pairs supporting GENE1->GENE2."""
    b = SampleBuilder(tmp_path, {"1": 20000, "2": 20000}, seed)
    b.add_gene("1", 1000, 1999, "+", "G1", "GENE1", "T1")
    b.add_gene("2", 5000, 5999, "+", "G2", "GENE2", "T2")
    for i, mate1_pos in enumerate([1104, 1114, 1124, 1134]):
        b.add_split_fragment(f"split{i}", "1", mate1_pos, 1204, 30, 40, "2", 5000)
    for i, (p1, p2) in enumerate([(1100, 5050), (1150, 5030)]):
        b.add_discordant_fragment(f"disc{i}", "1", p1, "2", p2)
    for i, (contig, pos) in enumerate([("1", 1150), ("1", 1180), ("2", 5020), ("2", 5060)]):
        b.add_proper_pair(f"norm{i}", contig, pos)
    return b.write()


def multi_event_sample(tmp_path, seed=13) -> List[str]:
    """Several event types at once: a translocation, duplicates,
    multimappers, an intergenic breakpoint (dummy genes), and background."""
    b = SampleBuilder(tmp_path, {"1": 40000, "2": 40000, "3": 30000}, seed)
    b.add_gene("1", 1000, 2999, "+", "G1", "ALPHA", "T1",
               exons=[(1000, 1499), (2000, 2999)])
    b.add_gene("1", 20000, 22999, "-", "G2", "BETA", "T2")
    b.add_gene("2", 5000, 7999, "+", "G3", "GAMMA", "T3",
               exons=[(5000, 5999), (7000, 7999)])
    b.add_gene("3", 10000, 11999, "+", "G4", "DELTA", "T4", coding=False)

    # translocation ALPHA -> GAMMA with varying support
    for i, mate1_pos in enumerate([1104, 1118, 1132]):
        b.add_split_fragment(f"t{i}", "1", mate1_pos, 1204, 30, 40, "2", 5000)
    b.add_discordant_fragment("td0", "1", 1100, "2", 5040)
    # PCR duplicates of the same split fragment
    b.add_split_fragment("dup0", "1", 1104, 1204, 30, 40, "2", 5000)
    # multimapper: same read name, two hit indices at different loci
    b.add_split_fragment("mm0", "1", 1110, 1204, 30, 40, "2", 5000, hi=1)
    b.add_split_fragment("mm0", "1", 20100, 20200, 30, 40, "3", 10100, hi=2)
    # intergenic breakpoint (no gene at 2:15000) => dummy gene
    b.add_split_fragment("ig0", "1", 1110, 1204, 30, 40, "2", 15000)
    b.add_split_fragment("ig1", "1", 1124, 1204, 30, 40, "2", 15000)
    # BETA -> DELTA (non-coding 3' partner)
    for i, mate1_pos in enumerate([20100, 20115]):
        b.add_split_fragment(f"bd{i}", "1", mate1_pos, 20200, 30, 40, "3", 10100)
    # background coverage near all breakpoints
    positions = [("1", 1150), ("1", 1180), ("2", 5020), ("2", 5060),
                 ("1", 20150), ("3", 10050), ("2", 14950), ("1", 1210),
                 ("2", 5002), ("1", 20202), ("3", 10102)]
    for i, (contig, pos) in enumerate(positions):
        b.add_proper_pair(f"n{i}", contig, pos)
    return b.write()


def fuzz_sample(tmp_path, seed: int) -> List[str]:
    """Randomized mixture of fragment types across random gene layouts."""
    rng = random.Random(seed)
    b = SampleBuilder(tmp_path, {"1": 60000, "2": 60000}, seed)
    # random gene layout: 3 genes per contig, alternating strands
    gene_positions = {}
    gene_row = 0
    for contig in ("1", "2"):
        pos = 2000
        for g in range(3):
            length = rng.choice([1000, 2000, 3000])
            strand = rng.choice("+-")
            gene_id = f"G{gene_row}"
            b.add_gene(contig, pos, pos + length - 1, strand, gene_id,
                       f"GENE{gene_row}", f"T{gene_row}",
                       coding=rng.random() < 0.8)
            gene_positions[gene_id] = (contig, pos, pos + length - 1)
            gene_row += 1
            pos += length + rng.choice([5000, 12000])

    gene_ids = list(gene_positions)

    def random_breakpoint():
        if rng.random() < 0.15:  # intergenic
            contig = rng.choice(("1", "2"))
            return contig, rng.randrange(40000, 55000)
        gene = rng.choice(gene_ids)
        contig, start, end = gene_positions[gene]
        return contig, rng.randrange(start + 100, end - 100)

    n_fragments = rng.randrange(10, 30)
    for i in range(n_fragments):
        kind = rng.random()
        contig1, bp1 = random_breakpoint()
        contig2, bp2 = random_breakpoint()
        if abs(bp1 - bp2) < 500 and contig1 == contig2:
            continue
        if kind < 0.6:
            matched = rng.choice([25, 30, 35])
            clip = rng.choice([30, 40])
            split_pos = bp1 - matched + 1
            if split_pos < 60 or bp2 + clip + 10 > 60000:
                continue
            mate1_pos = max(0, split_pos - rng.randrange(40, 120))
            n_copies = 1 + (rng.random() < 0.4) + (rng.random() < 0.3) * 2
            for copy in range(n_copies):
                b.add_split_fragment(
                    f"f{i}c{copy}", contig1, mate1_pos + copy * 7, split_pos,
                    matched, clip, contig2, bp2)
        else:
            if bp1 + 60 > 60000 or bp2 + 60 > 60000:
                continue
            b.add_discordant_fragment(f"f{i}", contig1, bp1, contig2, bp2)
        # background coverage near the breakpoints
        if rng.random() < 0.7 and bp1 + 300 < 60000:
            b.add_proper_pair(f"f{i}bg", contig1, bp1 + rng.randrange(0, 120))

    return b.write()


def itd_sample(tmp_path, seed=21) -> List[str]:
    """Internal tandem duplication: 12 duplication-orientation split reads
    inside one coding exon (recover_internal_tandem_duplication path)."""
    b = SampleBuilder(tmp_path, {"1": 20000}, seed)
    b.add_gene("1", 1000, 2999, "+", "G1", "FLT3LIKE", "T1")
    # supp before split on the same contig => canonicalized to
    # direction1=UPSTREAM @ supp_pos, direction2=DOWNSTREAM @ split end
    for i in range(12):
        b.add_split_fragment(f"itd{i}", "1", 1500 + i * 3, 1700, 30, 40, "1", 1660)
    for i, pos in enumerate([1600, 1640, 1680, 1720]):
        b.add_proper_pair(f"bg{i}", "1", pos)
    return b.write()


def aux_files_sample(tmp_path, seed=31) -> List[str]:
    """Translocation plus every optional input: known fusions (-k),
    tags (-t), protein domains (-p), WGS breakpoints (-d), and the
    -X/-I extra flags."""
    args = translocation_sample(tmp_path, seed)
    known = tmp_path / "known_fusions.tsv"
    known.write_text("GENE1\tGENE2\nNOSUCH\tGENE2\n")
    tags = tmp_path / "tags.tsv"
    tags.write_text("GENE1\tGENE2\toncogenic_fusion\nGENE2\tGENE1\treciprocal\n")
    domains = tmp_path / "domains.gff3"
    domains.write_text("\n".join([
        "1\ttest\tprotein_domain\t1001\t1400\t.\t+\t.\t"
        "gene_name=GENE1;gene_id=G1;Name=Kinase%20domain",
        "1\ttest\tprotein_domain\t1500\t1900\t.\t+\t.\t"
        "gene_name=GENE1;gene_id=G1;Name=SH2",
        "2\ttest\tprotein_domain\t5100\t5900\t.\t+\t.\t"
        "gene_name=GENE2;gene_id=G2;Name=DNA-binding",
    ]) + "\n")
    wgs = tmp_path / "wgs.tsv"
    wgs.write_text("1:1230\t2:4995\tdownstream\tupstream\n")
    return args + ["-k", str(known), "-t", str(tags), "-p", str(domains),
                   "-d", str(wgs), "-X", "-I"]


def viral_sample(tmp_path, seed=41) -> List[str]:
    """Viral integration: pristine reads on a viral contig plus
    human->virus split reads (viral contig filters + integration site)."""
    b = SampleBuilder(tmp_path, {"1": 30000, "AC_012345.1": 8000}, seed)
    b.add_gene("1", 1000, 2999, "+", "G1", "HOST", "T1")
    virus = "AC_012345.1"
    # integration: split reads from HOST into the virus
    for i, mate1_pos in enumerate([1104, 1118, 1132, 1146]):
        b.add_split_fragment(f"v{i}", "1", mate1_pos, 1204, 30, 40, virus, 3000)
    # pristine viral reads spread over the virus (expression + coverage)
    for i in range(12):
        b.add_proper_pair(f"vp{i}", virus, 200 + i * 600, gap=80)
    for i, pos in enumerate([1150, 1180, 1210]):
        b.add_proper_pair(f"hb{i}", "1", pos)
    args = b.write()
    # widen interesting contigs to include the viral contig (the default -i
    # matches AC_* but our SampleBuilder overrides -i)
    idx = args.index("-i")
    args[idx + 1] = "1 AC_*"
    return args + ["-v", "AC_*"]


def _add_split_fragment_start_clip(b: SampleBuilder, name: str, contig1: str,
                                   mate1_pos: int, split_pos: int, matched: int,
                                   clip: int, contig2: str, supp_pos: int,
                                   hi: int = 1) -> None:
    """Forward split read clipped at the START (clip maps to contig2 before
    the junction): directions UPSTREAM @ split_pos / DOWNSTREAM @ supp end."""
    tid1, tid2 = b.tid(contig1), b.tid(contig2)
    read_seq = b.seq(contig2, supp_pos, clip) + b.seq(contig1, split_pos, matched)
    b.records.append(BamRecord(
        qname=name, flag=83, tid=tid1, pos=mate1_pos, mapq=60,
        cigar=cigar_from_string("50M"), mtid=tid1, mpos=split_pos, tlen=-150,
        seq=b.seq(contig1, mate1_pos, 50), tags={"HI": hi}))
    b.records.append(BamRecord(
        qname=name, flag=163, tid=tid1, pos=split_pos, mapq=60,
        cigar=cigar_from_string(f"{clip}S{matched}M"), mtid=tid1, mpos=mate1_pos,
        tlen=150, seq=read_seq,
        tags={"HI": hi, "SA": f"{contig2},{supp_pos + 1},+,{clip}M{matched}S,60,0;"}))
    b.records.append(BamRecord(
        qname=name, flag=2179, tid=tid2, pos=supp_pos, mapq=60,
        cigar=cigar_from_string(f"{clip}M{matched}H"), mtid=tid1, mpos=mate1_pos,
        tlen=0, seq=b.seq(contig2, supp_pos, clip), tags={"HI": hi}))


SampleBuilder.add_split_fragment_start_clip = (
    lambda self, *args, **kwargs: _add_split_fragment_start_clip(self, *args, **kwargs))


def fuzz_sample2(tmp_path, seed: int) -> List[str]:
    """Fuzz with both split orientations, ITD-like events, and duplicates."""
    rng = random.Random(seed * 977)
    b = SampleBuilder(tmp_path, {"1": 60000, "2": 60000}, seed * 977)
    gene_positions = {}
    gene_row = 0
    for contig in ("1", "2"):
        pos = 2000
        for g in range(3):
            length = rng.choice([1500, 2500])
            gene_id = f"G{gene_row}"
            b.add_gene(contig, pos, pos + length - 1, rng.choice("+-"), gene_id,
                       f"GENE{gene_row}", f"T{gene_row}", coding=rng.random() < 0.8)
            gene_positions[gene_id] = (contig, pos, pos + length - 1)
            gene_row += 1
            pos += length + rng.choice([6000, 14000])
    gene_ids = list(gene_positions)

    def in_gene_pos(margin=200):
        gene = rng.choice(gene_ids)
        contig, start, end = gene_positions[gene]
        return contig, rng.randrange(start + margin, end - margin)

    for i in range(rng.randrange(8, 24)):
        c1, p1 = in_gene_pos()
        c2, p2 = in_gene_pos()
        kind = rng.random()
        matched = rng.choice([25, 30])
        clip = rng.choice([30, 40])
        if kind < 0.35:
            split_pos = p1 - matched + 1
            mate1_pos = max(0, split_pos - rng.randrange(40, 110))
            for copy in range(1 + (rng.random() < 0.5) * rng.randrange(1, 3)):
                b.add_split_fragment(f"a{i}c{copy}", c1, mate1_pos + copy * 5,
                                     split_pos, matched, clip, c2, p2)
        elif kind < 0.6:
            mate1_pos = p1 + rng.randrange(60, 140)
            if mate1_pos + 60 < 60000 and p2 + clip < 60000:
                for copy in range(1 + (rng.random() < 0.5) * rng.randrange(1, 3)):
                    b.add_split_fragment_start_clip(
                        f"b{i}c{copy}", c1, mate1_pos + copy * 5, p1, matched,
                        clip, c2, p2)
        elif kind < 0.8:
            # ITD-like: supp shortly before the split on the same contig
            split_pos = p1
            supp_pos = max(0, p1 - rng.randrange(10, 60))
            n_copies = rng.randrange(2, 13)
            for copy in range(n_copies):
                b.add_split_fragment(f"d{i}c{copy}", c1, split_pos - 100 + copy * 3,
                                     split_pos, matched, clip, c1, supp_pos)
        else:
            b.add_discordant_fragment(f"e{i}", c1, p1, c2, p2)
        if rng.random() < 0.8:
            b.add_proper_pair(f"g{i}", c1, p1 + rng.randrange(0, 100))
    return b.write()


def _write_extra_sam(b: SampleBuilder, path, records) -> str:
    write_sam(str(path), b.header, records)
    return str(path)


def separate_chimeric_sample(tmp_path, seed=51) -> List[str]:
    """Old-STAR mode: chimeric alignments in a separate Chimeric.out.sam
    passed via -c; the main BAM contributes discordant mates + coverage."""
    b = SampleBuilder(tmp_path, {"1": 20000, "2": 20000}, seed)
    b.add_gene("1", 1000, 1999, "+", "G1", "GENE1", "T1")
    b.add_gene("2", 5000, 5999, "+", "G2", "GENE2", "T2")
    # split fragments go into the separate file
    main_records = []
    for i, mate1_pos in enumerate([1104, 1114, 1124, 1134]):
        b.add_split_fragment(f"split{i}", "1", mate1_pos, 1204, 30, 40, "2", 5000)
    chimeric_records = b.records
    b.records = main_records
    for i, (p1, p2) in enumerate([(1100, 5050), (1150, 5030)]):
        b.add_discordant_fragment(f"disc{i}", "1", p1, "2", p2)
    for i, (contig, pos) in enumerate([("1", 1150), ("1", 1180), ("2", 5020), ("2", 5060)]):
        b.add_proper_pair(f"norm{i}", contig, pos)
    chimeric_path = _write_extra_sam(b, tmp_path / "chimeric.sam", chimeric_records)
    args = b.write()
    return args + ["-c", chimeric_path]


def single_end_sample(tmp_path, seed=61) -> List[str]:
    """Single-end reads: SA-tagged split reads without the paired flag."""
    b = SampleBuilder(tmp_path, {"1": 20000, "2": 20000}, seed)
    b.add_gene("1", 1000, 1999, "+", "G1", "GENE1", "T1")
    b.add_gene("2", 5000, 5999, "+", "G2", "GENE2", "T2")
    for i in range(4):
        name = f"se{i}"
        split_pos = 1204
        b.records.append(BamRecord(
            qname=name, flag=16, tid=0, pos=split_pos, mapq=60,
            cigar=cigar_from_string("30M40S"), mtid=-1, mpos=-1, tlen=0,
            seq=b.seq("1", split_pos, 30) + b.seq("2", 5000, 40),
            tags={"HI": 1, "SA": f"2,5001,-,30S40M,60,0;"}))
        b.records.append(BamRecord(
            qname=name, flag=2064, tid=1, pos=5000, mapq=60,
            cigar=cigar_from_string("30H40M"), mtid=-1, mpos=-1, tlen=0,
            seq=b.seq("2", 5000, 40), tags={"HI": 1}))
    # single-end background coverage
    for i, pos in enumerate([1150, 1180, 1210, 5020, 5060]):
        tid = 0 if pos < 3000 else 1
        contig = "1" if tid == 0 else "2"
        b.records.append(BamRecord(
            qname=f"bg{i}", flag=0, tid=tid, pos=pos, mapq=60,
            cigar=cigar_from_string("50M"), mtid=-1, mpos=-1, tlen=0,
            seq=b.seq(contig, pos, 50), tags={"HI": 1}))
    return b.write()


def stranded_sample(tmp_path, seed=71, strandedness="yes") -> List[str]:
    args = translocation_sample(tmp_path, seed)
    idx = args.index("-s")
    args[idx + 1] = strandedness
    return args


def duplicates_marked_sample(tmp_path, seed=81) -> List[str]:
    """External duplicate marking (-u): duplicate split fragments flagged
    with BAM_FDUP."""
    b = SampleBuilder(tmp_path, {"1": 20000, "2": 20000}, seed)
    b.add_gene("1", 1000, 1999, "+", "G1", "GENE1", "T1")
    b.add_gene("2", 5000, 5999, "+", "G2", "GENE2", "T2")
    for i, mate1_pos in enumerate([1104, 1114, 1124]):
        b.add_split_fragment(f"s{i}", "1", mate1_pos, 1204, 30, 40, "2", 5000)
    b.add_split_fragment("sdup", "1", 1104, 1204, 30, 40, "2", 5000,
                         duplicate=True)
    for i, (contig, pos) in enumerate([("1", 1150), ("2", 5020)]):
        b.add_proper_pair(f"n{i}", contig, pos)
    return b.write() + ["-u"]


def subsampled_sample(tmp_path, seed=91) -> List[str]:
    """Low subsampling threshold (-U 3) with more supporting reads than
    the cap (exercises fusions.cpp:265-272 subsampling)."""
    b = SampleBuilder(tmp_path, {"1": 20000, "2": 20000}, seed)
    b.add_gene("1", 1000, 1999, "+", "G1", "GENE1", "T1")
    b.add_gene("2", 5000, 5999, "+", "G2", "GENE2", "T2")
    for i in range(8):
        b.add_split_fragment(f"s{i}", "1", 1100 + i * 4, 1204, 30, 40, "2", 5000)
    for i in range(4):
        b.add_discordant_fragment(f"d{i}", "1", 1100 + i * 9, "2", 5030 + i * 5)
    for i, (contig, pos) in enumerate([("1", 1150), ("2", 5020)]):
        b.add_proper_pair(f"n{i}", contig, pos)
    return b.write() + ["-U", "3"]


def spliced_homolog_sample(tmp_path, seed=101) -> List[str]:
    """Multi-exon genes with spliced breakpoints and intron-spanning mates
    (pileup intron marks), two isoforms of the same gene pair (isoform
    recovery), a homologous gene copy (homologs filter), and a mismapping
    clipped segment (realignment filter)."""
    import numpy as np
    b = SampleBuilder(tmp_path, {"1": 20000, "2": 20000}, seed)
    b.add_gene("1", 1000, 3499, "+", "GA", "ALPHA", "TA",
               exons=[(1000, 1499), (2000, 2499), (3000, 3499)])
    b.add_gene("2", 5000, 6499, "+", "GB", "BRAVO", "TB",
               exons=[(5000, 5499), (6000, 6499)])
    b.add_gene("2", 10000, 11999, "+", "GC", "CHARLIE", "TC")
    # CHARLIE is a copy of ALPHA's genomic span => ~100% identity
    b.genome["2"][10000:12000] = b.genome["1"][1000:3000]

    def spliced_split(name, split_pos, matched, supp_pos, mate1_parts):
        """split read whose MATE1 spans an intron of ALPHA."""
        seq_mate1 = "".join(b.seq("1", p, l) for p, l in mate1_parts)
        cigar1 = ""
        prev_end = None
        for p, l in mate1_parts:
            if prev_end is not None:
                cigar1 += f"{p - prev_end}N"
            cigar1 += f"{l}M"
            prev_end = p + l
        b.records.append(BamRecord(
            qname=name, flag=99, tid=0, pos=mate1_parts[0][0], mapq=60,
            cigar=cigar_from_string(cigar1), mtid=0, mpos=split_pos, tlen=150,
            seq=seq_mate1, tags={"HI": 1}))
        b.records.append(BamRecord(
            qname=name, flag=147, tid=0, pos=split_pos, mapq=60,
            cigar=cigar_from_string(f"{matched}M40S"), mtid=0,
            mpos=mate1_parts[0][0], tlen=-150,
            seq=b.seq("1", split_pos, matched) + b.seq("2", supp_pos, 40),
            tags={"HI": 1, "SA": f"2,{supp_pos + 1},-,{matched}S40M,60,0;"}))
        b.records.append(BamRecord(
            qname=name, flag=2195, tid=1, pos=supp_pos, mapq=60,
            cigar=cigar_from_string(f"{matched}H40M"), mtid=0,
            mpos=mate1_parts[0][0], tlen=0, seq=b.seq("2", supp_pos, 40),
            tags={"HI": 1}))

    # isoform 1: ALPHA exon2 end (1:2500) -> BRAVO exon2 start (2:6001), spliced
    for i, offset in enumerate([0, 3, 6]):
        spliced_split(f"iso1_{i}", 2470, 30, 6000,
                      [(1480 - offset, 20), (2000, 30 + offset)])
    # isoform 2: ALPHA exon1 end (1:1500) -> BRAVO exon2 start, spliced
    for i in range(3):
        spliced_split(f"iso2_{i}", 1470, 30, 6000, [(1400 + i * 5, 50)])
    # homolog fusion: ALPHA -> CHARLIE (CHARLIE == copy of ALPHA)
    for i, mate1_pos in enumerate([2100, 2110, 2120]):
        b.add_split_fragment(f"hom{i}", "1", mate1_pos, 2200, 30, 40, "2", 10500)
    # mismapper: clip of a supposed ALPHA->BRAVO read actually matches ALPHA
    mm_clip_source = b.seq("1", 1200, 40)
    b.genome["2"][8000:8040] = np.frombuffer(mm_clip_source.encode(), np.uint8)
    # (8000 is intergenic on contig 2 => dummy gene; keep it inside BRAVO
    # instead so the mismapper filter applies to a real gene pair)
    b.genome["2"][6100:6140] = np.frombuffer(mm_clip_source.encode(), np.uint8)
    for i, mate1_pos in enumerate([2100, 2112, 2124]):
        b.add_split_fragment(f"mm{i}", "1", mate1_pos, 2200, 30, 40, "2", 6100)

    for i, (contig, pos) in enumerate([("1", 2420), ("1", 1420), ("2", 6010),
                                       ("2", 10450), ("1", 2210), ("2", 6120)]):
        b.add_proper_pair(f"bg{i}", contig, pos)
    return b.write()


def overlapping_genes_sample(tmp_path, seed: int = 111) -> List[str]:
    """Overlapping and nested genes: multi-gene ambiguity in annotation,
    gene-set disambiguation via splice patterns, and fusions where a
    breakpoint lies in several genes at once."""
    rng = random.Random(seed)
    b = SampleBuilder(tmp_path, {"1": 40000, "2": 40000}, seed)
    # OVER1/OVER2 overlap by half; NEST inner gene fully inside HOST
    b.add_gene("1", 1000, 2999, "+", "GO1", "OVER1", "TO1",
               exons=[(1000, 1499), (2500, 2999)])
    b.add_gene("1", 2000, 3999, "-", "GO2", "OVER2", "TO2",
               exons=[(2000, 2499), (3500, 3999)])
    b.add_gene("1", 10000, 15999, "+", "GH", "HOST", "TH",
               exons=[(10000, 10499), (15500, 15999)])
    b.add_gene("1", 11000, 12999, "+", "GN", "NEST", "TN")
    b.add_gene("2", 5000, 6999, "+", "GT", "TARGET", "TT")

    # fusions out of the overlap region (both OVER1 and OVER2 annotate)
    for i, mate1_pos in enumerate([2504 + i * 4 for i in range(3)]):
        b.add_split_fragment(f"ov{i}", "1", mate1_pos, 2604, 30, 40, "2", 5000)
    # fusion out of the nested gene (HOST and NEST both annotate)
    for i, mate1_pos in enumerate([11104 + i * 6 for i in range(3)]):
        b.add_split_fragment(f"ns{i}", "1", mate1_pos, 11204, 30, 40, "2", 5200)
    # discordant support spread across the overlap
    b.add_discordant_fragment("ovd", "1", 2550, "2", 5050)
    b.add_discordant_fragment("nsd", "1", 11150, "2", 5250)
    for i, (contig, pos) in enumerate([("1", 2550), ("1", 11150),
                                       ("2", 5020), ("2", 5220)]):
        b.add_proper_pair(f"bg{i}", contig, pos)
    return b.write()


def artifact_zoo_sample(tmp_path, seed=131) -> List[str]:
    """One fragment per rarely-triggered read-level filter: homopolymer,
    small_insert_size, long_gap, inconsistently_clipped, mismatches,
    low_entropy, proximal read_through, same_gene, hairpin."""
    import numpy as np
    b = SampleBuilder(tmp_path, {"1": 1800000, "2": 50000}, seed)
    b.add_gene("1", 1000, 2999, "+", "GA", "ALPHA", "TA")
    b.add_gene("1", 6000, 7999, "+", "GB", "BETA", "TB")       # 3kb downstream
    b.add_gene("1", 1500000, 1509999, "+", "GW", "WHISKEY", "TW")
    b.add_gene("2", 5000, 6999, "+", "GT", "TARGET", "TT")

    # homopolymer: poly-A immediately after the clip boundary on TARGET
    b.genome["2"][5000:5006] = np.frombuffer(b"AAAAAA", np.uint8)
    b.add_split_fragment("homopoly", "1", 1104, 1204, 30, 40, "2", 5000)

    # good control event (keeps the sample from being empty)
    for i in range(3):
        b.add_split_fragment(f"good{i}", "1", 1304 + i * 6, 1404, 30, 40, "2", 5600)

    # small insert: opposite strands, near-identical coordinates
    b.records.append(BamRecord(
        qname="smallins", flag=97, tid=0, pos=1200, mapq=60,
        cigar=cigar_from_string("50M"), mtid=1, mpos=5200, tlen=0,
        seq=b.seq("1", 1200, 50), tags={"HI": 1}))
    b.records.append(BamRecord(
        qname="smallins", flag=145, tid=1, pos=5200, mapq=60,
        cigar=cigar_from_string("50M"), mtid=0, mpos=1200, tlen=0,
        seq=b.seq("2", 5200, 50), tags={"HI": 1}))
    # (different contigs => not small insert; make a same-contig overlapping one)
    b.records.append(BamRecord(
        qname="smallins2", flag=97, tid=0, pos=2100, mapq=60,
        cigar=cigar_from_string("50M"), mtid=0, mpos=2102, tlen=0,
        seq=b.seq("1", 2100, 50), tags={"HI": 1}))
    b.records.append(BamRecord(
        qname="smallins2", flag=145, tid=0, pos=2102, mapq=60,
        cigar=cigar_from_string("50M"), mtid=0, mpos=2100, tlen=0,
        seq=b.seq("1", 2102, 50), tags={"HI": 1}))

    # long gap: MATE1 with a >=700kb REF_SKIP flanked by short matches; the
    # split read sits downstream of the gap so inconsistently_clipped does
    # not trigger first
    b.records.append(BamRecord(
        qname="longgap", flag=99, tid=0, pos=1490, mapq=60,
        cigar=cigar_from_string("10M1500000N10M"), mtid=0, mpos=1501504, tlen=0,
        seq=b.seq("1", 1490, 10) + b.seq("1", 1501500, 10),
        tags={"HI": 1}))
    b.records.append(BamRecord(
        qname="longgap", flag=147, tid=0, pos=1501504, mapq=60,
        cigar=cigar_from_string("30M40S"), mtid=0, mpos=1490, tlen=0,
        seq=b.seq("1", 1501504, 30) + b.seq("2", 5300, 40),
        tags={"HI": 1, "SA": "2,5301,-,30S40M,60,0;"}))
    b.records.append(BamRecord(
        qname="longgap", flag=2195, tid=1, pos=5300, mapq=60,
        cigar=cigar_from_string("30H40M"), mtid=0, mpos=1490, tlen=0,
        seq=b.seq("2", 5300, 40), tags={"HI": 1}))

    # inconsistently clipped: MATE1 extends >3bp beyond the split clip point
    b.records.append(BamRecord(
        qname="inconsist", flag=99, tid=0, pos=1400, mapq=60,
        cigar=cigar_from_string("60M"), mtid=0, mpos=1404, tlen=0,
        seq=b.seq("1", 1400, 60), tags={"HI": 1}))
    b.records.append(BamRecord(
        qname="inconsist", flag=147, tid=0, pos=1404, mapq=60,
        cigar=cigar_from_string("30M40S"), mtid=0, mpos=1400, tlen=0,
        seq=b.seq("1", 1404, 30) + b.seq("2", 5700, 40),
        tags={"HI": 1, "SA": "2,5701,-,30S40M,60,0;"}))
    b.records.append(BamRecord(
        qname="inconsist", flag=2195, tid=1, pos=5700, mapq=60,
        cigar=cigar_from_string("30H40M"), mtid=0, mpos=1400, tlen=0,
        seq=b.seq("2", 5700, 40), tags={"HI": 1}))

    # mismatches: mate1 sequence mutated every 4th base
    bad_seq = list(b.seq("1", 1104, 50))
    for p in range(0, 50, 4):
        bad_seq[p] = "ACGT"[("ACGT".index(bad_seq[p]) + 1) % 4]
    b.records.append(BamRecord(
        qname="manymm", flag=99, tid=0, pos=1104, mapq=60,
        cigar=cigar_from_string("50M"), mtid=0, mpos=1204, tlen=0,
        seq="".join(bad_seq), tags={"HI": 1}))
    b.records.append(BamRecord(
        qname="manymm", flag=147, tid=0, pos=1204, mapq=60,
        cigar=cigar_from_string("30M40S"), mtid=0, mpos=1104, tlen=0,
        seq=b.seq("1", 1204, 30) + b.seq("2", 5800, 40),
        tags={"HI": 1, "SA": "2,5801,-,30S40M,60,0;"}))
    b.records.append(BamRecord(
        qname="manymm", flag=2195, tid=1, pos=5800, mapq=60,
        cigar=cigar_from_string("30H40M"), mtid=0, mpos=1104, tlen=0,
        seq=b.seq("2", 5800, 40), tags={"HI": 1}))

    # low entropy: ACG-repeat region in TARGET feeding the clip
    repeat = ("ACG" * 20)[:40]
    b.genome["2"][5900:5940] = np.frombuffer(repeat.encode(), np.uint8)
    b.add_split_fragment("lowent", "1", 1104, 1204, 30, 40, "2", 5900)

    # proximal read-through: ALPHA->BETA deletion-orientation discordant pair
    # with distance <= 10kb
    b.add_discordant_fragment("prox", "1", 2800, "1", 6100)

    # same gene: overlapping mates inside ALPHA in normal orientation
    # (non-overlapping intra-gene pairs die to read_through first)
    b.records.append(BamRecord(
        qname="samegene", flag=97, tid=0, pos=1300, mapq=60,
        cigar=cigar_from_string("50M"), mtid=0, mpos=1330, tlen=0,
        seq=b.seq("1", 1300, 50), tags={"HI": 1}))
    b.records.append(BamRecord(
        qname="samegene", flag=145, tid=0, pos=1330, mapq=60,
        cigar=cigar_from_string("50M"), mtid=0, mpos=1300, tlen=0,
        seq=b.seq("1", 1330, 50), tags={"HI": 1}))

    for i, (contig, pos) in enumerate([("1", 1150), ("1", 1350), ("1", 1420),
                                       ("2", 5020), ("2", 5620), ("2", 5720)]):
        b.add_proper_pair(f"bg{i}", contig, pos)
    return b.write()


def fuzz_aux_sample(tmp_path, seed: int) -> List[str]:
    """fuzz2 events plus randomized auxiliary inputs: WGS breakpoints (-d),
    known fusions (-k), tags (-t), and the -X/-I flags."""
    rng = random.Random(seed * 7919)
    args = fuzz_sample2(tmp_path, seed)
    # random WGS breakpoints: some near real gene positions, some noise
    wgs_lines = []
    for _ in range(rng.randrange(2, 8)):
        c1, c2 = rng.choice("12"), rng.choice("12")
        p1, p2 = rng.randrange(2000, 50000), rng.randrange(2000, 50000)
        d1, d2 = rng.choice(["upstream", "downstream"]), rng.choice(["+", "-"])
        wgs_lines.append(f"{c1}:{p1}\t{c2}:{p2}\t{d1}\t{d2}")
    wgs = tmp_path / "wgs.tsv"
    wgs.write_text("\n".join(wgs_lines) + "\n")
    known = tmp_path / "known.tsv"
    known_lines = []
    for _ in range(rng.randrange(1, 5)):
        known_lines.append(f"GENE{rng.randrange(0, 6)}\tGENE{rng.randrange(0, 6)}")
    known.write_text("\n".join(known_lines) + "\n")
    tags = tmp_path / "tags.tsv"
    tags.write_text("\n".join(f"{line}\ttag{i}" for i, line in enumerate(known_lines)) + "\n")
    extra = ["-d", str(wgs), "-k", str(known), "-t", str(tags)]
    if rng.random() < 0.5:
        extra.append("-X")
    if rng.random() < 0.5:
        extra.append("-I")
    return args + extra


def gene_id_fallback_sample(tmp_path, seed=141) -> List[str]:
    """GTF without gene_name attributes: the default -G spec falls back to
    gene_id (gene_name=gene_name|gene_id)."""
    b = SampleBuilder(tmp_path, {"1": 20000, "2": 20000}, seed)
    b.add_gene("1", 1000, 1999, "+", "G1", "GENE1", "T1")
    b.add_gene("2", 5000, 5999, "+", "G2", "GENE2", "T2")
    for i, mate1_pos in enumerate([1104, 1114, 1124]):
        b.add_split_fragment(f"s{i}", "1", mate1_pos, 1204, 30, 40, "2", 5000)
    for i, (contig, pos) in enumerate([("1", 1150), ("2", 5020)]):
        b.add_proper_pair(f"n{i}", contig, pos)
    args = b.write()
    # strip gene_name attributes from the GTF
    gtf_path = args[args.index("-g") + 1]
    import re as _re
    content = Path(gtf_path).read_text()
    content = _re.sub(r'gene_name "[^"]*"; ', "", content)
    Path(gtf_path).write_text(content)
    return args


def large_fuzz_sample(tmp_path, seed: int, n_events: int = 60,
                      n_background: int = 3000) -> List[str]:
    """A scaled-up randomized sample (hundreds of events incl. heavy
    subsampling pressure, thousands of background pairs) for stress-level
    oracle parity — exercises the sharded scan and the event cascade at a
    size the small fuzz families never reach."""
    import numpy as _np
    rng = _np.random.default_rng(seed)
    lengths = {"1": 900000, "2": 900000, "3": 600000}
    b = SampleBuilder(tmp_path, lengths, seed)
    gene_positions = {}
    row = 0
    for contig, length in (("1", 900000), ("2", 900000), ("3", 600000)):
        starts = []
        for g in range(40):
            start = 5000 + g * 20000
            if start + 6000 >= length:
                break
            strand = "+" if rng.integers(0, 2) else "-"
            b.add_gene(contig, start, start + 5999, strand, f"G{row}",
                       f"GENE{row}", f"T{row}",
                       exons=[(start, start + 1499),
                              (start + 4000, start + 5999)])
            starts.append(start)
            row += 1
        gene_positions[contig] = starts
    contigs = list(gene_positions)
    fid = 0
    for event in range(n_events):
        c1, c2 = rng.choice(contigs, 2, replace=True)
        g1 = int(rng.integers(0, len(gene_positions[c1])))
        g2 = int(rng.integers(0, len(gene_positions[c2])))
        bp1 = gene_positions[c1][g1] + 1200
        bp2 = gene_positions[c2][g2] + 4100
        if c1 == c2 and abs(bp1 - bp2) < 10000:
            continue
        support = int(rng.integers(2, 40))
        for k in range(support):
            b.add_split_fragment(f"f{fid}", c1, bp1 - 120 - (k % 37),
                                 bp1 - 30, 30, 40, c2, bp2)
            fid += 1
        for k in range(int(rng.integers(0, 6))):
            b.add_discordant_fragment(f"d{fid}", c1, bp1 - 100 - k * 7,
                                      c2, bp2 + 30 + k * 11)
            fid += 1
    for i in range(n_background):
        contig = contigs[int(rng.integers(0, len(contigs)))]
        pos = int(rng.integers(2000, lengths[contig] - 2000))
        b.add_proper_pair(f"n{i}", contig, pos)
    return b.write()


def contig_start_clip_sample(tmp_path, seed=81) -> List[str]:
    """A fusion whose acceptor gene sits at the very start of its contig and
    whose split reads carry LEADING soft clips larger than the breakpoint
    position: the writer's keep-clip pileup pass then produces NEGATIVE
    reference positions (output_fusions.cpp:263-330 clip arithmetic), whose
    reference-base lookup the oracle resolves as 'N' via its unsigned-cast
    bounds check (output_fusions.cpp:155)."""
    b = SampleBuilder(tmp_path, {"1": 20000, "2": 20000}, seed)
    # acceptor gene hugging the contig start: breakpoint at 1:10
    b.add_gene("1", 5, 1004, "+", "G1", "EDGE", "T1")
    b.add_gene("2", 5000, 5999, "+", "G2", "FAR", "T2")
    # forward split reads with 40 bp leading clips at position 10 (< clip)
    for i, mate1_pos in enumerate([200, 214, 228]):
        b.add_split_fragment_start_clip(f"edge{i}", "1", mate1_pos, 10, 30,
                                        40, "2", 5400)
    # background coverage near both breakpoints
    for i, (contig, pos) in enumerate([("1", 60), ("1", 120), ("2", 5410),
                                       ("2", 5460)]):
        b.add_proper_pair(f"bg{i}", contig, pos)
    return b.write()


def marginal_boundary_sample(tmp_path, seed=91) -> List[str]:
    """A read-through-shaped fusion with EXACTLY 14 supporting reads at
    EXACTLY 200x breakpoint coverage and both breakpoints in the outermost
    1% of their genes: filter_marginal_read_through's float32 threshold
    (0.07f * 200 == 14.0f, filter_marginal_read_through.cpp:10) KEEPS the
    fusion — a float64 threshold (14.000000000000002) would filter it."""
    b = SampleBuilder(tmp_path, {"1": 40000}, seed)
    b.add_gene("1", 1000, 2999, "+", "GA", "DONOR", "TA")
    b.add_gene("1", 20000, 21999, "+", "GB", "ACCEPT", "TB")
    # bp1 = 1:2989 (position_in_donor = 1989/1999 > 0.99), bp2 = 1:20000
    for i in range(14):
        b.add_split_fragment(f"rt{i}", "1", 2860 + 4 * i, 2960, 30, 40,
                             "1", 20000)
    # background coverage: gap-20 pairs keep both mates inside DONOR (no
    # read-through artifacts); 186 pairs + 14 split fragments = 200x at
    # the window upstream of bp1
    for i in range(187):
        b.add_proper_pair(f"bg{i}", "1", 2925 + (i % 3), gap=20)
    return b.write()


def ig_tr_dux4_sample(tmp_path, seed=151) -> List[str]:
    """IG/TCR enhancer hijacking + DUX4-style rearrangements: drives every
    branch of the IG exception in filter_end_to_end.cpp:47-72. All events
    are 3'-3' fused ("+"-strand genes with upstream breakpoint directions:
    both discordant mates on the reverse strand) and discordant-only, so
    they hit the low-support branch; the exception then spares exactly the
    IGH::DUX4-shaped one:

    - IGHLIKE::DUX4L (different contigs, 12 discordant mates, partner
      intron-poor)                                    -> SPARED
    - IGHLIKE::PAX5L (8 mates < many_discordant_mates) -> filtered
    - CLOSEA::CLOSEB (same contig, breakpoints 800 kb < 1 Mb apart)
                                                       -> filtered
    - INTRON1::INTRON2 (both breakpoints exonic, both genes >66% intronic)
                                                       -> filtered
    """
    b = SampleBuilder(tmp_path, {"1": 200000, "2": 200000, "3": 1000000},
                      seed)
    # intron-rich IG-like locus: two slim exons across a 100 kb gene
    b.add_gene("1", 1000, 101000, "+", "GIGH", "IGHLIKE", "TIGH",
               coding=False, exons=[(1000, 1400), (100600, 101000)])
    # intron-poor DUX4-like partner: one solid exon. NOTE on coordinates:
    # breakpoint_overlaps_both_genes (common.hpp:260-264) compares raw
    # positions CONTIG-BLIND, so partner breakpoints must lie numerically
    # outside IGHLIKE's [1000, 101000] span or min_support demands split
    # reads (filter_min_support.cpp:14-15)
    b.add_gene("2", 150000, 151399, "+", "GDUX", "DUX4L", "TDUX",
               coding=False, exons=[(150000, 151399)])
    # second partner for the few-mates variant
    b.add_gene("2", 160000, 161399, "+", "GPAX", "PAX5L", "TPAX",
               coding=False, exons=[(160000, 161399)])
    # same-contig close pair (breakpoints ~800 kb apart < min 1 Mb)
    b.add_gene("3", 50000, 52000, "+", "GCA", "CLOSEA", "TCA",
               coding=False, exons=[(50000, 50400), (51600, 52000)])
    b.add_gene("3", 850000, 852000, "+", "GCB", "CLOSEB", "TCB",
               coding=False, exons=[(850000, 850400), (851600, 852000)])
    # both-exonic breakpoints in intron-rich genes. Gene spans derive from
    # the exon rows, and the reference's calculate_intronic_fraction only
    # counts bases BEFORE the last exon (filter_end_to_end.cpp:8-23) — so
    # a slim anchor exon at the start plus the breakpoint exon near the
    # end give 16,559 of 17,001 bases intronic = 0.97 > 0.66
    b.add_gene("1", 120000, 137000, "+", "GI1", "INTRON1", "TI1",
               coding=False, exons=[(120000, 120040), (136600, 137000)])
    b.add_gene("3", 200000, 217000, "+", "GI2", "INTRON2", "TI2",
               coding=False, exons=[(200000, 200040), (216600, 217000)])

    # SPARED: IGHLIKE intron x DUX4L exon-adjacent, 12 reverse-reverse
    # discordant mates (upstream/upstream = 3'-3')
    for i in range(12):
        b.add_discordant_fragment(f"igdux{i}", "1", 50000 + 4 * i,
                                  "2", 150100 + 3 * i,
                                  strand1="-", strand2="-")
    # FILTERED (few mates): 8 mates only
    for i in range(8):
        b.add_discordant_fragment(f"igpax{i}", "1", 52000 + 4 * i,
                                  "2", 160200 + 3 * i,
                                  strand1="-", strand2="-")
    # FILTERED (close): same contig, 800 kb apart, 12 mates; breakpoints
    # inside exons so the events survive filter_both_intronic and reach
    # end_to_end (the close-distance branch, not the intronic-fraction one:
    # these genes are only ~60% intronic)
    for i in range(12):
        b.add_discordant_fragment(f"close{i}", "3", 50100 + 4 * i,
                                  "3", 851700 + 3 * i,
                                  strand1="-", strand2="-")
    # FILTERED (exonic in intron-rich genes): breakpoints inside the slim
    # exons, 12 mates
    for i in range(12):
        b.add_discordant_fragment(f"intr{i}", "1", 136700 + 4 * i,
                                  "3", 216700 + 3 * i,
                                  strand1="-", strand2="-")

    # high-expression decoy gene pairs: raise the in-vitro 99.8% expression
    # quantile threshold above the IG/DUX gene counts so the exception
    # branch (not the in-vitro artifact filter) decides the events —
    # mirroring a real transcriptome where the IG locus is far from the
    # top 0.2% of chimeric expression
    for pair in range(15):
        ga = f"GDEC{pair}A"
        gb = f"GDEC{pair}B"
        start_a = 150000 + pair * 3000
        start_b = 300000 + pair * 3000
        b.add_gene("3", start_a, start_a + 1399, "+", ga, f"DEC{pair}A",
                   f"T{ga}", coding=False, exons=[(start_a, start_a + 1399)])
        b.add_gene("3", start_b, start_b + 1399, "+", gb, f"DEC{pair}B",
                   f"T{gb}", coding=False, exons=[(start_b, start_b + 1399)])
        for i in range(35):
            b.add_discordant_fragment(f"dec{pair}_{i}", "3",
                                      start_a + 100 + 4 * i, "3",
                                      start_b + 100 + 3 * i)

    # background coverage near every breakpoint (no_coverage filter)
    positions = [("1", 49950), ("1", 50100), ("2", 150050), ("2", 150200),
                 ("1", 51950), ("2", 160150), ("3", 50050), ("3", 851750),
                 ("1", 136650), ("3", 216650), ("3", 50200), ("1", 136800),
                 ("3", 216800), ("2", 160300)]
    for i, (contig, pos) in enumerate(positions):
        b.add_proper_pair(f"bg{i}", contig, pos)
    return b.write()


# ---------------------------------------------------------------------------
# adversarial iteration-order families (VERDICT r4 item 7): inputs
# CONSTRUCTED to make the reference's hash-map / std::map walk order
# observable, instead of waiting for a lucky fuzz seed. Each family is
# seeded so extended_fuzz.py can bank arbitrary bands.

def breakpoint_sharing_sample(tmp_path, seed: int = 1) -> List[str]:
    """Gene pairs SHARING breakpoints at ~10x the natural fuzz density —
    the class that hid the round-4 e-value partner-dedup bug
    (filter_relative_support.cpp:21-29 walks fusions in unordered_map
    order; when (A,B) and (A',B) share a breakpoint because A and A'
    overlap, which partner enters a gene's dedup set is order-dependent).
    Built from OVERLAPPING gene pairs at every donor locus, so every event
    produces two fusions with byte-identical breakpoints."""
    import numpy as _np
    rng = _np.random.default_rng(seed)
    b = SampleBuilder(tmp_path, {"1": 400000, "2": 400000}, seed)
    donors = []
    for g in range(10):
        start = 5000 + g * 30000
        # two genes covering the same interval (same strand): any
        # breakpoint inside annotates to both
        b.add_gene("1", start, start + 5999, "+", f"GA{g}", f"OVA{g}",
                   f"TA{g}")
        b.add_gene("1", start + 200, start + 6199, "+", f"GB{g}", f"OVB{g}",
                   f"TB{g}")
        donors.append(start)
    acceptors = []
    for g in range(10):
        start = 5000 + g * 30000
        b.add_gene("2", start, start + 5999,
                   "+" if rng.integers(0, 2) else "-", f"GC{g}", f"ACC{g}",
                   f"TC{g}")
        acceptors.append(start)
    fid = 0
    for event in range(14):
        d = int(rng.integers(0, len(donors)))
        a = int(rng.integers(0, len(acceptors)))
        bp1 = donors[d] + 1000 + int(rng.integers(0, 4000))
        bp2 = acceptors[a] + 500 + int(rng.integers(0, 4000))
        support = int(rng.integers(2, 8))
        for k in range(support):
            b.add_split_fragment(f"f{fid}", "1", bp1 - 120 - 3 * (k % 29),
                                 bp1 - 30, 30, 40, "2", bp2)
            fid += 1
        if rng.integers(0, 2):
            b.add_discordant_fragment(f"d{fid}", "1", bp1 - 90, "2",
                                      bp2 + 30)
            fid += 1
    for i in range(60):
        contig = "1" if i % 2 else "2"
        b.add_proper_pair(f"n{i}", contig,
                          int(rng.integers(2000, 390000)))
    return b.write()


def homolog_tie_sample(tmp_path, seed: int = 1) -> List[str]:
    """filter_homologs arbitration ties (filter_homologs.cpp:90-130): when
    two fusions share the 5' gene and their 3' partners are homologous
    (>=30% shared k-mers), the filter keeps the better-supported fusion —
    EQUAL support makes the survivor depend on the reference's map walk.
    The 3' partners are literal sequence COPIES planted in the genome, and
    every competing fusion gets exactly equal split-read counts."""
    import numpy as _np
    rng = _np.random.default_rng(seed)
    b = SampleBuilder(tmp_path, {"1": 200000, "2": 200000}, seed)
    b.add_gene("1", 5000, 10999, "+", "GP", "PIVOT", "TP")
    # homolog pair: identical 6 kb sequence at two loci of contig 2
    src = b.genome["2"][30000:36000].copy()
    b.genome["2"][60000:66000] = src
    b.add_gene("2", 30000, 35999, "+", "GH1", "HOMA", "TH1")
    b.add_gene("2", 60000, 65999, "+", "GH2", "HOMB", "TH2")
    # a second, independent tie triple
    src2 = b.genome["2"][100000:105000].copy()
    b.genome["2"][130000:135000] = src2
    b.add_gene("2", 100000, 104999, "-", "GH3", "HOMC", "TH3")
    b.add_gene("2", 130000, 134999, "-", "GH4", "HOMD", "TH4")
    b.add_gene("1", 50000, 55999, "+", "GQ", "PIVOT2", "TQ")

    fid = 0
    support = int(rng.integers(3, 7))
    for bp1, partners in ((8000, (31500, 61500)), (52000, (101500, 131500))):
        for bp2 in partners:
            for k in range(support):  # EXACTLY equal support per partner
                b.add_split_fragment(f"f{fid}", "1",
                                     bp1 - 120 - 3 * (k % 23), bp1 - 30,
                                     30, 40, "2", bp2)
                fid += 1
    for i in range(40):
        b.add_proper_pair(f"n{i}", "1" if i % 2 else "2",
                          int(rng.integers(2000, 190000)))
    return b.write()


def merge_adjacent_chain_sample(tmp_path, seed: int = 1) -> List[str]:
    """merge_adjacent_fusions shift chains (merge_adjacent_fusions.cpp:
    19-108): breakpoints at 2-3 bp steps form chains where which fusion
    absorbs which depends on the walk order over the fusion map (each merge
    moves support, changing later comparisons). Several chains of 4-6
    breakpoints spaced inside the 5 bp merge distance."""
    import numpy as _np
    rng = _np.random.default_rng(seed)
    b = SampleBuilder(tmp_path, {"1": 300000, "2": 300000}, seed)
    for g in range(6):
        start = 5000 + g * 40000
        b.add_gene("1", start, start + 7999, "+", f"G1_{g}", f"DON{g}",
                   f"T1_{g}")
        b.add_gene("2", start, start + 7999, "+", f"G2_{g}", f"ACC{g}",
                   f"T2_{g}")
    fid = 0
    for chain in range(6):
        base1 = 5000 + chain * 40000 + 2000 + int(rng.integers(0, 3000))
        base2 = 5000 + chain * 40000 + 2000 + int(rng.integers(0, 3000))
        n_links = int(rng.integers(4, 7))
        step = int(rng.integers(2, 4))
        for link in range(n_links):
            bp1 = base1 + link * step      # 2-3 bp apart: inside the merge
            bp2 = base2 + link * step      # distance, chaining transitively
            support = 2 + int(rng.integers(0, 2))
            for k in range(support):
                b.add_split_fragment(f"f{fid}", "1",
                                     bp1 - 125 - 3 * (k % 19), bp1 - 30,
                                     30, 40, "2", bp2)
                fid += 1
    for i in range(50):
        b.add_proper_pair(f"n{i}", "1" if i % 2 else "2",
                          int(rng.integers(2000, 290000)))
    return b.write()


def select_best_tie_sample(tmp_path, seed: int = 1) -> List[str]:
    """select_best exact ties (select_best.cpp:43-58): one gene pair with
    several well-separated breakpoint pairs carrying EXACTLY equal support
    and anchors — the kept breakpoint is decided by the reference's
    fusion-map iteration order alone."""
    import numpy as _np
    rng = _np.random.default_rng(seed)
    b = SampleBuilder(tmp_path, {"1": 200000, "2": 200000}, seed)
    for g, (c, name) in enumerate(
            (("1", "DON"), ("2", "ACC"), ("1", "DON2"), ("2", "ACC2"))):
        b.add_gene(c, 5000 + (g // 2) * 60000, 5000 + (g // 2) * 60000 + 19999,
                   "+", f"G{g}", name, f"T{g}")
    fid = 0
    for pair_base in (5000, 65000):
        n_bps = int(rng.integers(2, 5))
        support = int(rng.integers(2, 5))
        for bp_i in range(n_bps):
            bp1 = pair_base + 2000 + bp_i * 4000
            bp2 = pair_base + 3000 + bp_i * 4000
            for k in range(support):   # identical support at each breakpoint
                b.add_split_fragment(f"f{fid}", "1",
                                     bp1 - 120 - 3 * (k % 17), bp1 - 30,
                                     30, 40, "2", bp2)
                fid += 1
    for i in range(40):
        b.add_proper_pair(f"n{i}", "1" if i % 2 else "2",
                          int(rng.integers(2000, 190000)))
    return b.write()
