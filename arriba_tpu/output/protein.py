"""Protein domains, reading frames, and fusion peptide translation.

Reference parity: source/annotate_protein_domains.cpp — GFF3 protein-domain
loader with %-hex decoding, retained-domain percentages, the genetic code,
reference-protein translation along coding exons, reading-frame derivation,
fusion-peptide assembly with lowercase marking of aberrant codons, and the
in-frame classifier.
"""

from __future__ import annotations

import sys
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..annotation.index import IntervalIndex
from ..annotation.tables import Annotation, ExonTable, GeneTable, TranscriptTable
from ..constants import DOWNSTREAM, FORWARD, UPSTREAM
from ..contigs import ContigRegistry, remove_chr
from ..io.compressed import iter_lines
from ..io.fasta import Assembly
from ..io.gtf import strip_ensembl_version_number
from ..seq import COMPLEMENT_LUT


def dna_to_protein(triplet: str) -> str:
    """annotate_protein_domains.cpp:163-189 — prefix rules make e.g. 'GC?'
    still translate to 'A'."""
    t = triplet.upper()
    d = t[:2]
    if d == "GC":
        return "A"
    if t in ("TGT", "TGC"):
        return "C"
    if t in ("GAT", "GAC"):
        return "D"
    if t in ("GAA", "GAG"):
        return "E"
    if t in ("TTT", "TTC"):
        return "F"
    if d == "GG":
        return "G"
    if t in ("CAT", "CAC"):
        return "H"
    if t in ("ATT", "ATC", "ATA"):
        return "I"
    if t in ("AAA", "AAG"):
        return "K"
    if d == "CT" or t in ("TTA", "TTG"):
        return "L"
    if t == "ATG":
        return "M"
    if t in ("AAT", "AAC"):
        return "N"
    if d == "CC":
        return "P"
    if t in ("CAA", "CAG"):
        return "Q"
    if d == "CG" or t in ("AGA", "AGG"):
        return "R"
    if d == "TC" or t in ("AGT", "AGC"):
        return "S"
    if d == "AC":
        return "T"
    if d == "GT":
        return "V"
    if t == "TGG":
        return "W"
    if t in ("TAT", "TAC"):
        return "Y"
    if t in ("TAA", "TAG", "TGA"):
        return "*"
    return "?"


def _complement_char(base: int) -> str:
    return chr(COMPLEMENT_LUT[base])


# ---------------------------------------------------------------------------
# protein-domain annotation (GFF3)


class ProteinDomains:
    """Structure-of-arrays protein-domain records plus interval index."""

    def __init__(self) -> None:
        self.contig: List[int] = []
        self.start: List[int] = []
        self.end: List[int] = []
        self.strand: List[bool] = []
        self.gene: List[int] = []
        self.name: List[str] = []
        self.index: Optional[IntervalIndex] = None

    def __len__(self) -> int:
        return len(self.name)


def _decode_hex_escapes(name: str) -> str:
    """annotate_protein_domains.cpp:83-96 — decode %XY escapes."""
    result = []
    pos = 0
    while pos < len(name):
        if (name[pos] == "%" and pos + 2 < len(name)
                and name[pos + 1] in "0123456789abcdefABCDEF"
                and name[pos + 2] in "0123456789abcdefABCDEF"):
            result.append(chr(int(name[pos + 1:pos + 3], 16)))
            pos += 3
        else:
            result.append(name[pos])
            pos += 1
    return "".join(result)


def _sanitize(name: str, also_pipe: bool) -> str:
    """Replace whitespace/non-printable/comma (and pipe) with underscores."""
    out = []
    for c in name:
        if c < "!" or c > "~" or c == "," or (also_pipe and c == "|"):
            out.append("_")
        else:
            out.append(c)
    return "".join(out)


def _get_gff3_attribute(attributes: str, name: str) -> Optional[str]:
    """annotate_protein_domains.cpp:14-30."""
    start = attributes.find(name + "=")
    if start < 0:
        print(f"WARNING: failed to extract {name} from line in GFF3 file: {attributes}",
              file=sys.stderr)
        return None
    start += len(name) + 1
    end = attributes.find(";", start)
    return attributes[start:] if end < 0 else attributes[start:end]


def load_protein_domains(filename: str, contigs: ContigRegistry,
                         annotation: Annotation, n_contigs: int) -> ProteinDomains:
    """annotate_protein_domains.cpp:33-121."""
    genes = annotation.genes
    gene_ids: Dict[str, int] = {}
    for g in range(len(genes)):
        gene_ids[strip_ensembl_version_number(genes.gene_id[g])] = g

    domains = ProteinDomains()
    unknown_genes = set()
    for line in iter_lines(filename):
        if not line or line[0] == "#":
            continue
        columns = line.split("\t")
        if len(columns) < 9 or not columns[0] or not columns[6] or not columns[8]:
            print(f"WARNING: failed to parse line in GFF3 file: {line}", file=sys.stderr)
            continue
        from ..io.compressed import str_to_int
        start = str_to_int(columns[3])
        end = str_to_int(columns[4])
        if start is None or end is None:
            # tsv_stream_t >> int uses str_to_int (common.hpp:316), which
            # rejects padding/trailing junk that bare int() would accept
            print(f"WARNING: failed to parse line in GFF3 file: {line}", file=sys.stderr)
            continue
        attributes = columns[8]
        gene_name = _get_gff3_attribute(attributes, "gene_name")
        gene_id = _get_gff3_attribute(attributes, "gene_id")
        name = _get_gff3_attribute(attributes, "Name")
        if gene_name is None or gene_id is None or name is None:
            continue
        cid = contigs.name_to_id.get(remove_chr(columns[0]))
        if cid is None:
            print(f"WARNING: unknown contig: {columns[0]}", file=sys.stderr)
            continue

        name = _sanitize(_decode_hex_escapes(name), also_pipe=True)

        gene = gene_ids.get(strip_ensembl_version_number(gene_id))
        if gene is None:
            gene = annotation.gene_names.get(gene_name)
            if gene is None:
                key = gene_name + " " + gene_id
                if key not in unknown_genes:
                    print(f"WARNING: unknown gene: {key}", file=sys.stderr)
                    unknown_genes.add(key)
                continue

        domains.contig.append(cid)
        domains.start.append(start - 1)
        domains.end.append(end - 1)
        domains.strand.append(columns[6][0] == "+")
        domains.gene.append(gene)
        domains.name.append(name)

    if not len(domains):
        raise RuntimeError("failed to parse GFF3 file")
    domains.index = IntervalIndex(np.array(domains.contig, np.int32),
                                  np.array(domains.start, np.int64),
                                  np.array(domains.end, np.int64), n_contigs)
    return domains


def annotate_retained_protein_domains(contig: int, breakpoint: int,
                                      predicted_strand: bool,
                                      predicted_strand_ambiguous: bool, gene: int,
                                      direction: bool, genes: GeneTable,
                                      domains: ProteinDomains) -> str:
    """annotate_protein_domains.cpp:123-161."""
    if not genes.is_protein_coding[gene]:
        return ""
    if predicted_strand_ambiguous or predicted_strand != bool(genes.strand[gene]):
        return ""
    index = domains.index
    if index is None or contig >= index.n_contigs:
        return ""

    retained: Dict[str, List[int]] = {}
    bounds = index.boundaries[contig]
    gene_start = int(genes.start[gene])
    gene_end = int(genes.end[gene])
    idx = int(np.searchsorted(bounds, gene_start, side="left"))
    while idx < len(bounds) and bounds[idx] <= gene_end:
        for d in index.set_at(contig, idx):
            d = int(d)
            if domains.gene[d] != gene:
                continue
            # domains spanning multiple index regions are counted once per
            # region, like the reference (ratio-preserving)
            length = domains.end[d] - domains.start[d] + 1
            retained_bases = 0
            if direction == UPSTREAM and domains.end[d] >= breakpoint:
                retained_bases = domains.end[d] - max(domains.start[d], breakpoint) + 1
            elif direction == DOWNSTREAM and domains.start[d] <= breakpoint:
                retained_bases = min(domains.end[d], breakpoint) - domains.start[d] + 1
            entry = retained.setdefault(domains.name[d], [0, 0])
            entry[0] += length
            entry[1] += retained_bases
        idx += 1

    parts = []
    for name in sorted(retained):
        length, retained_bases = retained[name]
        if retained_bases > 0:
            parts.append(f"{name}({retained_bases * 100 // length}%)")
    return ",".join(parts)


# ---------------------------------------------------------------------------
# reading frame & peptide


_CODON_CLASS = None  # lazily-built 5x5x5 class table over {A,C,G,T,other}
_BASE_CLASS = None


def _codon_tables():
    """Vectorized dna_to_protein: its rules only distinguish A/C/G/T vs
    anything else per position, so a 125-entry class table reproduces it."""
    global _CODON_CLASS, _BASE_CLASS
    if _CODON_CLASS is not None:
        return _CODON_CLASS, _BASE_CLASS
    alphabet = "ACGTN"  # N represents every non-ACGT character
    table = np.empty(125, dtype="<U1")
    for i, b0 in enumerate(alphabet):
        for j, b1 in enumerate(alphabet):
            for k, b2 in enumerate(alphabet):
                table[i * 25 + j * 5 + k] = dna_to_protein(b0 + b1 + b2)
    base_class = np.full(256, 4, np.uint8)
    for cls, chars in enumerate("ACGT"):
        base_class[ord(chars)] = cls
        base_class[ord(chars.lower())] = cls
    _CODON_CLASS, _BASE_CLASS = table, base_class
    return table, base_class


def translate_reference_protein(exon_with_start_codon: Optional[int],
                                annotation: Annotation,
                                assembly: Assembly) -> Dict[int, str]:
    """annotate_protein_domains.cpp:192-211 — protein of the wild-type
    transcript, keyed by genomic position of each codon's third base.
    Vectorized: CDS bases of the exon chain are gathered into arrays and
    translated through a codon-class table (same output as the per-base
    walk, including the early-stop-codon warning)."""
    reference_protein: Dict[int, str] = {}
    if exon_with_start_codon is None:
        return reference_protein
    exons = annotation.exons
    genes = annotation.genes
    forward_strand = bool(genes.strand[int(exons.gene[exon_with_start_codon])]) == FORWARD

    base_parts = []
    position_parts = []
    interior_parts = []
    exon_of_parts = []
    exon: Optional[int] = exon_with_start_codon
    while exon is not None and exon >= 0:
        contig_seq = assembly[int(exons.contig[exon])]
        crs = int(exons.coding_region_start[exon])
        cre = int(exons.coding_region_end[exon])
        if crs != -1 and cre >= crs:
            bases = np.asarray(contig_seq[crs:cre + 1])
            positions = np.arange(crs, cre + 1, dtype=np.int64)
            if not forward_strand:
                bases = COMPLEMENT_LUT[bases][::-1]
                positions = positions[::-1]
            interior = (positions > crs) & (positions < cre)
            base_parts.append(bases)
            position_parts.append(positions)
            interior_parts.append(interior)
            exon_of_parts.append(np.full(len(positions), exon, np.int64))
        nxt = int(exons.next_exon[exon]) if forward_strand else int(exons.prev_exon[exon])
        exon = nxt if nxt >= 0 else None
    if not base_parts:
        return reference_protein

    bases = np.concatenate(base_parts)
    positions = np.concatenate(position_parts)
    interior = np.concatenate(interior_parts)
    exon_of = np.concatenate(exon_of_parts)
    n_codons = len(bases) // 3
    if n_codons == 0:
        return reference_protein

    table, base_class = _codon_tables()
    classes = base_class[bases[:n_codons * 3]].reshape(n_codons, 3)
    codon_index = classes[:, 0] * 25 + classes[:, 1] * 5 + classes[:, 2]
    amino_acids = table[codon_index]
    third_positions = positions[2:n_codons * 3:3]
    reference_protein = dict(zip(third_positions.tolist(),
                                 amino_acids.tolist()))

    # a stop codon whose third base lies strictly inside an exon is "early"
    # (the terminal stop sits on the exon boundary, so interior excludes it)
    early = np.flatnonzero((amino_acids == "*")
                           & interior[2:n_codons * 3:3])
    if len(early):
        first = int(early[0])
        transcript = int(exons.transcript[int(exon_of[first * 3 + 2])])
        print(f"WARNING: encountered early stop codon in transcript "
              f"{annotation.transcripts.name[transcript]} at amino acid "
              f"{first + 1} (error in GTF file?) => predicted "
              f"peptide sequence may be wrong", file=sys.stderr)
    return reference_protein


def get_reading_frame(transcribed_bases: List[int], from_: int, to_: int,
                      transcript: Optional[int], gene: int,
                      annotation: Annotation, assembly: Assembly
                      ) -> Tuple[int, Optional[int]]:
    """annotate_protein_domains.cpp:214-261 — returns (reading_frame,
    exon_with_start_codon)."""
    exons = annotation.exons
    genes = annotation.genes
    transcripts = annotation.transcripts
    forward = bool(genes.strand[gene]) == FORWARD

    if transcript is None:
        exon: Optional[int] = None
    else:
        exon = int(transcripts.first_exon[transcript] if forward
                   else transcripts.last_exon[transcript])
    while exon is not None and exon >= 0 and exons.coding_region_start[exon] == -1:
        exon = int(exons.next_exon[exon] if forward else exons.prev_exon[exon])
    if exon is None or exon < 0:
        return -1, None
    exon_with_start_codon = exon

    contig_seq = assembly[int(genes.contig[gene])]
    if forward:
        crs = int(exons.coding_region_start[exon])
        first_codon = contig_seq[crs:crs + 3].tobytes().decode("latin-1")
    else:
        cre = int(exons.coding_region_end[exon])
        window = contig_seq[cre - 2:cre + 1]
        first_codon = "".join(_complement_char(int(b)) for b in window[::-1])
    if first_codon != "ATG":
        return -1, exon_with_start_codon

    reading_frame = -1
    transcribed_coding_base = -1
    while exon is not None and exon >= 0 and exons.coding_region_start[exon] != -1 \
            and transcribed_coding_base == -1:
        crs = int(exons.coding_region_start[exon])
        cre = int(exons.coding_region_end[exon])
        for position in range(from_, to_ + 1):
            if crs <= transcribed_bases[position] <= cre:
                transcribed_coding_base = position
                break
        if transcribed_coding_base == -1:
            reading_frame = (reading_frame + cre - crs + 1) % 3
        else:
            if forward:
                reading_frame += transcribed_bases[transcribed_coding_base] - crs
            else:
                reading_frame += cre - transcribed_bases[transcribed_coding_base]
            reading_frame = (reading_frame + 1) % 3
        if transcribed_coding_base == -1:
            exon = int(exons.next_exon[exon] if forward else exons.prev_exon[exon])
            if exon < 0:
                exon = None
    if transcribed_coding_base == -1:
        return -1, exon_with_start_codon

    for position in range(transcribed_coding_base - 1, from_ - 1, -1):
        if transcribed_bases[position] != -1:
            reading_frame = 2 if reading_frame == 0 else reading_frame - 1

    return reading_frame, exon_with_start_codon


def get_fusion_peptide_sequence(transcript_sequence: str, positions: List[int],
                                gene_5: int, gene_3: int,
                                transcript_5: Optional[int],
                                transcript_3: Optional[int],
                                predicted_strand_3: bool, annotation: Annotation,
                                assembly: Assembly) -> str:
    """annotate_protein_domains.cpp:263-393."""
    genes = annotation.genes
    exons = annotation.exons

    if (not transcript_sequence or transcript_sequence == "."
            or "...|" in transcript_sequence or "|..." in transcript_sequence):
        return "."
    if int(genes.contig[gene_5]) not in assembly or int(genes.contig[gene_3]) not in assembly:
        return "."

    transcription_5_end = transcript_sequence.find("|") - 1
    # C++ rfind(str, pos) constrains only the match START to <= pos
    transcription_5_start = transcript_sequence.rfind("...", 0, transcription_5_end + 3)
    if transcription_5_start < 0:
        transcription_5_start = 0
    else:
        while (positions[transcription_5_start] == -1
               and transcript_sequence[transcription_5_start] != "|"):
            transcription_5_start += 1

    non_template_bases_length = transcript_sequence.find("|", transcription_5_end + 2)
    if non_template_bases_length < 0:
        non_template_bases_length = 0
    else:
        non_template_bases_length -= transcription_5_end + 2

    transcription_3_start = transcription_5_end + 2
    if non_template_bases_length > 0:
        transcription_3_start += non_template_bases_length + 1
    transcription_3_end = transcript_sequence.find("...", transcription_3_start)
    if transcription_3_end < 0:
        transcription_3_end = len(transcript_sequence) - 1
    else:
        transcription_3_end -= 1

    reading_frame_5, start_exon_5 = get_reading_frame(
        positions, transcription_5_start, transcription_5_end, transcript_5, gene_5,
        annotation, assembly)
    if reading_frame_5 == -1:
        return "."
    if reading_frame_5 != 0:
        reading_frame_5 = 3 - reading_frame_5

    start_exon_3: Optional[int] = None
    reading_frame_3 = -1
    if bool(genes.strand[gene_3]) == predicted_strand_3:
        reading_frame_3, start_exon_3 = get_reading_frame(
            positions, transcription_3_start, transcription_3_end, transcript_3, gene_3,
            annotation, assembly)

    reference_protein_5 = translate_reference_protein(start_exon_5, annotation, assembly)
    reference_protein_3 = translate_reference_protein(start_exon_3, annotation, assembly)

    peptide_sequence: List[str] = []
    codon_5_bases = 0
    codon_3_bases = 0
    found_start_codon = False
    codon = ""
    gene_5_forward = bool(genes.strand[gene_5]) == FORWARD
    start_exon_5_crs = int(exons.coding_region_start[start_exon_5]) if start_exon_5 is not None else -1
    start_exon_5_cre = int(exons.coding_region_end[start_exon_5]) if start_exon_5 is not None else -1

    for position in range(transcription_5_start + reading_frame_5, transcription_3_end):
        if not found_start_codon:
            if positions[position] != -1 and (
                    (gene_5_forward and positions[position] >= start_exon_5_crs)
                    or (not gene_5_forward and positions[position] <= start_exon_5_cre)):
                found_start_codon = True
            else:
                continue

        c = transcript_sequence[position]
        if c in "ATCGatcg?":
            if len(codon) == 0:
                codon_5_bases = 0
                codon_3_bases = 0
            if position <= transcription_5_end:
                codon_5_bases += 1
            elif position >= transcription_3_start:
                codon_3_bases += 1
            codon += c

        if len(codon) == 3:
            amino_acid = dna_to_protein(codon)
            reference_protein = (reference_protein_5 if position <= transcription_5_end
                                 else reference_protein_3)
            if ((transcription_5_end < position < transcription_3_start)
                    or positions[position] not in reference_protein
                    or amino_acid != reference_protein[positions[position]]
                    or (codon_5_bases != 3 and position <= transcription_5_end)
                    or (codon_3_bases != 3 and position >= transcription_3_start)
                    or (position >= transcription_3_start and reading_frame_3 == -1)):
                amino_acid = amino_acid.lower()
            peptide_sequence.append(amino_acid)
            codon = ""
            if codon_3_bases >= 2 and amino_acid == "*":
                break

        if (position == transcription_5_end and len(codon) <= 1) or \
                (codon_5_bases == 2 and len(codon) == 0):
            if not peptide_sequence or peptide_sequence[-1] != "|":
                peptide_sequence.append("|")

        if non_template_bases_length > 0:
            if (position + 2 == transcription_3_start and len(codon) <= 1) or \
                    (codon_3_bases == 1 and len(codon) == 0):
                if not peptide_sequence or peptide_sequence[-1] != "|":
                    peptide_sequence.append("|")

    result = "".join(peptide_sequence)
    return result if result else "."


def is_in_frame(fusion_peptide_sequence: str) -> str:
    """annotate_protein_domains.cpp:395-445."""
    if (fusion_peptide_sequence == "." or not fusion_peptide_sequence
            or fusion_peptide_sequence[-1] == "|"):
        return "."

    npos = len(fusion_peptide_sequence) + 1
    fusion_junction = fusion_peptide_sequence.rfind("|")
    if fusion_junction < 0:
        fusion_junction = npos
    last_stop = fusion_peptide_sequence.rfind(
        "*", 0, min(fusion_junction, len(fusion_peptide_sequence) - 1) + 1)
    if last_stop < 0:
        last_stop = npos
    search_from = last_stop if last_stop != npos else 0
    first_start = fusion_peptide_sequence.find("m", search_from)
    if first_start < 0:
        first_start = npos
    if first_start >= fusion_junction:
        first_start = fusion_peptide_sequence.find("M", search_from)
        if first_start < 0:
            first_start = npos
    if last_stop < fusion_junction and first_start >= fusion_junction:
        return "stop-codon"

    if last_stop < fusion_junction:
        in_frame_before = any("A" <= fusion_peptide_sequence[i] <= "Z"
                              for i in range(min(last_stop, len(fusion_peptide_sequence))))
        if in_frame_before:
            in_frame_after = any("A" <= fusion_peptide_sequence[i] <= "Z"
                                 for i in range(last_stop + 1,
                                                min(fusion_junction, len(fusion_peptide_sequence))))
            if not in_frame_after:
                return "stop-codon"

    start_5 = last_stop + 1 if last_stop < fusion_junction else 0
    in_frame_5 = any("A" <= fusion_peptide_sequence[i] <= "Z"
                     for i in range(start_5, min(fusion_junction, len(fusion_peptide_sequence))))
    # no '|' at all: the reference's size_t npos+1 wraps to 0, so the
    # 3' scan covers the whole peptide (annotate_protein_domains.cpp:440)
    start_3 = 0 if fusion_junction == npos else min(
        fusion_junction + 1, len(fusion_peptide_sequence))
    in_frame_3 = any("A" <= fusion_peptide_sequence[i] <= "Z"
                     for i in range(start_3, len(fusion_peptide_sequence)))
    return "in-frame" if in_frame_5 and in_frame_3 else "out-of-frame"
