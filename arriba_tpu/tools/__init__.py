"""Downstream utility tools — equivalents of the reference's scripts/
(convert_fusions_to_vcf.sh, annotate_exon_numbers.sh,
quantify_virus_expression.sh, extract_fusion-supporting_alignments.sh),
implemented natively so no samtools/awk toolchain is required."""
