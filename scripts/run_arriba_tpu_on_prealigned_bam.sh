#!/bin/bash
# Fusion calling on a prealigned BAM: realign only the reads that matter for
# fusion detection (unmapped/clipped/discordant), keep the rest as-is.
# Interface-compatible with the reference's run_arriba_on_prealigned_bam.sh.

if [ $# -ne 8 ]; then
	echo Usage: $(basename "$0") STAR_genomeDir/ annotation.gtf assembly.fa blacklist.tsv known_fusions.tsv protein_domains.gff3 threads alignments.bam
	echo
	echo "Description: Takes existing alignments as input and realigns only reads relevant to fusion detection (unmapped and clipped reads, discordant mates, reads on contigs absent from the assembly); all other alignments pass through unchanged. Useful to reprocess old alignments or output of aligners without SAM-compliant chimeric alignment support (e.g., HISAT2)."
	exit 1
fi 1>&2
STAR_INDEX_DIR="$1"
ANNOTATION_GTF="$2"
ASSEMBLY_FA="$3"
BLACKLIST_TSV="$4"
KNOWN_FUSIONS_TSV="$5"
TAGS_TSV="$KNOWN_FUSIONS_TSV"
PROTEIN_DOMAINS_GFF3="$6"
THREADS="$7"
ALIGNMENTS="$8"

set -e -u -o pipefail

if ! [[ $(samtools --version-only 2> /dev/null) =~ ^1\. ]]; then
	echo "samtools >= 1.0 must be installed" 1>&2
	exit 1
fi
if ! [[ "$(STAR --version 2> /dev/null)" =~ ^2\.(7\.([6-9]|[1-9][0-9])|[8-9]|[1-9][0-9]) ]]; then
	echo "STAR >= 2.7.6a must be installed" 1>&2
	exit 1
fi
BASE_DIR=$(cd "$(dirname "$0")/.." && pwd)

# auto-detect library layout (single-end vs. paired-end)
LAYOUT=$(samtools view "$ALIGNMENTS" | head -n1 | awk '{print ($2 % 2) ? "PE" : "SE"}' || exit 0)

(

if [ "$LAYOUT" = "SE" ]; then
	samtools view -F 2304 "$ALIGNMENTS"
else
	samtools collate -u -f -r 1000000 -O "$ALIGNMENTS" |
	samtools view -
fi |

cut -f 1-11 |

awk -F '\t' -v ASSEMBLY_FA="$ASSEMBLY_FA" -v LAYOUT="$LAYOUT" -v ARRIBA_PIPE="/dev/fd/3" -v STAR_PIPE="/dev/stdout" '
	BEGIN{
		while (getline line < ASSEMBLY_FA)
			if (line~/^>/) {
				gsub(/^>|[ \t].*/, "", line); contig=line
			} else {
				contigs[contig]+=length($0)
			}
		print "@HD\tVN:1.4\tSO:coordinate" > ARRIBA_PIPE
		for (contig in contigs)
			print "@SQ\tSN:"contig"\tLN:"contigs[contig] > ARRIBA_PIPE
	}
	function flag(f) { return ($2 % (2*f) >= f) }
	function realign() {
		return (flag(4) ||
		        !flag(16) && $6~/^[0-9][0-9]+S/ ||
		        flag(16) && $6~/[0-9][0-9]S$/ ||
		        LAYOUT=="SE" && $6~/[0-9][0-9]S/ ||
		        LAYOUT=="PE" && !flag(2) ||
		        !($3 in contigs))
	}
	LAYOUT=="PE" {
		if ($1==name1) {
			if (realign1 || realign()) {
				print mate1 "\n" $0 > STAR_PIPE
			} else {
				print mate1 "\n" $0 > ARRIBA_PIPE
			}
		} else {
			mate1=$0; name1=$1; realign1=realign()
		}
	}
	LAYOUT=="SE" {
		if (realign()) {
			print > STAR_PIPE
		} else {
			print > ARRIBA_PIPE
		}
	}
' |

STAR \
	--runThreadN "$THREADS" \
	--genomeDir "$STAR_INDEX_DIR" --genomeLoad NoSharedMemory \
	--readFilesIn /dev/stdin --readFilesType SAM $LAYOUT \
	--outStd BAM_Unsorted --outSAMtype BAM Unsorted --outBAMcompression 0 \
	--outFilterMultimapNmax 50 --peOverlapNbasesMin 10 --alignSplicedMateMapLminOverLmate 0.5 --alignSJstitchMismatchNmax 5 -1 5 5 \
	--chimSegmentMin 10 --chimOutType WithinBAM HardClip --chimJunctionOverhangMin 10 --chimScoreDropMax 30 --chimScoreJunctionNonGTAG 0 --chimScoreSeparation 1 --chimSegmentReadGapMax 3 --chimMultimapNmax 50 > realigned.bam
samtools view realigned.bam

) 3>&1 |

PYTHONPATH="$BASE_DIR" python3 -m arriba_tpu \
        -x /dev/stdin \
        -o fusions.tsv -O fusions.discarded.tsv \
        -a "$ASSEMBLY_FA" -g "$ANNOTATION_GTF" -b "$BLACKLIST_TSV" -k "$KNOWN_FUSIONS_TSV" -t "$TAGS_TSV" -p "$PROTEIN_DOMAINS_GFF3" \
	-@ "$THREADS"

rm -f realigned.bam SJ.out.tab
