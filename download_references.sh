#!/bin/bash
# Download assembly + annotation and build a STAR index.
# Interface-compatible with the reference's download_references.sh.

set -e -o pipefail -u

ASSEMBLIES="hs37d5viral+GENCODE19 GRCh37viral+GENCODE19 hg19viral+GENCODE19
GRCh38viral+GENCODE38 hg38viral+GENCODE38
GRCh38+GENCODE38 hg38+GENCODE38 hs37d5+GENCODE19 GRCh37+GENCODE19 hg19+GENCODE19
GRCh38+RefSeq hg38+RefSeq GRCh37+RefSeq hg19+RefSeq
GRCh38+ENSEMBL104 hg38+ENSEMBL104 GRCh37+ENSEMBL87 hg19+ENSEMBL87
GRCm38+GENCODEM25 mm10+GENCODEM25 GRCm39+GENCODEM27 mm39+GENCODEM27"

if [ $# -lt 1 ] || ! echo "$ASSEMBLIES" | tr ' ' '\n' | grep -qxF "$1"; then
	echo "Usage: $(basename "$0") ASSEMBLY+ANNOTATION [THREADS]" 1>&2
	echo "Available assemblies and annotations:" 1>&2
	echo "$ASSEMBLIES" | tr ' ' '\n' | sed 's/^/  /' 1>&2
	exit 1
fi

COMBINATION="$1"
THREADS="${2-8}"
ASSEMBLY="${COMBINATION%+*}"
ANNOTATION="${COMBINATION#*+}"
VIRAL=false
case "$ASSEMBLY" in *viral) VIRAL=true; ASSEMBLY="${ASSEMBLY%viral}";; esac

download() { wget -q -O - "$1" || curl -s -L "$1"; }

echo "Downloading assembly $ASSEMBLY"
case "$ASSEMBLY" in
	hs37d5) download 'ftp://ftp.1000genomes.ebi.ac.uk/vol1/ftp/technical/reference/phase2_reference_assembly_sequence/hs37d5.fa.gz' | gunzip -c > "$ASSEMBLY.fa" ;;
	hg19)   download 'https://hgdownload.soe.ucsc.edu/goldenPath/hg19/bigZips/hg19.fa.gz' | gunzip -c > "$ASSEMBLY.fa" ;;
	GRCh37) download 'http://ftp.ensembl.org/pub/grch37/release-87/fasta/homo_sapiens/dna/Homo_sapiens.GRCh37.dna_sm.primary_assembly.fa.gz' | gunzip -c > "$ASSEMBLY.fa" ;;
	hg38)   download 'https://hgdownload.soe.ucsc.edu/goldenPath/hg38/bigZips/hg38.fa.gz' | gunzip -c > "$ASSEMBLY.fa" ;;
	GRCh38) download 'http://ftp.ensembl.org/pub/release-104/fasta/homo_sapiens/dna/Homo_sapiens.GRCh38.dna_sm.primary_assembly.fa.gz' | gunzip -c > "$ASSEMBLY.fa" ;;
	mm10|GRCm38) download 'http://ftp.ensembl.org/pub/release-102/fasta/mus_musculus/dna/Mus_musculus.GRCm38.dna_sm.primary_assembly.fa.gz' | gunzip -c > "$ASSEMBLY.fa" ;;
	mm39|GRCm39) download 'http://ftp.ensembl.org/pub/release-104/fasta/mus_musculus/dna/Mus_musculus.GRCm39.dna_sm.primary_assembly.fa.gz' | gunzip -c > "$ASSEMBLY.fa" ;;
esac

if $VIRAL; then
	echo "Appending viral genomes (RVDB)"
	download 'https://rvdb.dbi.udel.edu/download/C-RVDBvCurrent.fasta.gz' | gunzip -c >> "$ASSEMBLY.fa" || \
		echo "WARNING: failed to download viral genomes; continuing without" 1>&2
fi

echo "Downloading annotation $ANNOTATION"
case "$ANNOTATION" in
	GENCODE19)  download 'http://ftp.ebi.ac.uk/pub/databases/gencode/Gencode_human/release_19/gencode.v19.annotation.gtf.gz' | gunzip -c > "$ANNOTATION.gtf" ;;
	GENCODE38)  download 'http://ftp.ebi.ac.uk/pub/databases/gencode/Gencode_human/release_38/gencode.v38.annotation.gtf.gz' | gunzip -c > "$ANNOTATION.gtf" ;;
	GENCODEM25) download 'http://ftp.ebi.ac.uk/pub/databases/gencode/Gencode_mouse/release_M25/gencode.vM25.annotation.gtf.gz' | gunzip -c > "$ANNOTATION.gtf" ;;
	GENCODEM27) download 'http://ftp.ebi.ac.uk/pub/databases/gencode/Gencode_mouse/release_M27/gencode.vM27.annotation.gtf.gz' | gunzip -c > "$ANNOTATION.gtf" ;;
	ENSEMBL87)  download 'http://ftp.ensembl.org/pub/grch37/release-87/gtf/homo_sapiens/Homo_sapiens.GRCh37.87.gtf.gz' | gunzip -c > "$ANNOTATION.gtf" ;;
	ENSEMBL104) download 'http://ftp.ensembl.org/pub/release-104/gtf/homo_sapiens/Homo_sapiens.GRCh38.104.gtf.gz' | gunzip -c > "$ANNOTATION.gtf" ;;
	RefSeq)
		case "$ASSEMBLY" in
			hg19|GRCh37|hs37d5) download 'https://hgdownload.soe.ucsc.edu/goldenPath/hg19/bigZips/genes/hg19.refGene.gtf.gz' | gunzip -c > "$ANNOTATION.gtf" ;;
			*) download 'https://hgdownload.soe.ucsc.edu/goldenPath/hg38/bigZips/genes/hg38.refGene.gtf.gz' | gunzip -c > "$ANNOTATION.gtf" ;;
		esac ;;
esac

if command -v STAR > /dev/null; then
	echo "Building STAR index (threads=$THREADS)"
	mkdir -p "STAR_index_${ASSEMBLY}_${ANNOTATION}"
	STAR --runMode genomeGenerate --genomeDir "STAR_index_${ASSEMBLY}_${ANNOTATION}" \
	     --genomeFastaFiles "$ASSEMBLY.fa" --sjdbGTFfile "$ANNOTATION.gtf" \
	     --runThreadN "$THREADS" --sjdbOverhang 250
else
	echo "STAR not found; skipping index construction" 1>&2
fi
