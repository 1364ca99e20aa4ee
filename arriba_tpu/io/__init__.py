"""Host-side file decoding: FASTA, GTF, SAM/BAM (BGZF)."""
