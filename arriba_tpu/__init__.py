"""arriba_tpu — a TPU-native gene-fusion detection engine.

A from-scratch reimplementation of the capabilities of Arriba
(fusion detection from RNA-Seq chimeric alignments) designed for TPU
hardware: the host runtime decodes BAM/GTF/FASTA into structure-of-arrays
tensors, per-read filters and realignment run as vectorized JAX/Pallas
programs, and candidate tables are merged across a device mesh with XLA
collectives.

Layer map (mirrors reference layers L0-L13, see SURVEY.md):
  constants / contigs            core data model + filter registry
  io/                            FASTA, GTF, SAM/BAM (BGZF) decoding
  annotation/                    gene/exon tables + interval index
  ingest/                        chimeric-alignment extraction + read stats
  filters/                       the ~30-stage filter/recovery cascade
  fusions.py                     breakpoint clustering (candidate generation)
  ops/                           JAX/Pallas device kernels (hot paths)
  parallel/                      mesh sharding + collective merges
  output/                        consensus assembly, peptides, TSV writer
  pipeline.py                    the orchestrator (reference: arriba.cpp:main)
"""

__version__ = "0.1.0"
