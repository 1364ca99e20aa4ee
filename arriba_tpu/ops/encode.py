"""ReadBatch tensorization: ragged chimeric alignments -> fixed-shape arrays.

The reference pipeline chases pointers over hash maps
(read_chimeric_alignments.cpp, common.hpp:208-222); the TPU path consumes a
structure-of-arrays ReadBatch instead: [N, L] 2-bit base codes, per-position
reference codes and match masks (from a host-side CIGAR walk), and dense
per-read metadata. Shapes are padded to multiples of the lane width so XLA
tiles them onto the VPU without re-layout; batch rows pad to a multiple of
the device count for even DP sharding.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..constants import (CIGAR_CONSUMES_QUERY, CIGAR_CONSUMES_REF, CIGAR_DEL,
                         CIGAR_DIFF, CIGAR_EQUAL, CIGAR_HARD_CLIP, CIGAR_INS,
                         CIGAR_MATCH, CIGAR_REF_SKIP, CIGAR_SOFT_CLIP, MATE1,
                         MATE2, SPLIT_READ, SUPPLEMENTARY, cigar_op,
                         cigar_oplen)
from ..io.fasta import Assembly
from ..model import Alignment, ChimericAlignments

# base codes for device kernels: matches the reference's kmer_to_int mapping
# (filter_mismappers.cpp:33-45): T=0, G=1, C=2, everything else=3.
# PAD=4 marks positions beyond the read length.
KMER_CODE_LUT = np.full(256, 3, dtype=np.uint8)
KMER_CODE_LUT[ord("T")] = 0
KMER_CODE_LUT[ord("G")] = 1
KMER_CODE_LUT[ord("C")] = 2
PAD_CODE = 4


def round_up(value: int, multiple: int) -> int:
    return (value + multiple - 1) // multiple * multiple


@dataclass
class ReadBatch:
    """Dense view of one batch of alignments (one row per aligned segment).

    All arrays are numpy on host; jnp.asarray at the device boundary.
    """

    bases: np.ndarray        # [N, L] uint8 kmer codes (PAD_CODE beyond length)
    ref: np.ndarray          # [N, L] uint8 kmer codes of the aligned reference base
    match_mask: np.ndarray   # [N, L] bool: position is CIGAR M/=/X (compare read vs ref)
    length: np.ndarray       # [N] int32 read length
    aligned_start: np.ndarray  # [N] int32 first non-clipped read position
    aligned_end: np.ndarray    # [N] int32 one past last non-clipped read position
    n_reads: int             # valid rows (rows >= n_reads are padding)

    @property
    def shape(self) -> Tuple[int, int]:
        return self.bases.shape


def encode_alignment(alignment: Alignment, sequence: str, assembly: Assembly,
                     bases_row: np.ndarray, ref_row: np.ndarray,
                     mask_row: np.ndarray) -> Tuple[int, int, int]:
    """CIGAR walk of one alignment filling one ReadBatch row; returns
    (length, aligned_start, aligned_end)."""
    seq_codes = KMER_CODE_LUT[np.frombuffer(sequence.encode("latin-1"), np.uint8)]
    n = len(seq_codes)
    bases_row[:n] = seq_codes

    contig_seq = assembly.get(alignment.contig)
    read_pos = 0
    ref_pos = alignment.start
    aligned_start = 0
    aligned_end = n
    for i, word in enumerate(alignment.cigar):
        op = cigar_op(int(word))
        oplen = cigar_oplen(int(word))
        if op in (CIGAR_MATCH, CIGAR_EQUAL, CIGAR_DIFF):
            stop = min(read_pos + oplen, n)
            span = stop - read_pos
            if span > 0 and contig_seq is not None:
                window = contig_seq[ref_pos:ref_pos + span]
                ref_row[read_pos:read_pos + len(window)] = KMER_CODE_LUT[window]
                mask_row[read_pos:read_pos + len(window)] = True
            read_pos += oplen
            ref_pos += oplen
        elif op == CIGAR_SOFT_CLIP:
            if i == 0:
                aligned_start = oplen
            else:
                aligned_end = min(aligned_end, n - oplen)
            read_pos += oplen
        elif op == CIGAR_HARD_CLIP:
            pass
        elif op == CIGAR_INS:
            read_pos += oplen
        elif op in (CIGAR_DEL, CIGAR_REF_SKIP):
            ref_pos += oplen
    return n, aligned_start, aligned_end


def tensorize(chimeric_alignments: ChimericAlignments, assembly: Assembly,
              max_read_length: int = 256, pad_rows_to: int = 8) -> ReadBatch:
    """Pack every mate with a sequence into a ReadBatch.

    Rows appear in the canonical iteration order of the fragment map,
    MATE1 then MATE2/SPLIT_READ per fragment — the deterministic analog of
    the reference's per-read loops.
    """
    rows: List[Tuple[Alignment, str]] = []
    for mates in chimeric_alignments.values():
        for mate in mates:
            if mate.sequence:
                rows.append((mate, mate.sequence))

    n_reads = len(rows)
    lane = 128
    max_len = max((len(seq) for _, seq in rows), default=0)
    L = round_up(max(min(max_len, max_read_length), lane), lane)
    N = round_up(max(n_reads, pad_rows_to), pad_rows_to)

    bases = np.full((N, L), PAD_CODE, np.uint8)
    ref = np.full((N, L), PAD_CODE, np.uint8)
    match_mask = np.zeros((N, L), np.bool_)
    length = np.zeros(N, np.int32)
    aligned_start = np.zeros(N, np.int32)
    aligned_end = np.zeros(N, np.int32)

    for row, (alignment, sequence) in enumerate(rows):
        sequence = sequence[:L]
        n, a_start, a_end = encode_alignment(alignment, sequence, assembly,
                                             bases[row], ref[row], match_mask[row])
        length[row] = n
        aligned_start[row] = a_start
        aligned_end[row] = a_end

    return ReadBatch(bases=bases, ref=ref, match_mask=match_mask, length=length,
                     aligned_start=aligned_start, aligned_end=aligned_end,
                     n_reads=n_reads)


def random_read_batch(rng: np.random.Generator, n_reads: int, read_length: int,
                      mismatch_rate: float = 0.01) -> ReadBatch:
    """Synthetic ReadBatch for benchmarks: reads drawn uniformly, reference
    equal to the read with `mismatch_rate` random substitutions."""
    lane = 128
    L = round_up(read_length, lane)
    N = round_up(n_reads, 8)
    bases = np.full((N, L), PAD_CODE, np.uint8)
    ref = np.full((N, L), PAD_CODE, np.uint8)
    match_mask = np.zeros((N, L), np.bool_)
    reads = rng.integers(0, 4, size=(n_reads, read_length), dtype=np.uint8)
    bases[:n_reads, :read_length] = reads
    flip = rng.random((n_reads, read_length)) < mismatch_rate
    ref_reads = np.where(flip, (reads + 1 + rng.integers(0, 3, reads.shape)) % 4, reads)
    ref[:n_reads, :read_length] = ref_reads.astype(np.uint8)
    match_mask[:n_reads, :read_length] = True
    length = np.zeros(N, np.int32)
    length[:n_reads] = read_length
    aligned_start = np.zeros(N, np.int32)
    aligned_end = np.zeros(N, np.int32)
    aligned_end[:n_reads] = read_length
    return ReadBatch(bases=bases, ref=ref, match_mask=match_mask, length=length,
                     aligned_start=aligned_start, aligned_end=aligned_end,
                     n_reads=n_reads)
