"""Assembly (FASTA) loader.

Reference parity: source/assembly.cpp:28-58 — streams a possibly-gzipped
FASTA, uppercases sequence, keeps only interesting contigs, registers contig
ids shared with the GTF/BAM, and remembers original (chr-prefixed) names.

The assembly is stored as {contig_id: numpy uint8 ASCII array} for O(1)
window slicing; device kernels receive 2-bit re-encoded windows. Parsing is
bulk byte work (record split + one-pass translate that uppercases and
strips newlines) rather than a per-line loop — ~10x faster on a
whole-genome FASTA.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..contigs import ContigRegistry, is_interesting_contig

Assembly = Dict[int, np.ndarray]

# one-pass uppercase + newline strip for bytes.translate
_UPPER = bytes.maketrans(bytes(range(ord("a"), ord("z") + 1)),
                         bytes(range(ord("A"), ord("Z") + 1)))


def _read_bytes(path: str) -> bytes:
    with open(path, "rb") as fh:
        head = fh.read(2)
        fh.seek(0)
        if head == b"\x1f\x8b":
            import gzip
            with gzip.open(fh) as gz:
                return gz.read()
        return fh.read()


def load_assembly(path: str, contigs: ContigRegistry, interesting_contigs: str) -> Assembly:
    data = _read_bytes(path)
    assembly: Dict[int, np.ndarray] = {}

    pos = 0 if data.startswith(b">") else data.find(b"\n>") + 1
    if pos == 0 and not data.startswith(b">"):
        return assembly  # no FASTA records
    while pos != -1 and pos < len(data):
        header_end = data.find(b"\n", pos)
        if header_end == -1:
            break
        next_record = data.find(b"\n>", header_end)
        body_end = len(data) if next_record == -1 else next_record + 1
        header = data[pos + 1:header_end].strip()
        fields = header.split()
        if fields:
            name = fields[0].decode("ascii", "replace")
            cid = contigs.add(name)
            if is_interesting_contig(name, interesting_contigs):
                seq = data[header_end + 1:body_end].translate(_UPPER, b"\r\n")
                arr = np.frombuffer(seq, dtype=np.uint8)
                if cid in assembly:
                    arr = np.concatenate([assembly[cid], arr])
                assembly[cid] = arr
        pos = -1 if next_record == -1 else next_record + 1
    return assembly
