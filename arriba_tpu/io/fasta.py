"""Assembly (FASTA) loader.

Reference parity: source/assembly.cpp:28-58 — streams a possibly-gzipped
FASTA, uppercases sequence, keeps only interesting contigs, registers contig
ids shared with the GTF/BAM, and remembers original (chr-prefixed) names.

The assembly is stored as {contig_id: numpy uint8 ASCII array} for O(1)
window slicing; device kernels receive 2-bit re-encoded windows.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..contigs import ContigRegistry, is_interesting_contig
from .compressed import iter_lines

Assembly = Dict[int, np.ndarray]


def load_assembly(path: str, contigs: ContigRegistry, interesting_contigs: str) -> Assembly:
    assembly: Dict[int, np.ndarray] = {}
    chunks: list[bytes] = []
    current: int | None = None

    def flush() -> None:
        nonlocal chunks, current
        if current is not None and chunks:
            seq = b"".join(chunks).upper()
            arr = np.frombuffer(seq, dtype=np.uint8)
            if current in assembly:
                arr = np.concatenate([assembly[current], arr])
            assembly[current] = arr
        chunks = []

    for line in iter_lines(path):
        if not line:
            continue
        if line[0] == ">":
            flush()
            name = line[1:].split()[0]
            cid = contigs.add(name)
            current = cid if is_interesting_contig(name, interesting_contigs) else None
        elif current is not None:
            chunks.append(line.encode("ascii"))
    flush()
    return assembly
