"""Contig registry: name normalization and wildcard matching.

Reference parity: source/common.hpp:72-110 (contigs_t, removeChr,
is_interesting_contig). Contig names have the "chr" prefix stripped and
"M" renamed to "MT" so assembly/annotation/BAM agree; original names are
kept for output.
"""

from __future__ import annotations

from typing import Dict, List


def remove_chr(contig: str) -> str:
    """Normalize a contig name (common.hpp:74-80)."""
    if contig.startswith("chr"):
        contig = contig[3:]
    if contig == "M":
        contig = "MT"
    return contig


def is_interesting_contig(contig: str, interesting_contigs: str) -> bool:
    """Wildcard contig matching (common.hpp:82-110).

    `interesting_contigs` is a whitespace-separated list of patterns where '*'
    matches any (possibly empty) substring, e.g. "1 2 X Y AC_* NC_*".
    Both the contig and the pattern are chr-normalized before matching.
    """
    contig = remove_chr(contig)
    for pattern in interesting_contigs.split():
        pattern = remove_chr(pattern)
        if not pattern:
            continue
        if _wildcard_match(contig, pattern):
            return True
    return False


def _wildcard_match(contig: str, pattern: str) -> bool:
    # replicate the reference's segment-scanning semantics: '*' splits the
    # pattern into segments that must appear in order; a leading '*' frees the
    # prefix, a trailing '*' frees the suffix.
    is_prefix = pattern.endswith("*")
    is_suffix = pattern.startswith("*")
    segments = [s for s in pattern.split("*") if s]
    pos = 0
    for i, segment in enumerate(segments):
        if i == 0 and not is_suffix:
            if not contig.startswith(segment):
                return False
            pos = len(segment)
            continue
        found = contig.find(segment, pos)
        if found < 0:
            return False
        pos = found + len(segment)
    if not segments:
        # pattern was only '*'s
        return is_prefix or is_suffix or pos == len(contig)
    return is_prefix or pos == len(contig)


class ContigRegistry:
    """Maps normalized contig names to dense numeric ids (common.hpp:72).

    Mirrors the reference's ordered map + original_contig_names vector:
    ids are assigned in first-seen order; `original` keeps the un-normalized
    name (with chr prefix) for output.
    """

    def __init__(self) -> None:
        self.name_to_id: Dict[str, int] = {}
        self.names: List[str] = []      # normalized names by id
        self.original: List[str] = []   # original names by id

    def __len__(self) -> int:
        return len(self.names)

    def __contains__(self, name: str) -> bool:
        return remove_chr(name) in self.name_to_id

    def add(self, name: str) -> int:
        """Insert a contig (idempotent); returns its id. Stores the original
        name the first time the contig is seen (assembly.cpp:43-47)."""
        key = remove_chr(name)
        existing = self.name_to_id.get(key)
        if existing is not None:
            return existing
        cid = len(self.names)
        if cid >= 0xFFFF - 1:
            raise ValueError("too many contigs")
        self.name_to_id[key] = cid
        self.names.append(key)
        self.original.append(name)
        return cid

    def get(self, name: str) -> int | None:
        return self.name_to_id.get(remove_chr(name))

    def interesting_mask(self, interesting_contigs: str) -> List[bool]:
        """Per-contig boolean lookup table (arriba.cpp:133-139)."""
        return [is_interesting_contig(n, interesting_contigs) for n in self.names]
