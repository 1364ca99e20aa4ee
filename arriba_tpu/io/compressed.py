"""Transparent (de)compression + lightweight TSV splitting.

Reference parity: source/read_compressed_file.{cpp,hpp} — files ending in
".gz" are decompressed whole into memory (the reference uses htslib BGZF,
which also accepts plain gzip); anything else streams from disk. Lines have
trailing '\\r' stripped (DOS line breaks).
"""

from __future__ import annotations

import io
import zlib
from typing import Iterator


def open_autodecompress(path: str) -> io.TextIOBase:
    """Open a possibly gzip/BGZF-compressed text file for line reading."""
    if path.endswith(".gz"):
        with open(path, "rb") as fh:
            raw = fh.read()
        data = decompress_gzip_multi(raw)
        return io.TextIOWrapper(io.BytesIO(data), encoding="ascii", errors="replace")
    return open(path, "rt", encoding="ascii", errors="replace")


def decompress_gzip_multi(raw: bytes) -> bytes:
    """Decompress concatenated gzip members (covers both plain gzip and BGZF,
    which is a sequence of gzip blocks)."""
    out = []
    view = memoryview(raw)  # zero-copy slicing (BGZF has thousands of members)
    pos = 0
    n = len(raw)
    while pos < n:
        dec = zlib.decompressobj(wbits=31)  # gzip wrapper
        out.append(dec.decompress(view[pos:]))
        consumed = n - pos - len(dec.unused_data)
        if consumed <= 0:
            break
        pos += consumed
    return b"".join(out)


def iter_lines(path: str) -> Iterator[str]:
    """Yield lines with the newline and any trailing carriage return removed
    (read_compressed_file.cpp:59-61)."""
    fh = open_autodecompress(path)
    try:
        for line in fh:
            if line.endswith("\n"):
                line = line[:-1]
            if line.endswith("\r"):
                line = line[:-1]
            yield line
    finally:
        fh.close()


class TsvStream:
    """Allocation-light field extraction mirroring tsv_stream_t semantics
    (read_compressed_file.cpp:65-90): reading past the last field sets the
    fail flag; int parsing failures set it too."""

    def __init__(self, line: str, delimiter: str = "\t") -> None:
        self._fields = line.split(delimiter)
        self._pos = 0
        self.failbit = False

    def next_str(self) -> str:
        if self._pos >= len(self._fields):
            self.failbit = True
            return ""
        value = self._fields[self._pos]
        self._pos += 1
        return value

    def next_int(self) -> int:
        value = self.next_str()
        if self.failbit:
            return 0
        try:
            # the reference's str_to_int rejects leading spaces and trailing junk
            if value != value.strip() or not value.lstrip("-").isdigit():
                self.failbit = True
                return 0
            return int(value)
        except ValueError:
            self.failbit = True
            return 0

    def fail(self) -> bool:
        return self.failbit
