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


_STR_TO_INT_RE = None


def str_to_int(text: str):
    """Exact common.hpp:316-321 semantics (strtol + int truncation):
    - a leading SPACE rejects (other strtol whitespace is consumed),
    - the whole string must parse (*end == '\0'),
    - values outside long range reject (strtol clamps to LONG_MAX/MIN),
    - values within long but outside int32 TRUNCATE modulo 2^32 and are
      accepted (the reference assigns long to int without a check).
    Returns the int value or None on failure."""
    global _STR_TO_INT_RE
    if _STR_TO_INT_RE is None:
        import re
        _STR_TO_INT_RE = re.compile(r"\s*[+-]?[0-9]+")
    if not text or text[0] == " ":
        return None
    match = _STR_TO_INT_RE.match(text)
    if match is None or match.end() != len(text):
        return None
    value = int(match.group(0))
    if value >= 2 ** 63 - 1 or value <= -(2 ** 63):
        return None  # strtol returned LONG_MAX/LONG_MIN
    return ((value + 2 ** 31) % 2 ** 32) - 2 ** 31


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
        parsed = str_to_int(value)
        if parsed is None:
            self.failbit = True
            return 0
        return parsed

    def fail(self) -> bool:
        return self.failbit
