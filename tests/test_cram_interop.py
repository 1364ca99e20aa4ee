"""CRAM interop spec-vectors: htslib compresses data-series blocks with
rANS-4x8 (and occasionally bzip2/lzma), while our writer only emits
gzip/raw — so the reader's rANS/bzip2/lzma block paths never see a full
file in writer-roundtrip tests.  These tests re-encode every block of a
writer-produced CRAM into those layouts (with a test-local rANS order-0
encoder that is an exact inverse of io/cram.py's decoder, per the CRAM
3.0 spec section 13 / htslib rANS_static) and assert record-identical
decoding.  Reference dependency being replaced: htslib cram."""

import bz2
import io
import lzma
import struct
import zlib

import numpy as np
import pytest

from arriba_tpu.io.cram import (METHOD_BZIP2, METHOD_GZIP, METHOD_LZMA,
                                METHOD_RANS, METHOD_RAW, RANS_TOTFREQ,
                                RANS_TF_SHIFT, rans_decode, read_cram,
                                read_itf8, read_ltf8, write_cram, write_itf8,
                                write_ltf8)


# ---------------------------------------------------------------------------
# rANS 4x8 order-0 encoder (test-local; the product only decodes)

def _normalized_freqs(data: bytes) -> dict:
    counts = np.bincount(np.frombuffer(data, np.uint8), minlength=256)
    total = int(counts.sum())
    freqs = {}
    scaled = {}
    for sym in range(256):
        if counts[sym]:
            scaled[sym] = max(1, int(counts[sym]) * RANS_TOTFREQ // total)
    # largest-remainder style fixup so the table sums to exactly TOTFREQ
    diff = RANS_TOTFREQ - sum(scaled.values())
    order = sorted(scaled, key=lambda s: -counts[s])
    i = 0
    while diff != 0:
        sym = order[i % len(order)]
        if diff > 0:
            scaled[sym] += 1
            diff -= 1
        elif scaled[sym] > 1:
            scaled[sym] -= 1
            diff += 1
        i += 1
    cumulative = 0
    for sym in sorted(scaled):
        freqs[sym] = (cumulative, scaled[sym])
        cumulative += scaled[sym]
    return freqs


def _write_freq_table(freqs: dict) -> bytes:
    """Serialize in the RLE format _rans_read_freq_table consumes."""
    syms = sorted(freqs)
    out = bytearray()

    def put_freq(freq):
        if freq < 128:
            out.append(freq)
        else:
            out.append(128 | (freq >> 8))
            out.append(freq & 0xFF)

    i = 0
    first = True
    while i < len(syms):
        run_end = i
        while (run_end + 1 < len(syms)
               and syms[run_end + 1] == syms[run_end] + 1):
            run_end += 1
        sym = syms[i]
        if not first:
            out.append(sym)
        else:
            out.append(sym)
            first = False
        put_freq(freqs[sym][1])
        if run_end > i:
            # consecutive run: "sym+1, count" then the remaining freqs
            out.append(sym + 1)
            out.append(run_end - i - 1)
            for j in range(i + 1, run_end + 1):
                put_freq(freqs[syms[j]][1])
        i = run_end + 1
    out.append(0)  # terminator
    return bytes(out)


def rans0_encode(data: bytes) -> bytes:
    """Exact inverse of io/cram.py rans_decode for order 0."""
    out_size = len(data)
    header = bytes([0])  # order 0
    if out_size == 0:
        return header + struct.pack("<II", 0, 0)
    freqs = _normalized_freqs(data)
    table = _write_freq_table(freqs)

    L = 1 << 23
    states = [L, L, L, L]
    emitted = bytearray()
    for i in range(out_size - 1, -1, -1):
        j = i & 3
        sym = data[i]
        cum, freq = freqs[sym]
        x = states[j]
        x_max = ((L >> RANS_TF_SHIFT) << 8) * freq
        while x >= x_max:
            emitted.append(x & 0xFF)
            x >>= 8
        states[j] = ((x // freq) << RANS_TF_SHIFT) + (x % freq) + cum
    stream = struct.pack("<4I", *states) + bytes(reversed(emitted))
    body = table + stream
    return header + struct.pack("<II", len(body) + 9, out_size) + body


def test_rans0_encoder_roundtrip():
    rng = np.random.default_rng(5)
    for blob in (b"", b"A", b"AAAA" * 100,
                 bytes(rng.integers(0, 4, 5000, dtype=np.uint8) + 65),
                 bytes(rng.integers(0, 256, 3000, dtype=np.uint8)),
                 bytes(range(256)) * 20):
        assert rans_decode(rans0_encode(blob)) == blob


# ---------------------------------------------------------------------------
# block-level remix: rewrite every block of a CRAM with a different
# compression method, with container lengths/landmarks/CRCs recomputed

CT_SLICE_HEADER = 2  # matches io/cram.py's numbering (spec: MAPPED_SLICE)


def _recompress(method: int, data: bytes) -> bytes:
    if method == METHOD_RAW:
        return data
    if method == METHOD_GZIP:
        compressor = zlib.compressobj(6, zlib.DEFLATED, zlib.MAX_WBITS | 16)
        return compressor.compress(data) + compressor.flush()
    if method == METHOD_BZIP2:
        return bz2.compress(data)
    if method == METHOD_LZMA:
        return lzma.compress(data)
    if method == METHOD_RANS:
        return rans0_encode(data)
    raise AssertionError(method)


def remix_cram(path_in: str, path_out: str, method_of) -> int:
    """Rewrite every block using method_of(block_index) -> METHOD_*;
    returns the number of blocks rewritten."""
    with open(path_in, "rb") as fh:
        raw = fh.read()
    buf = io.BytesIO(raw)
    out = bytearray()
    out += buf.read(26)  # magic, version, file id
    major = out[4]
    rewritten = 0

    while True:
        header_start = buf.tell()
        length_bytes = buf.read(4)
        if len(length_bytes) < 4:
            break
        length = struct.unpack("<i", length_bytes)[0]
        ref_id = read_itf8(buf)
        start = read_itf8(buf)
        span = read_itf8(buf)
        n_records = read_itf8(buf)
        counter = read_ltf8(buf) if major >= 3 else read_itf8(buf)
        bases = read_ltf8(buf) if major >= 3 else read_itf8(buf)
        n_blocks = read_itf8(buf)
        n_landmarks = read_itf8(buf)
        for _ in range(n_landmarks):
            read_itf8(buf)
        if major >= 3:
            buf.read(4)  # CRC32
        payload_start = buf.tell()

        if n_records == 0 and ref_id == -1 and start == 4542278:
            # spec EOF container: copy verbatim (fixed bytes)
            buf.seek(header_start)
            out += buf.read()
            break

        # decode + re-encode each block of the container payload
        payload = bytearray()
        landmarks = []
        for _ in range(n_blocks):
            method = buf.read(1)[0]
            content_type = buf.read(1)[0]
            content_id = read_itf8(buf)
            compressed_size = read_itf8(buf)
            raw_size = read_itf8(buf)
            block_payload = buf.read(compressed_size)
            buf.read(4)  # CRC
            if method == METHOD_RAW:
                data = block_payload
            elif method == METHOD_GZIP:
                data = zlib.decompress(block_payload, zlib.MAX_WBITS | 32)
            elif method == METHOD_BZIP2:
                data = bz2.decompress(block_payload)
            elif method == METHOD_LZMA:
                data = lzma.decompress(block_payload)
            elif method == METHOD_RANS:
                data = rans_decode(block_payload)
            else:
                raise AssertionError(f"unexpected method {method}")
            assert len(data) == raw_size

            if content_type == CT_SLICE_HEADER:
                landmarks.append(len(payload))
            new_method = method_of(rewritten)
            new_payload = _recompress(new_method, data)
            payload += bytes([new_method, content_type])
            payload += write_itf8(content_id)
            payload += write_itf8(len(new_payload))
            payload += write_itf8(len(data))
            payload += new_payload
            payload += struct.pack("<I", zlib.crc32(new_payload))
            rewritten += 1
        assert buf.tell() == payload_start + length

        header = bytearray()
        header += struct.pack("<i", len(payload))
        header += write_itf8(ref_id)
        header += write_itf8(start)
        header += write_itf8(span)
        header += write_itf8(n_records)
        header += write_ltf8(counter) if major >= 3 else write_itf8(counter)
        header += write_ltf8(bases) if major >= 3 else write_itf8(bases)
        header += write_itf8(n_blocks)
        header += write_itf8(len(landmarks))
        for landmark in landmarks:
            header += write_itf8(landmark)
        if major >= 3:
            header += struct.pack("<I", zlib.crc32(bytes(header)))
        out += header
        out += payload

    with open(path_out, "wb") as fh:
        fh.write(bytes(out))
    return rewritten


# ---------------------------------------------------------------------------
# fixtures: a writer-produced CRAM with mixed record shapes

def _sample_cram(tmp_path):
    from arriba_tpu.io.bam import BamRecord, SamHeader, cigar_from_string

    rng = np.random.default_rng(11)
    bases = np.frombuffer(b"ACGT", np.uint8)
    genome = {"1": bases[rng.integers(0, 4, 6000)],
              "2": bases[rng.integers(0, 4, 6000)]}
    header = SamHeader(target_names=["1", "2"],
                       target_lengths=[6000, 6000])

    def seq(contig, pos, length):
        return genome[contig][pos:pos + length].tobytes().decode()

    records = []
    for i in range(120):
        contig = "1" if i % 2 == 0 else "2"
        tid = 0 if contig == "1" else 1
        pos = 40 + i * 37
        records.append(BamRecord(
            qname=f"read{i}", flag=99 if i % 3 else 97, tid=tid, pos=pos,
            mapq=60, cigar=cigar_from_string("30M5S" if i % 5 == 0 else "35M"),
            mtid=tid, mpos=pos + 80, tlen=115,
            seq=seq(contig, pos, 35), tags={"HI": 1, "NM": i % 4}))
        records.append(BamRecord(
            qname=f"read{i}", flag=147 if i % 3 else 145, tid=tid,
            pos=pos + 80, mapq=60, cigar=cigar_from_string("35M"),
            mtid=tid, mpos=pos, tlen=-115,
            seq=seq(contig, pos + 80, 35), tags={"HI": 1}))
    path = tmp_path / "sample.cram"
    write_cram(str(path), header, records,
               reference_by_name={name: genome[name] for name in genome})
    return path, genome


def _decode_all(path, genome):
    header, records = read_cram(str(path), reference_by_name=genome)
    return header.text, [
        (r.qname, r.flag, r.tid, r.pos, r.mapq, r.cigar.tolist(), r.mtid,
         r.mpos, r.tlen, r.seq, dict(r.tags)) for r in records]


@pytest.mark.parametrize("method,name", [
    (METHOD_RANS, "rans"),        # htslib's default for data series
    (METHOD_BZIP2, "bzip2"),
    (METHOD_LZMA, "lzma"),
    (METHOD_RAW, "raw"),
])
def test_remixed_blocks_decode_identically(tmp_path, method, name):
    path, genome = _sample_cram(tmp_path)
    expected = _decode_all(path, genome)
    remixed = tmp_path / f"remixed_{name}.cram"
    n = remix_cram(str(path), str(remixed), lambda i: method)
    assert n > 3  # header block + compression header + slice blocks
    assert _decode_all(remixed, genome) == expected


def test_remixed_mixed_methods(tmp_path):
    """Rotate through all methods across consecutive blocks, like a file
    from an encoder that picks the best codec per block."""
    path, genome = _sample_cram(tmp_path)
    expected = _decode_all(path, genome)
    cycle = [METHOD_RANS, METHOD_GZIP, METHOD_BZIP2, METHOD_LZMA, METHOD_RAW]
    remixed = tmp_path / "remixed_mixed.cram"
    remix_cram(str(path), str(remixed), lambda i: cycle[i % len(cycle)])
    assert _decode_all(remixed, genome) == expected


def test_remixed_cram_through_pipeline_loader(tmp_path):
    """open_alignment_file must route a rANS-compressed CRAM through the
    reader exactly like the gzip one."""
    from arriba_tpu.io.bam import open_alignment_file

    path, genome = _sample_cram(tmp_path)
    remixed = tmp_path / "remixed_all_rans.cram"
    remix_cram(str(path), str(remixed), lambda i: METHOD_RANS)
    header1, records1 = open_alignment_file(str(path),
                                            reference_by_name=genome)
    header2, records2 = open_alignment_file(str(remixed),
                                            reference_by_name=genome)
    rows1 = [(r.qname, r.flag, r.pos, r.seq) for r in records1]
    rows2 = [(r.qname, r.flag, r.pos, r.seq) for r in records2]
    assert rows1 == rows2 and len(rows1) == 240
