"""CRAM 3.0 reader/writer tests: record roundtrip, rANS decoding, and
end-to-end pipeline equivalence between SAM and CRAM inputs."""

import struct

import numpy as np
import pytest

from arriba_tpu.io.bam import cigar_to_string, read_sam_text
from arriba_tpu.io.cram import (rans_decode, read_cram, read_itf8, read_ltf8,
                                write_cram, write_itf8, write_ltf8)


def test_itf8_ltf8_roundtrip():
    import io
    for value in (0, 1, 127, 128, 16383, 16384, 2 ** 20, 2 ** 27, 2 ** 31 - 1,
                  -1, -2):
        assert read_itf8(io.BytesIO(write_itf8(value))) == value
    for value in (0, 127, 128, 2 ** 40, 2 ** 62, -1):
        assert read_ltf8(io.BytesIO(write_ltf8(value))) == value


def _rans_encode_order0(data: bytes) -> bytes:
    """Minimal rANS 4x8 order-0 encoder (test-only) matching the decoder's
    expected stream layout: order byte, sizes, freq table, 4 LE states,
    renormalization bytes."""
    TOTFREQ = 1 << 12
    RANS_L = 1 << 23
    counts = [0] * 256
    for b in data:
        counts[b] += 1
    total = len(data)
    freqs = [0] * 256
    # normalize to 4096, keeping every present symbol >= 1
    remaining = TOTFREQ
    present = [s for s in range(256) if counts[s]]
    for s in present:
        freqs[s] = max(1, counts[s] * TOTFREQ // total)
    delta = TOTFREQ - sum(freqs)
    freqs[max(present, key=lambda s: freqs[s])] += delta
    cumulative = [0] * 257
    for s in range(256):
        cumulative[s + 1] = cumulative[s] + freqs[s]

    # frequency table with the htslib RLE convention: a run of consecutive
    # symbols is announced by the second symbol's byte + a count byte
    table = bytearray()

    def append_freq(f):
        if f >= 128:
            table.append(128 | (f >> 8))
            table.append(f & 0xFF)
        else:
            table.append(f)

    i = 0
    while i < len(present):
        s = present[i]
        table.append(s)
        append_freq(freqs[s])
        run = 0
        while i + 1 + run < len(present) and present[i + 1 + run] == s + 1 + run:
            run += 1
        if run:
            table.append(s + 1)
            table.append(run - 1)
            for k in range(run):
                append_freq(freqs[present[i + 1 + k]])
            i += 1 + run
        else:
            i += 1
    table.append(0)

    states = [RANS_L] * 4
    emitted = bytearray()
    for i in range(len(data) - 1, -1, -1):
        j = i & 3
        s = data[i]
        f = freqs[s]
        x = states[j]
        x_max = ((RANS_L >> 12) << 8) * f
        while x >= x_max:
            emitted.append(x & 0xFF)
            x >>= 8
        states[j] = ((x // f) << 12) + (x % f) + cumulative[s]
    payload = bytes(table) + struct.pack("<4I", *states) + bytes(reversed(emitted))
    return bytes([0]) + struct.pack("<II", len(payload), len(data)) + payload


def test_rans_order0_decode():
    for data in (b"hello world" * 50, bytes(range(200)) * 3, b"AAAA" * 100,
                 b"\x00\x01" * 77):
        assert rans_decode(_rans_encode_order0(data)) == data


def test_cram_record_roundtrip(tmp_path):
    sam = (
        "@HD\tVN:1.6\tSO:unsorted\n"
        "@SQ\tSN:1\tLN:100\n"
        "@SQ\tSN:2\tLN:80\n"
        "r1\t97\t1\t5\t60\t10M2I8M\t2\t11\t0\tACGTACGTACTTGGGGCCCC\t"
        "IIIIIIIIIIIIIIIIIIII\tHI:i:1\tSA:Z:2,5,+,10S10M,60,0;\n"
        "r1\t145\t2\t11\t60\t5S15M\t1\t5\t0\tTTTTTACGTACGTACGTACG\t"
        "JJJJJJJJJJJJJJJJJJJJ\tHI:i:1\n"
        "r2\t4\t*\t0\t0\t*\t*\t0\t0\tNNNACGT\t*\n")
    (tmp_path / "a.sam").write_text(sam)
    header, records = read_sam_text(str(tmp_path / "a.sam"))
    records = list(records)
    reference = {"1": np.frombuffer(b"A" * 100, np.uint8).copy(),
                 "2": np.frombuffer(b"C" * 80, np.uint8).copy()}
    write_cram(str(tmp_path / "a.cram"), header, records, reference)
    header2, parsed = read_cram(str(tmp_path / "a.cram"), reference)
    parsed = list(parsed)
    assert header2.target_names == header.target_names
    assert len(parsed) == len(records)
    for expected, got in zip(records, parsed):
        for attr in ("qname", "flag", "tid", "pos", "mapq", "mtid", "mpos",
                     "seq", "qual"):
            assert getattr(expected, attr) == getattr(got, attr), attr
        assert expected.cigar.tolist() == got.cigar.tolist()
        assert dict(expected.tags) == dict(got.tags)


def test_cram_pipeline_equivalence(tmp_path):
    """The pipeline produces identical fusions.tsv from SAM and CRAM input."""
    from .oracle_util import run_ours
    from .scenario import SampleBuilder

    builder = SampleBuilder(tmp_path, {"1": 30000, "2": 30000}, 7)
    builder.add_gene("1", 1000, 4999, "+", "G1", "GENE1", "T1",
                     exons=[(1000, 2999), (4000, 4999)])
    builder.add_gene("2", 11000, 14999, "+", "G2", "GENE2", "T2",
                     exons=[(11000, 12999), (14000, 14999)])
    for i in range(6):
        builder.add_split_fragment(f"s{i}", "1", 2800, 2950, 25, 25, "2", 11000)
    for i in range(4):
        builder.add_discordant_fragment(f"d{i}", "1", 2800, "2", 11100)
    for i in range(30):
        builder.add_proper_pair(f"n{i}", "1", 1200 + i * 37)
        builder.add_proper_pair(f"m{i}", "2", 11200 + i * 41)
    args = builder.write()

    sam_result = run_ours(args + ["-o", str(tmp_path / "from_sam.tsv")], tmp_path)
    assert sam_result.returncode == 0, sam_result.stderr

    # convert the SAM to CRAM using the assembly as reference
    sam_path = args[args.index("-x") + 1]
    fasta_path = args[args.index("-a") + 1]
    reference = {}
    name = None
    chunks = []
    for line in open(fasta_path):
        if line.startswith(">"):
            if name is not None:
                reference[name] = np.frombuffer(
                    "".join(chunks).encode(), np.uint8).copy()
            name = line[1:].split()[0].strip()
            chunks = []
        else:
            chunks.append(line.strip())
    if name is not None:
        reference[name] = np.frombuffer("".join(chunks).encode(), np.uint8).copy()

    header, records = read_sam_text(sam_path)
    write_cram(str(tmp_path / "sample.cram"), header, list(records), reference)

    cram_args = list(args)
    cram_args[cram_args.index("-x") + 1] = str(tmp_path / "sample.cram")
    cram_result = run_ours(cram_args + ["-o", str(tmp_path / "from_cram.tsv")],
                           tmp_path)
    assert cram_result.returncode == 0, cram_result.stderr
    assert ((tmp_path / "from_sam.tsv").read_bytes()
            == (tmp_path / "from_cram.tsv").read_bytes())


@pytest.mark.parametrize("seed", [601, 602])
def test_cram_pipeline_equivalence_fuzz(tmp_path, seed):
    """Fuzz samples (ITDs, read-throughs, multimappers, viral reads, ...)
    produce identical fusions.tsv from SAM and CRAM input."""
    from .oracle_util import run_ours
    from .scenario import fuzz_sample

    args = fuzz_sample(tmp_path, seed)
    sam_result = run_ours(args + ["-o", str(tmp_path / "from_sam.tsv")], tmp_path)
    assert sam_result.returncode == 0, sam_result.stderr

    sam_path = args[args.index("-x") + 1]
    fasta_path = args[args.index("-a") + 1]
    reference = {}
    name, chunks = None, []
    for line in open(fasta_path):
        if line.startswith(">"):
            if name is not None:
                reference[name] = np.frombuffer("".join(chunks).encode(),
                                                np.uint8).copy()
            name, chunks = line[1:].split()[0].strip(), []
        else:
            chunks.append(line.strip())
    if name is not None:
        reference[name] = np.frombuffer("".join(chunks).encode(), np.uint8).copy()

    header, records = read_sam_text(sam_path)
    write_cram(str(tmp_path / "sample.cram"), header, list(records), reference)

    cram_args = list(args)
    cram_args[cram_args.index("-x") + 1] = str(tmp_path / "sample.cram")
    cram_result = run_ours(cram_args + ["-o", str(tmp_path / "from_cram.tsv")],
                           tmp_path)
    assert cram_result.returncode == 0, cram_result.stderr
    assert ((tmp_path / "from_sam.tsv").read_bytes()
            == (tmp_path / "from_cram.tsv").read_bytes())


def _encoding_params(*values):
    from arriba_tpu.io.cram import write_itf8
    return b"".join(write_itf8(v) for v in values)


def test_huffman_codec():
    """Canonical Huffman decode, including the 0-bit single-symbol form."""
    from arriba_tpu.io.cram import BitReader, make_int_decoder

    # single symbol, zero-length code: no bits consumed
    params = _encoding_params(1, 42, 1, 0)
    decoder = make_int_decoder(3, params)
    assert decoder(BitReader(b""), {}) == 42

    # three symbols, lengths 1/2/2 -> canonical codes 0, 10, 11
    params = _encoding_params(3, 5, 6, 7, 3, 1, 2, 2)
    decoder = make_int_decoder(3, params)
    bits = BitReader(bytes([0b01011000]))  # 0, 10, 11 -> 5, 6, 7
    assert [decoder(bits, {}) for _ in range(3)] == [5, 6, 7]


def test_beta_gamma_subexp_codecs():
    from arriba_tpu.io.cram import BitReader, make_int_decoder

    # BETA: offset 0, 4 bits -> reads raw 4-bit values
    decoder = make_int_decoder(6, _encoding_params(0, 4))
    bits = BitReader(bytes([0b00110101]))  # 0011=3, 0101=5
    assert [decoder(bits, {}) for _ in range(2)] == [3, 5]

    # BETA with offset: value = bits - offset
    decoder = make_int_decoder(6, _encoding_params(1, 4))
    assert decoder(BitReader(bytes([0b01000000])), {}) == 3

    # GAMMA (offset 0): Elias gamma — '1'=1, '010'=2, '011'=3
    decoder = make_int_decoder(9, _encoding_params(0))
    bits = BitReader(bytes([0b10100110]))  # 1 | 010 | 011 -> 1, 2, 3
    assert [decoder(bits, {}) for _ in range(3)] == [1, 2, 3]

    # SUBEXP k=2, offset 0: '0' + 2 bits -> values 0..3
    decoder = make_int_decoder(7, _encoding_params(0, 2))
    bits = BitReader(bytes([0b00101100]))  # 0 01 | 0 11 -> 1, 3
    assert [decoder(bits, {}) for _ in range(2)] == [1, 3]
    # '10' + k+0 bits with leading 1 -> 1<<(k) + bits
    bits = BitReader(bytes([0b10100000]))  # i=1: reads i+k-1=2 bits '10' -> 4+2
    assert decoder(bits, {}) == 6


def test_byte_array_len_codec():
    from arriba_tpu.io.cram import (BitReader, ExternalStream,
                                    make_byte_decoder, write_itf8)

    # len: EXTERNAL stream 1; values: EXTERNAL stream 2
    len_params = write_itf8(1)
    val_params = write_itf8(2)
    params = (write_itf8(1) + write_itf8(len(len_params)) + len_params
              + write_itf8(1) + write_itf8(len(val_params)) + val_params)
    kind, decoder = make_byte_decoder(4, params)
    assert kind == "array"
    externals = {1: ExternalStream(write_itf8(3) + write_itf8(2)),
                 2: ExternalStream(b"abcde")}
    assert decoder(BitReader(b""), externals) == b"abc"
    assert decoder(BitReader(b""), externals) == b"de"


def test_cram_downstream_mate_resolution(tmp_path):
    """The reader resolves NF-linked (non-detached) mates: flags, mate
    coordinates, and tids reconstructed from the partner record."""
    sam = (
        "@HD\tVN:1.6\tSO:unsorted\n"
        "@SQ\tSN:1\tLN:200\n"
        "p1\t99\t1\t10\t60\t20M\t1\t50\t65\tACGTACGTACGTACGTACGT\t"
        "IIIIIIIIIIIIIIIIIIII\n"
        "p1\t147\t1\t50\t60\t20M\t1\t10\t-65\tACGTACGTACGTACGTACGT\t"
        "IIIIIIIIIIIIIIIIIIII\n")
    (tmp_path / "p.sam").write_text(sam)
    header, records = read_sam_text(str(tmp_path / "p.sam"))
    records = list(records)
    reference = {"1": np.frombuffer(b"A" * 200, np.uint8).copy()}
    write_cram(str(tmp_path / "p.cram"), header, records, reference,
               mate_downstream=True)
    _, parsed = read_cram(str(tmp_path / "p.cram"), reference)
    parsed = list(parsed)
    assert len(parsed) == 2
    for expected, got in zip(records, parsed):
        for attr in ("qname", "flag", "tid", "pos", "mtid", "mpos", "seq"):
            assert getattr(expected, attr) == getattr(got, attr), (
                attr, getattr(expected, attr), getattr(got, attr))
