"""CRAM 3.1 codec spec-vectors: rANS Nx16, adaptive arithmetic, and the
name tokeniser (io/cram31.py). htslib-written 3.1 files cannot be obtained
in this environment, so — like the 3.0 rANS-4x8 tests — each decoder is
exercised against a test-local encoder that is its exact structural
inverse per the CRAM 3.1 codecs spec, across every container transform
(ORDER-0/1, X32, PACK, RLE with raw and compressed metadata, STRIPE, CAT,
NOSZ), plus whole-file remix tests that rewrite every block of a CRAM
with the 3.1 methods and require record-identical decoding."""

import struct

import numpy as np
import pytest

from arriba_tpu.io.cram31 import (AdaptiveModel, ByteStream, F_CAT, F_NOSZ,
                                  F_ORDER1, F_PACK, F_RLE, F_STRIPE, F_X32,
                                  _normalise_freqs, arith_decode,
                                  rans4x16_decode, tok3_decode_names)


# ---------------------------------------------------------------------------
# shared writers

def write_uint7(value: int) -> bytes:
    out = bytearray([value & 0x7F])
    value >>= 7
    while value:
        out.append(0x80 | (value & 0x7F))
        value >>= 7
    return bytes(reversed(out))


def write_alphabet(symbols) -> bytes:
    """Inverse of cram31._read_alphabet: ascending symbols, consecutive
    runs encoded as (first, first+1, run_count)."""
    syms = sorted(symbols)
    out = bytearray()
    i = 0
    while i < len(syms):
        run_end = i
        while (run_end + 1 < len(syms)
               and syms[run_end + 1] == syms[run_end] + 1):
            run_end += 1
        out.append(syms[i])
        if run_end > i:
            out.append(syms[i] + 1)      # flags a run
            out.append(run_end - i - 1)  # count after the first two
        i = run_end + 1
    out.append(0)  # terminator
    return bytes(out)


def read_alphabet_roundtrip(symbols):
    from arriba_tpu.io.cram31 import _read_alphabet
    return _read_alphabet(ByteStream(write_alphabet(symbols)))


def test_alphabet_roundtrip():
    cases = [[65], [0], [0, 1, 2, 3], [10, 11, 13], list(range(256)),
             [1, 2, 3, 4, 5, 200], [0, 255], [7], [250, 251, 252, 253, 254, 255]]
    for symbols in cases:
        assert read_alphabet_roundtrip(symbols) == sorted(symbols)


# ---------------------------------------------------------------------------
# rANS Nx16 encoder (test-local exact inverse)

_L = 1 << 15


def _freq_tables(data: bytes, shift: int):
    freqs = [0] * 256
    for b in data:
        freqs[b] += 1
    stored = list(freqs)                 # raw counts go into the stream
    _normalise_freqs(freqs, 1 << shift)  # coder uses the normalized copy
    cums = [0] * 256
    cum = 0
    for s in range(256):
        cums[s] = cum
        cum += freqs[s]
    return stored, freqs, cums


def _rans_words(emit_sequence, shift):
    """Run the rANS state machine over (state_slot, sym, freq, cum) in
    encode order (reverse of decode), returning final states + word
    stream in decode order."""
    states = {}
    words = []
    for slot, freq, cum in emit_sequence:
        x = states.get(slot, _L)
        x_max = ((_L >> shift) << 16) * freq
        while x >= x_max:
            words.append(x & 0xFFFF)
            x >>= 16
        states[slot] = ((x // freq) << shift) + (x % freq) + cum
    return states, bytes(b for w in reversed(words)
                         for b in (w & 0xFF, w >> 8))


def rans4x16_encode_o0(data: bytes, n_states: int = 4) -> bytes:
    """Order-0 body (alphabet + freqs + states + words), without flags."""
    shift = 12
    stored, freqs, cums = _freq_tables(data, shift)
    out = bytearray()
    out += write_alphabet([s for s in range(256) if stored[s]])
    for s in range(256):
        if stored[s]:
            out += write_uint7(stored[s])
    seq = [(i % n_states, freqs[data[i]], cums[data[i]])
           for i in range(len(data) - 1, -1, -1)]
    states, words = _rans_words(seq, shift)
    for j in range(n_states):
        out += struct.pack("<I", states.get(j, _L))
    out += words
    return bytes(out)


def rans4x16_encode_o1(data: bytes, n_states: int = 4, shift: int = 12,
                       compress_table: bool = False) -> bytes:
    """Order-1 body: per-context tables + interleaved segment coding."""
    n = len(data)
    seg = n // n_states
    starts = [j * seg for j in range(n_states)]
    ends = [(j + 1) * seg for j in range(n_states)]
    ends[-1] = n

    # count (ctx, sym) pairs; each segment starts with context 0
    counts = {}
    alphabet = set(data) | {0}
    for j in range(n_states):
        ctx = 0
        for i in range(starts[j], ends[j]):
            counts.setdefault(ctx, [0] * 256)[data[i]] += 1
            ctx = data[i]
    table = bytearray()
    table += write_alphabet(alphabet)
    norm = {}
    cums = {}
    order = sorted(alphabet)
    for ctx in order:
        row = counts.get(ctx, [0] * 256)
        # zero-run compressed row over the alphabet columns
        i = 0
        while i < len(order):
            sym = order[i]
            table += write_uint7(row[sym])
            if row[sym] == 0:
                run = 0
                while (i + 1 + run < len(order)
                       and run < 255 and row[order[i + 1 + run]] == 0):
                    run += 1
                table.append(run)
                i += run
            i += 1
        normalized = list(row)
        _normalise_freqs(normalized, 1 << shift)
        cum_row = [0] * 256
        cum = 0
        for s in range(256):
            cum_row[s] = cum
            cum += normalized[s]
        norm[ctx] = normalized
        cums[ctx] = cum_row

    out = bytearray()
    if compress_table:
        out.append((shift << 4) | 1)
        # raw order-0 4-state body, no container flags (htscodecs framing)
        compressed = rans4x16_encode_o0(bytes(table), 4)
        out += write_uint7(len(table))
        out += write_uint7(len(compressed))
        out += compressed
    else:
        out.append(shift << 4)
        out += table

    # encode order = exact reverse of the decoder's pull order:
    # decoder does seg lockstep rounds (state 0..N-1 each round), then the
    # last state's tail — so encode tail reversed first, then rounds
    # seg-1..0 with states N-1..0
    seq = []
    ctx_of = {}
    for j in range(n_states):
        ctx_of[j] = [0] * (ends[j] - starts[j])
        ctx = 0
        for k, i in enumerate(range(starts[j], ends[j])):
            ctx_of[j][k] = ctx
            ctx = data[i]
    j = n_states - 1
    for i in range(ends[j] - 1, starts[j] + seg - 1, -1):
        k = i - starts[j]
        ctx = ctx_of[j][k]
        sym = data[i]
        seq.append((j, norm[ctx][sym], cums[ctx][sym]))
    for step in range(seg - 1, -1, -1):
        for j in range(n_states - 1, -1, -1):
            i = starts[j] + step
            ctx = ctx_of[j][step]
            sym = data[i]
            seq.append((j, norm[ctx][sym], cums[ctx][sym]))
    states, words = _rans_words(seq, shift)
    for j in range(n_states):
        out += struct.pack("<I", states.get(j, _L))
    out += words
    return bytes(out)


def _pack(data: bytes):
    """Bit-pack when <=16 distinct symbols; returns (meta, packed) or None."""
    symbols = sorted(set(data))
    if len(symbols) > 16:
        return None
    index = {s: i for i, s in enumerate(symbols)}
    n_sym = len(symbols)
    if n_sym <= 1:
        packed = b""
    elif n_sym <= 2:
        packed = bytearray((len(data) + 7) // 8)
        for i, b in enumerate(data):
            packed[i >> 3] |= index[b] << (i & 7)
    elif n_sym <= 4:
        packed = bytearray((len(data) + 3) // 4)
        for i, b in enumerate(data):
            packed[i >> 2] |= index[b] << ((i & 3) << 1)
    else:
        packed = bytearray((len(data) + 1) // 2)
        for i, b in enumerate(data):
            packed[i >> 1] |= index[b] << ((i & 1) << 2)
    meta = bytes([n_sym]) + bytes(symbols) + write_uint7(len(packed))
    return meta, bytes(packed)


def _rle(data: bytes, compress_meta: bool):
    """Run-length encode every symbol observed in a run of >=2."""
    rle_syms = set()
    i = 0
    while i < len(data):
        j = i
        while j + 1 < len(data) and data[j + 1] == data[i]:
            j += 1
        if j > i:
            rle_syms.add(data[i])
        i = j + 1
    if not rle_syms:
        rle_syms = {data[0]} if data else {0}
    meta = bytearray()
    meta.append(len(rle_syms) & 0xFF)  # 256 -> 0
    meta += bytes(sorted(rle_syms))
    literals = bytearray()
    runs = bytearray()
    i = 0
    while i < len(data):
        b = data[i]
        literals.append(b)
        if b in rle_syms:
            run = 0
            while i + 1 + run < len(data) and data[i + 1 + run] == b:
                run += 1
            runs += write_uint7(run)
            i += run
        i += 1
    meta += runs
    header = bytearray()
    if compress_meta:
        header += write_uint7(len(meta) << 1)
        header += write_uint7(len(literals))
        # raw order-0 4-state body, no container flags (htscodecs framing)
        compressed = rans4x16_encode_o0(bytes(meta), 4)
        header += write_uint7(len(compressed))
        header += compressed
    else:
        header += write_uint7((len(meta) << 1) | 1)
        header += write_uint7(len(literals))
        header += bytes(meta)
    return bytes(header), bytes(literals)


def rans4x16_encode(data: bytes, order: int = 0, x32: bool = False,
                    pack: bool = False, rle: bool = False, cat: bool = False,
                    stripe: int = 0, nosz: bool = False,
                    rle_compressed_meta: bool = False,
                    compress_table: bool = False) -> bytes:
    """Full container encoder — the exact inverse of rans4x16_decode."""
    flags = (F_ORDER1 if order else 0) | (F_X32 if x32 else 0) \
        | (F_PACK if pack else 0) | (F_RLE if rle else 0) \
        | (F_CAT if cat else 0) | (F_STRIPE if stripe else 0) \
        | (F_NOSZ if nosz else 0)
    out = bytearray([flags])
    if not nosz:
        out += write_uint7(len(data))

    if stripe:
        n = stripe
        subs = [rans4x16_encode(bytes(data[j::n]), order=order)
                for j in range(n)]
        out.append(n)
        for sub in subs:
            out += write_uint7(len(sub))
        for sub in subs:
            out += sub
        return bytes(out)

    payload = data
    if pack:
        packed = _pack(payload)
        assert packed is not None, "more than 16 symbols; disable pack"
        meta, payload = packed
        out += meta
    if rle:
        header, payload = _rle(payload, rle_compressed_meta)
        out += header

    if len(payload) == 0:
        pass
    elif cat:
        out += payload
    elif order:
        out += rans4x16_encode_o1(payload, 32 if x32 else 4,
                                  compress_table=compress_table)
    else:
        out += rans4x16_encode_o0(payload, 32 if x32 else 4)
    return bytes(out)


# ---------------------------------------------------------------------------
# rANS Nx16 roundtrips

def _corpus():
    rng = np.random.default_rng(31)
    return [
        b"",
        b"A",
        b"ACGTACGTACGT" * 50,
        bytes(rng.integers(65, 69, 4000, dtype=np.uint8)),
        bytes(rng.integers(0, 256, 3000, dtype=np.uint8)),
        b"\x00" * 500,
        bytes(range(256)) * 4,
        b"AAAAAAAAAABBBBBBBBCCCCCCCD" * 40,
        bytes(rng.choice([0, 1], 2048, p=[0.95, 0.05]).astype(np.uint8)),
    ]


@pytest.mark.parametrize("order", [0, 1])
@pytest.mark.parametrize("n_states", [4, 32])
def test_rans4x16_plain_roundtrip(order, n_states):
    for blob in _corpus():
        if order == 1 and len(blob) < n_states * 2:
            continue
        encoded = rans4x16_encode(blob, order=order, x32=(n_states == 32))
        assert rans4x16_decode(encoded) == blob


def test_rans4x16_order1_compressed_table():
    blob = b"the quick brown fox jumps over the lazy dog " * 30
    encoded = rans4x16_encode(blob, order=1, compress_table=True)
    assert rans4x16_decode(encoded) == blob


def test_rans4x16_cat_and_nosz():
    blob = b"literal bytes, any distribution \xff\x00"
    assert rans4x16_decode(rans4x16_encode(blob, cat=True)) == blob
    encoded = rans4x16_encode(blob, cat=True, nosz=True)
    assert rans4x16_decode(encoded, len(blob)) == blob


def test_rans4x16_pack_roundtrip():
    rng = np.random.default_rng(7)
    for n_sym in (1, 2, 3, 4, 7, 16):
        alphabet = bytes(rng.choice(256, n_sym, replace=False).astype(np.uint8))
        blob = bytes(rng.choice(list(alphabet), 999).astype(np.uint8))
        encoded = rans4x16_encode(blob, pack=True)
        assert rans4x16_decode(encoded) == blob


@pytest.mark.parametrize("compressed_meta", [False, True])
def test_rans4x16_rle_roundtrip(compressed_meta):
    blob = b"AAAAAAAAAACCCCCCCCCCCCCGGGGTTTTTTTTTTTTT" * 25 + b"N"
    encoded = rans4x16_encode(blob, rle=True,
                              rle_compressed_meta=compressed_meta)
    assert rans4x16_decode(encoded) == blob


def test_rans4x16_pack_plus_rle():
    blob = (b"\x00" * 40 + b"\x01" * 17 + b"\x02\x03" * 9) * 20
    encoded = rans4x16_encode(blob, pack=True, rle=True)
    assert rans4x16_decode(encoded) == blob


@pytest.mark.parametrize("n", [2, 4])
def test_rans4x16_stripe(n):
    blob = bytes(np.random.default_rng(9).integers(0, 200, 1777,
                                                   dtype=np.uint8))
    encoded = rans4x16_encode(blob, stripe=n)
    assert rans4x16_decode(encoded) == blob


def test_rans4x16_fuzz():
    rng = np.random.default_rng(20260819)
    for trial in range(60):
        size = int(rng.integers(0, 2000))
        spread = int(rng.integers(1, 256))
        blob = bytes(rng.integers(0, spread, size, dtype=np.uint8))
        order = int(rng.integers(0, 2)) if size >= 8 else 0
        kwargs = {}
        if spread <= 16 and rng.random() < 0.5:
            kwargs["pack"] = True
        if rng.random() < 0.3:
            kwargs["rle"] = True
            kwargs["rle_compressed_meta"] = bool(rng.random() < 0.5)
        encoded = rans4x16_encode(blob, order=order, **kwargs)
        assert rans4x16_decode(encoded) == blob, (trial, size, spread, kwargs)


# ---------------------------------------------------------------------------
# adaptive arithmetic coder

class RangeEncoder:
    """LZMA-style carry-propagating range encoder, the inverse of
    cram31.RangeDecoder (the stream leads with the initial zero cache
    byte, which the decoder's 5-byte priming consumes)."""

    def __init__(self):
        self.low = 0
        self.range = 0xFFFFFFFF
        self.cache = 0
        self.cache_size = 1
        self.out = bytearray()

    def _shift_low(self):
        if self.low < 0xFF000000 or self.low > 0xFFFFFFFF:
            carry = self.low >> 32
            temp = self.cache
            while True:
                self.out.append((temp + carry) & 0xFF)
                temp = 0xFF
                self.cache_size -= 1
                if self.cache_size == 0:
                    break
            self.cache = (self.low >> 24) & 0xFF
        self.cache_size += 1
        self.low = (self.low << 8) & 0xFFFFFFFF

    def encode(self, cum: int, freq: int, total: int):
        self.range //= total
        self.low += cum * self.range
        self.range *= freq
        while self.range < (1 << 24):
            self.range <<= 8
            self._shift_low()

    def finish(self) -> bytes:
        for _ in range(5):
            self._shift_low()
        return bytes(self.out)


def model_encode(model: AdaptiveModel, rc: RangeEncoder, sym: int):
    """Mirror of AdaptiveModel.decode for the encode direction."""
    i = model.syms.index(sym)
    cum = sum(model.freqs[:i])
    rc.encode(cum, model.freqs[i], model.total)
    model.freqs[i] += 16
    model.total += 16
    if i > 0 and model.freqs[i] > model.freqs[i - 1]:
        model.freqs[i], model.freqs[i - 1] = \
            model.freqs[i - 1], model.freqs[i]
        model.syms[i], model.syms[i - 1] = model.syms[i - 1], model.syms[i]
    if model.total > (1 << 16) - 17:
        total = 0
        for k in range(len(model.freqs)):
            model.freqs[k] -= model.freqs[k] >> 1
            total += model.freqs[k]
        model.total = total


def arith_encode(data: bytes, order: int = 0, cat: bool = False,
                 ext: bool = False, pack: bool = False,
                 stripe: int = 0, nosz: bool = False) -> bytes:
    from arriba_tpu.io.cram31 import F_EXT
    flags = (F_ORDER1 if order else 0) | (F_CAT if cat else 0) \
        | (F_EXT if ext else 0) | (F_PACK if pack else 0) \
        | (F_STRIPE if stripe else 0) | (F_NOSZ if nosz else 0)
    out = bytearray([flags])
    if not nosz:
        out += write_uint7(len(data))
    if stripe:
        n = stripe
        subs = [arith_encode(bytes(data[j::n]), order=order)
                for j in range(n)]
        out.append(n)
        for sub in subs:
            out += write_uint7(len(sub))
        for sub in subs:
            out += sub
        return bytes(out)
    payload = data
    if pack:
        packed = _pack(payload)
        assert packed is not None
        meta, payload = packed
        out += meta
    if len(payload) == 0:
        return bytes(out)
    if ext:
        import bz2
        out += bz2.compress(bytes(payload))
        return bytes(out)
    if cat:
        out += payload
        return bytes(out)
    rc = RangeEncoder()
    if order:
        models = [AdaptiveModel(256) for _ in range(256)]
        last = 0
        for b in payload:
            model_encode(models[last], rc, b)
            last = b
    else:
        model = AdaptiveModel(256)
        for b in payload:
            model_encode(model, rc, b)
    out += rc.finish()
    return bytes(out)


@pytest.mark.parametrize("order", [0, 1])
def test_arith_roundtrip(order):
    for blob in _corpus():
        encoded = arith_encode(blob, order=order)
        assert arith_decode(encoded) == blob


def test_arith_transforms():
    blob = b"GATTACA" * 123
    assert arith_decode(arith_encode(blob, cat=True)) == blob
    assert arith_decode(arith_encode(blob, ext=True)) == blob
    assert arith_decode(arith_encode(blob, pack=True)) == blob
    assert arith_decode(arith_encode(blob, stripe=4)) == blob
    encoded = arith_encode(blob, nosz=True)
    assert arith_decode(encoded, len(blob)) == blob


def test_arith_fuzz():
    rng = np.random.default_rng(612)
    for trial in range(25):
        size = int(rng.integers(0, 1200))
        spread = int(rng.integers(1, 256))
        blob = bytes(rng.integers(0, spread, size, dtype=np.uint8))
        order = int(rng.integers(0, 2))
        encoded = arith_encode(blob, order=order)
        assert arith_decode(encoded) == blob, (trial, size, spread, order)


# ---------------------------------------------------------------------------
# name tokeniser

T_TYPE, T_STRING, T_CHAR, T_DIGITS0, T_DZLEN, T_DUP, T_DIFF = range(7)
T_DIGITS, T_DELTA, T_DELTA0, T_MATCH, T_NOP, T_END = range(7, 13)


def _tokenize(name: bytes):
    """Split into alternating non-digit / digit tokens."""
    tokens = []
    i = 0
    while i < len(name):
        j = i
        if name[i:i + 1].isdigit():
            while j < len(name) and name[j:j + 1].isdigit():
                j += 1
        else:
            while j < len(name) and not name[j:j + 1].isdigit():
                j += 1
        tokens.append(name[i:j])
        i = j
    return tokens


def tok3_encode_names(names, use_arith: bool = False) -> bytes:
    """Test-local name tokeniser encoder (inverse of tok3_decode_names):
    every name is encoded against its immediate predecessor."""
    streams = {}

    def stream(pos, ttype):
        return streams.setdefault(pos, {}).setdefault(ttype, bytearray())

    prev_tokens = None
    token_lists = []
    for n, name in enumerate(names):
        tokens = _tokenize(name)
        if prev_tokens is not None and tokens == prev_tokens:
            stream(0, T_TYPE).append(T_DUP)
            stream(0, T_DUP).extend(struct.pack("<I", 0))
            token_lists.append(tokens)
            continue
        stream(0, T_TYPE).append(T_DIFF)
        stream(0, T_DIFF).extend(struct.pack("<I", 0))
        for p, token in enumerate(tokens, start=1):
            ref = (prev_tokens[p - 1]
                   if prev_tokens is not None and p - 1 < len(prev_tokens)
                   else None)
            if ref == token:
                stream(p, T_TYPE).append(T_MATCH)
            elif token.isdigit() and token[0:1] != b"0" and int(token) < 1 << 32:
                value = int(token)
                if (ref is not None and ref.isdigit()
                        and ref[0:1] != b"0" and 0 <= value - int(ref) < 256):
                    stream(p, T_TYPE).append(T_DELTA)
                    stream(p, T_DELTA).append(value - int(ref))
                else:
                    stream(p, T_TYPE).append(T_DIGITS)
                    stream(p, T_DIGITS).extend(struct.pack("<I", value))
            elif (token.isdigit() and len(token) < 256
                  and int(token) < 1 << 32):
                stream(p, T_TYPE).append(T_DIGITS0)
                stream(p, T_DIGITS0).extend(struct.pack("<I", int(token)))
                stream(p, T_DZLEN).append(len(token))
            elif len(token) == 1:
                stream(p, T_TYPE).append(T_CHAR)
                stream(p, T_CHAR).append(token[0])
            else:
                stream(p, T_TYPE).append(T_STRING)
                stream(p, T_STRING).extend(token + b"\x00")
        stream(len(tokens) + 1, T_TYPE).append(T_END)
        prev_tokens = tokens
        token_lists.append(tokens)

    ulen = sum(len(n) + 1 for n in names)
    out = bytearray()
    out += struct.pack("<I", ulen)
    out += struct.pack("<I", len(names))
    out.append(1 if use_arith else 0)
    for pos in sorted(streams):
        first = True
        for ttype in sorted(streams[pos]):
            payload = bytes(streams[pos][ttype])
            if use_arith:
                compressed = arith_encode(payload, order=0)
            else:
                compressed = rans4x16_encode(payload, order=0)
            out.append(ttype | (0x80 if first else 0))
            out += write_uint7(len(compressed))
            out += compressed
            first = False
    return bytes(out)


NAME_SETS = [
    [b"read1", b"read2", b"read3"],
    [b"read1", b"read1", b"read1"],                        # DUP chain
    [b"A00111:67:H3M5YDSXX:1:1101:1000:1016",
     b"A00111:67:H3M5YDSXX:1:1101:1000:1017",              # DELTA
     b"A00111:67:H3M5YDSXX:1:1101:1001:1000",
     b"A00111:67:H3M5YDSXX:1:1101:1001:1000"],             # DUP
    [b"f0", b"f1", b"f2", b"f0"],
    [b"SRR123.0007", b"SRR123.0008", b"SRR124.1"],         # DIGITS0
    [b"x" * 40 + b"9" * 12, b"y", b"x"],                   # long tokens
]


@pytest.mark.parametrize("use_arith", [False, True])
@pytest.mark.parametrize("names", NAME_SETS)
def test_tok3_roundtrip(names, use_arith):
    blob = tok3_encode_names(names, use_arith=use_arith)
    expected = b"\x00".join(names) + b"\x00"
    assert tok3_decode_names(blob, len(expected)) == expected


def test_tok3_fuzz():
    rng = np.random.default_rng(8141)
    for trial in range(20):
        n = int(rng.integers(1, 40))
        names = []
        for i in range(n):
            kind = int(rng.integers(0, 3))
            if kind == 0:
                names.append(b"inst:%d:%d:%d" % tuple(
                    rng.integers(0, 10000, 3)))
            elif kind == 1 and names:
                names.append(names[-1])
            else:
                names.append(bytes(rng.choice(
                    list(b"abcXYZ0123456789_."), int(rng.integers(1, 25)))
                    .astype(np.uint8)))
        blob = tok3_encode_names(names)
        expected = b"\x00".join(names) + b"\x00"
        assert tok3_decode_names(blob, len(expected)) == expected, trial


# ---------------------------------------------------------------------------
# fqzcomp quality codec

from arriba_tpu.io.cram31 import (FQZ_GFLAG_DO_REV, FQZ_GFLAG_HAVE_STAB,
                                  FQZ_GFLAG_MULTI_PARAM, FQZ_PFLAG_DO_DEDUP,
                                  FQZ_PFLAG_DO_LEN, FQZ_PFLAG_DO_SEL,
                                  FQZ_PFLAG_HAVE_DTAB, FQZ_PFLAG_HAVE_PTAB,
                                  FQZ_PFLAG_HAVE_QMAP, FQZ_PFLAG_HAVE_QTAB,
                                  fqzcomp_decode)


def _fqz_write_array(values) -> bytes:
    """Inverse of cram31._fqz_read_array: run lengths of ascending values
    0,1,2,... with 255-extension."""
    out = bytearray()
    value = 0
    i = 0
    n = len(values)
    while i < n or value <= (values[-1] if n else -1):
        run = 0
        while i < n and values[i] == value:
            run += 1
            i += 1
        while run >= 255:
            out.append(255)
            run -= 255
        out.append(run)
        value += 1
        if i >= n:
            break
    return bytes(out)


def test_fqz_array_roundtrip():
    from arriba_tpu.io.cram31 import ByteStream, _fqz_read_array
    cases = [[0] * 256,
             [min(i // 16, 15) for i in range(256)],
             [0] * 300 + [1] * 724,
             [i // 100 for i in range(1024)]]
    for values in cases:
        blob = _fqz_write_array(values)
        assert _fqz_read_array(ByteStream(blob), len(values)) == values


def fqz_encode(records, qshift=5, qbits=9, qloc=7, ploc=0, dloc=16,
               do_len=True, do_dedup=False, do_rev=None, use_ptab=True,
               use_dtab=False, use_qmap=False) -> bytes:
    """Test-local fqzcomp encoder, the exact inverse of fqzcomp_decode.
    `records` is a list of (quals: bytes, reversed: bool) or plain bytes."""
    recs = [(r, False) if isinstance(r, (bytes, bytearray)) else r
            for r in records]
    have_rev = any(rev for _, rev in recs) if do_rev is None else do_rev

    syms = sorted({q for quals, _ in recs for q in quals} | {0})
    if use_qmap:
        qmap = syms                       # decoded symbol i -> qmap[i]
        sym_to_code = {s: i for i, s in enumerate(qmap)}
        max_sym = len(qmap) - 1
    else:
        qmap = None
        sym_to_code = None
        max_sym = max(syms)

    pflags = 0
    if do_dedup:
        pflags |= FQZ_PFLAG_DO_DEDUP
    if do_len:
        pflags |= FQZ_PFLAG_DO_LEN
    if use_qmap:
        pflags |= FQZ_PFLAG_HAVE_QMAP
    if use_ptab:
        pflags |= FQZ_PFLAG_HAVE_PTAB
    if use_dtab:
        pflags |= FQZ_PFLAG_HAVE_DTAB
    qtab = list(range(256))
    ptab = [min(p // 32, 15) for p in range(1024)] if use_ptab else None
    dtab = [min(d, 15) for d in range(256)] if use_dtab else None

    out = bytearray()
    out.append(5)                      # vers
    gflags = FQZ_GFLAG_DO_REV if have_rev else 0
    out.append(gflags)
    context0 = 0
    out += struct.pack("<H", context0)
    out.append(pflags)
    out.append(max_sym)
    out.append((qbits << 4) | qshift)
    out.append((qloc << 4) | 0)        # sloc unused (single param)
    out.append((ploc << 4) | (dloc & 15))
    if use_qmap:
        out += bytes(qmap)
    if use_ptab:
        out += _fqz_write_array(ptab)
    if use_dtab:
        out += _fqz_write_array(dtab)

    from arriba_tpu.io.cram31 import AdaptiveModel, _LazyModels
    rc = RangeEncoder()
    qual_models = _LazyModels(max_sym + 1)
    len_models = [AdaptiveModel(256) for _ in range(4)]
    rev_model = AdaptiveModel(2)
    dup_model = AdaptiveModel(2)

    last_len = 0
    prev = None
    for quals, rev in recs:
        if do_len or last_len == 0:
            for b in range(4):
                model_encode(len_models[b], rc, (len(quals) >> (8 * b)) & 0xFF)
            last_len = len(quals)
        if have_rev:
            model_encode(rev_model, rc, 1 if rev else 0)
        if do_dedup:
            dup = prev is not None and quals == prev
            model_encode(dup_model, rc, 1 if dup else 0)
            if dup:
                prev = quals
                continue
        qctx = 0
        prevq = 0
        delta = 0
        p = len(quals)
        ctx = context0
        for q_raw in quals:
            q = sym_to_code[q_raw] if use_qmap else q_raw
            model_encode(qual_models[ctx], rc, q)
            qctx = ((qctx << qshift) + qtab[q]) & 0xFFFFFFFF
            ctx = (qctx & ((1 << qbits) - 1)) << qloc
            if ptab is not None:
                ctx += ptab[min(1023, p)] << ploc
            if dtab is not None:
                ctx += dtab[min(255, delta)] << dloc
            ctx &= 0xFFFF
            p -= 1
            delta += 1 if prevq != q else 0
            prevq = q
        prev = quals
    out += rc.finish()
    return bytes(out)


def _expected_quals(records):
    parts = []
    for r in records:
        quals, rev = (r, False) if isinstance(r, (bytes, bytearray)) else r
        parts.append(bytes(quals[::-1]) if rev else bytes(quals))
    return b"".join(parts)


def test_fqzcomp_roundtrip_basic():
    rng = np.random.default_rng(77)
    records = [bytes((rng.integers(0, 40, 100)).astype(np.uint8))
               for _ in range(25)]
    blob = fqz_encode(records)
    expected = _expected_quals(records)
    assert fqzcomp_decode(blob, len(expected)) == expected


def test_fqzcomp_fixed_length_stream():
    rng = np.random.default_rng(3)
    records = [bytes((rng.integers(0, 45, 60)).astype(np.uint8))
               for _ in range(15)]
    blob = fqz_encode(records, do_len=False)
    expected = _expected_quals(records)
    assert fqzcomp_decode(blob, len(expected)) == expected


def test_fqzcomp_dedup_and_rev():
    rng = np.random.default_rng(8)
    base = bytes((rng.integers(0, 40, 80)).astype(np.uint8))
    records = [(base, False), (base, False), (base, True),
               (bytes((rng.integers(0, 40, 80)).astype(np.uint8)), True)]
    blob = fqz_encode(records, do_dedup=True)
    expected = _expected_quals(records)
    assert fqzcomp_decode(blob, len(expected)) == expected


def test_fqzcomp_qmap_and_dtab():
    rng = np.random.default_rng(12)
    # few distinct symbols spread widely -> qmap compresses the symbol space
    alphabet = np.array([2, 12, 25, 38], np.uint8)
    records = [bytes(rng.choice(alphabet, 90).astype(np.uint8))
               for _ in range(12)]
    blob = fqz_encode(records, use_qmap=True, use_dtab=True, dloc=13)
    expected = _expected_quals(records)
    assert fqzcomp_decode(blob, len(expected)) == expected


def test_fqzcomp_fuzz():
    rng = np.random.default_rng(5150)
    for trial in range(10):
        n = int(rng.integers(1, 20))
        records = []
        for _ in range(n):
            ln = int(rng.integers(1, 150))
            spread = int(rng.integers(2, 60))
            records.append((bytes(rng.integers(0, spread, ln)
                                  .astype(np.uint8)),
                            bool(rng.random() < 0.3)))
        blob = fqz_encode(records, do_dedup=bool(rng.random() < 0.5))
        expected = _expected_quals(records)
        assert fqzcomp_decode(blob, len(expected)) == expected, trial


# ---------------------------------------------------------------------------
# whole-file remix with 3.1 methods

from arriba_tpu.io.cram import METHOD_RANS4X16, METHOD_ARITH, METHOD_TOK3
from .test_cram_interop import _decode_all, _sample_cram, remix_cram
import tests.test_cram_interop as interop


def _recompress31(method, data):
    if method == METHOD_RANS4X16:
        order = 1 if len(data) >= 64 else 0
        return rans4x16_encode(data, order=order)
    if method == METHOD_ARITH:
        return arith_encode(data, order=1 if len(data) >= 64 else 0)
    if method == METHOD_TOK3:
        names = data.split(b"\x00")
        assert names[-1] == b""
        return tok3_encode_names(names[:-1])
    return interop._recompress(method, data)


@pytest.mark.parametrize("method,name", [
    (METHOD_RANS4X16, "rans4x16"),
    (METHOD_ARITH, "arith"),
])
def test_remixed_31_blocks_decode_identically(tmp_path, method, name,
                                              monkeypatch):
    monkeypatch.setattr(interop, "_recompress", _recompress31)
    path, genome = _sample_cram(tmp_path)
    expected = _decode_all(path, genome)
    remixed = tmp_path / f"remixed_{name}.cram"
    n = remix_cram(str(path), str(remixed), lambda i: method)
    assert n > 3
    assert _decode_all(remixed, genome) == expected


def test_remixed_tok3_names_block(tmp_path, monkeypatch):
    """Route the read-names block through the tokeniser and everything else
    through rans4x16, like htslib's 3.1 'normal' profile."""
    path, genome = _sample_cram(tmp_path)
    expected = _decode_all(path, genome)

    # discovery pass: record each block's decoded payload by remix index
    seen = {}
    counter = [0]

    def spy_recompress(method, data):
        seen[counter[0]] = bytes(data)
        counter[0] += 1
        return interop.__dict__["_recompress_orig"](method, data)

    interop.__dict__.setdefault("_recompress_orig", _recompress31)
    monkeypatch.setattr(interop, "_recompress", spy_recompress)
    remix_cram(str(path), str(tmp_path / "discovery.cram"),
               lambda i: METHOD_RANS4X16)

    # names blocks: '\0'-separated "readN" tokens from the fixture
    names_blocks = {
        i for i, data in seen.items()
        if data.startswith(b"read") and data.endswith(b"\x00")
        and data.count(b"\x00") >= 100
        and all(part.startswith(b"read")
                for part in data.split(b"\x00")[:-1])}
    assert names_blocks, "no names block identified"

    monkeypatch.setattr(interop, "_recompress", _recompress31)
    remixed = tmp_path / "remixed_tok3.cram"
    remix_cram(str(path), str(remixed),
               lambda i: METHOD_TOK3 if i in names_blocks
               else METHOD_RANS4X16)
    assert _decode_all(remixed, genome) == expected


# ---------------------------------------------------------------------------
# native codec fast path (native/codecs.cpp) vs the Python reference

def test_native_codecs_match_python_reference():
    pytest.importorskip("arriba_tpu._native")
    from arriba_tpu import _native
    if not hasattr(_native, "codec_rans4x8"):
        pytest.skip("extension built without codecs")
    from arriba_tpu.io.cram import _rans_decode_py, rans_decode
    from arriba_tpu.io.cram31 import _rans4x16_decode_py
    from .test_cram_interop import rans0_encode

    rng = np.random.default_rng(99)
    corpus = _corpus() + [bytes(rng.integers(0, 256, 50000, dtype=np.uint8))]
    for blob in corpus:
        enc = rans0_encode(blob)
        assert _native.codec_rans4x8(enc) == _rans_decode_py(enc) == blob
    for blob in corpus:
        for kwargs in ({}, {"order": 1}, {"pack": False, "rle": True},
                       {"stripe": 2}, {"cat": True}):
            if kwargs.get("order") == 1 and len(blob) < 8:
                continue
            enc = rans4x16_encode(blob, **kwargs)
            assert _native.codec_rans4x16(enc, len(blob)) == \
                _rans4x16_decode_py(enc) == blob
    # NOSZ + X32 paths
    blob = corpus[2]
    enc = rans4x16_encode(blob, nosz=True)
    assert _native.codec_rans4x16(enc, len(blob)) == blob
    enc = rans4x16_encode(blob, order=1, x32=True)
    assert _native.codec_rans4x16(enc, len(blob)) == blob


def fqz_encode_multiparam(records_with_sel, param_defs) -> bytes:
    """Multi-parameter-set fqzcomp encoder: records_with_sel is a list of
    (quals, selector); param_defs is a list of dicts with per-set qshift/
    qbits/qloc/ploc and use_qtab. Exercises GFLAG_MULTI_PARAM +
    GFLAG_HAVE_STAB + PFLAG_DO_SEL + PFLAG_HAVE_QTAB decode branches."""
    from arriba_tpu.io.cram31 import (FQZ_GFLAG_HAVE_STAB,
                                      FQZ_GFLAG_MULTI_PARAM,
                                      FQZ_PFLAG_HAVE_QTAB, AdaptiveModel,
                                      _LazyModels)

    n_param = len(param_defs)
    max_sel = n_param - 1
    stab = [min(s, max_sel) for s in range(256)]

    out = bytearray()
    out.append(5)  # vers
    out.append(FQZ_GFLAG_MULTI_PARAM | FQZ_GFLAG_HAVE_STAB)
    out.append(n_param)
    out.append(max_sel)
    out += _fqz_write_array(stab)

    max_sym = max(max(q for quals, _ in records_with_sel for q in quals), 0)
    qtabs = []
    ptab = [min(p // 32, 15) for p in range(1024)]
    for pd in param_defs:
        pflags = FQZ_PFLAG_DO_LEN | FQZ_PFLAG_DO_SEL | FQZ_PFLAG_HAVE_PTAB
        use_qtab = pd.get("use_qtab", False)
        if use_qtab:
            pflags |= FQZ_PFLAG_HAVE_QTAB
        out += struct.pack("<H", 0)           # initial context
        out.append(pflags)
        out.append(max_sym)
        out.append((pd.get("qbits", 9) << 4) | pd.get("qshift", 5))
        out.append((pd.get("qloc", 7) << 4) | pd.get("sloc", 13))
        out.append((pd.get("ploc", 0) << 4) | 0)
        if use_qtab:
            qtab = [min(q // 2, 127) for q in range(256)]
            out += _fqz_write_array(qtab)
            qtabs.append(qtab)
        else:
            qtabs.append(list(range(256)))
        out += _fqz_write_array(ptab)

    rc = RangeEncoder()
    qual_models = _LazyModels(max_sym + 1)
    len_models = [AdaptiveModel(256) for _ in range(4)]
    sel_model = AdaptiveModel(max_sel + 1)
    for quals, sel in records_with_sel:
        model_encode(sel_model, rc, sel)
        pd = param_defs[stab[sel]]
        qtab = qtabs[stab[sel]]
        for b in range(4):
            model_encode(len_models[b], rc, (len(quals) >> (8 * b)) & 0xFF)
        qctx = 0
        prevq = 0
        delta = 0
        p = len(quals)
        ctx = 0
        for q in quals:
            model_encode(qual_models[ctx], rc, q)
            qctx = ((qctx << pd.get("qshift", 5)) + qtab[q]) & 0xFFFFFFFF
            ctx = (qctx & ((1 << pd.get("qbits", 9)) - 1)) << pd.get("qloc", 7)
            ctx += ptab[min(1023, p)] << pd.get("ploc", 0)
            ctx += sel << pd.get("sloc", 13)
            ctx &= 0xFFFF
            p -= 1
            delta += 1 if prevq != q else 0
            prevq = q
    out += rc.finish()
    return bytes(out)


def test_fqzcomp_multiparam_selector_qtab():
    """Two parameter sets selected per record through the selector table,
    one with an explicit quality-quantizer table (the archive-profile
    decode branches: MULTI_PARAM, HAVE_STAB, DO_SEL, HAVE_QTAB)."""
    rng = np.random.default_rng(21)
    records = []
    for i in range(16):
        ln = int(rng.integers(20, 90))
        records.append((bytes(rng.integers(0, 45, ln).astype(np.uint8)),
                        i % 2))
    blob = fqz_encode_multiparam(
        records,
        [{"qshift": 5, "qbits": 9, "qloc": 7, "ploc": 0, "sloc": 13},
         {"qshift": 4, "qbits": 8, "qloc": 6, "ploc": 0, "sloc": 14,
          "use_qtab": True}])
    expected = b"".join(q for q, _ in records)
    assert fqzcomp_decode(blob, len(expected)) == expected


def test_codec_decoders_survive_malformed_input():
    """Random garbage and bit-flipped valid streams must raise cleanly
    (ValueError/IndexError/KeyError/struct.error) from both the Python and
    native decoders — never crash or hang. CRAM blocks are untrusted
    external input."""
    import itertools

    from arriba_tpu.io.cram import _rans_decode_py, rans_decode
    from arriba_tpu.io.cram31 import (_rans4x16_decode_py, arith_decode,
                                      fqzcomp_decode, tok3_decode_names)
    try:
        from arriba_tpu import _native
        native_fns = []  # covered through rans_decode's guarded entry
        native16 = ([lambda d: _native.codec_rans4x16(d, 256)]
                    if hasattr(_native, "codec_rans4x16") else [])
    except ImportError:
        native_fns, native16 = [], []

    # small out_len keeps the adaptive decoders' worst case bounded (a
    # garbage stream decodes up to out_len symbols before failing)
    decoders = ([lambda d: rans_decode(d, 256)] + native_fns
                + [lambda d: _rans4x16_decode_py(d, 256)] + native16
                + [lambda d: arith_decode(d, 256),
                   lambda d: tok3_decode_names(d, 256),
                   lambda d: fqzcomp_decode(d, 256)])

    rng = np.random.default_rng(4242)
    blobs = [bytes(rng.integers(0, 256, int(rng.integers(1, 400)),
                                dtype=np.uint8)) for _ in range(24)]
    # bit-flipped valid streams hit deeper parse states than pure noise
    base = rans4x16_encode(b"ACGTACGT" * 64, order=1, rle=True)
    for _ in range(24):
        mutated = bytearray(base)
        for _ in range(int(rng.integers(1, 4))):
            mutated[int(rng.integers(0, len(mutated)))] ^= \
                1 << int(rng.integers(0, 8))
        blobs.append(bytes(mutated))

    survived = 0
    for blob, decode in itertools.product(blobs, decoders):
        try:
            decode(blob)
            survived += 1
        except Exception:  # noqa: BLE001 - any clean Python exception is fine
            pass
    assert survived >= 0  # reaching here at all is the assertion
