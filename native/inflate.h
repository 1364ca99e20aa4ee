/* Fast clean-room DEFLATE (RFC 1951) decoder for BGZF block bodies.
 *
 * Why: the BAM path pays one zlib inflate per 64 KB BGZF member; zlib's
 * byte-at-a-time bit reader and two-level tables leave ~2x on the table.
 * This decoder uses the standard fast-inflate recipe: a 64-bit bit buffer
 * refilled 8 bytes at a time, flat 12-bit first-level Huffman tables with
 * a strict canonical bit-by-bit fallback for longer codes, and word-wide
 * match copies into a slack-padded scratch buffer.
 *
 * Safety contract: the caller (bgzf_parallel.h inflate_block) verifies the
 * gzip CRC32 of every output and retries any failure through zlib, so this
 * path can only improve throughput, never change bytes. All input reads
 * come from a caller-padded buffer; all output writes go to a scratch
 * buffer with 16 bytes of slack and are bounds-checked against the
 * declared ISIZE.
 *
 * This is an original implementation written from the DEFLATE
 * specification. */
#pragma once

#include <cstdint>
#include <cstring>

namespace fast_inflate {

constexpr int LITLEN_TABLE_BITS = 12;
constexpr int DIST_TABLE_BITS = 10;
constexpr int MAX_CODE_BITS = 15;

/* length codes 257..285 */
static const uint16_t LENGTH_BASE[29] = {
    3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27, 31, 35, 43, 51,
    59, 67, 83, 99, 115, 131, 163, 195, 227, 258};
static const uint8_t LENGTH_EXTRA[29] = {
    0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4,
    4, 5, 5, 5, 5, 0};
/* distance codes 0..29 */
static const uint32_t DIST_BASE[30] = {
    1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97, 129, 193, 257, 385,
    513, 769, 1025, 1537, 2049, 3073, 4097, 6145, 8193, 12289, 16385,
    24577};
static const uint8_t DIST_EXTRA[30] = {
    0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8, 9, 9, 10,
    10, 11, 11, 12, 12, 13, 13};
/* order of code-length code lengths in a dynamic header */
static const uint8_t CLEN_ORDER[19] = {16, 17, 18, 0, 8, 7, 9, 6, 10, 5,
                                       11, 4, 12, 3, 13, 2, 14, 1, 15};

struct BitReader {
    const uint8_t *in;
    const uint8_t *in_end;    /* true end of the compressed data */
    const uint8_t *in_hard;   /* padded end: reads may touch but results
                                 past in_end must never be believed */
    uint64_t buf = 0;
    int count = 0;
    bool bad = false;  /* bit debt at the stream tail: poisoned */

    void refill() {
        if (count < 0) {  /* truncated/corrupt stream consumed past its
                             end; poison so the caller must fail */
            bad = true;
            count = 0;
            buf = 0;
        }
        /* branchless 8-byte refill (the caller pads >= 8 bytes past
         * in_end): after this count is in [56, 63] until the tail */
        if (in + 8 <= in_hard) {
            uint64_t w;
            std::memcpy(&w, in, 8);
            buf |= w << count;
            in += (63 - count) >> 3;
            count |= 56;
            return;
        }
        while (count <= 56 && in < in_hard) {
            buf |= (uint64_t)(*in++) << count;
            count += 8;
        }
    }
    uint32_t peek(int n) { return (uint32_t)(buf & ((1u << n) - 1)); }
    void consume(int n) { buf >>= n; count -= n; }
    uint32_t bits(int n) {
        if (count < n) refill();
        uint32_t value = peek(n);
        consume(n);
        return value;
    }
    /* true when we've consumed data past the real end (corrupt stream) */
    bool overran() const {
        /* bytes logically consumed = (in - start) - count/8; simpler: the
         * reader has overrun when the bytes it has loaded beyond in_end
         * exceed what is still sitting unconsumed in buf */
        if (bad) return true;
        long long loaded_past = in - in_end;
        if (loaded_past <= 0) return false;
        return loaded_past * 8 > count;
    }
};

constexpr uint32_t F_LIT = 1u << 31;   /* packed-entry: literal */
constexpr uint32_t F_EOB = 1u << 30;   /* packed-entry: end of block */

struct HuffTable {
    /* entry: (symbol << 4) | code_length; 0 = not decodable in one step */
    uint16_t table[1 << LITLEN_TABLE_BITS];
    /* packed fast entries (built for litlen/dist tables only):
     *   literal: F_LIT | (byte << 8) | code_len
     *   EOB:     F_EOB | code_len
     *   length:  (base << 16) | (extra << 8) | code_len   (base <= 258)
     *   dist:    (base << 16) | (extra << 8) | code_len   (base <= 24577)
     *   0 = decode via the strict fallback */
    uint32_t fast[1 << LITLEN_TABLE_BITS];
    /* canonical metadata for the >TABLE_BITS fallback */
    uint16_t count[MAX_CODE_BITS + 1];     /* codes per length */
    uint16_t sorted[288];                  /* symbols by (len, symbol) */
    int table_bits = 0;
    bool ok = false;

    /* mode: 0 = symbol table only (clen), 1 = litlen packed, 2 = dist
     * packed */
    bool build(const uint8_t *lens, int n, int bits, int mode = 0) {
        table_bits = bits;
        ok = false;
        std::memset(count, 0, sizeof(count));
        for (int i = 0; i < n; ++i) {
            if (lens[i] > MAX_CODE_BITS) return false;
            count[lens[i]] += 1;
        }
        if (count[0] == n) return false;     /* no codes at all */
        /* canonical check + first code per length */
        uint32_t code = 0;
        uint32_t first_code[MAX_CODE_BITS + 1] = {0};
        uint16_t offset[MAX_CODE_BITS + 1] = {0};
        int left = 1;
        uint16_t total = 0;
        uint16_t prev_count = 0;  /* count[0] is the UNUSED-symbol tally and
                                     must not shift into the code space */
        for (int len = 1; len <= MAX_CODE_BITS; ++len) {
            left <<= 1;
            left -= count[len];
            if (left < 0) return false;      /* over-subscribed */
            first_code[len] = code = (code + prev_count) << 1;
            prev_count = count[len];
            offset[len] = total;
            total += count[len];
        }
        /* incomplete trees are accepted (the FIXED distance tree itself
         * is incomplete: 30 assigned of 32 five-bit codes, and deflate
         * permits single-code dynamic distance trees). Codes that were
         * never assigned stay zero in the flat table and the strict
         * fallback returns -1, so USING one fails the stream — the same
         * contract zlib implements. */
        (void)left;

        uint16_t next[MAX_CODE_BITS + 1];
        std::memcpy(next, offset, sizeof(next));
        for (int sym = 0; sym < n; ++sym)
            if (lens[sym] != 0) sorted[next[lens[sym]]++] = sym;

        std::memset(table, 0, sizeof(uint16_t) << bits);
        if (mode != 0)
            std::memset(fast, 0, sizeof(uint32_t) << bits);
        uint32_t codes_seen[MAX_CODE_BITS + 1];
        std::memcpy(codes_seen, first_code, sizeof(codes_seen));
        for (int idx = 0; idx < total; ++idx) {
            uint16_t sym = sorted[idx];
            int len = 0;
            /* recover this symbol's length from the offsets */
            for (int l = 1; l <= MAX_CODE_BITS; ++l)
                if (idx >= offset[l] && idx < offset[l] + count[l]) {
                    len = l;
                    break;
                }
            uint32_t c = codes_seen[len]++;
            if (len > bits) continue;        /* fallback path decodes it */
            /* reverse the len-bit code (deflate packs codes MSB-first into
             * an LSB-first stream) */
            uint32_t rev = 0;
            for (int b = 0; b < len; ++b)
                rev |= ((c >> (len - 1 - b)) & 1u) << b;
            uint16_t entry = (uint16_t)((sym << 4) | len);
            uint32_t packed = 0;
            if (mode == 1) {
                if (sym < 256)
                    packed = F_LIT | ((uint32_t)sym << 8) | (uint32_t)len;
                else if (sym == 256)
                    packed = F_EOB | (uint32_t)len;
                else if (sym <= 285)
                    packed = ((uint32_t)LENGTH_BASE[sym - 257] << 16)
                             | ((uint32_t)LENGTH_EXTRA[sym - 257] << 8)
                             | (uint32_t)len;
                /* sym > 285: invalid, stays 0 -> strict fallback fails */
            } else if (mode == 2) {
                if (sym <= 29)
                    packed = (DIST_BASE[sym] << 16)
                             | ((uint32_t)DIST_EXTRA[sym] << 8)
                             | (uint32_t)len;
            }
            for (uint32_t hi = 0; hi < (1u << (bits - len)); ++hi) {
                table[rev | (hi << len)] = entry;
                if (mode != 0)
                    fast[rev | (hi << len)] = packed;
            }
        }
        ok = true;
        return true;
    }

    /* strict bit-by-bit canonical decode (codes longer than table_bits,
     * or any index the flat table could not cover) */
    int decode_slow(BitReader &br) const {
        uint32_t code = 0;
        int idx_base = 0;
        uint32_t first = 0;
        for (int len = 1; len <= MAX_CODE_BITS; ++len) {
            if (br.count < 1) br.refill();
            code = (code << 1) | (br.peek(1));
            br.consume(1);
            int n_here = count[len];
            if ((int)(code - first) < n_here)
                return sorted[idx_base + (code - first)];
            idx_base += n_here;
            first = (first + n_here) << 1;
        }
        return -1;
    }

    int decode(BitReader &br) {
        if (br.count < MAX_CODE_BITS) br.refill();
        uint16_t entry = table[br.peek(table_bits)];
        if (entry != 0) {
            br.consume(entry & 0xF);
            return entry >> 4;
        }
        return decode_slow(br);
    }
};

struct Decoder {
    HuffTable litlen, dist;
    uint8_t fixed_built = 0;
    HuffTable fixed_litlen, fixed_dist;

    bool build_fixed() {
        if (fixed_built) return true;
        uint8_t lens[288];
        for (int i = 0; i < 144; ++i) lens[i] = 8;
        for (int i = 144; i < 256; ++i) lens[i] = 9;
        for (int i = 256; i < 280; ++i) lens[i] = 7;
        for (int i = 280; i < 288; ++i) lens[i] = 8;
        if (!fixed_litlen.build(lens, 288, LITLEN_TABLE_BITS, 1)) return false;
        uint8_t dlens[30];
        for (int i = 0; i < 30; ++i) dlens[i] = 5;
        if (!fixed_dist.build(dlens, 30, DIST_TABLE_BITS, 2)) return false;
        fixed_built = 1;
        return true;
    }

    /* decompress `in[0, in_size)` (with >= 8 readable padding bytes after)
     * into out[0, out_size); returns true on exact-size success */
    bool run(const uint8_t *in, size_t in_size, size_t in_padded,
             uint8_t *out, size_t out_size) {
        BitReader br{in, in + in_size, in + in_padded};
        uint8_t *op = out;
        uint8_t *out_end = out + out_size;

        for (;;) {
            uint32_t bfinal = br.bits(1);
            uint32_t btype = br.bits(2);
            if (btype == 0) {
                /* stored: align to byte, LEN/NLEN, raw copy */
                br.consume(br.count & 7);
                uint32_t len = br.bits(16);
                uint32_t nlen = br.bits(16);
                if ((len ^ 0xFFFF) != nlen) return false;
                if ((size_t)(out_end - op) < len) return false;
                for (uint32_t i = 0; i < len; ++i) {
                    if (br.count < 8) br.refill();
                    *op++ = (uint8_t)br.peek(8);
                    br.consume(8);
                }
            } else {
                HuffTable *lt, *dt;
                if (btype == 1) {
                    if (!build_fixed()) return false;
                    lt = &fixed_litlen;
                    dt = &fixed_dist;
                } else if (btype == 2) {
                    if (!read_dynamic_header(br)) return false;
                    lt = &litlen;
                    dt = &dist;
                } else {
                    return false;
                }
                if (!inflate_block_body(br, *lt, *dt, out, op, out_end))
                    return false;
            }
            if (br.overran()) return false;
            if (bfinal) break;
        }
        return op == out_end && !br.overran();
    }

  private:
    bool read_dynamic_header(BitReader &br) {
        uint32_t hlit = br.bits(5) + 257;
        uint32_t hdist = br.bits(5) + 1;
        uint32_t hclen = br.bits(4) + 4;
        if (hlit > 288 || hdist > 32) return false;
        uint8_t clen_lens[19] = {0};
        for (uint32_t i = 0; i < hclen; ++i)
            clen_lens[CLEN_ORDER[i]] = (uint8_t)br.bits(3);
        HuffTable clen;
        if (!clen.build(clen_lens, 19, 7)) return false;

        uint8_t lens[288 + 32];
        uint32_t total = hlit + hdist;
        uint32_t filled = 0;
        while (filled < total) {
            int sym = clen.decode(br);
            if (sym < 0) return false;
            if (sym < 16) {
                lens[filled++] = (uint8_t)sym;
            } else if (sym == 16) {
                if (filled == 0) return false;
                uint32_t repeat = 3 + br.bits(2);
                uint8_t prev = lens[filled - 1];
                if (filled + repeat > total) return false;
                while (repeat--) lens[filled++] = prev;
            } else if (sym == 17) {
                uint32_t repeat = 3 + br.bits(3);
                if (filled + repeat > total) return false;
                while (repeat--) lens[filled++] = 0;
            } else {
                uint32_t repeat = 11 + br.bits(7);
                if (filled + repeat > total) return false;
                while (repeat--) lens[filled++] = 0;
            }
        }
        if (lens[256] == 0) return false;    /* EOB must be codeable */
        if (!litlen.build(lens, (int)hlit, LITLEN_TABLE_BITS, 1)) return false;
        if (!dist.build(lens + hlit, (int)hdist, DIST_TABLE_BITS, 2))
            return false;
        return true;
    }

    bool inflate_block_body(BitReader &br, HuffTable &lt, HuffTable &dt,
                            uint8_t *out, uint8_t *&op, uint8_t *out_end) {
        /* one refill covers a whole sequence: litlen (<=15) + length extra
         * (<=5) + distance (<=15) + distance extra (<=13) = 48 <= 56 bits,
         * so the hot loop touches the input exactly once per iteration and
         * can emit several literals per refill (<=15 bits each) */
        for (;;) {
            br.refill();
            uint32_t e = lt.fast[br.peek(LITLEN_TABLE_BITS)];
            /* literal run: store-then-decode-next, topping the bit buffer
             * up only when it runs low (refill is one branch + 8-byte
             * load) */
            while (e & F_LIT) {
                br.consume(e & 0xFF);
                if (op >= out_end) return false;
                *op++ = (uint8_t)(e >> 8);
                if (br.count < MAX_CODE_BITS) br.refill();
                e = lt.fast[br.peek(LITLEN_TABLE_BITS)];
            }
            uint32_t length;
            if (e == 0) {
                int sym = lt.decode_slow(br);
                if (sym < 0) return false;
                if (sym < 256) {
                    if (op >= out_end) return false;
                    *op++ = (uint8_t)sym;
                    continue;
                }
                if (sym == 256) break;
                if (sym > 285) return false;
                length = LENGTH_BASE[sym - 257]
                         + br.bits(LENGTH_EXTRA[sym - 257]);
            } else if (e & F_EOB) {
                br.consume(e & 0xFF);
                break;
            } else {
                br.consume(e & 0xFF);
                length = (e >> 16) + br.bits((e >> 8) & 0x1F);
            }
            uint32_t distance;
            {
                if (br.count < MAX_CODE_BITS) br.refill();
                uint32_t de = dt.fast[br.peek(DIST_TABLE_BITS)];
                if (de != 0) {
                    br.consume(de & 0xFF);
                    distance = (de >> 16) + br.bits((de >> 8) & 0x1F);
                } else {
                    int dsym = dt.decode_slow(br);
                    if (dsym < 0 || dsym > 29) return false;
                    distance = DIST_BASE[dsym] + br.bits(DIST_EXTRA[dsym]);
                }
            }
            if ((size_t)(op - out) < distance) return false;
            if ((size_t)(out_end - op) < length) return false;
            const uint8_t *src = op - distance;
            if (distance >= 8) {
                /* word copies; the scratch buffer has >= 16 bytes of slack
                 * past out_end so trailing overrun is harmless */
                uint8_t *dst = op;
                op += length;
                do {
                    uint64_t w;
                    std::memcpy(&w, src, 8);
                    std::memcpy(dst, &w, 8);
                    src += 8;
                    dst += 8;
                } while (dst < op);
            } else {
                uint8_t *dst = op;
                op += length;
                while (dst < op) *dst++ = *src++;
            }
        }
        return true;
    }
};

/* thread-local entry point: returns true and fills out[0, out_size) on
 * success; any failure leaves the caller to retry with zlib. `in` must
 * have at least 8 readable bytes beyond in_size (caller pads). */
inline bool decompress(const uint8_t *in, size_t in_size, size_t in_padded,
                       uint8_t *out, size_t out_size) {
    static thread_local Decoder decoder;
    return decoder.run(in, in_size, in_padded, out, out_size);
}

}  // namespace fast_inflate
