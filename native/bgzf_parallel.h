/* Parallel BGZF block decompression for the native BAM reader — the
 * counterpart of the reference's hts_set_threads decompression pool
 * (read_chimeric_alignments.cpp:563-565). BGZF files are sequences of
 * independent <=64 KB gzip members, so batches of blocks are inflated
 * concurrently by a small worker group and served to the record parser in
 * order. Non-BGZF inputs fall back to serial zlib. */

#ifndef ARRIBA_TPU_BGZF_PARALLEL_H
#define ARRIBA_TPU_BGZF_PARALLEL_H

#include <zlib.h>

#include "inflate.h"
#if defined(__has_include)
#  if __has_include(<libdeflate.h>)
#    include <libdeflate.h>
#    define ARRIBA_TPU_HAVE_LIBDEFLATE 1
#  endif
#endif

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace bgzf_parallel {

struct Block {
    std::vector<uint8_t> compressed;   /* raw deflate payload */
    std::vector<uint8_t> decompressed;
    uint32_t isize = 0;
    uint32_t crc = 0;                  /* expected CRC32 from the trailer */
    bool ok = true;
};

class Reader {
    FILE *file_ = nullptr;
    int n_threads_;
    std::vector<Block> batch_;
    std::vector<Block> staged_;   /* filled by the prefetch thread */
    std::thread prefetch_;
    bool prefetch_active_ = false;
    size_t batch_index_ = 0;      /* next block to serve */
    size_t cursor_ = 0;           /* offset within current block */
    bool eof_ = false;
    bool saw_eof_marker_ = false;
    std::string error_;           /* nonempty = corruption, not EOF */

    enum HeaderStatus { HEADER_OK, HEADER_EOF, HEADER_ERROR };

    /* Read one BGZF member. Distinguishes a clean end of file (no bytes
     * left at a block boundary) from mid-file corruption or truncation,
     * which sets error_ — the reference relies on htslib's equivalent
     * validation (bgzf.c load_block_from_cache/check_header). */
    HeaderStatus read_block_header(Block &block) {
        uint8_t header[12];
        size_t got = fread(header, 1, 12, file_);
        if (got == 0 && feof(file_))
            return HEADER_EOF;
        if (got != 12) {
            error_ = "truncated BGZF block header";
            return HEADER_ERROR;
        }
        if (header[0] != 0x1f || header[1] != 0x8b || header[2] != 8 ||
            !(header[3] & 4)) {
            error_ = "corrupt BGZF block header (bad gzip magic)";
            return HEADER_ERROR;
        }
        uint16_t xlen;
        memcpy(&xlen, header + 10, 2);
        std::vector<uint8_t> extra(xlen);
        if (fread(extra.data(), 1, xlen, file_) != xlen) {
            error_ = "truncated BGZF extra field";
            return HEADER_ERROR;
        }
        int bsize = -1;
        for (size_t offset = 0; offset + 4 <= extra.size();) {
            uint16_t slen;
            memcpy(&slen, extra.data() + offset + 2, 2);
            if (extra[offset] == 'B' && extra[offset + 1] == 'C' && slen == 2
                && offset + 6 <= extra.size()) {
                uint16_t value;
                memcpy(&value, extra.data() + offset + 4, 2);
                bsize = value;
            }
            offset += 4 + slen;
        }
        if (bsize < 0) {
            error_ = "BGZF block lacks the BC size subfield";
            return HEADER_ERROR;
        }
        long cdata_size = bsize + 1 - 12 - xlen - 8;
        if (cdata_size < 0) {
            error_ = "corrupt BGZF block size";
            return HEADER_ERROR;
        }
        block.compressed.resize(cdata_size);
        if (cdata_size && fread(block.compressed.data(), 1, cdata_size, file_)
                != (size_t)cdata_size) {
            error_ = "truncated BGZF block payload";
            return HEADER_ERROR;
        }
        uint8_t trailer[8];
        if (fread(trailer, 1, 8, file_) != 8) {
            error_ = "truncated BGZF block trailer";
            return HEADER_ERROR;
        }
        memcpy(&block.crc, trailer, 4);
        memcpy(&block.isize, trailer + 4, 4);
        if (block.isize > 65536) {  /* BGZF spec: ISIZE <= 1<<16 */
            error_ = "BGZF block ISIZE exceeds 65536 (corrupt trailer)";
            return HEADER_ERROR;
        }
        return HEADER_OK;
    }

    static bool inflate_block_zlib(Block &block) {
        z_stream stream{};
        if (inflateInit2(&stream, -15) != Z_OK)
            return false;
        stream.next_in = block.compressed.data();
        stream.avail_in = (uInt)block.compressed.size();
        stream.next_out = block.decompressed.data();
        stream.avail_out = block.isize;
        int status = inflate(&stream, Z_FINISH);
        inflateEnd(&stream);
        if (status != Z_STREAM_END || stream.avail_out != 0)
            return false;
        uint32_t crc = (uint32_t)crc32(0L, block.decompressed.data(),
                                       block.isize);
        return crc == block.crc;
    }

    static void inflate_block(Block &block) {
        block.decompressed.resize(block.isize);
        if (block.isize == 0)
            return;
        {
            /* fast clean-room DEFLATE first (native/inflate.h): the CRC
             * check below validates every byte and any failure retries
             * through zlib, so this can only improve throughput */
            size_t n = block.compressed.size();
            block.compressed.resize(n + 8, 0);  /* bit-reader slack */
            static thread_local std::vector<uint8_t> scratch;
            if (scratch.size() < (size_t)block.isize + 32)
                scratch.resize((size_t)block.isize + 32);
            bool ok = fast_inflate::decompress(
                block.compressed.data(), n, n + 8, scratch.data(),
                block.isize);
            block.compressed.resize(n);
            if (ok) {
                uint32_t crc = (uint32_t)crc32(0L, scratch.data(),
                                               block.isize);
                if (crc == block.crc) {
                    memcpy(block.decompressed.data(), scratch.data(),
                           block.isize);
                    block.ok = true;
                    return;
                }
            }
        }
#ifdef ARRIBA_TPU_HAVE_LIBDEFLATE
        /* libdeflate is ~2-3x faster than zlib on 64 KB BGZF members; the
         * block CRC validates every output, and any failure (including a
         * CRC mismatch) retries through zlib before the block is declared
         * corrupt, so this path can only improve throughput, never change
         * results */
        static thread_local struct Scoped {
            struct libdeflate_decompressor *d;
            Scoped() : d(libdeflate_alloc_decompressor()) {}
            ~Scoped() { if (d) libdeflate_free_decompressor(d); }
        } scoped;
        if (scoped.d != nullptr) {
            size_t actual = 0;
            enum libdeflate_result result = libdeflate_deflate_decompress(
                scoped.d, block.compressed.data(), block.compressed.size(),
                block.decompressed.data(), block.isize, &actual);
            if (result == LIBDEFLATE_SUCCESS && actual == block.isize &&
                libdeflate_crc32(0, block.decompressed.data(), block.isize)
                    == block.crc) {
                block.ok = true;
                return;
            }
        }
#endif
        block.ok = inflate_block_zlib(block);
    }

    /* read + inflate one batch of blocks into `out`. All file reads and
     * eof_/error_ mutations happen here — either synchronously from
     * refill() or on the single prefetch thread, never both at once. */
    void fill(std::vector<Block> &out) {
        out.clear();
        if (eof_ || !error_.empty())
            return;
        const size_t batch_blocks = 256;
        for (size_t i = 0; i < batch_blocks; ++i) {
            Block block;
            HeaderStatus status = read_block_header(block);
            if (status == HEADER_ERROR) {
                eof_ = true;
                break;
            }
            if (status == HEADER_EOF) {
                eof_ = true;
                if (!saw_eof_marker_)
                    /* htslib parity: warn — a markerless file cut exactly at
                     * a block boundary is indistinguishable from a legacy
                     * file written without the marker */
                    fprintf(stderr, "WARNING: EOF marker is absent; the "
                                    "input BAM may be truncated\n");
                break;
            }
            if (block.isize == 0) {
                /* candidate EOF marker: terminal iff nothing follows */
                int next = fgetc(file_);
                if (next == EOF) {
                    saw_eof_marker_ = true;
                    eof_ = true;
                    break;
                }
                ungetc(next, file_);
                continue;  /* legal empty mid-file block; contributes no bytes */
            }
            out.push_back(std::move(block));
        }
        if (out.empty())
            return;

        int workers = n_threads_;
        if (workers > (int)out.size())
            workers = (int)out.size();
        if (workers <= 1) {
            for (Block &block : out)
                inflate_block(block);
        } else {
            std::atomic<size_t> next(0);
            std::vector<std::thread> threads;
            threads.reserve(workers);
            for (int t = 0; t < workers; ++t)
                threads.emplace_back([&out, &next]() {
                    for (;;) {
                        size_t index = next.fetch_add(1);
                        if (index >= out.size())
                            return;
                        inflate_block(out[index]);
                    }
                });
            for (std::thread &thread : threads)
                thread.join();
        }
        for (Block &block : out)
            if (!block.ok) {
                error_ = "BGZF block failed decompression or CRC check "
                         "(corrupt file)";
                out.clear();
                return;
            }
    }

    /* double-buffered: serve the staged batch and immediately start
     * prefetching the next one, so block inflation overlaps the caller's
     * record decoding instead of stalling it */
    bool refill() {
        batch_index_ = 0;
        cursor_ = 0;
        if (prefetch_active_) {
            prefetch_.join();
            prefetch_active_ = false;
            batch_.swap(staged_);
        } else {
            fill(batch_);
        }
        if (batch_.empty())
            return false;
        if (!eof_ && error_.empty()) {
            prefetch_active_ = true;
            prefetch_ = std::thread([this]() { fill(staged_); });
        }
        return true;
    }

public:
    Reader(FILE *file, int n_threads)
        : file_(file), n_threads_(n_threads > 0 ? n_threads : 1) {}

    ~Reader() { join_prefetch(); }

    /* settle any in-flight prefetch so error()/eof state is safe to read
     * (early-abort paths inspect error() before destroying the reader) */
    void join_prefetch() {
        if (prefetch_active_) {
            prefetch_.join();
            prefetch_active_ = false;
        }
    }

    /* nonempty after a failed read iff the failure was corruption or
     * truncation rather than a clean end of file */
    const std::string &error() const { return error_; }

    /* probe: true if the stream looks like BGZF (leaves position at 0) */
    static bool is_bgzf(FILE *file) {
        uint8_t header[18];
        size_t got = fread(header, 1, 18, file);
        fseek(file, 0, SEEK_SET);
        if (got < 18)
            return false;
        return header[0] == 0x1f && header[1] == 0x8b && header[2] == 8 &&
               (header[3] & 4) && header[12] == 'B' && header[13] == 'C';
    }

    bool read_exact(void *data, size_t length) {
        uint8_t *out = (uint8_t *)data;
        while (length > 0) {
            if (batch_index_ >= batch_.size()) {
                if (!refill())
                    return false;
            }
            Block &block = batch_[batch_index_];
            size_t available = block.decompressed.size() - cursor_;
            if (available == 0) {
                batch_index_ += 1;
                cursor_ = 0;
                continue;
            }
            size_t take = available < length ? available : length;
            memcpy(out, block.decompressed.data() + cursor_, take);
            cursor_ += take;
            out += take;
            length -= take;
        }
        return true;
    }
};

}  // namespace bgzf_parallel

#endif  /* ARRIBA_TPU_BGZF_PARALLEL_H */
