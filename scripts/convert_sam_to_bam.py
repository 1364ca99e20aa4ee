"""Minimal streaming SAM -> BAM converter (BGZF, unsorted) for bench/test
inputs in environments without samtools. Quality strings are written as
0xFF (missing) like STAR's chimeric records; tags i/Z only."""
import struct, sys, zlib
import numpy as np

if len(sys.argv) != 3:
    print("usage: convert_sam_to_bam.py in.sam out.bam", file=sys.stderr)
    raise SystemExit(1)
IN, OUT = sys.argv[1], sys.argv[2]
NT16 = "=ACMGRSVTWYHKDBN"
LUT = np.full(256, 15, np.uint8)
for i, c in enumerate(NT16):
    LUT[ord(c)] = i

names, lens = [], []
body_buf = bytearray()
out_f = open(OUT, "wb")

def flush_bgzf(buf, final=False):
    block_size = 65280
    out = bytearray()
    n_full = len(buf) // block_size if not final else (len(buf) + block_size - 1) // block_size
    consumed = 0
    for k in range(n_full):
        chunk = bytes(buf[k*block_size:(k+1)*block_size])
        if not chunk: break
        comp = zlib.compressobj(6, zlib.DEFLATED, -15)
        cdata = comp.compress(chunk) + comp.flush()
        bsize = len(cdata) + 25
        out += b"\x1f\x8b\x08\x04\x00\x00\x00\x00\x00\xff" + struct.pack("<H", 6)
        out += b"BC" + struct.pack("<HH", 2, bsize) + cdata
        out += struct.pack("<II", zlib.crc32(chunk), len(chunk))
        consumed += len(chunk)
    out_f.write(out)
    del buf[:consumed]

hdr_lines = []
tid_of = {}
records = 0
with open(IN) as fh:
    for line in fh:
        if line.startswith("@"):
            hdr_lines.append(line)
            if line.startswith("@SQ"):
                f = dict(x.split(":", 1) for x in line.rstrip("\n").split("\t")[1:])
                tid_of[f["SN"]] = len(names)
                names.append(f["SN"]); lens.append(int(f["LN"]))
            continue
        if not body_buf and records == 0:
            text = "".join(hdr_lines).encode()
            body_buf += b"BAM\x01" + struct.pack("<i", len(text) + 1) + text + b"\x00"
            body_buf += struct.pack("<i", len(names))
            for nm, ln in zip(names, lens):
                enc = nm.encode() + b"\x00"
                body_buf += struct.pack("<i", len(enc)) + enc + struct.pack("<i", ln)
        p = line.rstrip("\n").split("\t")
        qname = p[0].encode() + b"\x00"
        flag = int(p[1]); tid = tid_of.get(p[2], -1); pos = int(p[3]) - 1
        mapq = int(p[4])
        cig = []
        num = 0
        OPS = {"M":0,"I":1,"D":2,"N":3,"S":4,"H":5,"P":6,"=":7,"X":8}
        if p[5] != "*":
            for ch in p[5]:
                if ch.isdigit(): num = num*10 + ord(ch) - 48
                else: cig.append((num << 4) | OPS[ch]); num = 0
        mtid = tid if p[6] == "=" else tid_of.get(p[6], -1)
        mpos = int(p[7]) - 1; tlen = int(p[8])
        seq = p[9]
        codes = LUT[np.frombuffer(seq.encode(), np.uint8)]
        if len(codes) % 2: codes = np.concatenate([codes, np.zeros(1, np.uint8)])
        seq4 = ((codes[0::2] << 4) | codes[1::2]).tobytes()
        aux = b""
        for tag in p[11:]:
            name, typ, val = tag.split(":", 2)
            if typ == "i": aux += name.encode() + b"i" + struct.pack("<i", int(val))
            else: aux += name.encode() + b"Z" + val.encode() + b"\x00"
        body = struct.pack("<iiBBHHHiiii", tid, pos, len(qname), mapq, 4680,
                           len(cig), flag, len(seq), mtid, mpos, tlen)
        body += qname + b"".join(struct.pack("<I", w) for w in cig) + seq4 + bytes([255]*len(seq)) + aux
        body_buf += struct.pack("<i", len(body)) + body
        records += 1
        if len(body_buf) > 8 << 20:
            flush_bgzf(body_buf)
flush_bgzf(body_buf, final=True)
out_f.write(bytes.fromhex("1f8b08040000000000ff0600424302001b0003000000000000000000"))
out_f.close()
print("records:", records)
