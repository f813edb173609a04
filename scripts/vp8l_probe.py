#!/usr/bin/env python3
"""Derive VP8L bitstream constants empirically from libwebp (driver-side).

The WebP Lossless spec's distance-mapping table (120 (dx,dy) entries) and
bit conventions must be EXACT in the repo's decoders. Rather than trusting
a from-memory transcription, this probe hand-crafts minimal VP8L streams
(LSB-first bit writer, simple + normal huffman codes, one LZ77 copy with a
chosen distance code) and decodes them with the system reference
implementation (libwebp.so.7, v1.2.4) via ctypes: where the copied pixel
lands reveals the table entry for each plane code 1..120. Output is the
table as Scala/Python source, plus a verification of the generation rule.

Run: python3 scripts/vp8l_probe.py
"""
import ctypes, sys

lib = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libwebp.so.7")
lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
lib.WebPDecodeRGBA.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                               ctypes.POINTER(ctypes.c_int),
                               ctypes.POINTER(ctypes.c_int)]
lib.WebPFree.argtypes = [ctypes.c_void_p]


def decode_rgba(data: bytes):
    w = ctypes.c_int(); h = ctypes.c_int()
    p = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not p:
        return None
    try:
        return w.value, h.value, bytes(p[0:w.value * h.value * 4])
    finally:
        lib.WebPFree(p)


class BitWriter:
    """LSB-first bit writer (VP8L convention)."""
    def __init__(self):
        self.bits = 0
        self.n = 0
        self.out = bytearray()

    def write(self, value, nbits):
        assert 0 <= value < (1 << nbits), (value, nbits)
        self.bits |= value << self.n
        self.n += nbits
        while self.n >= 8:
            self.out.append(self.bits & 0xFF)
            self.bits >>= 8
            self.n -= 8

    def done(self):
        if self.n:
            self.out.append(self.bits & 0xFF)
            self.bits = 0
            self.n = 0
        return bytes(self.out)


def canonical(lengths):
    """Canonical huffman codes (DEFLATE rule): (symbol -> (code, len))."""
    pairs = sorted((l, s) for s, l in enumerate(lengths) if l > 0)
    code = 0
    prev_len = 0
    out = {}
    for l, s in pairs:
        code <<= (l - prev_len)
        out[s] = (code, l)
        code += 1
        prev_len = l
    return out


def write_code(bw, code, length):
    """Huffman code bits are consumed MSB-first by the tree walk."""
    for i in range(length - 1, -1, -1):
        bw.write((code >> i) & 1, 1)


# code length code order per the spec
CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


def write_normal_code(bw, lengths):
    """Write a huffman code as code-length-coded lengths (no repeats)."""
    used = sorted({l for l in lengths if l > 0})
    # complete code over CL symbols {0} + used: 0 gets length 1, the rest
    # get lengths forming a complete code. With at most 4 distinct pixel
    # code lengths this fixed assignment is always complete:
    cl_len = {0: 1}
    fill = [2, 3, 4, 4]
    assert len(used) <= 4, used
    # pad with unused CL symbols so the kraft sum closes to 1
    syms = used + [15 - i for i in range(4 - len(used))]
    for s, l in zip(syms, fill):
        cl_len[s] = l
    cl_code = canonical([cl_len.get(i, 0) for i in range(19)])
    # how many leading CL_ORDER entries must be transmitted
    need = max(CL_ORDER.index(s) for s in cl_len) + 1
    bw.write(0, 1)             # not a simple code
    bw.write(need - 4, 4)      # num_code_lengths - 4
    for i in range(need):
        bw.write(cl_len.get(CL_ORDER[i], 0), 3)
    bw.write(0, 1)             # no max_symbol shortcut
    for l in lengths:
        c, n = cl_code[l]
        write_code(bw, c, n)


def write_simple_code(bw, symbols):
    """1- or 2-symbol 'simple' huffman code."""
    bw.write(1, 1)                     # simple
    bw.write(len(symbols) - 1, 1)      # num symbols - 1
    if symbols[0] < 2 and len(symbols) == 1:
        bw.write(0, 1)                 # first symbol in 1 bit
        bw.write(symbols[0], 1)
    else:
        bw.write(1, 1)                 # first symbol in 8 bits
        bw.write(symbols[0], 8)
    if len(symbols) == 2:
        bw.write(symbols[1], 8)


def riff_wrap(vp8l_payload: bytes) -> bytes:
    chunk = b"VP8L" + len(vp8l_payload).to_bytes(4, "little") + vp8l_payload
    if len(vp8l_payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP" + chunk


def dist_prefix(value):
    """LZ77 prefix code + extra bits for a distance/length value (>=1)."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    nbits = v.bit_length() - 1
    code = 2 * nbits + ((v >> (nbits - 1)) & 1) - 1  # hmm, solve directly
    # direct search is clearer and this is a probe:
    for c in range(4, 40):
        extra = (c - 2) >> 1
        offset = (2 + (c & 1)) << extra
        if offset + 1 <= value <= offset + (1 << extra):
            return c, value - offset - 1, extra
    raise ValueError(value)


W, H = 17, 9  # dx in [-8,8] and dy in [0,7] resolve uniquely: dist=dy*17+dx


def probe_stream(plane_code):
    """152 unique literals (green=index), then one len-1 copy at the last
    pixel using `plane_code` as the distance code."""
    bw = BitWriter()
    bw.write(0x2F, 8)          # signature
    bw.write(W - 1, 14)
    bw.write(H - 1, 14)
    bw.write(0, 1)             # alpha hint
    bw.write(0, 3)             # version
    bw.write(0, 1)             # no transforms
    bw.write(0, 1)             # no color cache
    bw.write(0, 1)             # no meta huffman
    # green+length alphabet (280): greens 0..151 len 8; len-code 256
    # (length value 1) len 2; completing symbols 257 len 3, 258 len 5
    glen = [0] * 280
    for i in range(152):
        glen[i] = 8
    glen[256] = 2
    glen[257] = 3
    glen[258] = 5
    write_normal_code(bw, glen)
    gcode = canonical(glen)
    write_simple_code(bw, [7])    # red: constant 7
    write_simple_code(bw, [9])    # blue: constant 9
    write_simple_code(bw, [255])  # alpha: constant 255
    dc, extra_val, extra_bits = dist_prefix(plane_code)
    write_simple_code(bw, [dc])   # distance: constant prefix code
    for i in range(W * H - 1):    # literals
        c, n = gcode[i]
        write_code(bw, c, n)
    c, n = gcode[256]             # length code -> length 1
    write_code(bw, c, n)
    if extra_bits:
        bw.write(extra_val, extra_bits)
    return riff_wrap(bw.done())


def dist_prefix_for(value):
    return dist_prefix(value)


def main():
    # sanity: literal-only image must round-trip through libwebp exactly
    bw = BitWriter()
    bw.write(0x2F, 8); bw.write(W - 1, 14); bw.write(H - 1, 14)
    bw.write(0, 1); bw.write(0, 3)
    bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)
    # complete code (kraft sum exactly 1): 156/256 + 1/4 + 1/8 + 1/64
    glen = [0] * 280
    for i in range(153):
        glen[i] = 8
    glen[256] = 2; glen[257] = 3; glen[258] = 6; glen[259] = 8; glen[260] = 8
    glen[261] = 8
    write_normal_code(bw, glen)
    gcode = canonical(glen)
    write_simple_code(bw, [7]); write_simple_code(bw, [9])
    write_simple_code(bw, [255]); write_simple_code(bw, [0])
    for i in range(W * H):
        c, n = gcode[i]
        write_code(bw, c, n)
    r = decode_rgba(riff_wrap(bw.done()))
    assert r, "libwebp refused the hand-written literal stream"
    w, h, px = r
    assert (w, h) == (W, H)
    for i in range(W * H):
        got = (px[4 * i], px[4 * i + 1], px[4 * i + 2], px[4 * i + 3])
        assert got == (7, i, 9, 255), (i, got)
    print("literal-stream sanity: OK (bit conventions confirmed)")

    table = []
    for k in range(1, 121):
        r = decode_rgba(probe_stream(k))
        assert r, f"libwebp refused plane_code={k}"
        w, h, px = r
        last = W * H - 1
        g = px[4 * last + 1]
        dist = last - g
        dy, dx = divmod(dist + 8, W)
        dx -= 8
        table.append((dx, dy))
    # cross-check: >120 must be linear (code-120)
    r = decode_rgba(probe_stream(121))
    w, h, px = r
    assert (W * H - 1) - px[4 * (W * H - 1) + 1] == 1, "code 121 != dist 1"
    w, h, px = decode_rgba(probe_stream(130))
    assert (W * H - 1) - px[4 * (W * H - 1) + 1] == 10, "code130 != dist10"

    print("derived kDistanceMap (plane codes 1..120):")
    print("Scala:")
    rows = [f"({dx},{dy})" for dx, dy in table]
    for i in range(0, 120, 8):
        print("    " + ", ".join(rows[i:i + 8]) + ",")
    # verify the generation rule: all (dx,dy), dy 0..7, (dx,dy)!=(0,0),
    # dx in -8..8 (dx>=1 when dy==0), sorted by (dx*dx+dy*dy, dy desc?,..)
    cand = [(dx, dy) for dy in range(8) for dx in range(-8, 9)
            if (dy > 0 or dx > 0)]
    for keyname, key in [
            ("d2,-dy,dx", lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], p[0])),
            ("d2,-dy,|dx|,dx<0",
             lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], abs(p[0]), p[0] < 0)),
    ]:
        guess = sorted(cand, key=key)[:120]
        print(f"rule '{keyname}' matches derived table: {guess == table}")


if __name__ == "__main__":
    main()
