#!/usr/bin/env python3
"""Independent spec-written WebP/VP8L reference decoder (driver-side).

A cleanroom transcription of the public WebP container + WebP Lossless
bitstream specifications (RFC 9649 / the Google "WebP Lossless Bitstream
Specification"): RIFF walk, VP8L (huffman codes, LZ77 backward refs,
color cache, meta-huffman blocks, all four transforms) and ALPH alpha
decoding (lossless method + horizontal/vertical/gradient filters).

Role in the verification chain (the q295 MP4-muxer precedent): two
INDEPENDENT transcriptions of the same public spec — this file and the
repo's Scala `operators/WebpCodec.scala` — are each cross-checked
pixel-exact against the system reference implementation (libwebp.so.7)
on real encoder output. The distance-mapping table below is not
transcribed from anywhere: scripts/vp8l_probe.py DERIVES it empirically
from libwebp by crafting one-copy streams per plane code.

Usage: python3 scripts/webp_ref.py <file.webp>   # prints dims + sums
"""
import sys
import zlib

# plane-code -> (dx, dy), derived by scripts/vp8l_probe.py from libwebp
DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7)]

CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


class Bits:
    def __init__(self, data):
        self.d = data
        self.pos = 0  # bit position

    def read(self, n):
        v = 0
        for i in range(n):
            byte = self.pos >> 3
            if byte >= len(self.d):
                raise ValueError("truncated bitstream")
            v |= ((self.d[byte] >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v


class Huff:
    """Canonical prefix code from code lengths (DEFLATE rule); decode
    walks one bit at a time, MSB of the code first."""
    def __init__(self, lengths):
        nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if len(nz) == 1:
            self.single = nz[0][1]
            return
        self.single = None
        # completeness check (libwebp enforces it; hostile streams must
        # not build an ambiguous tree)
        if sum(2 ** -l for l, _ in nz) != 1.0:
            raise ValueError("incomplete/oversubscribed huffman code")
        code = 0
        prev = 0
        self.table = {}
        for l, s in sorted(nz):
            code <<= (l - prev)
            self.table[(code, l)] = s
            code += 1
            prev = l

    def read(self, br):
        if self.single is not None:
            return self.single
        code, l = 0, 0
        while l < 16:
            code = (code << 1) | br.read(1)
            l += 1
            if (code, l) in self.table:
                return self.table[(code, l)]
        raise ValueError("bad huffman code")


def read_code(br, alphabet):
    """One huffman code: 'simple' (1-2 symbols) or code-length coded."""
    lengths = [0] * alphabet
    if br.read(1):  # simple
        n = br.read(1) + 1
        s0 = br.read(8) if br.read(1) else br.read(1)
        lengths[s0] = 1
        if n == 2:
            lengths[br.read(8)] = 1
        else:
            return Huff._single(s0, alphabet)
        return Huff(lengths)
    num_cl = 4 + br.read(4)
    cl_lens = [0] * 19
    for i in range(num_cl):
        cl_lens[CL_ORDER[i]] = br.read(3)
    cl = Huff(cl_lens)
    if br.read(1):  # bounded number of transmitted symbols
        nb = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(nb)
    else:
        max_symbol = alphabet
    i = 0
    prev = 8
    while i < alphabet:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        s = cl.read(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev = s
        elif s == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if i < alphabet:
                    lengths[i] = prev
                    i += 1
        elif s == 17:
            i += 3 + br.read(3)
        else:
            i += 11 + br.read(7)
    return Huff(lengths)


def _single(s, alphabet):
    h = Huff.__new__(Huff)
    h.single = s
    return h


Huff._single = staticmethod(_single)


def subsample(size, bits):
    return (size + (1 << bits) - 1) >> bits


TRACE = []  # feature trace of the last decode (debugging/coverage aid)


def decode_image_stream(br, w, h, level0):
    """Returns (argb list of w*h ints, transforms list) — transforms are
    returned unapplied only at level0 (sub-images have none)."""
    transforms = []
    xsize = w
    if level0:
        seen = set()
        while br.read(1):
            t = br.read(2)
            if t in seen:
                raise ValueError("duplicate transform")
            seen.add(t)
            TRACE.append(['predictor', 'color', 'subtract_green',
                          'color_index'][t])
            if t == 0 or t == 1:  # predictor / color
                bits = br.read(3) + 2
                sub = decode_image_stream(
                    br, subsample(xsize, bits), subsample(h, bits), False)[0]
                transforms.append((t, bits, sub, xsize))
            elif t == 2:  # subtract green
                transforms.append((2, 0, None, xsize))
            else:  # color indexing
                n_colors = br.read(8) + 1
                pal = decode_image_stream(br, n_colors, 1, False)[0]
                # palette entries are delta-coded componentwise
                for i in range(1, n_colors):
                    pal[i] = (
                        ((pal[i] & 0xFF00FF00) + (pal[i - 1] & 0xFF00FF00))
                        & 0xFF00FF00) | (
                        ((pal[i] & 0x00FF00FF) + (pal[i - 1] & 0x00FF00FF))
                        & 0x00FF00FF)
                wb = 3 if n_colors <= 2 else 2 if n_colors <= 4 \
                    else 1 if n_colors <= 16 else 0
                transforms.append((3, wb, pal, xsize))
                xsize = subsample(xsize, wb)

    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("bad color cache size")
        TRACE.append(f"color_cache({cache_bits})")
    cache = [0] * (1 << cache_bits) if cache_bits else None

    meta = None
    meta_bits = 0
    n_groups = 1
    if level0 and br.read(1):
        meta_bits = br.read(3) + 2
        meta = decode_image_stream(
            br, subsample(xsize, meta_bits), subsample(h, meta_bits),
            False)[0]
        n_groups = max(((p >> 8) & 0xFFFF) for p in meta) + 1
        TRACE.append(f"meta_huffman({n_groups})")

    green_alpha = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    groups = [[read_code(br, green_alpha), read_code(br, 256),
               read_code(br, 256), read_code(br, 256), read_code(br, 40)]
              for _ in range(n_groups)]

    def prefix_value(code):
        if code < 4:
            return code + 1
        extra = (code - 2) >> 1
        offset = (2 + (code & 1)) << extra
        return offset + br.read(extra) + 1

    def cache_insert(px):
        if cache is not None:
            cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px

    npix = xsize * h
    out = [0] * npix
    pos = 0
    mw = subsample(xsize, meta_bits) if meta is not None else 0
    while pos < npix:
        if meta is not None:
            x, y = pos % xsize, pos // xsize
            mp = meta[(y >> meta_bits) * mw + (x >> meta_bits)]
            g = groups[(mp >> 8) & 0xFFFF]
        else:
            g = groups[0]
        s = g[0].read(br)
        if s < 256:
            r = g[1].read(br)
            b = g[2].read(br)
            a = g[3].read(br)
            px = (a << 24) | (r << 16) | (s << 8) | b
            out[pos] = px
            cache_insert(px)
            pos += 1
        elif s < 280:
            length = prefix_value(s - 256)
            dcode = g[4].read(br)
            dval = prefix_value(dcode)
            if dval > 120:
                dist = dval - 120
            else:
                dx, dy = DIST_MAP[dval - 1]
                dist = max(dy * xsize + dx, 1)
            if dist > pos or pos + length > npix:
                raise ValueError("LZ77 copy out of bounds")
            for _ in range(length):
                px = out[pos - dist]
                out[pos] = px
                cache_insert(px)
                pos += 1
        else:
            out[pos] = cache[s - 280]
            pos += 1
    return out, transforms


def avg2(a, b):
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def clamp(v):
    return 0 if v < 0 else 255 if v > 255 else v


def _sel(t, l, tl):
    pl = pt = 0
    for sh in (24, 16, 8, 0):
        pc = ((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
        pl += abs(pc - ((l >> sh) & 0xFF))
        pt += abs(pc - ((t >> sh) & 0xFF))
    return l if pl < pt else t


def _cas_full(l, t, tl):
    out = 0
    for sh in (24, 16, 8, 0):
        c = clamp(((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF))
        out |= c << sh
    return out


def _cas_half(l, t, tl):
    ave = avg2(l, t)
    out = 0
    for sh in (24, 16, 8, 0):
        a = (ave >> sh) & 0xFF
        b = (tl >> sh) & 0xFF
        c = clamp(a + (a - b) // 2 if a >= b else a - (b - a) // 2)
        out |= c << sh
    return out


def apply_predictor(out, w, h, bits, sub):
    sw = subsample(w, bits)
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = out[i - 1]
            elif x == 0:
                pred = out[i - w]
            else:
                mode = (sub[(y >> bits) * sw + (x >> bits)] >> 8) & 0xFF
                l = out[i - 1]
                t = out[i - w]
                tl = out[i - w - 1]
                # top-right of the last column reads the CURRENT row's
                # first pixel (upper[w] in libwebp's contiguous layout)
                tr = out[i - w + 1] if x + 1 < w else out[y * w]
                if mode == 0:
                    pred = 0xFF000000
                elif mode == 1:
                    pred = l
                elif mode == 2:
                    pred = t
                elif mode == 3:
                    pred = tr
                elif mode == 4:
                    pred = tl
                elif mode == 5:
                    pred = avg2(avg2(l, tr), t)
                elif mode == 6:
                    pred = avg2(l, tl)
                elif mode == 7:
                    pred = avg2(l, t)
                elif mode == 8:
                    pred = avg2(tl, t)
                elif mode == 9:
                    pred = avg2(t, tr)
                elif mode == 10:
                    pred = avg2(avg2(l, tl), avg2(t, tr))
                elif mode == 11:
                    pred = _sel(t, l, tl)
                elif mode == 12:
                    pred = _cas_full(l, t, tl)
                elif mode == 13:
                    pred = _cas_half(l, t, tl)
                else:
                    raise ValueError(f"bad predictor mode {mode}")
            out[i] = (((out[i] & 0xFF00FF00) + (pred & 0xFF00FF00))
                      & 0xFF00FF00) | (((out[i] & 0x00FF00FF)
                      + (pred & 0x00FF00FF)) & 0x00FF00FF)


def _d8(t, c):
    t = t - 256 if t > 127 else t
    c = c - 256 if c > 127 else c
    return (t * c) >> 5


def apply_color(out, w, h, bits, sub):
    sw = subsample(w, bits)
    for y in range(h):
        for x in range(w):
            i = y * w + x
            cte = sub[(y >> bits) * sw + (x >> bits)]
            g2r = cte & 0xFF            # blue channel
            g2b = (cte >> 8) & 0xFF     # green channel
            r2b = (cte >> 16) & 0xFF    # red channel
            px = out[i]
            g = (px >> 8) & 0xFF
            r = (((px >> 16) & 0xFF) + _d8(g2r, g)) & 0xFF
            b = ((px & 0xFF) + _d8(g2b, g) + _d8(r2b, r)) & 0xFF
            out[i] = (px & 0xFF00FF00) | (r << 16) | b


def apply_subtract_green(out):
    for i, px in enumerate(out):
        g = (px >> 8) & 0xFF
        r = (((px >> 16) & 0xFF) + g) & 0xFF
        b = ((px & 0xFF) + g) & 0xFF
        out[i] = (px & 0xFF00FF00) | (r << 16) | b


def apply_color_index(out, w, h, wb, pal):
    packed_w = subsample(w, wb)
    bpp = 8 >> wb
    mask = (1 << bpp) - 1
    res = [0] * (w * h)
    for y in range(h):
        for x in range(w):
            px = out[y * packed_w + (x >> wb)] if wb else out[y * w + x]
            idx = ((px >> 8) & 0xFF)
            if wb:
                idx = (idx >> ((x & ((1 << wb) - 1)) * bpp)) & mask
            res[y * w + x] = pal[idx] if idx < len(pal) else 0
    return res


def decode_vp8l(data, w=None, h=None):
    """Full VP8L payload (with header) or, when w/h given, a headerless
    ALPH image-stream of implicit dimensions."""
    br = Bits(data)
    if w is None:
        if br.read(8) != 0x2F:
            raise ValueError("bad VP8L signature")
        w = br.read(14) + 1
        h = br.read(14) + 1
        br.read(1)  # alpha hint
        if br.read(3) != 0:
            raise ValueError("bad VP8L version")
    out, transforms = decode_image_stream(br, w, h, True)
    for t, bits, sub, xs in reversed(transforms):
        if t == 0:
            apply_predictor(out, xs, h, bits, sub)
        elif t == 1:
            apply_color(out, xs, h, bits, sub)
        elif t == 2:
            apply_subtract_green(out)
        else:
            out = apply_color_index(out, xs, h, bits, sub)
    return w, h, out


def unfilter_alpha(plane, w, h, method):
    if method == 0:
        return plane
    out = bytearray(plane)
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if method == 1:  # horizontal
                pred = out[i - 1] if x else (out[i - w] if y else 0)
            elif method == 2:  # vertical
                pred = out[i - w] if y else (out[i - 1] if x else 0)
            else:  # gradient
                if y == 0:
                    pred = out[i - 1] if x else 0
                elif x == 0:
                    pred = out[i - w]
                else:
                    pred = clamp(out[i - 1] + out[i - w] - out[i - w - 1])
            out[i] = (out[i] + pred) & 0xFF
    return bytes(out)


def decode_alph(data, w, h):
    head = data[0]
    comp = head & 3
    filt = (head >> 2) & 3
    if comp == 0:
        plane = data[1:1 + w * h]
    else:
        _, _, argb = decode_vp8l(data[1:], w, h)
        plane = bytes((p >> 8) & 0xFF for p in argb)
    return unfilter_alpha(plane, w, h, filt)


def walk(data):
    """RIFF chunk walk -> dict of chunk fourcc -> payload (first wins),
    plus canvas dims from VP8X when present."""
    assert data[:4] == b"RIFF" and data[8:12] == b"WEBP", "not webp"
    chunks = []
    off = 12
    while off + 8 <= len(data):
        tag = data[off:off + 4].decode("latin1")
        size = int.from_bytes(data[off + 4:off + 8], "little")
        chunks.append((tag, data[off + 8:off + 8 + size]))
        off += 8 + size + (size & 1)
    return chunks


def decode(data):
    """-> (w, h, rgba bytes) for VP8L (+VP8X wrapped) payloads; lossy
    VP8 yields alpha-only (rgb zero) when ALPH is present."""
    chunks = dict(walk(data))
    if "VP8L" in chunks:
        w, h, argb = decode_vp8l(chunks["VP8L"])
        rgba = bytearray()
        for p in argb:
            rgba += bytes(((p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF,
                           (p >> 24) & 0xFF))
        return w, h, bytes(rgba)
    if "VP8X" in chunks and "ALPH" in chunks:
        v = chunks["VP8X"]
        w = int.from_bytes(v[4:7], "little") + 1
        h = int.from_bytes(v[7:10], "little") + 1
        alpha = decode_alph(chunks["ALPH"], w, h)
        rgba = bytearray()
        for a in alpha:
            rgba += bytes((0, 0, 0, a))
        return w, h, bytes(rgba)
    raise ValueError("no decodable payload (lossy VP8 without alpha)")


if __name__ == "__main__":
    raw = open(sys.argv[1], "rb").read()
    w, h, rgba = decode(raw)
    print(f"{w}x{h} rgba_crc32={zlib.crc32(rgba)} "
          f"sums R={sum(rgba[0::4])} G={sum(rgba[1::4])} "
          f"B={sum(rgba[2::4])} A={sum(rgba[3::4])}")
