#!/usr/bin/env python3
"""Generate committed WebP fixtures + goldens from libwebp (driver-side).

Fixtures (src/main/resources/graft/):
- wild_vp8x_alpha.webp  — CPython's test-corpus python.webp, verbatim: a
  real-world VP8X container (lossy VP8 pixels + VP8L-compressed ALPH
  alpha plane). The repo did not produce it.
- wild_lossless.webp    — a photo-class deterministic image encoded by
  libwebp's own lossless encoder (WebPEncodeLosslessRGBA): real encoder
  output exercising predictor/color/subtract-green transforms, meta
  huffman blocks, color cache and LZ77.
- wild_palette.webp     — a 13-color image, same encoder: exercises the
  color-indexing transform with 4-bit packing.
- wild_lossy_alpha.webp — libwebp lossy+alpha encode (WebPEncodeRGBA):
  VP8X census + ALPH decode coverage with a filtered alpha plane.

Golden (webp_golden.json): per fixture, dims + libwebp's decode as
RGBA channel sums and a CRC32 of the full RGBA buffer (pixel-exact in
one number). The independent spec decoder (scripts/webp_ref.py) is then
cross-checked against every applicable golden: two transcriptions + the
reference implementation agreeing on real entropy data.
"""
import ctypes, json, os, sys, zlib

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import webp_ref

lib = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libwebp.so.7")
lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
lib.WebPDecodeRGBA.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                               ctypes.POINTER(ctypes.c_int),
                               ctypes.POINTER(ctypes.c_int)]
lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
lib.WebPEncodeLosslessRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.POINTER(ctypes.c_void_p)]
lib.WebPEncodeRGBA.restype = ctypes.c_size_t
lib.WebPEncodeRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.c_float, ctypes.POINTER(ctypes.c_void_p)]
lib.WebPFree.argtypes = [ctypes.c_void_p]

RES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "src/main/resources/graft")
WILD_SRC = ("/root/.pyenv/versions/3.13.0/lib/python3.13/test/"
            "test_email/data/python.webp")


def decode_rgba(data):
    w = ctypes.c_int(); h = ctypes.c_int()
    p = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    assert p, "libwebp decode failed"
    try:
        return w.value, h.value, bytes(p[0:w.value * h.value * 4])
    finally:
        lib.WebPFree(p)


def encode_lossless(rgba, w, h):
    out = ctypes.c_void_p()
    n = lib.WebPEncodeLosslessRGBA(bytes(rgba), w, h, w * 4,
                                   ctypes.byref(out))
    assert n, "lossless encode failed"
    try:
        return ctypes.string_at(out, n)
    finally:
        lib.WebPFree(out)


def encode_lossy(rgba, w, h, q=75.0):
    out = ctypes.c_void_p()
    n = lib.WebPEncodeRGBA(bytes(rgba), w, h, w * 4, q, ctypes.byref(out))
    assert n, "lossy encode failed"
    try:
        return ctypes.string_at(out, n)
    finally:
        lib.WebPFree(out)


def photo_image(w=97, h=61):
    """Deterministic photo-class content: smooth gradients + a textured
    band + flat runs — drives the encoder into predictors, color
    transform, subtract-green, LZ77 and the color cache."""
    rng = 0x2545F4914F6CDD1D
    px = bytearray()
    for y in range(h):
        for x in range(w):
            if y < h // 3:
                r, g, b = (x * 255) // w, (y * 255) // h, 128
            elif y < 2 * h // 3:
                rng = (rng * 6364136223846793005 + 1442695040888963407) \
                    % (1 << 64)
                n = (rng >> 33) & 0x3F
                base = (x * 2 + y * 3) & 0xFF
                r, g, b = base, (base + n) & 0xFF, (255 - base) & 0xFF
            else:
                r, g, b = 40, 180, 220  # flat region -> LZ77 runs
            px += bytes((r, g, b, 255))
    return px, w, h


def palette_image(w=48, h=32):
    pal = [(i * 19 % 256, i * 53 % 256, i * 101 % 256, 255)
           for i in range(13)]
    px = bytearray()
    for y in range(h):
        for x in range(w):
            px += bytes(pal[(x // 3 + y // 2) % 13])
    return px, w, h


def gray_image(w=120, h=80):
    """r==g strongly correlated -> libwebp picks SUBTRACT_GREEN
    (probed), the one transform the other fixtures don't hit."""
    px = bytearray()
    for y in range(h):
        for x in range(w):
            v = (x * 7 + y * 13) % 256
            px += bytes((v, v, (v + 3) % 256, 255))
    return px, w, h


def meta_image(w=200, h=150):
    """Smooth sine-mix photo at this size drives libwebp into META
    HUFFMAN blocks (2 entropy groups, probed) + a color cache —
    the spatially-varying-entropy path the smaller photo misses."""
    import math
    px = bytearray()
    for y in range(h):
        for x in range(w):
            r = int(127 + 120 * math.sin(x / 17) + ((x * y) % 7)) % 256
            g = int(127 + 120 * math.sin(y / 23) + ((x + y) % 5)) % 256
            px += bytes((r, g, (r + g) // 2, 255))
    return px, w, h


def alpha_image(w=64, h=48):
    # (x²+y²) mod 256 drives libwebp's alpha-filter heuristic to pick
    # the VERTICAL filter (probed), so the committed fixture exercises
    # the ALPH unfilter path, not just filter=0
    px = bytearray()
    for y in range(h):
        for x in range(w):
            px += bytes((200, 50, 90, (x * x + y * y) % 256))
    return px, w, h


def golden_entry(name, data):
    w, h, rgba = decode_rgba(data)
    return {
        "file": name, "width": w, "height": h, "bytes": len(data),
        "rgba_crc32": zlib.crc32(rgba),
        "sum_r": sum(rgba[0::4]), "sum_g": sum(rgba[1::4]),
        "sum_b": sum(rgba[2::4]), "sum_a": sum(rgba[3::4]),
        # position-weighted sum over all channels: moves if any pixel
        # lands in the wrong place even when plain sums collide
        "wsum": sum((i + 1) * v for i, v in enumerate(rgba)) % (1 << 61),
    }


def main():
    os.makedirs(RES, exist_ok=True)
    fixtures = {}

    wild = open(WILD_SRC, "rb").read()
    fixtures["wild_vp8x_alpha.webp"] = wild

    px, w, h = photo_image()
    fixtures["wild_lossless.webp"] = encode_lossless(px, w, h)
    ppx, pw, ph = palette_image()
    fixtures["wild_palette.webp"] = encode_lossless(ppx, pw, ph)
    gpx, gw, gh = gray_image()
    fixtures["wild_gray_sg.webp"] = encode_lossless(gpx, gw, gh)
    mpx, mw, mh = meta_image()
    fixtures["wild_meta.webp"] = encode_lossless(mpx, mw, mh)
    apx, aw, ah = alpha_image()
    fixtures["wild_lossy_alpha.webp"] = encode_lossy(apx, aw, ah)

    goldens = []
    for name, data in fixtures.items():
        with open(os.path.join(RES, name), "wb") as f:
            f.write(data)
        g = golden_entry(name, data)
        chunks = [t for t, _ in webp_ref.walk(data)]
        g["chunks"] = chunks
        if "VP8L" in chunks:  # feature coverage, from the spec decoder
            webp_ref.TRACE.clear()
            webp_ref.decode(data)
            g["features"] = list(webp_ref.TRACE)
        goldens.append(g)
        print(f"{name}: {g['width']}x{g['height']} {g['bytes']}B "
              f"chunks={chunks}")

    # cross-check: the independent spec decoder must agree with libwebp
    # pixel-exactly on every stream it claims (VP8L pixels; ALPH alpha)
    for g in goldens:
        data = fixtures[g["file"]]
        chunks = dict(webp_ref.walk(data))
        if "VP8L" in chunks:
            w, h, rgba = webp_ref.decode(data)
            assert (w, h) == (g["width"], g["height"]), g["file"]
            assert zlib.crc32(rgba) == g["rgba_crc32"], \
                f"{g['file']}: spec decoder != libwebp (pixels)"
            print(f"cross-check {g['file']}: VP8L pixels EXACT")
        elif "ALPH" in chunks:
            w, h, rgba = webp_ref.decode(data)  # alpha-only
            ref = decode_rgba(data)[2]
            assert rgba[3::4] == ref[3::4], \
                f"{g['file']}: spec decoder != libwebp (alpha plane)"
            alph_head = chunks["ALPH"][0]
            print(f"cross-check {g['file']}: ALPH plane EXACT "
                  f"(compression={alph_head & 3}, "
                  f"filter={(alph_head >> 2) & 3})")

    test_res = RES.replace("src/main/resources", "src/test/resources")
    with open(os.path.join(test_res, "webp_golden.json"), "w") as f:
        json.dump(goldens, f, indent=1)
    print("wrote webp_golden.json")


if __name__ == "__main__":
    main()
