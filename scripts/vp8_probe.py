#!/usr/bin/env python3
"""Derive VP8 (lossy) decoder constants and goldens from libwebp.

Two outputs, both driver-side (nothing here ships in the library):

1. TABLES — the keyframe decoder's constant tables, extracted from
   libwebp.so.7 (v1.2.x) .rodata by STRUCTURE, not transcribed from
   memory: the dequant AC/DC lookups (monotonic uint16[128] runs), the
   coefficient-band map, the token probability table (1056 = 4 types x
   8 bands x 3 contexts x 11 probs, duplicated in the binary's decoder
   and encoder halves — the duplicate is the cross-check), the
   update-probability table (its 898 x 255 bytes make it structurally
   unmistakable), the kf B-mode tree probabilities (10x10x9), the
   zigzag scan and the cat3..cat6 extra-bit probabilities (located by
   exact match against RFC 6386's published values — agreement between
   the RFC transcription and the binary is itself a check). Emitted as
   Scala source for graft/operators/Vp8Tables.scala.

2. FIXTURES + GOLDENS — deterministic RGB images encoded to lossy VP8
   via WebPEncodeRGB at several qualities/sizes (including
   non-multiple-of-16 dims), then decoded back with WebPDecodeYUV: the
   golden is the raw Y/U/V plane bytes (md5 + dims + stride-free
   copies), i.e. the decoder's output BEFORE any RGB conversion — the
   exact target a from-scratch VP8 decoder must hit bit-for-bit
   (prediction + dequant + IDCT + loop filter all included).

Run: python3 scripts/vp8_probe.py
"""
import ctypes, hashlib, json, struct, sys, os

LIB = "/usr/lib/x86_64-linux-gnu/libwebp.so.7"
SO = "/usr/lib/x86_64-linux-gnu/libwebp.so.7.1.5"
RO_OFF, RO_LEN = 0x5A000, 0x7C38

ro = open(SO, "rb").read()[RO_OFF:RO_OFF + RO_LEN]


def u16s(off, n):
    return list(struct.unpack("<%dH" % n, ro[off:off + 2 * n]))


def find(pat):
    i = ro.find(bytes(pat))
    assert i >= 0, "pattern not found: %s" % pat[:8]
    return i


# ---- table extraction (structural anchors) ----
zz_off = find([0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15])
bands_off = find([0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7])
# dc table: uint8[128] (max 157 fits a byte) ending immediately
# before the bands map; ac table: uint16[128] ending at 284
dc = list(ro[bands_off - 128:bands_off])
assert dc[0] == 4 and dc[-1] == 157 and all(
    a <= b for a, b in zip(dc, dc[1:])), dc[:5]
ac_off = find(struct.pack("<5H", 4, 5, 6, 7, 8))
ac = u16s(ac_off, 128)
assert ac[-1] == 284 and all(a <= b for a, b in zip(ac, ac[1:]))
# anchor the kf B-mode table by its RFC-published first row (also a
# memory-vs-binary cross-check); the update table is the 1056 bytes
# immediately before it
bm_off = find([231, 120, 48, 89, 115, 113, 120, 152, 112])
upd_off = bm_off - 1056
upd = list(ro[upd_off:upd_off + 1056])
assert upd.count(255) > 800, "update-proba signature missing"
bmode = list(ro[bm_off:bm_off + 900])
assert all(b > 0 for b in bmode)
# CoeffsProba0: the other 1056-byte all-nonzero run; verify the
# decoder/encoder duplicate agree byte-for-byte
cp_off = 0xA60
cp = list(ro[cp_off:cp_off + 1056])
dup = ro.find(bytes(cp))
dup2 = ro.find(bytes(cp), dup + 1)
assert dup2 > dup >= 0, "CoeffsProba0 must appear twice (dec+enc)"
cat6 = [254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129]
find(cat6)  # asserts the RFC transcription matches the binary

OUT_TABLES = os.path.join(os.path.dirname(__file__), "vp8_tables.txt")


def scala_arr(name, vals, per=12, typ="Int"):
    rows = [", ".join(str(v) for v in vals[i:i + per])
            for i in range(0, len(vals), per)]
    return ("  val %s: Array[%s] = Array(\n    %s)\n"
            % (name, typ, ",\n    ".join(rows)))


with open(OUT_TABLES, "w") as f:
    f.write("// extracted from %s .rodata by scripts/vp8_probe.py\n" % SO)
    f.write(scala_arr("DcQLookup", dc))
    f.write(scala_arr("AcQLookup", ac))
    f.write(scala_arr("Bands", list(ro[bands_off:bands_off + 16])))
    f.write(scala_arr("Zigzag", list(ro[zz_off:zz_off + 16])))
    f.write(scala_arr("CoeffUpdateProba", upd))
    f.write(scala_arr("KfBModeProba", bmode))
    f.write(scala_arr("CoeffProba0", cp))
print("wrote", OUT_TABLES)

# ---- fixtures + YUV goldens ----
lib = ctypes.CDLL(LIB)
lib.WebPEncodeRGB.restype = ctypes.c_size_t
lib.WebPEncodeRGB.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.c_float, ctypes.POINTER(ctypes.c_void_p)]
lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_ubyte)
lib.WebPDecodeYUV.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
lib.WebPFree.argtypes = [ctypes.c_void_p]


def pixels(w, h, seed):
    """Deterministic RGB: gradients + xorshift texture + flat patches
    so the encoder exercises DC/V/H/TM and B_PRED mode mixes."""
    x = seed | 1
    buf = bytearray()
    for y in range(h):
        for xx in range(w):
            x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
            x ^= x >> 7
            x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
            if (xx // 16 + y // 16) % 3 == 0:
                r, g, b = (xx * 4) % 256, (y * 4) % 256, 128
            elif (xx // 16 + y // 16) % 3 == 1:
                r = g = b = 60 + ((xx + y) % 8) * 3
            else:
                r, g, b = x & 255, (x >> 8) & 255, (x >> 16) & 255
            buf += bytes((r, g, b))
    return bytes(buf)


def encode(rgb, w, h, q):
    out = ctypes.c_void_p()
    n = lib.WebPEncodeRGB(rgb, w, h, w * 3, ctypes.c_float(q),
                          ctypes.byref(out))
    assert n > 0
    data = ctypes.string_at(out, n)
    lib.WebPFree(out)
    return data


def decode_yuv(data):
    w = ctypes.c_int(); h = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_ubyte)()
    v = ctypes.POINTER(ctypes.c_ubyte)()
    stride = ctypes.c_int(); uv_stride = ctypes.c_int()
    y = lib.WebPDecodeYUV(data, len(data), ctypes.byref(w),
                          ctypes.byref(h), ctypes.byref(u),
                          ctypes.byref(v), ctypes.byref(stride),
                          ctypes.byref(uv_stride))
    assert y
    W, H = w.value, h.value
    cw, ch = (W + 1) // 2, (H + 1) // 2
    yp = b"".join(ctypes.string_at(
        ctypes.addressof(y.contents) + r * stride.value, W)
        for r in range(H))
    up = b"".join(ctypes.string_at(
        ctypes.addressof(u.contents) + r * uv_stride.value, cw)
        for r in range(ch))
    vp = b"".join(ctypes.string_at(
        ctypes.addressof(v.contents) + r * uv_stride.value, cw)
        for r in range(ch))
    lib.WebPFree(y)
    return W, H, yp, up, vp


res_dir = os.path.join(os.path.dirname(__file__),
                       "..", "src", "test", "resources", "graft")
golden = {}
for name, w, h, q, seed in [
        ("vp8_grad_48x32_q75", 48, 32, 75.0, 0x9E3779B9),
        ("vp8_odd_33x17_q40", 33, 17, 40.0, 0x1234567),
        ("vp8_tex_64x64_q90", 64, 64, 90.0, 0xDEADBEE),
        ("vp8_flat_16x16_q95", 16, 16, 95.0, 0x42)]:
    rgb = pixels(w, h, seed)
    data = encode(rgb, w, h, q)
    W, H, yp, up, vp = decode_yuv(data)
    assert (W, H) == (w, h)
    path = os.path.join(res_dir, name + ".webp")
    with open(path, "wb") as f:
        f.write(data)
    golden[name] = {
        "w": W, "h": H, "bytes": len(data),
        "y_md5": hashlib.md5(yp).hexdigest(),
        "u_md5": hashlib.md5(up).hexdigest(),
        "v_md5": hashlib.md5(vp).hexdigest(),
        "y_sum": sum(yp), "u_sum": sum(up), "v_sum": sum(vp),
        "y_first16": list(yp[:16]),
        "y_last16": list(yp[-16:]),
    }
    print(name, len(data), "bytes", golden[name]["y_md5"])

# wild lossy fixtures already in the repo: golden their YUV planes too
# (their VP8 chunks are real libwebp encoder output from earlier
# rounds' fixture builds — decoded here by the same reference lib)
main_res = os.path.join(os.path.dirname(__file__),
                        "..", "src", "main", "resources", "graft")
for name in ["wild_lossy_alpha", "wild_vp8x_alpha"]:
    data = open(os.path.join(main_res, name + ".webp"), "rb").read()
    W, H, yp, up, vp = decode_yuv(data)
    golden[name] = {
        "w": W, "h": H, "bytes": len(data),
        "y_md5": hashlib.md5(yp).hexdigest(),
        "u_md5": hashlib.md5(up).hexdigest(),
        "v_md5": hashlib.md5(vp).hexdigest(),
        "y_sum": sum(yp), "u_sum": sum(up), "v_sum": sum(vp),
        "y_first16": list(yp[:16]),
        "y_last16": list(yp[-16:]),
    }
    n_units = len(yp) + len(up) + len(vp)
    vsum = sum(yp) + sum(up) + sum(vp)
    print("q310 pin %s: w=%d h=%d n_units=%d value_sum=%d"
          % (name, W, H, n_units, vsum))

with open(os.path.join(res_dir, "vp8_golden.json"), "w") as f:
    json.dump(golden, f, indent=1, sort_keys=True)
print("goldens written")
