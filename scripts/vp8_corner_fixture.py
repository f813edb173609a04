#!/usr/bin/env python3
"""Add the top-left-corner VP8 fixture + golden (driver-side).

The r15 ADVICE found that the frame's above-left border pixel for
MB(0,0) must be 127 (libwebp fills the entire top border row,
including the corner, with 127) — the repo's committed fixtures never
exercised that pixel because no fixture's MB(0,0) picks a mode that
reads above-left. A 16x16 diagonal gradient at q95 forces MB0 into
B_PRED with corner-reading sub-modes (B_HD/B_RD/TM class), so the
golden from libwebp's own WebPDecodeYUV pins the convention forever.

Appends one entry to src/test/resources/graft/vp8_golden.json and
writes vp8_tlcorner_16x16_q95.webp; existing fixtures/goldens are
left byte-identical.
"""
import ctypes, hashlib, json, os

LIB = "/usr/lib/x86_64-linux-gnu/libwebp.so.7"
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


w = h = 16
# diagonal gradient: value driven by x+y so the best predictor for the
# top-left 4x4s is a diagonal (B_HD/B_RD) or TM — all read above-left
rgb = bytearray()
for yy in range(h):
    for xx in range(w):
        d = (xx + yy) * 8
        rgb += bytes((min(255, d), min(255, d), min(255, d)))
out = ctypes.c_void_p()
n = lib.WebPEncodeRGB(bytes(rgb), w, h, w * 3, ctypes.c_float(95.0),
                      ctypes.byref(out))
assert n > 0
data = ctypes.string_at(out, n)
lib.WebPFree(out)

W, H, yp, up, vp = decode_yuv(data)
assert (W, H) == (w, h)

res_dir = os.path.join(os.path.dirname(__file__),
                       "..", "src", "test", "resources", "graft")
name = "vp8_tlcorner_16x16_q95"
with open(os.path.join(res_dir, name + ".webp"), "wb") as f:
    f.write(data)
path = os.path.join(res_dir, "vp8_golden.json")
golden = json.load(open(path))
golden[name] = {
    "w": W, "h": H, "bytes": len(data),
    "y_md5": hashlib.md5(yp).hexdigest(),
    "u_md5": hashlib.md5(up).hexdigest(),
    "v_md5": hashlib.md5(vp).hexdigest(),
    "y_sum": sum(yp), "u_sum": sum(up), "v_sum": sum(vp),
    "y_first16": list(yp[:16]),
    "y_last16": list(yp[-16:]),
}
with open(path, "w") as f:
    json.dump(golden, f, indent=1, sort_keys=True)
print(name, len(data), "bytes", golden[name]["y_md5"],
      "y_first16", golden[name]["y_first16"])
