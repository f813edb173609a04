#!/usr/bin/env python3
"""Animated WebP with LOSSY (VP8) frames — fixture + golden.

Same construction as make_webp_anim_fixture.py (independent spec-
transcription muxer for VP8X + ANIM + ANMF; libwebpmux is absent from
this container), but every frame payload is a real libwebp LOSSY
encode (WebPEncodeRGB) — the class the r15 Vp8Codec decoder handles.
The golden pins, per frame, the chunk layout AND libwebp's own
WebPDecodeYUV plane sums/md5 of the identical payload, so the Scala
animation route (decodeAnimationLossyPlanes) is reference-comparable
at the YUV layer with zero RGB-upsampler ambiguity.
"""
import ctypes, hashlib, json, os, struct

lib = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libwebp.so.7")
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

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MAIN_RES = os.path.join(ROOT, "src/main/resources/graft")
TEST_RES = os.path.join(ROOT, "src/test/resources/graft")
W, H = 32, 32
DURATIONS = [80, 120, 160]
LOOPS = 2


def frame_rgb(k):
    out = bytearray()
    x = (0x9E3779B9 ^ (k * 0x85EBCA6B)) | 1
    for yy in range(H):
        for xx in range(W):
            x ^= (x << 13) & 0xFFFFFFFF
            x ^= x >> 17
            x ^= (x << 5) & 0xFFFFFFFF
            if (xx // 8 + yy // 8 + k) % 2 == 0:
                out += bytes(((xx * 7 + k * 31) % 256,
                              (yy * 5 + k * 11) % 256, 100))
            else:
                out += bytes((x & 255, (x >> 8) & 255, (x >> 16) & 255))
    return bytes(out)


def encode_lossy(rgb, q):
    out = ctypes.c_void_p()
    n = lib.WebPEncodeRGB(rgb, W, H, W * 3, ctypes.c_float(q),
                          ctypes.byref(out))
    assert n
    try:
        return ctypes.string_at(out, n)
    finally:
        lib.WebPFree(out)


def vp8_payload(webp_bytes):
    o = 12
    while o + 8 <= len(webp_bytes):
        tag = webp_bytes[o:o + 4]
        sz = struct.unpack("<I", webp_bytes[o + 4:o + 8])[0]
        if tag == b"VP8 ":
            return webp_bytes[o + 8:o + 8 + sz]
        o += 8 + sz + (sz & 1)
    raise AssertionError("no VP8 chunk")


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
    Wd, Hd = w.value, h.value
    cw, ch = (Wd + 1) // 2, (Hd + 1) // 2
    yp = b"".join(ctypes.string_at(
        ctypes.addressof(y.contents) + r * stride.value, Wd)
        for r in range(Hd))
    up = b"".join(ctypes.string_at(
        ctypes.addressof(u.contents) + r * uv_stride.value, cw)
        for r in range(ch))
    vp = b"".join(ctypes.string_at(
        ctypes.addressof(v.contents) + r * uv_stride.value, cw)
        for r in range(ch))
    lib.WebPFree(y)
    return Wd, Hd, yp, up, vp


def chunk(tag, body):
    out = tag + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        out += b"\x00"
    return out


def le24(v):
    return struct.pack("<I", v)[:3]


stills = [encode_lossy(frame_rgb(k), 60.0 + 10 * k)
          for k in range(len(DURATIONS))]
payloads = [vp8_payload(s) for s in stills]

anmf = b""
golden = {"canvas_w": W, "canvas_h": H, "loop_count": LOOPS,
          "frames": []}
for k, (p, dur) in enumerate(zip(payloads, DURATIONS)):
    body = (le24(0) + le24(0) + le24(W - 1) + le24(H - 1) +
            le24(dur) + bytes([0x02]) +  # no-blend, keep (no dispose)
            chunk(b"VP8 ", p))
    anmf += chunk(b"ANMF", body)
    Wd, Hd, yp, up, vp = decode_yuv(stills[k])
    assert (Wd, Hd) == (W, H)
    golden["frames"].append({
        "duration_ms": dur, "payload_bytes": len(p),
        "y_md5": hashlib.md5(yp).hexdigest(),
        "u_md5": hashlib.md5(up).hexdigest(),
        "v_md5": hashlib.md5(vp).hexdigest(),
        "y_sum": sum(yp), "u_sum": sum(up), "v_sum": sum(vp)})

vp8x = chunk(b"VP8X", bytes([0x02, 0, 0, 0]) + le24(W - 1) + le24(H - 1))
anim = chunk(b"ANIM", struct.pack("<I", 0xFF306090) +
             struct.pack("<H", LOOPS))
body = b"WEBP" + vp8x + anim + anmf
out = b"RIFF" + struct.pack("<I", len(body)) + body

with open(os.path.join(MAIN_RES, "wild_anim_lossy.webp"), "wb") as f:
    f.write(out)
with open(os.path.join(TEST_RES, "webp_anim_lossy_golden.json"),
          "w") as f:
    json.dump(golden, f, indent=1, sort_keys=True)
print("fixture", len(out), "bytes;",
      [g["y_sum"] for g in golden["frames"]])
