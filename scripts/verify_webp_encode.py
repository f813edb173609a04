#!/usr/bin/env python3
"""Verify the Scala store-mode VP8L encoder against libwebp AND the
independent Python spec decoder (driver-side; run after
`sbt "Test/runMain graft.WebpEncodeEmit"`).

Appends/updates a `scala_encode_sample` entry in webp_golden.json with
the encoded CRC32 so WebpCodecSpec can pin the encoder's exact bytes.
"""
import ctypes, json, os, sys, zlib

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import webp_ref

lib = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libwebp.so.7")
lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
lib.WebPDecodeRGBA.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                               ctypes.POINTER(ctypes.c_int),
                               ctypes.POINTER(ctypes.c_int)]
lib.WebPFree.argtypes = [ctypes.c_void_p]

W, H = 33, 21  # must match graft.WebpEncodeEmit


def expected_rgba():
    rgb = [(i * 7 + 13) % 256 for i in range(W * H * 3)]
    out = bytearray()
    for p in range(W * H):
        out += bytes((rgb[p * 3], rgb[p * 3 + 1], rgb[p * 3 + 2], 255))
    return bytes(out)


def main():
    data = open("/tmp/graft_webp_encode_sample.webp", "rb").read()
    exp = expected_rgba()

    w = ctypes.c_int(); h = ctypes.c_int()
    p = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    assert p, "libwebp REFUSED the scala encode"
    try:
        got = bytes(p[0:w.value * h.value * 4])
    finally:
        lib.WebPFree(p)
    assert (w.value, h.value) == (W, H), (w.value, h.value)
    assert got == exp, "libwebp decode != source pixels"
    print("libwebp decode of scala encode: EXACT")

    w2, h2, rgba2 = webp_ref.decode(data)
    assert (w2, h2) == (W, H) and rgba2 == exp, "spec decoder mismatch"
    print("independent spec decoder: EXACT")

    gpath = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))),
        "src/test/resources/graft/webp_golden.json")
    goldens = json.load(open(gpath))
    goldens = [g for g in goldens if g["file"] != "scala_encode_sample"]
    goldens.append({
        "file": "scala_encode_sample", "width": W, "height": H,
        "bytes": len(data), "encode_crc32": zlib.crc32(data),
        "rgba_crc32": zlib.crc32(exp),
        "sum_r": sum(exp[0::4]), "sum_g": sum(exp[1::4]),
        "sum_b": sum(exp[2::4]), "sum_a": sum(exp[3::4]),
        "wsum": sum((i + 1) * v for i, v in enumerate(exp)) % (1 << 61),
        "chunks": ["VP8L"]})
    json.dump(goldens, open(gpath, "w"), indent=1)
    print(f"golden updated: encode_crc32={zlib.crc32(data)} "
          f"bytes={len(data)}")


if __name__ == "__main__":
    main()
