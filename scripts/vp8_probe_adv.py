#!/usr/bin/env python3
"""Advanced-API libwebp fixtures for the two VP8 paths the simple
encoder API never emits: the SIMPLE loop-filter profile and
MULTI-PARTITION token streams. Uses WebPConfig/WebPPicture via ctypes
(ABI-probed: WebPConfigInitInternal returns 0 on a version mismatch,
so a wrong struct layout fails loudly, not silently). Goldens are
WebPDecodeYUV planes, same standard as vp8_probe.py.
"""
import ctypes, hashlib, json, os, struct, sys

LIB = "/usr/lib/x86_64-linux-gnu/libwebp.so.7"
lib = ctypes.CDLL(LIB)
ABI = 0x020F  # encoder ABI for libwebp 1.2.x


class WebPConfig(ctypes.Structure):
    _fields_ = [
        ("lossless", ctypes.c_int), ("quality", ctypes.c_float),
        ("method", ctypes.c_int), ("image_hint", ctypes.c_int),
        ("target_size", ctypes.c_int), ("target_PSNR", ctypes.c_float),
        ("segments", ctypes.c_int), ("sns_strength", ctypes.c_int),
        ("filter_strength", ctypes.c_int),
        ("filter_sharpness", ctypes.c_int),
        ("filter_type", ctypes.c_int), ("autofilter", ctypes.c_int),
        ("alpha_compression", ctypes.c_int),
        ("alpha_filtering", ctypes.c_int),
        ("alpha_quality", ctypes.c_int), ("pass_", ctypes.c_int),
        ("show_compressed", ctypes.c_int),
        ("preprocessing", ctypes.c_int), ("partitions", ctypes.c_int),
        ("partition_limit", ctypes.c_int),
        ("emulate_jpeg_size", ctypes.c_int),
        ("thread_level", ctypes.c_int), ("low_memory", ctypes.c_int),
        ("near_lossless", ctypes.c_int), ("exact", ctypes.c_int),
        ("use_delta_palette", ctypes.c_int),
        ("use_sharp_yuv", ctypes.c_int),
        ("qmin", ctypes.c_int), ("qmax", ctypes.c_int)]


WriterFn = ctypes.CFUNCTYPE(ctypes.c_int,
    ctypes.POINTER(ctypes.c_ubyte), ctypes.c_size_t, ctypes.c_void_p)


class WebPPicture(ctypes.Structure):
    _fields_ = [
        ("use_argb", ctypes.c_int), ("colorspace", ctypes.c_int),
        ("width", ctypes.c_int), ("height", ctypes.c_int),
        ("y", ctypes.c_void_p), ("u", ctypes.c_void_p),
        ("v", ctypes.c_void_p),
        ("y_stride", ctypes.c_int), ("uv_stride", ctypes.c_int),
        ("a", ctypes.c_void_p), ("a_stride", ctypes.c_int),
        ("pad1", ctypes.c_uint32 * 2),
        ("argb", ctypes.c_void_p), ("argb_stride", ctypes.c_int),
        ("pad2", ctypes.c_uint32 * 3),
        ("writer", WriterFn), ("custom_ptr", ctypes.c_void_p),
        ("extra_info_type", ctypes.c_int),
        ("extra_info", ctypes.c_void_p),
        ("stats", ctypes.c_void_p), ("error_code", ctypes.c_int),
        ("progress_hook", ctypes.c_void_p),
        ("user_data", ctypes.c_void_p),
        ("pad3", ctypes.c_uint32 * 3),
        ("pad4", ctypes.c_void_p), ("pad5", ctypes.c_void_p),
        ("pad6", ctypes.c_uint32 * 8),
        ("memory_", ctypes.c_void_p), ("memory_argb_", ctypes.c_void_p),
        ("pad7", ctypes.c_void_p * 2)]


lib.WebPConfigInitInternal.restype = ctypes.c_int
lib.WebPConfigInitInternal.argtypes = [
    ctypes.POINTER(WebPConfig), ctypes.c_int, ctypes.c_float,
    ctypes.c_int]
lib.WebPPictureInitInternal.restype = ctypes.c_int
lib.WebPPictureInitInternal.argtypes = [
    ctypes.POINTER(WebPPicture), ctypes.c_int]
lib.WebPPictureImportRGB.restype = ctypes.c_int
lib.WebPPictureImportRGB.argtypes = [
    ctypes.POINTER(WebPPicture), ctypes.c_char_p, ctypes.c_int]
lib.WebPValidateConfig.restype = ctypes.c_int
lib.WebPValidateConfig.argtypes = [ctypes.POINTER(WebPConfig)]
lib.WebPEncode.restype = ctypes.c_int
lib.WebPEncode.argtypes = [ctypes.POINTER(WebPConfig),
                           ctypes.POINTER(WebPPicture)]
lib.WebPPictureFree.argtypes = [ctypes.POINTER(WebPPicture)]
lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_ubyte)
lib.WebPDecodeYUV.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
lib.WebPFree.argtypes = [ctypes.c_void_p]


def pixels(w, h, seed):
    x = seed | 1
    buf = bytearray()
    for y in range(h):
        for xx in range(w):
            x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
            x ^= x >> 7
            x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
            if (xx // 16 + y // 16) % 2 == 0:
                buf += bytes(((xx * 3) % 256, (y * 3) % 256, 80))
            else:
                buf += bytes((x & 255, (x >> 8) & 255, (x >> 16) & 255))
    return bytes(buf)


def encode_adv(rgb, w, h, tweak):
    cfg = WebPConfig()
    ok = lib.WebPConfigInitInternal(ctypes.byref(cfg), 0,
                                    ctypes.c_float(75.0), ABI)
    assert ok, "ABI mismatch for WebPConfig"
    tweak(cfg)
    assert lib.WebPValidateConfig(ctypes.byref(cfg))
    pic = WebPPicture()
    assert lib.WebPPictureInitInternal(ctypes.byref(pic), ABI), \
        "ABI mismatch for WebPPicture"
    pic.width = w
    pic.height = h
    out = bytearray()

    @WriterFn
    def writer(data, size, _):
        out.extend(ctypes.string_at(data, size))
        return 1

    pic.writer = writer
    assert lib.WebPPictureImportRGB(ctypes.byref(pic), rgb, w * 3)
    okE = lib.WebPEncode(ctypes.byref(cfg), ctypes.byref(pic))
    err = pic.error_code
    lib.WebPPictureFree(ctypes.byref(pic))
    assert okE, f"encode failed err={err}"
    return bytes(out)


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


def frame_header_info(data):
    """peek the VP8 chunk: (simple_filter?, n_partitions) — decoded by
    a tiny bool-decoder replica, enough to prove the fixture exercises
    the intended path."""
    o = 12
    while o + 8 <= len(data):
        tag = data[o:o + 4]
        sz = struct.unpack("<I", data[o + 4:o + 8])[0]
        if tag == b"VP8 ":
            break
        o += 8 + sz + (sz & 1)
    p = o + 8

    class BD:
        def __init__(self, buf, start):
            self.buf = buf; self.pos = start + 2
            self.range_ = 255
            self.value = (buf[start] << 8) | buf[start + 1]
            self.bits = 0

        def bit(self, prob=128):
            split = 1 + (((self.range_ - 1) * prob) >> 8)
            big = split << 8
            if self.value >= big:
                ret = 1; self.range_ -= split; self.value -= big
            else:
                ret = 0; self.range_ = split
            while self.range_ < 128:
                self.value <<= 1; self.range_ <<= 1; self.bits += 1
                if self.bits == 8:
                    self.bits = 0
                    self.value |= self.buf[self.pos] if self.pos < len(
                        self.buf) else 0
                    self.pos += 1
            return ret

        def lit(self, n):
            v = 0
            for _ in range(n):
                v = (v << 1) | self.bit()
            return v

        def msigned(self, n):
            if not self.bit():
                return 0
            v = self.lit(n)
            return -v if self.bit() else v

    bd = BD(data, p + 10)
    bd.lit(2)  # colorspace+clamp
    if bd.bit():  # segmentation
        upd_map = bd.bit()
        if bd.bit():
            bd.bit()
            for _ in range(8):
                bd.msigned(7 if _ < 4 else 6)
        if upd_map:
            for _ in range(3):
                if bd.bit():
                    bd.lit(8)
    simple = bd.lit(1)
    bd.lit(6); bd.lit(3)
    if bd.bit():
        if bd.bit():
            for _ in range(8):
                if bd.bit():
                    bd.lit(6); bd.bit()
    nparts = 1 << bd.lit(2)
    return simple == 1, nparts


ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TEST_RES = os.path.join(ROOT, "src/test/resources/graft")

golden = {}
specs = [
    ("vp8_simplefilter_48x48", 48, 48, 0x77,
     lambda c: (setattr(c, "filter_type", 0),
                setattr(c, "filter_strength", 60),
                setattr(c, "autofilter", 0))),
    # multi-partition emission needs the non-token-buffer encode loop
    # (method <= 1); methods >= 2 collapse to one partition
    ("vp8_4part_64x48", 64, 48, 0x1331,
     lambda c: (setattr(c, "partitions", 2),
                setattr(c, "method", 1))),  # 4 token partitions
    ("vp8_8part_sf_80x48", 80, 48, 0xABC,
     lambda c: (setattr(c, "partitions", 3),
                setattr(c, "method", 1),
                setattr(c, "filter_type", 0),
                setattr(c, "filter_strength", 40))),
]
for name, w, h, seed, tweak in specs:
    rgb = pixels(w, h, seed)
    data = encode_adv(rgb, w, h, tweak)
    simple, nparts = frame_header_info(data)
    W, H, yp, up, vp = decode_yuv(data)
    assert (W, H) == (w, h)
    with open(os.path.join(TEST_RES, name + ".webp"), "wb") as f:
        f.write(data)
    golden[name] = {
        "w": W, "h": H, "bytes": len(data),
        "simple_filter": simple, "n_partitions": nparts,
        "y_md5": hashlib.md5(yp).hexdigest(),
        "u_md5": hashlib.md5(up).hexdigest(),
        "v_md5": hashlib.md5(vp).hexdigest(),
        "y_sum": sum(yp)}
    print(name, len(data), "bytes simple=%s parts=%d" % (simple, nparts))

path = os.path.join(TEST_RES, "vp8_golden.json")
merged = json.load(open(path))
merged.update(golden)
with open(path, "w") as f:
    json.dump(merged, f, indent=1, sort_keys=True)
print("goldens merged")
