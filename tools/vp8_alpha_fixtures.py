#!/usr/bin/env python3
"""Generate ALPH (lossy WebP alpha plane) conformance fixtures with the
installed libwebp: WebPEncodeRGBA at quality<100 over images WITH alpha
produces VP8X + ALPH + VP8 layouts. Expected outputs recorded from the
reference decoder itself: the ALPHA channel of WebPDecodeRGBA (alpha is
independent of chroma upsampling) plus the YUV planes from
WebPDecodeYUV — together they pin the ALPH decode (raw/lossless methods,
the 4 prediction filters) and the keyframe decode of the paired VP8
chunk. Output: src/test/resources/vp8alpha/<name>.webp + <name>.alpha
(w*h bytes) + <name>.yuv, manifest lines "<name> <w> <h>".
"""
import ctypes, os

lib = ctypes.CDLL("libwebp.so.7")
lib.WebPEncodeRGBA.restype = ctypes.c_size_t
lib.WebPEncodeRGBA.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
    ctypes.c_int, ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
lib.WebPDecodeRGBA.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
lib.WebPDecodeYUV.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]

def synth(w, h, kind):
    buf = bytearray(w * h * 4)
    for y in range(h):
        for x in range(w):
            r = (x * 5 + y * 3) % 256
            g = (x * 2 + y * 7 + 40) % 256
            b = (255 - x - 2 * y) % 256
            if kind == "gradient_alpha":   # smooth alpha -> filtered plane
                a = (x * 255) // max(1, w - 1)
            elif kind == "blocky_alpha":   # flat regions -> lossless/VP8L alpha
                a = 255 if (x // 8 + y // 8) % 2 == 0 else 64
            else:                           # noisy alpha
                a = (x * 97 + y * 41 + 13) % 256
            i = (y * w + x) * 4
            buf[i] = r; buf[i + 1] = g; buf[i + 2] = b; buf[i + 3] = a
    return bytes(buf)

outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
    "src/test/resources/vp8alpha")
os.makedirs(outdir, exist_ok=True)
manifest = []
for name, w, h, kind, q in [
    ("grad_48x32_q75", 48, 32, "gradient_alpha", 75),
    ("blocky_40x24_q60", 40, 24, "blocky_alpha", 60),
    ("noisy_33x17_q85", 33, 17, "noisy_alpha", 85),
]:
    rgba = synth(w, h, kind)
    out = ctypes.POINTER(ctypes.c_uint8)()
    size = lib.WebPEncodeRGBA(rgba, w, h, w * 4, float(q), ctypes.byref(out))
    assert size > 0, name
    webp = ctypes.string_at(out, size)
    assert b"ALPH" in webp[:40], (name, webp[:40])
    ww = ctypes.c_int(); hh = ctypes.c_int()
    dec = lib.WebPDecodeRGBA(webp, size, ctypes.byref(ww), ctypes.byref(hh))
    assert dec and ww.value == w and hh.value == h
    full = ctypes.string_at(dec, w * h * 4)
    alpha = bytes(full[i * 4 + 3] for i in range(w * h))
    up = ctypes.POINTER(ctypes.c_uint8)(); vp = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int(); uv_stride = ctypes.c_int()
    yp = lib.WebPDecodeYUV(webp, size, ctypes.byref(ww), ctypes.byref(hh),
        ctypes.byref(up), ctypes.byref(vp), ctypes.byref(stride),
        ctypes.byref(uv_stride))
    assert yp
    uvw = (w + 1) // 2; uvh = (h + 1) // 2
    planes = bytearray()
    for r in range(h):
        planes += ctypes.string_at(ctypes.byref(yp.contents, r * stride.value), w)
    for plane in (up, vp):
        for r in range(uvh):
            planes += ctypes.string_at(
                ctypes.byref(plane.contents, r * uv_stride.value), uvw)
    open(os.path.join(outdir, name + ".webp"), "wb").write(webp)
    open(os.path.join(outdir, name + ".alpha"), "wb").write(alpha)
    open(os.path.join(outdir, name + ".yuv"), "wb").write(bytes(planes))
    hdr = webp[webp.find(b"ALPH") + 8]
    print(name, size, "bytes; ALPH header byte:",
        f"method={hdr & 3} filter={(hdr >> 2) & 3} pre={(hdr >> 4) & 3}")
    manifest.append(f"{name} {w} {h}")
open(os.path.join(outdir, "manifest.txt"), "w").write("\n".join(manifest) + "\n")
print("done")
