#!/usr/bin/env python3
"""Generate VP8L (lossless WebP) conformance fixtures with the installed
libwebp: real-encoder output (which uses the 2-D LZ77 distance
neighborhood, color cache, meta prefix images, and transform stacks the
in-repo synth writer never emits) paired with the exact RGBA pixels.
The in-repo Webp decoder must reproduce them byte-for-byte (WebpSpec) —
this guards the decode-only paths round trips can't reach (the r11
planeCodeToDistance sign fix class).

Output: src/test/resources/vp8l/<name>.webp + <name>.rgba (w*h*4 bytes
row-major RGBA), plus manifest.txt lines "<name> <w> <h>".
"""
import ctypes, os

lib = ctypes.CDLL("libwebp.so.7")
lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
lib.WebPEncodeLosslessRGBA.argtypes = [ctypes.c_char_p, ctypes.c_int,
    ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
lib.WebPDecodeRGBA.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]

def synth(w, h, kind):
    buf = bytearray(w * h * 4)
    for y in range(h):
        for x in range(w):
            if kind == "photo":  # smooth with local texture -> predictors + cache
                r = (x * 3 + y * 2 + ((x * y) % 7)) % 256
                g = (x + y * 4 + ((x + y) % 5)) % 256
                b = (255 - x * 2 + y) % 256
                a = 255
            elif kind == "palette":  # few colors -> color indexing
                k = (x // 3 + y // 2) % 5
                r, g, b, a = [(10, 40, 90, 255), (200, 30, 60, 255),
                              (60, 200, 30, 200), (0, 0, 0, 255),
                              (250, 250, 250, 255)][k]
            else:  # repeats: runs and 2-D matches -> LZ77 distance codes
                r = (x // 4 * 40) % 256
                g = ((x + 2 * y) // 3 * 30) % 256
                b = (y // 2 * 25) % 256
                a = 255 if (x + y) % 11 else 128
            i = (y * w + x) * 4
            buf[i] = r; buf[i + 1] = g; buf[i + 2] = b; buf[i + 3] = a
    return bytes(buf)

outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
    "src/test/resources/vp8l")
os.makedirs(outdir, exist_ok=True)
manifest = []
for name, w, h, kind in [
    ("photo_61x37", 61, 37, "photo"),
    ("palette_40x25", 40, 25, "palette"),
    ("repeats_96x48", 96, 48, "repeats"),
]:
    rgba = synth(w, h, kind)
    out = ctypes.POINTER(ctypes.c_uint8)()
    size = lib.WebPEncodeLosslessRGBA(rgba, w, h, w * 4, ctypes.byref(out))
    assert size > 0, name
    webp = ctypes.string_at(out, size)
    ww = ctypes.c_int(); hh = ctypes.c_int()
    dec = lib.WebPDecodeRGBA(webp, size, ctypes.byref(ww), ctypes.byref(hh))
    assert dec and ww.value == w and hh.value == h
    got = ctypes.string_at(dec, w * h * 4)
    assert got == rgba, name + ": libwebp round trip not lossless?!"
    open(os.path.join(outdir, name + ".webp"), "wb").write(webp)
    open(os.path.join(outdir, name + ".rgba"), "wb").write(rgba)
    manifest.append(f"{name} {w} {h}")
    print(name, size, "bytes")
open(os.path.join(outdir, "manifest.txt"), "w").write("\n".join(manifest) + "\n")
print("done")
