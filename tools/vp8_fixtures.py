#!/usr/bin/env python3
"""Generate VP8 (lossy WebP) conformance fixtures with the installed
libwebp: encode deterministic synthetic images through the REAL encoder
(WebPEncodeRGB — default config: 4 segments, loop filter on, dynamic
token probability updates), then record libwebp's own decoded YUV420
planes as the expected output. The in-repo Vp8 decoder must reproduce
those planes BIT-EXACTLY (Vp8Spec) — this functionally verifies every
constant table, the bool decoder, token trees, dequant, IDCT/IWHT,
all intra predictors, segmentation, and the loop filter against the
reference implementation, with no network and no hand-typed expecteds.

Output: src/test/resources/vp8/<name>.webp + <name>.yuv (Y plane w*h
bytes row-major, then U then V at ceil(w/2)*ceil(h/2)), plus
manifest.txt lines "<name> <w> <h>".
"""
import ctypes, os, struct

lib = ctypes.CDLL("libwebp.so.7")
lib.WebPEncodeRGB.restype = ctypes.c_size_t
lib.WebPEncodeRGB.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
    ctypes.c_int, ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
lib.WebPDecodeYUV.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]

def synth(w, h, kind):
    """Deterministic RGB patterns with varied spectra (flat blocks, smooth
    gradients, hash noise, sharp edges) so the encoder emits a wide token
    mix (EOB runs, zeros, every value category, skips, B_PRED + 16x16)."""
    buf = bytearray(w * h * 3)
    for y in range(h):
        for x in range(w):
            if kind == "blocks":
                r = (x // 8 * 40 + y // 8 * 23) % 256
                g = 255 if (x // 16 + y // 16) % 2 == 0 else 30
                b = (x // 4 * 17) % 256
            elif kind == "gradient":
                r = (x * 255) // max(1, w - 1)
                g = (y * 255) // max(1, h - 1)
                b = ((x + y) * 255) // max(1, w + h - 2)
            elif kind == "noise":
                v = (x * 2654435761 + y * 40503 + 12345) & 0xffffffff
                r = (v >> 8) & 0xff; g = (v >> 16) & 0xff; b = (v >> 24) & 0xff
            else:  # edges
                r = 230 if (x + 2 * y) % 17 < 3 else 20
                g = 240 if x % 13 < 2 else (y * 11) % 256
                b = 250 if (x * y) % 29 == 0 else 60
            i = (y * w + x) * 3
            buf[i] = r; buf[i + 1] = g; buf[i + 2] = b
    return bytes(buf)

outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
    "src/test/resources/vp8")
os.makedirs(outdir, exist_ok=True)
manifest = []
cases = [
    ("blocks_64x48_q75", 64, 48, "blocks", 75),
    ("gradient_48x32_q50", 48, 32, "gradient", 50),
    ("noise_33x17_q90", 33, 17, "noise", 90),   # crop + high q (rich tokens)
    ("edges_80x64_q25", 80, 64, "edges", 25),   # low q (heavy quant, skips)
    ("gradient_16x16_q80", 16, 16, "gradient", 80),  # single MB
    ("noise_129x65_q60", 129, 65, "noise", 60), # crop on both axes, larger
]
for name, w, h, kind, q in cases:
    rgb = synth(w, h, kind)
    out = ctypes.POINTER(ctypes.c_uint8)()
    size = lib.WebPEncodeRGB(rgb, w, h, w * 3, float(q), ctypes.byref(out))
    assert size > 0, name
    webp = ctypes.string_at(out, size)
    ww = ctypes.c_int(); hh = ctypes.c_int()
    up = ctypes.POINTER(ctypes.c_uint8)(); vp = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int(); uv_stride = ctypes.c_int()
    yp = lib.WebPDecodeYUV(webp, size, ctypes.byref(ww), ctypes.byref(hh),
        ctypes.byref(up), ctypes.byref(vp), ctypes.byref(stride),
        ctypes.byref(uv_stride))
    assert yp and ww.value == w and hh.value == h, name
    uvw = (w + 1) // 2; uvh = (h + 1) // 2
    planes = bytearray()
    for r in range(h):
        planes += ctypes.string_at(ctypes.byref(yp.contents, r * stride.value), w)
    for plane in (up, vp):
        for r in range(uvh):
            planes += ctypes.string_at(
                ctypes.byref(plane.contents, r * uv_stride.value), uvw)
    open(os.path.join(outdir, name + ".webp"), "wb").write(webp)
    open(os.path.join(outdir, name + ".yuv"), "wb").write(bytes(planes))
    manifest.append(f"{name} {w} {h}")
    print(name, "webp", size, "bytes; yuv", len(planes))
open(os.path.join(outdir, "manifest.txt"), "w").write("\n".join(manifest) + "\n")
print("wrote", len(cases), "fixtures to", outdir)
