#!/usr/bin/env python3
"""Margin scan for au1_stft_energy's per-term floor(x*cos/sin*2^20).

The au1 fixture is SF-independent (a synthesized 48-frame stereo PCM
WAV), so the scan enumerates the FULL finite term domain: every
(band, n, x) triple the fixed-point DFT floors. The minimum distance
from a floor boundary must dwarf the proven <=1-ULP cos/sin
cross-engine drift (~1e-10 at these magnitudes). Exact-integer terms
(theta = 0 -> cos = 1.0 exactly) are deterministic on both engines and
scan as a separate count, not margins. Run: python3 tools/au1_margin_scan.py
"""
import math

W0 = 2.0 * math.pi / 17
SCALE = 1048576.0


def main():
    # A 1-ULP cos/sin disagreement perturbs a term by ~|v| * 2^-52, so
    # the safety condition is RELATIVE: each term's distance from a floor
    # boundary must exceed |v| * 2^-40 (a 4096x cushion on the drift).
    # theta = 0 terms are exact on both engines (cos(0) = 1, sin(0) = 0
    # are required-exact libm special cases) and exempt.
    worst = (float("inf"), None)
    exact = 0
    for f in range(48):
        for ch in range(2):
            x = float((f * 37 + ch * 19) % 200 - 100)
            for band in range(4):
                for n in range(17):
                    for fn in (math.cos, math.sin):
                        theta = W0 * (band * n)
                        if theta == 0.0 or x == 0.0:
                            exact += 1
                            continue
                        v = x * fn(theta) * SCALE
                        m = min(v % 1.0, 1.0 - (v % 1.0))
                        drift = abs(v) * 2.0 ** -40
                        ratio = m / drift if drift > 0 else float("inf")
                        if ratio < worst[0]:
                            worst = (ratio, (f, ch, band, n, fn.__name__, v, m))
    print(f"exact terms (theta=0 / x=0): {exact}")
    print(f"worst margin/drift ratio: {worst[0]:.3e} at {worst[1]}")
    assert worst[0] > 1.0, "a term sits within the drift cushion of a boundary"
    print("OK: every term's floor is stable under 1-ULP cos/sin drift")


if __name__ == "__main__":
    main()
