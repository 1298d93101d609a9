#!/usr/bin/env python3
"""cov5 margin scan (the g23 discipline): distance of every row's
area/16 to its floor boundary vs the ~1e-13*value cross-engine sin/ln
drift band. Replays the oracle's own formula in python (independent
third evaluation) over all customers at each SF."""
import math, sys
import duckdb

K = math.pi / 180.0
F = 1.0 / 298.257223563
E2 = F * (2 - F)
E = math.sqrt(E2)
A = 6378137.0
B2 = A * A * (1 - E2)

def zf(phi_deg):
    s = math.sin(phi_deg * K)
    return s / (1 - E2 * s * s) + math.log((1 + E * s) / (1 - E * s)) / (2 * E)

def area(g):
    bx = -96.0 + (g % 30) * 0.02
    by = 30.0 + (g % 20) * 0.02
    w = (g % 3 + 4) * 0.001
    h = (g % 2 + 3) * 0.001
    def mx(m): return bx + m * 0.002
    def my(m): return by + m * 0.001
    edges = [
        (mx(0), mx(0) + w, my(0)),
        (mx(0) + w, mx(1) + w, my(1)),
        (mx(1) + w, mx(2) + w, my(2)),
        (mx(2) + w, mx(2), my(2) + h),
        (mx(2), mx(1), my(1) + h),
        (mx(1), mx(0), my(0) + h)]
    s = 0.0
    for l1, l2, phi in edges:
        s += (l2 * K - l1 * K) * (zf(phi) + zf(phi))
    return abs(s) * (B2 / 4.0)

worst = (1e18, None)
for sf in sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]:
    gs = [r[0] for r in duckdb.sql(
        f"SELECT c_custkey FROM '{sf}/customer.parquet'").fetchall()]
    for g in gs:
        v = area(g) / 16.0
        fr = v - math.floor(v)
        margin = min(fr, 1.0 - fr)
        drift = 1e-13 * v  # the documented cross-engine band, in fp units
        if margin / max(drift, 1e-300) < worst[0]:
            worst = (margin / max(drift, 1e-300), (sf, g, v, margin, drift))
    print(f"{sf}: {len(gs)} rows scanned")
ratio, (sf, g, v, margin, drift) = worst
print(f"worst margin/drift ratio: {ratio:.3g} (g={g} at {sf}: "
      f"area_fp value {v:.6f}, margin {margin:.3g}, drift band {drift:.3g})")
assert ratio > 1e3, "margin too close to the drift band -- fixed point unsafe"
print("MARGIN OK (>1000x the drift band)")
