#!/usr/bin/env python3
"""Margin scan for g20_ups_variant_a's fixed-point floor(v*64) outputs.

Python replica of the Snyder polar-stereographic variant-A forward
(Regrid.PsParams with k0Pole, EPSG:5041 UPS North) over the ACTUAL
fixture rows at all three SFs. pow is 1-ULP unstable cross-engine, so
the minimum x64-grid margin must dwarf ~1.5e-7 (the ULP at UPS
magnitudes). Run: python3 tools/g20_margin_scan.py
"""
import math
import glob

import duckdb

DEG2RAD = math.pi / 180.0
A = 6378137.0
F = 1.0 / 298.257223563
E2 = F * (2 - F)
E = math.sqrt(E2)
K0 = 0.994
FE = FN = 2000000.0
LON0 = 0.0
RHO_F = 2.0 * A * K0 / math.sqrt((1 + E) ** (1 + E) * (1 - E) ** (1 - E))


def forward(lon, lat):
    phi = lat * DEG2RAD
    esin = E * math.sin(phi)
    t = math.tan(math.pi / 4.0 - phi / 2.0) / \
        ((1.0 - esin) / (1.0 + esin)) ** (E / 2.0)
    rho = RHO_F * t
    dlam = (lon - LON0) * DEG2RAD
    return FE + rho * math.sin(dlam), FN + (-1.0 * rho) * math.cos(dlam)


def margin(v):
    f = (v * 64.0) % 1.0
    return min(f, 1.0 - f)


def main():
    worst = (1.0, None)
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        paths = glob.glob(f"/root/testdata/{sf}/part.parquet")
        if not paths:
            continue
        rows = duckdb.sql(
            f"SELECT p_partkey, p_size FROM '{paths[0]}'").fetchall()
        w = (1.0, None)
        for pk, sz in rows:
            lon = -178.73 + float(pk % 120) * 2.99
            lat = 62.17 + float(sz % 27) * 1.01
            x, y = forward(lon, lat)
            for ax, v in (("x", x), ("y", y)):
                m = margin(v)
                if m < w[0]:
                    w = (m, (sf, pk, ax, v))
        print(f"{sf}: rows={len(rows)} worst margin {w[0]:.3e} at {w[1]}")
        if w[0] < worst[0]:
            worst = w
    print(f"OVERALL worst x64-grid margin: {worst[0]:.3e} at {worst[1]}")
    assert worst[0] > 2e-5, "margin too thin vs ~1.5e-7 ULP drift"
    print("OK: margin dwarfs cross-engine pow/transcendental drift")


if __name__ == "__main__":
    main()
