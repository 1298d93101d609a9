#!/usr/bin/env python3
"""Margin scan for g18_gauss_kruger's fixed-point floor(v*64) outputs.

Python replica of the Snyder TM forward series (Regrid.TmParams /
TransverseMercatorFromGeographic) over the ACTUAL fixture rows
(part.parquet at all three SFs). For each of the four outputs
(gk_x, gk_y, o_x, o_y) computes v*64 and the distance to the nearest
integer boundary; the minimum over all rows/columns must dwarf the
few-ULP StrictMath-vs-libm drift (~1e-7 at this magnitude) for the
cross-engine hash to be deterministic. Run:

    python3 tools/g18_margin_scan.py
"""
import math
import glob

import duckdb

DEG2RAD = math.pi / 180.0


class Tm:
    """Mirror of graft.operators.Regrid.TmParams (same arithmetic order)."""

    def __init__(self, lon0, lat0=0.0, k0=0.9996, fe=500000.0, fn=0.0,
                 a=6378137.0, invf=298.257223563, e2=None):
        self.lon0, self.lat0, self.k0, self.fe, self.fn, self.a = \
            lon0, lat0, k0, fe, fn, a
        f = 1.0 / invf
        self.e2 = f * (2 - f) if e2 is None else e2
        e2 = self.e2
        self.ep2 = e2 / (1 - e2)
        self.m0c = 1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 * e2 * e2 / 256
        self.m2c = 3 * e2 / 8 + 3 * e2 * e2 / 32 + 45 * e2 * e2 * e2 / 1024
        self.m4c = 15 * e2 * e2 / 256 + 45 * e2 * e2 * e2 / 1024
        self.m6c = 35 * e2 * e2 * e2 / 3072
        self.m0arc = self.arc(lat0)

    def arc(self, phi_deg):
        p = phi_deg * DEG2RAD
        return self.a * (self.m0c * p - self.m2c * math.sin(2 * p)
                         + self.m4c * math.sin(4 * p)
                         - self.m6c * math.sin(6 * p))

    def forward(self, lon, lat):
        phi = lat * DEG2RAD
        dlam = (lon - self.lon0) * DEG2RAD
        sp, cp, tp = math.sin(phi), math.cos(phi), math.tan(phi)
        n = self.a / math.sqrt(1.0 - self.e2 * sp * sp)
        t = tp * tp
        c = self.ep2 * cp * cp
        aa = dlam * cp
        m = self.a * (self.m0c * phi - self.m2c * math.sin(2 * phi)
                      + self.m4c * math.sin(4 * phi)
                      - self.m6c * math.sin(6 * phi))
        x = self.fe + self.k0 * n * (
            aa + (1.0 - t + c) * aa ** 3 / 6.0
            + (5.0 - 18.0 * t + t * t + 72.0 * c - 58.0 * self.ep2)
            * aa ** 5 / 120.0)
        y = self.fn + self.k0 * ((m - self.m0arc) + n * tp * (
            aa * aa / 2.0
            + (5.0 - t + 9.0 * c + 4.0 * c * c) * aa ** 4 / 24.0
            + (61.0 - 58.0 * t + t * t + 600.0 * c - 330.0 * self.ep2)
            * aa ** 6 / 720.0))
        return x, y


GK = Tm(9.0, 0.0, 1.0, 3500000.0, 0.0, a=6377397.155, invf=299.1528128)
O = Tm(9.0, 48.0, 1.0, 250000.0, 100000.0)


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
            lon = 7.217 + float(pk % 60) * 0.06
            lat = 47.303 + float(sz % 45) * 0.08
            for tag, (x, y) in (("gk", GK.forward(lon, lat)),
                                ("o", O.forward(lon, lat))):
                for ax, v in ((f"{tag}_x", x), (f"{tag}_y", y)):
                    m = margin(v)
                    if m < w[0]:
                        w = (m, (sf, pk, ax, v))
        print(f"{sf}: rows={len(rows)} worst margin {w[0]:.3e} at {w[1]}")
        if w[0] < worst[0]:
            worst = w
    print(f"OVERALL worst x64-grid margin: {worst[0]:.3e} at {worst[1]}")
    assert worst[0] > 1e-5, "margin too thin vs ~1e-7 ULP drift"
    print("OK: margin dwarfs cross-engine transcendental drift")


if __name__ == "__main__":
    main()
