#!/usr/bin/env python3
"""Margin scan for g19_helmert_7param's fixed-point floor(deg*2^20) outputs.

Python replica of the full chain (GK zone-4 inverse -> geocentric
Helmert position-vector -> Bowring) over the ACTUAL fixture rows at all
three SFs. The minimum distance of lon*2^20 / lat*2^20 to integer
boundaries must dwarf the accumulated cross-engine transcendental drift
(~1e-6 on this grid). Run: python3 tools/g19_margin_scan.py
"""
import math
import glob

import duckdb

DEG2RAD = math.pi / 180.0
SEC2RAD = math.pi / (180.0 * 3600.0)

# Bessel 1841 / WGS84 (mirror Regrid.Ellipsoid arithmetic)
def ellipsoid(a, invf):
    f = 1.0 / invf
    return a, f, f * (2 - f)

A_B, F_B, E2_B = ellipsoid(6377397.155, 299.1528128)
A_W, F_W, E2_W = ellipsoid(6378137.0, 298.257223563)

# TmParams(12, 0, 1, 4500000, 0, Bessel)
LON0, K0, FE, FN = 12.0, 1.0, 4500000.0, 0.0
E2 = E2_B
EP2 = E2 / (1 - E2)
M0C = 1 - E2 / 4 - 3 * E2 * E2 / 64 - 5 * E2 * E2 * E2 / 256
E1 = (1 - math.sqrt(1 - E2)) / (1 + math.sqrt(1 - E2))
P2 = 3 * E1 / 2 - 27 * E1 ** 3 / 32
P4 = 21 * E1 * E1 / 16 - 55 * E1 ** 4 / 32
P6 = 151 * E1 ** 3 / 96
P8 = 1097 * E1 ** 4 / 512

# HelmertDatumShift(598.1, 73.7, 418.2, 0.202, 0.045, -2.455, 6.7)
DX, DY, DZ = 598.1, 73.7, 418.2
RX, RY, RZ = 0.202 * SEC2RAD, 0.045 * SEC2RAD, -2.455 * SEC2RAD
S = 1.0 + 6.7 * 1e-6
M = ((S, -S * RZ, S * RY), (S * RZ, S, -S * RX), (-S * RY, S * RX, S))
B_W = A_W * (1 - F_W)
EP2_W = E2_W / (1 - E2_W)


def chain(gx, gy):
    mu = ((gy - FN) / K0 + 0.0) / (A_B * M0C)
    phi1 = (mu + P2 * math.sin(2 * mu) + P4 * math.sin(4 * mu)
            + P6 * math.sin(6 * mu) + P8 * math.sin(8 * mu))
    sp1, cp1, tp1 = math.sin(phi1), math.cos(phi1), math.tan(phi1)
    c1 = EP2 * cp1 * cp1
    t1 = tp1 * tp1
    om = 1.0 - E2 * sp1 * sp1
    n1 = A_B / math.sqrt(om)
    r1 = A_B * (1 - E2) / (om * math.sqrt(om))
    dd = (gx - FE) / (n1 * K0)
    lat = (phi1 - (n1 * tp1 / r1) * (dd * dd / 2.0
           - (5.0 + 3.0 * t1 + 10.0 * c1 - 4.0 * c1 * c1 - 9.0 * EP2)
           * dd ** 4 / 24.0
           + (61.0 + 90.0 * t1 + 298.0 * c1 + 45.0 * t1 * t1 - 252.0 * EP2
              - 3.0 * c1 * c1) * dd ** 6 / 720.0)) / DEG2RAD
    lon = LON0 + (dd - (1.0 + 2.0 * t1 + c1) * dd ** 3 / 6.0
                  + (5.0 - 2.0 * c1 + 28.0 * t1 - 3.0 * c1 * c1 + 8.0 * EP2
                     + 24.0 * t1 * t1) * dd ** 5 / 120.0) / cp1 / DEG2RAD
    # Helmert
    phi, lam = lat * DEG2RAD, lon * DEG2RAD
    sp, cp = math.sin(phi), math.cos(phi)
    sl, cl = math.sin(lam), math.cos(lam)
    n = A_B / math.sqrt(1.0 - E2_B * sp * sp)
    x, y, z = n * cp * cl, n * cp * sl, n * (1.0 - E2_B) * sp
    xp = DX + M[0][0] * x + M[0][1] * y + M[0][2] * z
    yp = DY + M[1][0] * x + M[1][1] * y + M[1][2] * z
    zp = DZ + M[2][0] * x + M[2][1] * y + M[2][2] * z
    pr = math.sqrt(xp * xp + yp * yp)
    theta = math.atan2(zp * A_W, pr * B_W)
    st, ct = math.sin(theta), math.cos(theta)
    lat2 = math.atan2(zp + EP2_W * B_W * st ** 3,
                      pr - E2_W * A_W * ct ** 3) / DEG2RAD
    lon2 = math.atan2(yp, xp) / DEG2RAD
    return lon2, lat2


def margin(v):
    f = (v * 1048576.0) % 1.0
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
            gx = 4420000.0 + float(pk % 60) * 2963.0
            gy = 5240000.0 + float(sz % 45) * 4231.0
            lon2, lat2 = chain(gx, gy)
            for ax, v in (("lon", lon2), ("lat", lat2)):
                m = margin(v)
                if m < w[0]:
                    w = (m, (sf, pk, ax, v))
        print(f"{sf}: rows={len(rows)} worst margin {w[0]:.3e} at {w[1]}")
        if w[0] < worst[0]:
            worst = w
    print(f"OVERALL worst 2^20-grid margin: {worst[0]:.3e} at {worst[1]}")
    assert worst[0] > 1e-4, "margin too thin vs ~1e-6 drift"
    print("OK: margin dwarfs cross-engine transcendental drift")


if __name__ == "__main__":
    main()
