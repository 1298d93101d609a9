#!/usr/bin/env python3
"""g23 fixed-point margin scan (the g6/g15 recipe).

Replicates the g23 ellipsoidal closed forms in python over every part row
at all three SFs and reports the minimum distance of area/16 and perim to
a floor boundary. Cross-engine sin/ln drift is ~1e-13 * value; margins
must sit orders above that for the floor decisions to be hash-stable.

Usage: python3 tools/g23_margin_scan.py [sfdir ...]
"""
import math, sys
import duckdb

E2 = (lambda f: f * (2 - f))(1.0 / 298.257223563)
E = math.sqrt(E2)
A = 6378137.0
B2 = A * A * (1 - E2)
K = math.pi / 180.0


def F(phi):
    s = math.sin(phi)
    return s / (1 - E2 * s * s) + math.log((1 + E * s) / (1 - E * s)) / (2 * E)


def main(dirs):
    worst_a, worst_p = 1e9, 1e9
    n = 0
    for d in dirs:
        rows = duckdb.sql(
            f"SELECT p_partkey, p_size FROM '{d}/part.parquet'").fetchall()
        for pk, size in rows:
            lon0 = -96.0 + (pk % 50) * 0.01
            lat0 = 30.0 + (size % 40) * 0.01
            dx = 0.01 + (pk % 7) * 0.001
            dy = 0.008 + (size % 5) * 0.001
            l1, l2 = lon0 * K, (lon0 + dx) * K
            f1, f2 = lat0 * K, (lat0 + dy) * K
            area = abs((l2 - l1) * (F(f2) - F(f1))) * (B2 / 2) / 16.0
            s1, s2 = math.sin(f1), math.sin(f2)
            fm = (f1 + f2) / 2
            w2 = 1 - E2 * math.sin(fm) ** 2
            perim = (A / math.sqrt(1 - E2 * s1 * s1)) * math.cos(f1) * (l2 - l1) \
                + (A / math.sqrt(1 - E2 * s2 * s2)) * math.cos(f2) * (l2 - l1) \
                + 2 * (A * (1 - E2)) / (w2 * math.sqrt(w2)) * (f2 - f1)
            for v, tag in ((area, 'a'), (perim, 'p')):
                frac = v - math.floor(v)
                margin = min(frac, 1 - frac)
                if tag == 'a':
                    worst_a = min(worst_a, margin)
                else:
                    worst_p = min(worst_p, margin)
            n += 1
    print(f"rows={n} worst area/16 margin={worst_a:.3e} worst perim margin={worst_p:.3e}")
    drift_a = 1e-13 * 2e5   # ~area/16 magnitude
    drift_p = 1e-13 * 6e3   # ~perim magnitude
    assert worst_a > 100 * drift_a, f"area margin {worst_a} too close to drift {drift_a}"
    assert worst_p > 100 * drift_p, f"perim margin {worst_p} too close to drift {drift_p}"
    print("OK: margins clear cross-engine drift by >=100x")


if __name__ == '__main__':
    main(sys.argv[1:] or [f"/root/testdata/sf{s}" for s in ("0.001", "0.01", "0.1")])
