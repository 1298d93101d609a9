#!/usr/bin/env python3
"""Independent reference implementation of Felzenszwalb-Huttenlocher graph
segmentation (the published 2004 IJCV algorithm), used to generate the
golden label partition SegmentationSpec pins the Scala kernel against.

Deliberately mirrors the engine's documented determinism contract
(Segmentation.felzenszwalb): 8-connectivity edges enumerated row-major
interleaved (right, down, down-right, down-left), edge weights compared
for SORTING at float32 precision with ties broken by enumeration index,
merge predicate evaluated at float64. Everything else is the textbook
algorithm — an independent reimplementation, not a port of the Scala.

Run: python3 tools/felz_golden.py > src/test/resources/felz_golden_24x24.csv
"""
import math
import struct

H = W = 24
SCALE = 35.0
MIN_SIZE = 15


def f32(x):
    return struct.unpack('f', struct.pack('f', x))[0]


def g0(r, c):
    return f32(10.0 * ((r // 8) + (c // 8)) + ((r * 7 + c * 13) % 5) * 0.25)


def g1(r, c):
    return f32(6.0 * ((r // 12) * 2 + (c // 6) % 2) + ((r * 3 + c * 5) % 7) * 0.25)


def main():
    n = H * W
    ch0 = [g0(i // W, i % W) for i in range(n)]
    ch1 = [g1(i // W, i % W) for i in range(n)]

    edges = []  # (a, b, w64)
    for r in range(H):
        for c in range(W):
            i = r * W + c
            if c + 1 < W:
                edges.append((i, i + 1))
            if r + 1 < H:
                edges.append((i, i + W))
                if c + 1 < W:
                    edges.append((i, i + W + 1))
                if c > 0:
                    edges.append((i, i + W - 1))

    def dist(a, b):
        d0 = ch0[a] - ch0[b]
        d1 = ch1[a] - ch1[b]
        return math.sqrt(d0 * d0 + d1 * d1)

    ws = [dist(a, b) for a, b in edges]
    order = sorted(range(len(edges)), key=lambda e: (f32(ws[e]), e))

    parent = list(range(n))
    size = [1] * n
    intd = [0.0] * n

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        if size[a] < size[b]:
            a, b = b, a
        parent[b] = a
        size[a] += size[b]
        return a

    for e in order:
        a, b = edges[e]
        ra, rb = find(a), find(b)
        w = ws[e]
        if ra != rb and w <= min(intd[ra] + SCALE / size[ra],
                                 intd[rb] + SCALE / size[rb]):
            root = union(ra, rb)
            intd[root] = w

    for e in order:
        a, b = edges[e]
        ra, rb = find(a), find(b)
        if ra != rb and (size[ra] < MIN_SIZE or size[rb] < MIN_SIZE):
            union(ra, rb)

    label_of = {}
    out = []
    for i in range(n):
        r = find(i)
        if r not in label_of:
            label_of[r] = len(label_of)
        out.append(label_of[r])
    print(",".join(map(str, out)))


if __name__ == "__main__":
    main()
