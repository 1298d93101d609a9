#!/usr/bin/env python3
"""Scale-probe data generator (r12 verdict stretch-9): replicate the
read-only sf0.1 testdata K times (default 10 -> ~sf1) into an OUT dir
with per-replica key offsets, so every FK join stays consistent and the
heaviest bench queries can be timed at ~10x the driver's bench SF.

Replica perturbations keep the probe honest:
  - all keys offset per replica (joins neither dangle nor collapse)
  - document text is vowel-permuted per replica (translate with a
    distinct 'aeiou' permutation) plus a replica suffix: replicas are
    far in shingle/simhash/minhash space, so NEAR-dup density stays
    constant per corpus size instead of every doc becoming a genuine
    10-near-dup family (the first probe run showed e14 at 84x from
    exactly that artifact: suffix-only replicas ARE near-dups, and
    real sf1 data would not be 10x near-dup-dense); token counts and
    lengths are preserved so quality/length-based ops stay realistic
  - embeddings are dimension-ROTATED per replica (circular shift by k)
    plus a k*1e-4 offset: rotation preserves norms and the value
    distribution but decorrelates replicas, so cosine-near-dup density
    stays constant per corpus size (the k*1e-4-only first version left
    replica pairs at cosine ~1.0 and inflated e8 the same way the text
    suffix inflated e14)
  - region/nation stay fixed (TPC-H dimension tables do not scale)

Usage: python3 tools/sfprobe_gen.py [K] [OUT]  (defaults 10 /tmp/sfprobe1)
"""
import sys
import duckdb
from itertools import permutations

# greedily pick permutations that agree with every already-kept one in
# at most ONE vowel position: lexicographically consecutive permutations
# share long prefixes (perms 0-5 all keep 'ae'), which left replicas 0-5
# near-identical and re-inflated the near-dup queries the perturbation
# exists to keep honest. [0] keeps the identity PERMUTATION (replica 0's
# letters match the source; the ' r0' suffix is still appended).
def _pick_perms(n):
    kept = ["aeiou"]
    # only 8 perms exist at agreement <= 1; relax the cap as needed
    # (any two DISTINCT perms agree in <= 3 positions, so cap 3 reaches
    # all 120 — enough for any K this probe will ever run)
    for cap in (1, 2, 3):
        for p in permutations("aeiou"):
            cand = "".join(p)
            if cand not in kept and all(
                    sum(a == b for a, b in zip(cand, q)) <= cap for q in kept):
                kept.append(cand)
            if len(kept) >= n:
                return kept
    return kept

K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfprobe1"

# K perms, not a fixed 10: reuse at K > 10 would hand replica pairs the
# SAME permutation, re-creating the suffix-only near-dup artifact
VOWEL_PERMS = _pick_perms(K)
assert len(VOWEL_PERMS) >= K, f"only {len(VOWEL_PERMS)} dissimilar perms for K={K}"
SRC = "/root/testdata/sf0.1"

OFF = dict(order=10_000_000, part=1_000_000, supp=100_000, cust=1_000_000,
           doc=1_000_000, vec=1_000_000, ev=10_000_000, user=1_000_000)

con = duckdb.connect()
con.execute("PRAGMA threads=16")
import os
os.makedirs(OUT, exist_ok=True)

def gen(table, select, extra=None):
    reps = " UNION ALL ".join(
        select.format(k=k, src=f"'{SRC}/{table}.parquet'",
                      **(extra(k) if extra else {})) for k in range(K))
    con.execute(f"COPY ({reps}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{OUT}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")

for t in ("region", "nation"):
    con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
    print(f"{t}: copied")

gen("customer", f"SELECT c_custkey + {{k}}*{OFF['cust']} AS c_custkey, c_name, "
    "c_nationkey, c_acctbal, c_mktsegment FROM {src}")
gen("supplier", f"SELECT s_suppkey + {{k}}*{OFF['supp']} AS s_suppkey, s_name, "
    "s_nationkey, s_acctbal FROM {src}")
# p_name vowel-permuted per replica: verbatim replication makes every
# name a 10-duplicate family and the edit-distance joins' TRUE match set
# grows quadratically (fz2 first measured 33x at 10x from exactly that);
# real TPC-H names at sf1 are ~distinct
gen("part", f"SELECT p_partkey + {{k}}*{OFF['part']} AS p_partkey, "
    "translate(p_name, 'aeiou', '{perm}') AS p_name, "
    "p_brand, p_type, p_size, p_retailprice FROM {src}",
    extra=lambda k: dict(perm=VOWEL_PERMS[k]))
gen("orders", f"SELECT o_orderkey + {{k}}*{OFF['order']} AS o_orderkey, "
    f"o_custkey + {{k}}*{OFF['cust']} AS o_custkey, o_orderstatus, "
    "o_totalprice, o_orderdate, o_orderpriority FROM {src}")
gen("lineitem", f"SELECT l_orderkey + {{k}}*{OFF['order']} AS l_orderkey, "
    f"l_partkey + {{k}}*{OFF['part']} AS l_partkey, "
    f"l_suppkey + {{k}}*{OFF['supp']} AS l_suppkey, "
    "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
    "l_returnflag, l_linestatus, l_shipdate FROM {src}")
gen("events", f"SELECT event_id + {{k}}*{OFF['ev']} AS event_id, ts, "
    f"user_id + {{k}}*{OFF['user']} AS user_id, event_type, value, props FROM {{src}}".replace("{{src}}", "{src}"))
gen("documents", f"SELECT doc_id + {{k}}*{OFF['doc']} AS doc_id, "
    "translate(text, 'aeiou', '{perm}') || ' r{k}' AS text, "
    "lang, source, n_chars + {slen} AS n_chars FROM {src}",
    extra=lambda k: dict(perm=VOWEL_PERMS[k], slen=len(f" r{k}")))
gen("embeddings", f"SELECT vec_id + {{k}}*{OFF['vec']} AS vec_id, "
    "list_transform(list_concat(embedding[{k1}:], embedding[:{k}]), "
    "x -> CAST(x + {k}*1e-4 AS FLOAT)) AS embedding, "
    "label FROM {src}",
    extra=lambda k: dict(k1=k + 1))
print("done:", OUT)
