#!/usr/bin/env python3
"""Derive a ~sf1 testdata slice from sf0.1 by 10x replication (driver-side
tooling, like verify_local.py — not engine code).

Usage: python3 tools/scale_up.py [srcDir] [dstDir] [replicas]
Defaults: /root/testdata/sf0.1 /tmp/sf1_derived 10

Replication is NOT a blind copy — each replica is perturbed so derived data
keeps the original's statistical shape without manufacturing pathologies the
real sf1 would not have:
  - fact keys shift per replica (orderkey/custkey/doc_id/vec_id/event_id
    spaces stay disjoint), so key cardinalities scale with volume;
  - documents rotate their word order AND tag every 4th token with a
    replica marker (rotation alone is a circular shift that PRESERVES
    n-grams), so the near-dup detectors don't see a synthetic R-way
    near-duplicate of the whole corpus — candidate-pair volume scales
    linearly like a real corpus, not quadratically like a copy;
  - embeddings get a small deterministic per-replica offset, keeping the
    cluster structure while making vectors distinct;
  - event timestamps jitter a few ms per replica so time-ordered windows
    keep a deterministic order (no 10-deep exact-timestamp ties);
  - part and supplier SCALE WITH THE FACTS (replica k's lineitem rows remap
    l_partkey/l_suppkey into replica k's key stripe), exactly like real
    TPC-H where part/supplier cardinality grows with SF — so graph-on-parts
    and dim-join queries grow instead of saturating on a fixed dim;
  - region/nation copy through unscaled (fixed-size even in real TPC-H).
"""
import sys, os, shutil
import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_derived"
R = int(sys.argv[3]) if len(sys.argv) > 3 else 10

os.makedirs(dst, exist_ok=True)
con = duckdb.connect()

# Key stripes are DERIVED from the base corpus, not hardcoded: a fixed
# stripe (the old l_partkey + k*100000) silently collides across replicas
# the moment the base holds more keys than the stripe width (any base at
# or above ~sf0.5), merging distinct keys and corrupting every scaled
# join/graph surface with no error. The stripe is the next power of ten
# strictly above the max key over EVERY table that carries the key (PK
# and FK sides), so replica key spaces stay disjoint at any base SF.
def _stripe(*table_cols):
    m = 0
    for table, col in table_cols:
        v = con.execute(
            f"SELECT max({col}) FROM '{src}/{table}.parquet'").fetchone()[0]
        m = max(m, int(v or 0))
    s = 10
    while s <= m:
        s *= 10
    return s

S = {
    "ok": _stripe(("orders", "o_orderkey"), ("lineitem", "l_orderkey")),
    "ck": _stripe(("customer", "c_custkey"), ("orders", "o_custkey")),
    "pk": _stripe(("part", "p_partkey"), ("lineitem", "l_partkey")),
    "sk": _stripe(("supplier", "s_suppkey"), ("lineitem", "l_suppkey")),
    "ev": _stripe(("events", "event_id")),
    "uid": _stripe(("events", "user_id")),
    "doc": _stripe(("documents", "doc_id")),
    "vec": _stripe(("embeddings", "vec_id")),
}
print("stripes:", S)

def write(table, per_replica_sql):
    parts = [per_replica_sql.format(k=k, src=f"'{src}/{table}.parquet'", **S)
             for k in range(R)]
    q = "COPY (" + "\nUNION ALL\n".join(parts) + \
        f") TO '{dst}/{table}.parquet' (FORMAT PARQUET)"
    con.execute(q)
    n = con.execute(f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")

write("events", """
  SELECT event_id + {k} * {ev} AS event_id,
         ts + INTERVAL ({k} * 7) MILLISECOND AS ts,
         user_id + {k} * {uid} AS user_id,
         event_type, value, props
  FROM {src}""")

# rotation ALONE is a circular shift — it preserves nearly every word
# n-gram, so replicas would be genuine near-dups of each other and the
# near-dup pair volume would grow QUADRATICALLY in R (measured: 23.5M
# LSH candidate pairs at R=100 from a 500k-doc corpus — round 12).
# Every replica therefore also tags each 4th token (phase varies by k)
# with a replica marker: ~3/4 of 3-gram shingles break between any two
# replicas, cross-replica Jaccard lands ~0.14 (far below banding
# thresholds), and candidate volume scales linearly like a real corpus
# while the base corpus's own planted duplicates still replicate
# per-stripe (so dedup surfaces keep linear work to find).
write("documents", """
  SELECT doc_id + {k} * {doc} AS doc_id,
         text2 AS text, lang, source,
         CASE WHEN {k} = 0 THEN n_chars
              ELSE length(text2)::BIGINT END AS n_chars
  FROM (
    SELECT *, CASE WHEN {k} = 0 THEN text
         ELSE array_to_string(list_transform(range(1, len(rot) + 1),
           i -> CASE WHEN (i % 4) = (({k} * 3) % 4)
                THEN rot[i] || '_x{k}' ELSE rot[i] END), ' ')
         END AS text2
    FROM (
      SELECT *, list_concat(
          toks[1 + (({k} * 7) % GREATEST(len(toks), 1)):],
          toks[: (({k} * 7) % GREATEST(len(toks), 1))]) AS rot
      FROM (SELECT *, string_split(text, ' ') AS toks FROM {src})))""")

# dimension ROTATION per replica (not just a small offset): an offset keeps
# each replica a near-duplicate of its siblings, handing the near-dup
# detectors a synthetic 10-way duplicate of the whole corpus (quadratic
# candidate-pair blowup a real sf1 would not have); rotating the dimension
# order preserves norms and the value distribution while making replicas
# mutually dissimilar, like genuinely new vectors
write("embeddings", """
  SELECT vec_id + {k} * {vec} AS vec_id,
         list_transform(range(1, len(embedding) + 1),
           i -> (embedding[1 + ((i - 1 + {k} * 5) % len(embedding))]
                 + (({k} * 31 + i * 7) % 13 - 6) * 0.003)::FLOAT
         )::FLOAT[] AS embedding,
         label
  FROM {src}""")

write("orders", """
  SELECT o_orderkey + {k} * {ok} AS o_orderkey,
         o_custkey + {k} * {ck} AS o_custkey,
         o_orderstatus, o_totalprice,
         o_orderdate + INTERVAL ({k} * 7) MILLISECOND AS o_orderdate,
         o_orderpriority
  FROM {src}""")

write("lineitem", """
  SELECT l_orderkey + {k} * {ok} AS l_orderkey,
         l_partkey + {k} * {pk} AS l_partkey,
         l_suppkey + {k} * {sk} AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice,
         l_discount, l_tax, l_returnflag, l_linestatus,
         l_shipdate + INTERVAL ({k} * 7) MILLISECOND AS l_shipdate
  FROM {src}""")

write("customer", """
  SELECT c_custkey + {k} * {ck} AS c_custkey,
         c_name || '_r{k}' AS c_name, c_nationkey, c_acctbal, c_mktsegment
  FROM {src}""")

# part/supplier stripes mirror the lineitem FK remap above; names get a
# per-replica suffix so distinct-name surfaces (q16-style) grow too, while
# brand/type/size/nation distributions copy through unchanged
write("part", """
  SELECT p_partkey + {k} * {pk} AS p_partkey,
         p_name || '_r{k}' AS p_name, p_brand, p_type, p_size, p_retailprice
  FROM {src}""")

write("supplier", """
  SELECT s_suppkey + {k} * {sk} AS s_suppkey,
         s_name || '_r{k}' AS s_name, s_nationkey, s_acctbal
  FROM {src}""")

for dim in ["region", "nation"]:
    shutil.copyfile(f"{src}/{dim}.parquet", f"{dst}/{dim}.parquet")
    print(f"{dim}: copied")

print(f"done -> {dst}")
