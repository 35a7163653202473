#!/usr/bin/env python3
"""Staged sf1 oracle for the entries whose MONOLITHIC DuckDB restatement
exceeds single-node capacity at the 10x replica fixture (dev tool; see
tools/check.py for the main gate).

Every such oracle shares one quadratic prefix — the shared-shingle
inverted-index self-join that produces the verified jaccard>=0.5 pair
table. At sf1 the fixture's 10 exact copies per doc square that join's
volume, so re-deriving it inside each entry's oracle blows the 240 s /
10 GiB budget even though each entry's OWN logic (closure, pagerank,
curation gates) is cheap. This tool verifies in stages instead:

  stage 1: materialize the pair table ONCE in DuckDB (still computed
           entirely by DuckDB from raw text — no circularity; the same
           construction already hash-verifies at sf1 through the
           dedup_ngram_jaccard / graph_degrees entries);
  stage 2: run each entry's downstream logic from that table and
           compare against the Spark dump, exactly like check.py.

Usage: python3 tools/check_sf1_staged.py [sfdir] [outdir]
  (defaults: /root/repo/target/sf1  /root/repo/target/verify_out_sf1)
"""
import glob
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from oraclecmp import compare

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/target/sf1"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out_sf1"

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
try:
    con.execute("SET max_temp_directory_size='20GiB'")
    con.execute("SET memory_limit='48GiB'")
except Exception:
    pass

TOKS = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')"
TOKS_LOWER = "list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')"

fails = []


def stage(desc, sql):
    t0 = time.time()
    con.execute(sql)
    print(f"  [stage] {desc}: {time.time() - t0:.1f}s")


def entry(name, sql):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"  {name:28s} NO SPARK OUTPUT (run graft.Verify first)")
        fails.append((name, "no spark output"))
        return
    t0 = time.time()
    try:
        odf = con.execute(sql).df()
    except Exception as e:
        fails.append((name, f"staged oracle error: {e}"))
        print(f"  {name:28s} STAGED-ORACLE ERROR: {str(e)[:200]}")
        return
    sdf = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
    msg = compare(name, sdf, odf)
    if msg is None:
        print(f"  {name:28s} OK ({len(sdf)} rows, staged, {time.time() - t0:.1f}s)")
    else:
        fails.append((name, msg))
        print(f"  {name:28s} FAIL: {msg[:300]}")


# ---- stage 1: the shared quadratic prefix, materialized once ----------
stage("jaccard>=0.5 pair table", f"""
CREATE TABLE pairs05 AS
WITH toks AS (
    SELECT doc_id, {TOKS_LOWER} AS t FROM documents),
  sh AS (
    SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
      THEN list_transform(generate_series(1, len(t)-2),
        i -> array_to_string(list_slice(t, i, i+2), ' '))
      ELSE [array_to_string(t, ' ')] END) AS sh
    FROM toks),
  inv AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS g FROM sh),
  p AS (
    SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS shared,
      any_value(a.n_sh) AS a_n, any_value(b.n_sh) AS b_n
    FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
    GROUP BY 1, 2)
SELECT a_id, b_id FROM p
WHERE CAST(shared AS DOUBLE) / CAST(a_n + b_n - shared AS DOUBLE) >= 0.5""")

stage("connected-component closure", """
CREATE TABLE clusters05 AS
WITH RECURSIVE
  edges AS (SELECT a_id AS u, b_id AS v FROM pairs05
            UNION SELECT b_id, a_id FROM pairs05),
  reach(u, v) AS (
    SELECT u, v FROM edges
    UNION
    SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)
SELECT u AS id, least(u, min(v)) AS cluster_id FROM reach GROUP BY u""")

# ---- stage 2: per-entry logic over the staged tables ------------------
entry("dedup_clusters", "SELECT id, cluster_id FROM clusters05")

entry("dedup_materialize", """
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT id FROM clusters05 WHERE id <> cluster_id)""")

# triangles (a<b<c) over the ordered edge list — each wedge (a-b, b-c)
# closed by probing the third edge (a,c); the monolithic twin re-derives
# pairs05 from raw text, which crossed the 240 s budget on the round-18
# (slower-band) box
entry("graph_triangles", """
SELECT e1.a_id AS a, e1.b_id AS b, e2.b_id AS c
FROM pairs05 e1
JOIN pairs05 e2 ON e2.a_id = e1.b_id
JOIN pairs05 e3 ON e3.a_id = e1.a_id AND e3.b_id = e2.b_id""")

entry("graph_pagerank", """
WITH edges AS (SELECT a_id AS src, b_id AS dst FROM pairs05
               UNION ALL SELECT b_id, a_id FROM pairs05),
  deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
  nn AS (SELECT count(*) AS n FROM deg),
  pr0 AS (SELECT src AS id, 1.0 / (SELECT n FROM nn) AS pr FROM deg),
  c1 AS (SELECT e.dst AS id, sum(p.pr / d.deg) AS s
         FROM edges e JOIN pr0 p ON e.src = p.id
           JOIN deg d ON e.src = d.src GROUP BY 1),
  pr1 AS (SELECT d.src AS id, 0.15 / (SELECT n FROM nn)
            + 0.85 * coalesce(c1.s, 0.0) AS pr
          FROM deg d LEFT JOIN c1 ON d.src = c1.id),
  c2 AS (SELECT e.dst AS id, sum(p.pr / d.deg) AS s
         FROM edges e JOIN pr1 p ON e.src = p.id
           JOIN deg d ON e.src = d.src GROUP BY 1),
  pr2 AS (SELECT d.src AS id, 0.15 / (SELECT n FROM nn)
            + 0.85 * coalesce(c2.s, 0.0) AS pr
          FROM deg d LEFT JOIN c2 ON d.src = c2.id),
  c3 AS (SELECT e.dst AS id, sum(p.pr / d.deg) AS s
         FROM edges e JOIN pr2 p ON e.src = p.id
           JOIN deg d ON e.src = d.src GROUP BY 1),
  pr3 AS (SELECT d.src AS id, 0.15 / (SELECT n FROM nn)
            + 0.85 * coalesce(c3.s, 0.0) AS pr
          FROM deg d LEFT JOIN c3 ON d.src = c3.id)
SELECT id, round(pr, 4) AS pr FROM pr3""")

entry("pipeline_curate_pack", f"""
WITH gop AS (
    SELECT doc_id,
      CAST(len(toks) AS BIGINT) AS n_words,
      round(CASE WHEN len(toks) > 0
        THEN CAST(coalesce(list_sum(list_transform(toks, w -> length(w))), 0) AS DOUBLE)
             / CAST(len(toks) AS DOUBLE) ELSE 0.0 END, 4) AS mean_word_len,
      round(CASE WHEN len(toks) > 0
        THEN CAST(len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
             / CAST(len(toks) AS DOUBLE) ELSE 0.0 END, 4) AS alpha_ratio
    FROM (SELECT doc_id, {TOKS} AS toks, text FROM documents)),
  keep AS (
    SELECT d.doc_id, d.lang, CAST(len({TOKS}) AS BIGINT) AS n_tokens,
      ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 14))::BIGINT % 32
        AS shard
    FROM documents d JOIN gop USING (doc_id)
    WHERE d.lang = 'en'
      AND gop.n_words >= 50
      AND gop.mean_word_len BETWEEN 3.0 AND 10.0
      AND gop.alpha_ratio >= 0.8
      AND d.doc_id NOT IN
        (SELECT id FROM clusters05 WHERE id <> cluster_id)),
  cum AS (
    SELECT doc_id, n_tokens, shard,
      sum(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
        ROWS UNBOUNDED PRECEDING) AS cs
    FROM keep)
SELECT doc_id, n_tokens, shard,
  CAST(shard * 4294967296 + floor((cs - n_tokens) / 2048.0) AS BIGINT)
    AS pack_id
FROM cum""")

# ---- embedding-LSH closure (same stage split over the vector corpus) --
stage("banded-LSH verified pair table", """
CREATE TABLE embpairs AS
WITH params AS (
    SELECT (CASE WHEN n <= 2048 THEN 4 WHEN n <= 4096 THEN 5
      WHEN n <= 8192 THEN 6 WHEN n <= 16384 THEN 7
      WHEN n <= 32768 THEN 8 WHEN n <= 65536 THEN 9
      WHEN n <= 131072 THEN 10 WHEN n <= 262144 THEN 11
      WHEN n <= 524288 THEN 12 WHEN n <= 1048576 THEN 13
      WHEN n <= 2097152 THEN 14 WHEN n <= 4194304 THEN 15
      ELSE 16 END) AS ppb
    FROM (SELECT count(*) AS n FROM embeddings)),
  bits AS (
    SELECT vec_id, CAST(pl // ppb AS BIGINT) AS band,
      CASE WHEN list_sum(list_transform(embedding, (v, i) ->
          CAST(v AS DOUBLE) *
            (('0x' || substr(md5(CAST(pl AS VARCHAR) || '_' ||
              CAST(i - 1 AS VARCHAR)), 1, 14))::BIGINT
             / 36028797018963968.0 - 1.0))) >= 0
        THEN (1::BIGINT << CAST(pl % ppb AS INT)) ELSE 0::BIGINT END AS bit
    FROM embeddings, params,
      (SELECT unnest(range(0, 16 * ppb)) AS pl FROM params) t),
  bk AS (SELECT vec_id, band, CAST(sum(bit) AS BIGINT) AS bucket
         FROM bits GROUP BY 1, 2),
  cand AS (
    SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
    FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket
      AND a.vec_id < b.vec_id)
SELECT c.a_id, c.b_id
FROM cand c
JOIN embeddings x ON x.vec_id = c.a_id
JOIN embeddings y ON y.vec_id = c.b_id
WHERE list_cosine_similarity(x.embedding::DOUBLE[],
  y.embedding::DOUBLE[]) >= 0.45""")

entry("dedup_embedding_clusters", """
WITH RECURSIVE
  edges AS (SELECT a_id AS u, b_id AS v FROM embpairs
            UNION SELECT b_id, a_id FROM embpairs),
  reach(u, v) AS (
    SELECT u, v FROM edges
    UNION
    SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)
SELECT u AS id, least(u, min(v)) AS cluster_id FROM reach GROUP BY u""")

print()
if fails:
    print(f"STAGED FAILED {len(fails)}:")
    for n, msg in fails:
        print(f"  {n}: {msg[:500]}")
    sys.exit(1)
print("ALL staged sf1 entries passed")
