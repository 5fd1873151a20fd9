#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare (t2 gate).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [--pair-memo]

Reads each <outDir>/<name> parquet result produced by graft.Verify, runs the
matching SQL from oracle_sql.json in DuckDB over the raw testdata parquet, and
compares: columns sorted by name, rows compared in order, exact value equality
(floats compared bitwise after float64 coercion; NaN==NaN).

--pair-memo (VERDICT r14 #4, the sf0.1 prune shrinker): 9 of the replay
oracles embed the same all-pairs exact-Jaccard join (5-gram shingles);
standalone each costs ~10 min at sf0.1, which is why they sat on the
quadratic prune list. With the flag, the SUPERSET pair table (every pair
sharing >= 1 shingle, with its jaccard) is materialized ONCE as a DuckDB
temp table and each sharer's pair block is substituted by exact-needle
string replacement — a missing needle fails LOUD so source drift can
never silently run the unsubstituted quadratic (or worse, a wrong
rewrite). The oracles as dumped stay self-contained for the driver's
sf0.01 gate; this flag only amortizes the sf0.1 replay.
"""
import json, sys, math
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
pair_memo = "--pair-memo" in sys.argv[3:]
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

# ---- shared pair-table memo (--pair-memo) ---------------------------------
J = ("CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)\n"
     "      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))")
PAIR_MEMO_SQL = """CREATE TEMP TABLE pair_memo AS
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (SELECT doc_id,
  CASE WHEN len(w) >= 5 THEN list_distinct(list_transform(range(1, len(w) - 3),
    i -> array_to_string(w[i:i+4], ' ')))
  ELSE [array_to_string(w, ' ')] END AS s
FROM toks)
SELECT a.doc_id AS da, b.doc_id AS db, """ + J.replace("\n      ", " ") + """ AS j
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.s, b.s)) >= 1"""

# per-query exact needles -> memo-backed replacements (needles are the
# verbatim source strings; see PipelineShared.x07OracleSql and friends)
PAIR_BLOCK = ("pairs AS (SELECT a.doc_id AS da, b.doc_id AS db\n"
              "  FROM sh a JOIN sh b ON a.doc_id < b.doc_id\n"
              "  WHERE " + J + " >= 0.5)")
PAIR_SUBS = {
    "x07_dedup_clusters": [(PAIR_BLOCK,
        "pairs AS (SELECT da, db FROM pair_memo WHERE j >= 0.5)")],
    "x07_dedup_clusters_star": [(PAIR_BLOCK,
        "pairs AS (SELECT da, db FROM pair_memo WHERE j >= 0.5)")],
    "x56_leakage_free_split": [(PAIR_BLOCK,
        "pairs AS (SELECT da, db FROM pair_memo WHERE j >= 0.5)")],
    "x32_cluster_keeper": [(PAIR_BLOCK,
        "pairs AS (SELECT da, db FROM pair_memo WHERE j >= 0.5)")],
    "x02_ngram_jaccard": [(
        "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,\n  "
        + J.replace("\n      ", "\n    ") + " AS j\n"
        "FROM sh a JOIN sh b ON a.doc_id < b.doc_id\n"
        "WHERE " + J.replace("\n      ", "\n    ") + " >= 0.5",
        "SELECT da AS doc_a, db AS doc_b, j FROM pair_memo WHERE j >= 0.5")],
    "x60_split_leakage_audit": [(
        "pairs AS (SELECT a.doc_id AS da, b.doc_id AS db,\n    "
        + J + " AS j\n"
        "  FROM sh a JOIN sh b ON a.doc_id < b.doc_id\n"
        "  WHERE " + J + " >= 0.5)",
        "pairs AS (SELECT da, db, j FROM pair_memo WHERE j >= 0.5)")],
    "x33_threshold_sweep": [(
        "p AS (SELECT a.doc_id AS da, b.doc_id AS db,\n    "
        + J + " AS j\n"
        "  FROM sh a JOIN sh b ON a.doc_id < b.doc_id\n"
        "  WHERE len(list_intersect(a.s, b.s)) >= 1)",
        "p AS (SELECT da, db, j FROM pair_memo)")],
    "x74_contrastive_pairs": [(
        "pairs AS (SELECT a.doc_id AS anchor, b.doc_id AS positive,\n    "
        + J + " AS j\n"
        "  FROM sh a JOIN sh b ON a.doc_id < b.doc_id\n"
        "  WHERE " + J + " >= 0.5)",
        "pairs AS (SELECT da AS anchor, db AS positive, j FROM pair_memo "
        "WHERE j >= 0.5)")],
    # x64's pair stage runs over ALL documents (toks is unfiltered), only
    # the CTE alias differs (sh5)
    "x64_release_funnel": [(
        "pairs AS (SELECT a.doc_id AS da, b.doc_id AS db\n"
        "  FROM sh5 a JOIN sh5 b ON a.doc_id < b.doc_id\n"
        "  WHERE " + J + " >= 0.5)",
        "pairs AS (SELECT da, db FROM pair_memo WHERE j >= 0.5)")],
    # x73's TRUE pair set is the same join (alias shd); its banded
    # candidate side stays self-computed — that is the thing being audited
    "x73_lsh_recall_audit": [(
        "pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,\n    "
        + J + " AS j\n"
        "  FROM shd a JOIN shd b ON a.doc_id < b.doc_id\n"
        "  WHERE " + J + " >= 0.5)",
        "pairs AS (SELECT da AS doc_a, db AS doc_b, j FROM pair_memo "
        "WHERE j >= 0.5)")],
    # x06's pairs run over the exact-dedup SUBSET `ded`; jaccard is
    # text-determined, so restricting the corpus-wide memo to pairs with
    # both endpoints in `ded` is the identical set
    "x06_pipeline_e2e": [(
        "pairs AS (SELECT b.doc_id AS drop_id FROM sh a JOIN sh b ON a.doc_id < b.doc_id\n"
        "  WHERE " + J + " >= 0.5)",
        "pairs AS (SELECT m.db AS drop_id FROM pair_memo m\n"
        "  JOIN ded x ON m.da = x.doc_id JOIN ded y ON m.db = y.doc_id\n"
        "  WHERE m.j >= 0.5)")],
}

if pair_memo:
    import time
    subs_hit = 0
    for qname, subs in PAIR_SUBS.items():
        if qname not in oracle:
            continue
        for needle, repl in subs:
            if needle not in oracle[qname]:
                print(f"FATAL --pair-memo: needle not found in {qname}; "
                      "oracle source drifted — fix PAIR_SUBS before trusting "
                      "this replay")
                sys.exit(2)
            oracle[qname] = oracle[qname].replace(needle, repl)
            subs_hit += 1
    if subs_hit:
        t0 = time.time()
        con.sql(PAIR_MEMO_SQL)
        n = con.sql("SELECT count(*) FROM pair_memo").fetchone()[0]
        print(f"[pair-memo] materialized {n} candidate pairs once in "
              f"{time.time()-t0:.0f}s, shared by {subs_hit} oracles")

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    return df

fails, passes = [], 0
for name, sql in sorted(oracle.items()):
    try:
        got = pd.read_parquet(f"{outdir}/{name}")
        exp = con.sql(sql).df()
    except Exception as e:
        fails.append((name, f"load/exec error: {e}"))
        continue
    got, exp = norm(got), norm(exp)
    if list(got.columns) != list(exp.columns):
        fails.append((name, f"columns differ: spark={list(got.columns)} duck={list(exp.columns)}"))
        continue
    for c_ in got.columns:
        if str(got[c_].dtype) != str(exp[c_].dtype):
            print(f"WARN {name}.{c_}: dtype spark={got[c_].dtype} duck={exp[c_].dtype}")
    if len(got) != len(exp):
        fails.append((name, f"row count differs: spark={len(got)} duck={len(exp)}"))
        continue
    bad = None
    for c in got.columns:
        a, b = got[c], exp[c]
        try:
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                a2, b2 = a.astype('float64'), b.astype('float64')
                neq = ~((a2 == b2) | (a2.isna() & b2.isna()))
            else:
                a2, b2 = a.astype(str), b.astype(str)
                neq = ~((a2 == b2) | (a.isna() & b.isna()))
        except Exception as e:
            bad = (c, f"compare error: {e}")
            break
        if neq.any():
            i = int(neq.idxmax())
            bad = (c, f"row {i}: spark={a.iloc[i]!r} duck={b.iloc[i]!r} ({int(neq.sum())} diffs)")
            break
    if bad:
        fails.append((name, f"col {bad[0]}: {bad[1]}"))
    else:
        passes += 1

print(f"PASS {passes}/{len(oracle)}")
for n, msg in fails:
    print(f"FAIL {n}: {msg}")
sys.exit(1 if fails else 0)
