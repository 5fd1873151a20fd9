package graft.operators

import graft.{GQuery, Tables}
import graft.functions.GraftFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decontamination & leakage family: n-gram and bloom eval-set
  * probes, span excision, semantic (embedding) decontamination, the unified
  * contamination firewall, leakage-free train/eval splits and the naive-split
  * leakage audit.
  *
  * Part of the [[PipelineQueries]] registry (split from the former
  * monolithic file in round 11); shared helpers live in [[PipelineShared]].
  */
private[operators] object PipelineDecontamQueries {
  import PipelineShared._

  val queries: Seq[GQuery] = Seq(


    // ---- X13: benchmark decontamination ------------------------------------
    // Train/test-leak scan: every corpus doc is scored by how many of its
    // 3-gram shingles appear in a held-out eval set (here the deterministic
    // doc_id % 20 = 0 slice stands in for the benchmark suite). The eval
    // shingle set is BROADCAST (benchmarks are tiny vs a 100 TB corpus), the
    // corpus probes it partition-locally, and the only shuffle is the
    // per-doc hit count. O-class.
    GQuery("x13_decontaminate",
      (s, d) => {
        val docs = t(s, d, "documents")
        graft.GraftOps.decontaminate(
            docs.filter(col("doc_id") % 20 =!= 0),
            docs.filter(col("doc_id") % 20 === 0),
            col("doc_id"), col("text"), k = 3, flagFrac = 0.2)
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (SELECT doc_id,
  CASE WHEN len(w) >= 3 THEN list_distinct(list_transform(range(1, len(w) - 1),
    i -> array_to_string(w[i:i+2], ' ')))
  ELSE [array_to_string(w, ' ')] END AS s
FROM toks),
ev AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 20 = 0),
tr AS (SELECT doc_id, len(s) AS nsh, unnest(s) AS g FROM sh WHERE doc_id % 20 <> 0),
hits AS (SELECT doc_id, count(*) AS n_hits FROM tr JOIN ev USING (g) GROUP BY doc_id),
base AS (SELECT doc_id, len(s) AS nsh FROM sh WHERE doc_id % 20 <> 0)
SELECT b.doc_id, b.nsh, coalesce(h.n_hits, 0) AS n_hits,
  CAST(CAST(CAST(coalesce(h.n_hits, 0) AS DOUBLE) / b.nsh AS DECIMAL(18,6)) AS DOUBLE)
    AS contam_frac,
  CAST(CAST(CAST(coalesce(h.n_hits, 0) AS DOUBLE) / b.nsh AS DECIMAL(18,6)) AS DOUBLE)
    >= 0.2 AS flagged
FROM base b LEFT JOIN hits h USING (doc_id) ORDER BY doc_id NULLS FIRST""")),


    // ---- X13b: 13-gram decontamination (industry-standard n) ---------------
    // Same broadcast-probe plan as x13 but at n=13 — the shingle width used
    // for real eval-contamination scans (e.g. GPT-3's 13-gram overlap
    // filter), where a hit means a verbatim ~13-word span, not topical
    // similarity. 13-grams need longer documents than the raw corpus rows,
    // so the corpus here is 3-doc concatenation groups (ordered inside the
    // group — deterministic on both engines); the eval set is the
    // doc_id % 20 = 0 slice of the ORIGINAL docs, so every group containing
    // an eval member holds its full text verbatim and must flag, while
    // 13-grams spanning doc boundaries hit nothing. O-class.
    GQuery("x13b_decontaminate_13gram",
      (s, d) => {
        val docs = t(s, d, "documents")
        val groups = docs
          .groupBy(expr("doc_id div 3").as("gid"))
          .agg(expr("array_join(transform(array_sort(" +
            "collect_list(struct(doc_id, text))), x -> x.text), ' ')").as("text"))
        // decontaminate shingles both sides with the same id/text columns
        val evalDocs = docs.filter(col("doc_id") % 20 === 0)
          .select(col("doc_id").as("gid"), col("text"))
        graft.GraftOps.decontaminate(groups, evalDocs,
            col("gid"), col("text"), k = 13, flagFrac = 0.1)
          .orderBy(col("doc_id"))
      },
      Some("""WITH grp AS (SELECT doc_id // 3 AS gid,
    string_agg(text, ' ' ORDER BY doc_id) AS text
  FROM documents GROUP BY gid),
gt AS (SELECT gid, string_split(text, ' ') AS w FROM grp),
gsh AS (SELECT gid,
  CASE WHEN len(w) >= 13 THEN list_distinct(list_transform(range(1, len(w) - 11),
    i -> array_to_string(w[i:i+12], ' ')))
  ELSE [array_to_string(w, ' ')] END AS s
FROM gt),
et AS (SELECT string_split(text, ' ') AS w FROM documents WHERE doc_id % 20 = 0),
esh AS (SELECT
  CASE WHEN len(w) >= 13 THEN list_distinct(list_transform(range(1, len(w) - 11),
    i -> array_to_string(w[i:i+12], ' ')))
  ELSE [array_to_string(w, ' ')] END AS s
FROM et),
ev AS (SELECT DISTINCT unnest(s) AS g FROM esh),
tr AS (SELECT gid, len(s) AS nsh, unnest(s) AS g FROM gsh),
hits AS (SELECT gid, count(*) AS n_hits FROM tr JOIN ev USING (g) GROUP BY gid),
base AS (SELECT gid, len(s) AS nsh FROM gsh)
SELECT b.gid AS doc_id, b.nsh, coalesce(h.n_hits, 0) AS n_hits,
  CAST(CAST(CAST(coalesce(h.n_hits, 0) AS DOUBLE) / b.nsh AS DECIMAL(18,6)) AS DOUBLE)
    AS contam_frac,
  CAST(CAST(CAST(coalesce(h.n_hits, 0) AS DOUBLE) / b.nsh AS DECIMAL(18,6)) AS DOUBLE)
    >= 0.1 AS flagged
FROM base b LEFT JOIN hits h USING (gid) ORDER BY doc_id NULLS FIRST""")),


    // ---- X29: Bloom-filter decontamination (the 100 TB eval-set path) ------
    // X13 broadcasts the EXACT eval shingle set — right while benchmarks are
    // tiny, impossible once the held-out suite outgrows a broadcast (strings
    // for 10^9 shingles). The Bloom twin ships ~1.2 KB per 1k shingles at
    // 1% FP: the eval side folds into one mergeable [[BloomAgg]] binary
    // (bit-OR partials, partition-invariant), the corpus probes it through
    // [[BloomMightContain]] (deserialize-once cached), and by construction
    // flags are a SUPERSET of the exact flags — no contaminated doc escapes;
    // the FP tax is bounded by fpp and measured against x13's exact result
    // in BloomSpec. G-class (FP bits depend on the hash, no DuckDB replay).
    GQuery("x29_bloom_decontaminate",
      (s, d) => {
        val docs = t(s, d, "documents")
        val sh = docs.select(col("doc_id"),
          explode(word_shingles(col("text"), 3)).as("g"))
        // the built sketch is aggregate-sized (KBs at fpp=1%), so it is
        // collected ONCE and embedded as a binary literal — the same move
        // Spark's own InjectRuntimeFilter makes. Carrying it through a
        // broadcast one-row join instead makes every probe row re-copy the
        // filter bytes out of the joined UnsafeRow (and pay a full
        // content-compare in the probe cache): measured 17.8 s → the
        // literal form re-uses one array, so the cache hits by reference.
        val bfBytes = sh.filter(col("doc_id") % 20 === 0)
          .agg(graft.functions.GraftFunctions
            .bloom_agg(col("g"), 20000L, 0.01).as("bf"))
          .head().getAs[Array[Byte]](0)
        sh.filter(col("doc_id") % 20 =!= 0)
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("nsh"),
            sum(when(graft.functions.GraftFunctions
              .bloom_might_contain(lit(bfBytes), col("g")), 1L).otherwise(0L))
              .as("n_hits"))
          .select(col("doc_id"), col("nsh"), col("n_hits"),
            (col("n_hits").cast("double") / col("nsh").cast("double"))
              .cast("decimal(18,6)").cast("double").as("contam_frac"))
          .withColumn("flagged", col("contam_frac") >= 0.2)
          .orderBy(col("doc_id"))
      },
      None),


    // ---- X31: exact-substring span EXCISION --------------------------------
    // The removal half of Lee et al. 2022 (x23 flags, this excises): token
    // positions covered by any ACROSS-DOC duplicated 8-gram span are marked
    // via the positional shingle generator + an inverted span index, and
    // each doc reports how much of it survives the cut. Span logic applies
    // to docs with >= 8 tokens (a short doc's whole-text "shingle" is a
    // doc-level dup, x01's job); coverage union = explode the per-hit
    // position ranges and count distinct token slots — one span-key shuffle
    // and one doc-key shuffle, never doc×doc. At 100 TB the excision writes
    // the kept-token text; here the oracle checks the coverage accounting
    // (the rewrite itself is a deterministic function of it).
    GQuery("x31_span_excision",
      (s, d) => {
        val docs = t(s, d, "documents")
        val long8 = docs.filter(size(split(col("text"), " ")) >= 8)
        val sp = long8.select(col("doc_id"), pos_shingles(col("text"), 8))
        val dup = sp.groupBy(col("shingle"))
          .agg(countDistinct(col("doc_id")).as("nd"))
          .filter(col("nd") >= 2).select(col("shingle"))
        val cov = sp.join(dup, "shingle")
          .select(col("doc_id"),
            explode(sequence(col("pos"), col("pos") + 7)).as("t"))
          .distinct()
        val per = cov.groupBy(col("doc_id")).agg(count(lit(1)).as("n_covered"))
        docs.select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n_tokens"))
          .join(per, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_tokens"),
            coalesce(col("n_covered"), lit(0L)).as("n_covered"),
            (col("n_tokens") - coalesce(col("n_covered"), lit(0L))).as("n_kept"),
            (coalesce(col("n_covered"), lit(0L)).cast("double")
              / col("n_tokens").cast("double"))
              .cast("decimal(18,6)").cast("double").as("excised_frac"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
sp AS (SELECT doc_id, i AS pos, array_to_string(ws[i:i+7], ' ') AS g
  FROM t0, unnest(range(1, len(ws) - 6)) r(i) WHERE len(ws) >= 8),
dup AS (SELECT g FROM (SELECT g, count(DISTINCT doc_id) AS nd
    FROM sp GROUP BY g) WHERE nd >= 2),
cov AS (SELECT DISTINCT doc_id, u.t
  FROM sp JOIN dup USING (g), unnest(range(sp.pos, sp.pos + 8)) u(t)),
per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_covered
  FROM cov GROUP BY doc_id),
base AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens FROM t0)
SELECT b.doc_id, b.n_tokens, coalesce(p.n_covered, 0) AS n_covered,
  b.n_tokens - coalesce(p.n_covered, 0) AS n_kept,
  CAST(CAST(CAST(coalesce(p.n_covered, 0) AS DOUBLE) / b.n_tokens
    AS DECIMAL(18,6)) AS DOUBLE) AS excised_frac
FROM base b LEFT JOIN per p USING (doc_id)
ORDER BY b.doc_id NULLS FIRST""")),


    // ---- X15: deterministic corpus split -----------------------------------
    // Reproducible train/val/test assignment from a seeded content-free hash
    // of the id (md5 hex prefix, string-compared — the exact q75 idiom):
    // ~80/10/10, stable under re-runs, re-partitioning, and corpus growth
    // (a doc's split never depends on other docs). Pure per-row map + one
    // hash agg — the split of a 100 TB corpus is one scan. O-class.
    GQuery("x15_corpus_split",
      (s, d) => {
        val bk = substring(md5(concat(lit("split42:"), col("doc_id"))), 1, 4)
        t(s, d, "documents")
          .withColumn("split",
            when(bk < "cccc", "train").when(bk < "e666", "val").otherwise("test"))
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n_docs"),
            sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"),
            min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
          .orderBy(col("split"))
      },
      Some("""WITH b AS (SELECT doc_id, text,
    CASE WHEN substr(md5('split42:' || doc_id), 1, 4) < 'cccc' THEN 'train'
         WHEN substr(md5('split42:' || doc_id), 1, 4) < 'e666' THEN 'val'
         ELSE 'test' END AS split
  FROM documents)
SELECT split, count(*) AS n_docs,
  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
  min(doc_id) AS min_id, max(doc_id) AS max_id
FROM b GROUP BY split ORDER BY split NULLS FIRST""")),


    // ---- X56: leakage-free corpus split (cluster-granular) -----------------
    // Train/val/test assignment where the unit of assignment is the NEAR-DUP
    // CLUSTER, not the document: every doc inherits its x07 connected
    // component's id (singletons their own), and the split is a portable
    // hash of the CLUSTER id — so a near-dup pair straddling train/test is
    // impossible by construction, not by post-hoc decontamination. This is
    // the split a 100 TB pretraining pipeline actually needs: x13/x29 catch
    // eval overlap against an external benchmark; x56 prevents self-overlap
    // between the corpus's own splits. Scale: reuses the memoized x07 pair
    // table + O(log n) CC; the assignment itself is one left join and one
    // aggregate. PipelineSpec audits zero straddling pairs end-to-end.
    // DuckDB's replay brute-forces the pair set (oracle scale only — listed
    // with the quadratic oracles pruned at sf0.1).
    GQuery("x56_leakage_free_split",
      (s, d) => {
        val clusters = nearDupClusters(s, d) // shared CC memo (r18)
        val docs = t(s, d, "documents")
          .select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("tok"))
        val bucket = (expr(
          "CAST(conv(substr(md5(concat('split56:', cluster)), 1, 2), 16, 10) AS BIGINT)")
          % 10).as("bucket")
        docs.join(clusters, Seq("doc_id"), "left")
          .withColumn("cluster", coalesce(col("cluster"), col("doc_id")))
          .withColumn("bucket", bucket)
          .withColumn("split",
            when(col("bucket") < 8, "train")
              .when(col("bucket") === 8, "val").otherwise("test"))
          .groupBy(col("split"))
          .agg(countDistinct(col("cluster")).as("n_clusters"),
            count(lit(1)).as("n_docs"),
            sum(col("tok")).as("n_tokens"))
          .orderBy(col("split"))
      },
      Some("""WITH RECURSIVE toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (SELECT doc_id,
  CASE WHEN len(w) >= 5 THEN list_distinct(list_transform(range(1, len(w) - 3),
    i -> array_to_string(w[i:i+4], ' ')))
  ELSE [array_to_string(w, ' ')] END AS s
FROM toks),
pairs AS (SELECT a.doc_id AS da, b.doc_id AS db
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5),
edges AS (SELECT da AS src, db AS dst FROM pairs
  UNION ALL SELECT db, da FROM pairs),
reach(id, r) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.id),
clus AS (SELECT id AS doc_id, min(r) AS cluster FROM reach GROUP BY id),
asg AS (SELECT d.doc_id,
    coalesce(c.cluster, d.doc_id) AS cluster,
    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS tok
  FROM documents d LEFT JOIN clus c ON d.doc_id = c.doc_id),
b AS (SELECT *,
    CAST(concat('0x', substr(md5('split56:' || cluster), 1, 2)) AS BIGINT) % 10
      AS bucket
  FROM asg)
SELECT CASE WHEN bucket < 8 THEN 'train' WHEN bucket = 8 THEN 'val'
    ELSE 'test' END AS split,
  count(DISTINCT cluster) AS n_clusters, count(*) AS n_docs,
  CAST(sum(tok) AS BIGINT) AS n_tokens
FROM b GROUP BY 1 ORDER BY split NULLS FIRST""")),


    // ---- X57: semantic (embedding-space) decontamination -------------------
    // The third decontamination axis beside x13 (exact 3-gram hits) and x29
    // (Bloom superset at 100 TB): paraphrased eval leakage that shares no
    // n-gram still lands NEAR the eval item in embedding space. Eval set =
    // a deterministic ~1% id slice; every corpus vector is scored by its
    // MAX cosine against the broadcast eval set and flagged at the same
    // 0.45 cut x03 measured stable margins for (eval×corpus pairs are a
    // subset of x03's all-pairs set, so the margin is inherited). Shape:
    // the eval side collapses to ONE array row, reaches the corpus as a
    // one-row broadcast nested-loop build (Catalyst folds the constant
    // join key away — probe-free O(n)), and the max runs as a per-row
    // struct-fold over the broadcast array — the corpus never shuffles
    // (plan-pinned). Ties on the quantized score break to the smallest
    // eval id on both engines (struct-max on (sc, -eid) ≡ row_number over
    // (sc DESC, eid)). The eval slice is CAPPED (id < 2000 — non-binding
    // at both oracle tiers, so results are unchanged there) because a
    // benchmark suite is a bounded artifact, not a constant fraction of
    // the corpus: uncapped, the %-slice made total work quadratic in sf
    // (measured ×19 at sf1); capped it is honest-linear in the corpus.
    // At eval sets too large to broadcast, this composes with x28's
    // filtered-ANN pruning instead — the per-row loop is the bench-set
    // path (real eval benches are ~1e5 rows: broadcastable).
    GQuery("x57_semantic_decontaminate",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val ev = emb.filter(col("vec_id") % 97 === 0 && col("vec_id") < 2000)
          .agg(collect_list(struct(col("vec_id").as("eid"),
            col("embedding").as("ev"))).as("evs"))
          .withColumn("jk", lit(1))
        emb.filter(!(col("vec_id") % 97 === 0 && col("vec_id") < 2000))
          .withColumn("jk", lit(1))
          .join(broadcast(ev), "jk")
          // Loud canary (the ExactSum convention): a global collect_list
          // still emits ONE row when the eval slice is empty, so every
          // corpus row would "survive" with NULL max_cos while DuckDB's
          // CROSS JOIN against an empty ev returns zero rows — fail the job
          // instead of silently diverging. assert_true yields NULL when the
          // slice is non-empty, so the when() passes evs through untouched.
          .withColumn("evs",
            when(assert_true(size(col("evs")) > 0,
              lit("x57: eval slice is empty — decontamination would " +
                "silently keep every corpus row")).isNull, col("evs")))
          .select(col("vec_id"),
            array_max(transform(col("evs"), e =>
              struct(cosine_sim(e.getField("ev"), col("embedding"))
                  .cast("decimal(18,6)").as("sc"),
                (-e.getField("eid")).as("nid")))).as("best"))
          .select(col("vec_id"),
            col("best.sc").cast("double").as("max_cos"),
            (-col("best.nid")).as("nearest_eval"),
            (col("best.sc").cast("double") >= 0.45).as("contaminated"))
          .orderBy(col("vec_id"))
      },
      Some("""WITH ev AS (SELECT vec_id AS eid, CAST(embedding AS DOUBLE[]) AS evv
  FROM embeddings WHERE vec_id % 97 = 0 AND vec_id < 2000),
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE NOT (vec_id % 97 = 0 AND vec_id < 2000)),
s AS (SELECT c.vec_id, eid,
    CAST(list_cosine_similarity(v, evv) AS DECIMAL(18,6)) AS sc
  FROM c CROSS JOIN ev),
r AS (SELECT vec_id, eid, sc,
    row_number() OVER (PARTITION BY vec_id ORDER BY sc DESC, eid) AS rn
  FROM s)
SELECT vec_id, CAST(sc AS DOUBLE) AS max_cos, eid AS nearest_eval,
  CAST(sc AS DOUBLE) >= 0.45 AS contaminated
FROM r WHERE rn = 1 ORDER BY vec_id NULLS FIRST""")),


    // ---- X60: split-leakage audit (the diagnostic that motivates x56) ------
    // Measures the cross-split near-dup contamination a NAIVE per-document
    // hash split (x15's rule, mirrored byte-for-byte) actually produces:
    // every jaccard≥0.5 pair is labeled with its endpoints' splits and
    // rolled up per (split_a, split_b) cell with a mean-similarity column —
    // the off-diagonal cells ARE train/val/test leakage. This is the audit
    // a pipeline runs BEFORE switching to x56's cluster-granular split
    // (whose straddling count is zero by construction, PipelineSpec-
    // audited); pairing the two queries shows the problem and the fix.
    // Scale: reuses the memoized x02/x07/x56 pair table (pair generation
    // amortized registry-wide); the audit itself is two broadcast-probe
    // joins of split labels onto the pair table + one tiny rollup. DuckDB
    // replays the pair set brute-force (oracle scale only — pruned with
    // the quadratic list at sf0.1).
    GQuery("x60_split_leakage_audit",
      (s, d) => {
        def splitOf(idCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
          val bk = substring(md5(concat(lit("split42:"), idCol)), 1, 4)
          when(bk < "cccc", "train").when(bk < "e666", "val").otherwise("test")
        }
        val pairs = nearDupPairs(s, d)
        pairs
          .select(col("j"),
            splitOf(col("doc_a")).as("sa"), splitOf(col("doc_b")).as("sb"))
          .select(col("j"),
            least(col("sa"), col("sb")).as("split_a"),
            greatest(col("sa"), col("sb")).as("split_b"))
          .groupBy(col("split_a"), col("split_b"))
          // order-free mean: per-pair j quantizes to decimal(18,6) (the
          // one double division is bit-identical cross-engine), the SUM is
          // exact decimal arithmetic, and only the final mean divides in
          // double — avg(double) would be partition-order-dependent
          .agg(count(lit(1)).as("n_pairs"),
            sum(col("j").cast("decimal(18,6)")).as("sj"))
          .select(col("split_a"), col("split_b"), col("n_pairs"),
            (col("sj").cast("double") / col("n_pairs").cast("double"))
              .cast("decimal(18,6)").cast("double").as("mean_j"),
            (col("split_a") =!= col("split_b")).as("leaking"))
          .orderBy(col("split_a"), col("split_b"))
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (SELECT doc_id,
  CASE WHEN len(w) >= 5 THEN list_distinct(list_transform(range(1, len(w) - 3),
    i -> array_to_string(w[i:i+4], ' ')))
  ELSE [array_to_string(w, ' ')] END AS s
FROM toks),
pairs AS (SELECT a.doc_id AS da, b.doc_id AS db,
    CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS j
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5),
sp AS (SELECT j,
    CASE WHEN substr(md5('split42:' || da), 1, 4) < 'cccc' THEN 'train'
         WHEN substr(md5('split42:' || da), 1, 4) < 'e666' THEN 'val'
         ELSE 'test' END AS sa,
    CASE WHEN substr(md5('split42:' || db), 1, 4) < 'cccc' THEN 'train'
         WHEN substr(md5('split42:' || db), 1, 4) < 'e666' THEN 'val'
         ELSE 'test' END AS sb
  FROM pairs)
SELECT least(sa, sb) AS split_a, greatest(sa, sb) AS split_b,
  count(*) AS n_pairs,
  CAST(CAST(CAST(sum(CAST(j AS DECIMAL(18,6))) AS DOUBLE) / count(*)
    AS DECIMAL(18,6)) AS DOUBLE) AS mean_j,
  least(sa, sb) <> greatest(sa, sb) AS leaking
FROM sp GROUP BY 1, 2 ORDER BY split_a NULLS FIRST, split_b NULLS FIRST""")),


    // ---- X61: unified contamination firewall --------------------------------
    // The decision table a release pipeline actually gates on: BOTH
    // contamination axes joined per document — verbatim n-gram overlap
    // (x13's broadcast shingle probe) and embedding-space paraphrase
    // proximity (x57's one-row broadcast eval array; the corpus's embedding
    // table pairs 1:1 with documents on id) — against ONE coherent capped
    // eval slice (doc_id % 20 = 0 AND < 2000, the x57 cap discipline: a
    // benchmark is a bounded artifact, so work stays linear in the corpus).
    // Verdict per doc: both / ngram / semantic / clean. A doc that shares
    // no 13-gram but paraphrases an eval item is caught by the semantic
    // axis; a verbatim quote with a different embedding neighborhood by the
    // n-gram axis — the union is what "decontaminated" has to mean.
    // Scale: two broadcast probes (eval grams; eval vectors) + one id-join
    // of two corpus-sized flag tables — no corpus×corpus, no corpus
    // shuffle beyond the id join. O-class: the capped eval keeps DuckDB's
    // cosine replay at |eval|×|corpus|, feasible at every oracle tier.
    GQuery("x61_contamination_firewall",
      (s, d) => {
        val docs = t(s, d, "documents")
        val isEval = col("doc_id") % 20 === 0 && col("doc_id") < 2000
        val ngram = graft.GraftOps.decontaminate(
          docs.filter(!isEval), docs.filter(isEval),
          col("doc_id"), col("text"), k = 3, flagFrac = 0.2)
        val emb = t(s, d, "embeddings")
        val isEvalV = col("vec_id") % 20 === 0 && col("vec_id") < 2000
        val ev = emb.filter(isEvalV)
          .agg(collect_list(struct(col("vec_id").as("eid"),
            col("embedding").as("ev"))).as("evs"))
          .withColumn("jk", lit(1))
        val sem = emb.filter(!isEvalV)
          .withColumn("jk", lit(1))
          .join(broadcast(ev), "jk")
          // Same loud canary as x57/x64 (ADVICE r10): an empty eval slice
          // still yields one collect_list row with an empty array, so
          // max_cos would be NULL and every doc would pass as clean/ngram
          // while the oracle's CROSS JOIN returns zero rows.
          .withColumn("evs",
            when(assert_true(size(col("evs")) > 0,
              lit("x61: semantic eval slice is empty — the firewall would " +
                "silently pass every corpus row")).isNull, col("evs")))
          .select(col("vec_id"),
            array_max(transform(col("evs"), e =>
              struct(cosine_sim(e.getField("ev"), col("embedding"))
                  .cast("decimal(18,6)").as("sc"),
                (-e.getField("eid")).as("nid")))).as("best"))
          .select(col("vec_id"),
            col("best.sc").cast("double").as("max_cos"),
            (-col("best.nid")).as("nearest_eval"))
        ngram.join(sem, col("doc_id") === col("vec_id"))
          .select(col("doc_id"), col("nsh"), col("n_hits"),
            col("contam_frac"), col("max_cos"), col("nearest_eval"),
            when(col("contam_frac") >= 0.2 && col("max_cos") >= 0.45, "both")
              .when(col("contam_frac") >= 0.2, "ngram")
              .when(col("max_cos") >= 0.45, "semantic")
              .otherwise("clean").as("verdict"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (SELECT doc_id,
  CASE WHEN len(w) >= 3 THEN list_distinct(list_transform(range(1, len(w) - 1),
    i -> array_to_string(w[i:i+2], ' ')))
  ELSE [array_to_string(w, ' ')] END AS s
FROM toks),
evg AS (SELECT DISTINCT unnest(s) AS g FROM sh
  WHERE doc_id % 20 = 0 AND doc_id < 2000),
tr AS (SELECT doc_id, len(s) AS nsh, unnest(s) AS g FROM sh
  WHERE NOT (doc_id % 20 = 0 AND doc_id < 2000)),
hits AS (SELECT doc_id, count(*) AS n_hits FROM tr JOIN evg USING (g)
  GROUP BY doc_id),
base AS (SELECT doc_id, len(s) AS nsh FROM sh
  WHERE NOT (doc_id % 20 = 0 AND doc_id < 2000)),
ng AS (SELECT b.doc_id, b.nsh, coalesce(h.n_hits, 0) AS n_hits,
    CAST(CAST(CAST(coalesce(h.n_hits, 0) AS DOUBLE) / b.nsh
      AS DECIMAL(18,6)) AS DOUBLE) AS contam_frac
  FROM base b LEFT JOIN hits h USING (doc_id)),
eve AS (SELECT vec_id AS eid, CAST(embedding AS DOUBLE[]) AS evv
  FROM embeddings WHERE vec_id % 20 = 0 AND vec_id < 2000),
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE NOT (vec_id % 20 = 0 AND vec_id < 2000)),
scs AS (SELECT c.vec_id, eid,
    CAST(list_cosine_similarity(v, evv) AS DECIMAL(18,6)) AS sc
  FROM c CROSS JOIN eve),
r AS (SELECT vec_id, eid, sc,
    row_number() OVER (PARTITION BY vec_id ORDER BY sc DESC, eid) AS rn
  FROM scs),
sem AS (SELECT vec_id, CAST(sc AS DOUBLE) AS max_cos, eid AS nearest_eval
  FROM r WHERE rn = 1)
SELECT ng.doc_id, ng.nsh, ng.n_hits, ng.contam_frac,
  sem.max_cos, sem.nearest_eval,
  CASE WHEN ng.contam_frac >= 0.2 AND sem.max_cos >= 0.45 THEN 'both'
       WHEN ng.contam_frac >= 0.2 THEN 'ngram'
       WHEN sem.max_cos >= 0.45 THEN 'semantic'
       ELSE 'clean' END AS verdict
FROM ng JOIN sem ON ng.doc_id = sem.vec_id
ORDER BY doc_id NULLS FIRST"""))
  )
}
