package graft.operators

import graft.{GQuery, Tables}
import graft.functions.GraftFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis & tokenizer family: per-document stats, quality
  * scoring, language id, fingerprinting, tf-idf, surprisal, repetition
  * filters, PII redaction, chunking, sketch rollups (HLL/CMS), vocabulary
  * induction (BPE pairs/merges) and the full BPE encoder, curriculum
  * ordering, and source reputation.
  *
  * Part of the [[PipelineQueries]] registry (split from the former
  * monolithic file in round 11); shared helpers live in [[PipelineShared]].
  */
private[operators] object PipelineTextQueries {
  import PipelineShared._

  /** DuckDB replay of [[graft.GraftOps.bpeVocab]] at batch=1 — the EXACT
    * classic BPE trainer: `merges` unrolled rounds of (pair-count → top-1
    * by (count desc, l, r) → one greedy left-to-right re-segmentation),
    * emitting the merge table itself. The re-segmentation fold is x53's
    * proven template specialized to a single merge per round (scalar CASE
    * / computed slice bounds only — the DuckDB v1.0 list-in-CASE
    * list_reduce trap). */
  private def bpeMergesOracle(merges: Int): String = {
    val rounds = (1 to merges).map { n =>
      val prev = if (n == 1) "w0s" else s"w${n - 1}"
      s"""p$n AS (
  SELECT pr['l'] AS l, pr['r'] AS r, sum(freq) AS pf FROM (
    SELECT unnest(list_transform(range(1, len(syms)), i -> {'l': syms[i], 'r': syms[i+1]})) AS pr,
           freq FROM $prev)
  GROUP BY 1, 2),
t$n AS (SELECT l, r, pf FROM p$n ORDER BY pf DESC, l, r LIMIT 1),
w$n AS (SELECT word, freq,
  list_reduce(list_transform(syms, s -> [s]),
    (acc, e) -> acc[1:len(acc) - ((acc[len(acc)] = t$n.l AND e[1] = t$n.r)::INT)]
      || [CASE WHEN acc[len(acc)] = t$n.l AND e[1] = t$n.r
          THEN acc[len(acc)] || e[1] ELSE e[1] END]) AS syms
  FROM $prev, t$n)"""
    }.mkString(",\n")
    val finals = (1 to merges).map { n =>
      s"""SELECT CAST(${n - 1} AS INT) AS "rank", l AS "left", r AS "right", l || r AS merged, CAST(pf AS BIGINT) AS pair_freq FROM t$n"""
    }.mkString("\nUNION ALL ")
    s"""WITH w0 AS (
  SELECT word, count(*)::BIGINT AS freq FROM (
    SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
  WHERE word <> '' GROUP BY word),
w0s AS (SELECT word, freq,
  list_transform(range(1, length(word)+1), i -> substr(word, i, 1)) AS syms FROM w0),
$rounds
SELECT * FROM ($finals) ORDER BY "rank""""
  }

  val queries: Seq[GQuery] = Seq(


    // Approximate aggregates (HLL count-distinct, quantile sketch) — G-class
    // by design (SURVEY.md §2.3: never declared against the DuckDB oracle).
    GQuery("q35_approx_agg",
      (s, d) => t(s, d, "lineitem")
        .agg(approx_count_distinct(col("l_partkey")).as("apx_parts"),
          approx_count_distinct(col("l_orderkey"), 0.01).as("apx_orders"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
            .as("apx_median"),
          percentile_approx(col("l_extendedprice"),
            array(lit(0.25), lit(0.75)), lit(1000)).as("apx_quartiles"))
        .select(col("apx_parts"), col("apx_orders"), col("apx_median"),
          element_at(col("apx_quartiles"), 1).as("apx_p25"),
          element_at(col("apx_quartiles"), 2).as("apx_p75")),
      None),


    // ---- X04: text analysis ------------------------------------------------
    GQuery("x04_text_stats",
      (s, d) => {
        val stop = Seq("the", "a", "of", "and", "to")
        spread(t(s, d, "documents"))
          .withColumn("w", split(col("text"), " "))
          .select(col("doc_id"),
            size(col("w")).cast("long").as("n_tokens"),
            ((col("n_chars") - size(col("w")) + 1).cast("double") / size(col("w")))
              .as("avg_tok"),
            (size(filter(col("w"), x => x.isin(stop: _*))).cast("double")
              / size(col("w"))).as("stop_ratio"),
            size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|\\S"), lit(0)))
              .cast("long").as("n_units"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
  len(string_split(text, ' ')) AS n_tokens,
  CAST(n_chars - len(string_split(text, ' ')) + 1 AS DOUBLE)
    / len(string_split(text, ' ')) AS avg_tok,
  CAST(len(list_filter(string_split(text, ' '),
    x -> x IN ('the','a','of','and','to'))) AS DOUBLE)
    / len(string_split(text, ' ')) AS stop_ratio,
  len(regexp_extract_all(text, '[a-z]+|[0-9]+|\S')) AS n_units
FROM documents ORDER BY doc_id NULLS FIRST""")),


    // BPE-ish pre-tokenizer counting over a corpus WITH punctuation (the
    // documents table is plain space-separated words, so the regex branches
    // would be vacuous there; events.props JSON exercises contraction /
    // letter-run / digit-run / punctuation / space alternatives). The
    // pattern is the GPT-2 pre-tokenizer family minus its \s+(?!\S)
    // lookahead (RE2 — DuckDB's engine — has no lookahead; both engines are
    // leftmost-first on this alternation, verified piece-for-piece).
    GQuery("x04_bpe_tokens",
      (s, d) => {
        val pat = "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +"
        Tables.events(s, d)
          .select(col("event_id"), col("props"))
          .withColumn("n_bpe",
            size(regexp_extract_all(col("props"), lit(pat), lit(0))).cast("long"))
          .withColumn("n_ws", size(split(col("props"), " ")).cast("long"))
          .select(col("event_id"), col("n_bpe"), col("n_ws"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id,
  len(regexp_extract_all(props,
    '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +')) AS n_bpe,
  len(string_split(props, ' ')) AS n_ws
FROM events ORDER BY event_id NULLS FIRST""")),


    GQuery("x04_tfidf",
      (s, d) => {
        val docs = t(s, d, "documents")
        val words = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        val tf = words.groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
        val dfreq = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
        val nd = docs.agg(count(lit(1)).as("nd"))
        tf.join(dfreq, "word").crossJoin(broadcast(nd))
          .filter(col("doc_id") < 100)
          .select(col("doc_id"), col("word"),
            (col("tf") * log(col("nd") / col("df"))).cast("decimal(18,6)").cast("double").as("tfidf"))
          .orderBy(col("doc_id"), col("word"))
      },
      Some("""WITH words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
tf AS (SELECT doc_id, word, count(*) AS tf FROM words GROUP BY 1, 2),
df AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
nd AS (SELECT count(*) AS nd FROM documents)
SELECT t.doc_id, t.word, CAST(CAST(t.tf * ln(nd.nd / d.df) AS DECIMAL(18,6)) AS DOUBLE) AS tfidf
FROM tf t JOIN df d USING (word) CROSS JOIN nd
WHERE t.doc_id < 100
ORDER BY doc_id NULLS FIRST, word NULLS FIRST""")),


    // ---- X41: BPE tokenizer induction --------------------------------------
    // The TRAINING half of the tokenizer axis (x04_bpe_tokens is inference-
    // side pre-tokenization). x41_bpe_pairs is the oracle-checked kernel:
    // the iteration-0 corpus-wide weighted adjacent-character-pair counts
    // over the distinct-word frequency table — exactly the aggregation each
    // BPE merge round runs. Top-50 with a total (count desc, l, r) order so
    // the LIMIT boundary is deterministic cross-engine.
    GQuery("x41_bpe_pairs",
      (s, d) => {
        val wf = t(s, d, "documents")
          .select(explode(split(lower(col("text")), " ")).as("word"))
          .filter(col("word") =!= "")
          .groupBy("word").agg(count(lit(1)).as("freq"))
          .withColumn("syms", split(col("word"), "(?!^)(?=.)"))
        wf.select(col("freq"), explode(arrays_zip(
            slice(col("syms"), lit(1), size(col("syms")) - 1).as("l"),
            slice(col("syms"), lit(2), size(col("syms")) - 1).as("r"))).as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("freq")).cast("long").as("pair_freq"))
          .orderBy(col("pair_freq").desc, col("l"), col("r"))
          .limit(50)
      },
      Some("""WITH w AS (
  SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents),
wf AS (SELECT word, count(*) AS freq FROM w WHERE word <> '' GROUP BY word),
p AS (SELECT substr(word, CAST(i AS INT) + 1, 1) AS l,
             substr(word, CAST(i AS INT) + 2, 1) AS r, freq
      FROM wf, unnest(range(len(word) - 1)) u(i))
SELECT l, r, CAST(sum(freq) AS BIGINT) AS pair_freq
FROM p GROUP BY l, r
ORDER BY pair_freq DESC, l NULLS FIRST, r NULLS FIRST LIMIT 50""")),


    // Full iterative induction: 8 learned merges over the documents corpus.
    // O-class since round 12 via the x53 trainer-replay recipe: batch=1 is
    // the EXACT classic algorithm, so each round is top-1 pair (count desc,
    // l, r) → one greedy left-to-right re-segmentation — 8 unrolled DuckDB
    // CTE rounds walk the identical op tree and the merge TABLE itself
    // (rank, left, right, merged, pair_freq) hash-matches. BpeSpec still
    // proves the distributed trainer equals an independent in-memory BPE
    // reference on randomized corpora.
    GQuery("x41_bpe_merges",
      (s, d) => graft.GraftOps.bpeVocab(
          t(s, d, "documents"), col("text"), merges = 8)
        .orderBy(col("rank")),
      Some(bpeMergesOracle(8))),


    // Heuristic language-ID vs the labeled lang column. O-class: the
    // expression's distance is exact integer arithmetic, so the DuckDB oracle
    // replays the identical counts + formula in SQL (generated from the same
    // profile table — one source of truth).
    GQuery("x04_langid",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"), lang_id(col("text")).as("guess"), col("lang"))
        .orderBy(col("doc_id")),
      Some(graft.functions.LanguageId.oracleSql)),


    // Trained language ID (round 16, VERDICT r15 #6): Laplace-smoothed
    // multinomial Naive Bayes fit on the even-doc_id half, classifying
    // every doc; log-probs decimal-quantized (x27 recipe), scores summed
    // as exact decimals, argmax replayed identically in DuckDB. The x78b
    // audit scores this on the untouched odd-half holdout — see its
    // commentary for why the majority prior is this corpus's Bayes
    // ceiling (the label is chi-square-independent of the text).
    GQuery("x04_langid2",
      // memo-backed since round 18 (setup_langid_memo): identical lineage,
      // shared with x78b's audit instead of re-training the NB per lane
      (s, d) => langid2Memo(s, d)
        .select(col("doc_id"), col("guess"), col("lang"))
        .orderBy(col("doc_id")),
      Some(s"""WITH $langid2OracleCte
SELECT doc_id, guess, lang FROM nbpred ORDER BY doc_id NULLS FIRST""")),


    // Winnowing rolling-hash fingerprint per document. G-class.
    GQuery("x04_fingerprint",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"), winnow_fp(col("text"), 8, 4).as("fp"))
        .orderBy(col("doc_id")),
      None),


    // Min-hash document fingerprint over 8-char shingles with a
    // cross-engine-stable hash (md5 hex, lexicographic min) — the O-class
    // companion to the custom winnowing expression above. Built purely from
    // codegen'd higher-order functions (sequence → transform → array_min).
    GQuery("x04_fingerprint_md5",
      (s, d) => spread(t(s, d, "documents"))
        .select(col("doc_id"),
          // stride-4 shingle positions: identical fingerprint definition on
          // both engines at a quarter of the hash work (hashing EVERY
          // position was the single most expensive query in the registry)
          expr("""array_min(transform(sequence(1, greatest(length(text) - 7, 1), 4),
                 i -> md5(substring(text, i, 8))))""").as("fp"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
  list_min([md5(substr(text, i, 8))
            for i in range(1, greatest(len(text) - 7, 1) + 1, 4)]) AS fp
FROM documents ORDER BY doc_id NULLS FIRST""")),


    // The WINNOWING ALGORITHM replayed exactly (round 14, VERDICT r13 #6 —
    // the x02c recipe applied to x04_fingerprint): same scheme as the
    // winnow_fp kernel (k=8 char grams, w=4 windows, leftmost-min
    // selection, XOR fold of the selected gram hashes; Schleimer/
    // Wilkerson/Aiken SIGMOD'03) with ONE substitution — the gram hash is
    // the cross-engine md5-prefix 60-bit value instead of FNV+splitmix64
    // (64-bit wraparound multiplies, not DuckDB-expressible; the memory
    // trap list). The kernel's "skip if same position as last pick" dedup
    // is provably XOR-over-DISTINCT-picked-positions (picked positions are
    // non-decreasing: a strictly-smaller later gram can never lose to, then
    // beat, the same earlier gram), which is what both engines compute.
    // Short docs (< k chars) degrade to one gram = the whole text, falling
    // out of the same expressions (substring clamps on both engines). This
    // twin pins window selection, position dedup and the XOR fold — the
    // parts of x04_fingerprint the stride-4 min-hash twin above cannot see.
    GQuery("x04b_fingerprint_winnow_exact",
      (s, d) => spread(t(s, d, "documents"))
        .withColumn("g", expr(
          """transform(sequence(1, greatest(length(text) - 7, 1)),
             i -> cast(conv(substring(md5(substring(text, i, 8)), 1, 15), 16, 10) as bigint))"""))
        .withColumn("picks", expr(
          """array_distinct(transform(sequence(1, greatest(size(g) - 3, 1)),
             i -> aggregate(sequence(i, least(i + 3, size(g))), i,
                    (best, j) -> if(element_at(g, j) < element_at(g, best), j, best))))"""))
        .select(col("doc_id"), expr(
          """aggregate(picks, cast(0 as bigint),
             (acc, q) -> acc ^ element_at(g, q))""").as("fp"))
        .orderBy(col("doc_id")),
      Some("""WITH g AS (
  SELECT doc_id,
    list_transform(range(1, greatest(len(text) - 7, 1) + 1),
      i -> CAST(concat('0x', substr(md5(substr(text, i, 8)), 1, 15)) AS BIGINT)) AS gv
  FROM documents),
p AS (
  SELECT doc_id, gv,
    list_distinct(list_transform(range(1, greatest(len(gv) - 3, 1) + 1),
      i -> list_reduce(range(i, least(i + 3, len(gv)) + 1),
             (best, j) -> CASE WHEN gv[j] < gv[best] THEN j ELSE best END))) AS picks
  FROM g)
SELECT doc_id,
  CAST(list_reduce(list_transform(picks, q -> gv[q]), (a, b) -> xor(a, b)) AS BIGINT) AS fp
FROM p ORDER BY doc_id NULLS FIRST""")),


    // Document quality score: length / punctuation / stopword / uniqueness
    // signals combined into one 0..100 score plus a keep/flag/drop band — the
    // filter a training-data pipeline applies before dedup. Pure integer/
    // decimal arithmetic so the band edges are exact on both engines.
    GQuery("x04_quality",
      (s, d) => {
        val stop = Seq("the", "a", "of", "and", "to")
        spread(t(s, d, "documents"))
          .withColumn("w", split(col("text"), " "))
          .withColumn("n_tok", size(col("w")).cast("long"))
          .withColumn("n_stop",
            size(filter(col("w"), x => x.isin(stop: _*))).cast("long"))
          .withColumn("n_uniq", size(array_distinct(col("w"))).cast("long"))
          .withColumn("score",
            // `div` (integer division) — Spark's `/` on longs is double
            expr("""least(n_tok, 400) * 25 div 400
              + (25 - least(n_stop * 100 div n_tok, 25))
              + least(n_uniq * 50 div n_tok, 50)""").cast("long"))
          .select(col("doc_id"), col("n_tok"), col("n_uniq"), col("score"),
            when(col("score") >= 60, "keep")
              .when(col("score") >= 40, "flag").otherwise("drop").as("band"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
m AS (SELECT doc_id, len(w) AS n_tok,
    len(list_filter(w, x -> x IN ('the','a','of','and','to'))) AS n_stop,
    len(list_distinct(w)) AS n_uniq
  FROM t),
sc AS (SELECT doc_id, n_tok, n_uniq,
    least(n_tok, 400) * 25 // 400
      + (25 - least(n_stop * 100 // n_tok, 25))
      + least(n_uniq * 50 // n_tok, 50) AS score
  FROM m)
SELECT doc_id, n_tok, n_uniq, score,
  CASE WHEN score >= 60 THEN 'keep' WHEN score >= 40 THEN 'flag'
       ELSE 'drop' END AS band
FROM sc ORDER BY doc_id NULLS FIRST""")),


    // ---- X08: context-window chunking --------------------------------------
    // Fixed-size token chunks with overlap (50-token windows, stride 40) —
    // the packing prep before tokenization in a training pipeline. Pure
    // per-row higher-order functions (sequence → transform → slice →
    // posexplode): partition-local, codegen'd, no shuffle until the final
    // order. Chunk count = ceil((n-50)/40)+1 in exact integer arithmetic.
    GQuery("x08_chunk_documents",
      (s, d) => t(s, d, "documents")
        .filter(col("doc_id") < 200)
        .withColumn("w", split(col("text"), " "))
        .select(col("doc_id"),
          posexplode(expr(
            """transform(sequence(1, greatest((size(w) - 50 + 39) div 40, 0) + 1),
               i -> array_join(slice(w, (i - 1) * 40 + 1, 50), ' '))""")))
        .select(col("doc_id"), col("pos").cast("long").as("chunk"),
          size(split(col("col"), " ")).cast("long").as("n_tokens"),
          col("col").as("chunk_text"))
        .orderBy(col("doc_id"), col("chunk")),
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
  FROM documents WHERE doc_id < 200),
c AS (SELECT doc_id,
    [array_to_string(w[(i - 1) * 40 + 1 : (i - 1) * 40 + 50], ' ')
     for i in range(1, greatest((len(w) - 50 + 39) // 40, 0) + 2)] AS chunks
  FROM t)
SELECT doc_id, pos AS chunk,
  len(string_split(chunks[pos + 1], ' ')) AS n_tokens,
  chunks[pos + 1] AS chunk_text
FROM c, unnest(range(len(chunks))) u(pos)
ORDER BY doc_id NULLS FIRST, chunk NULLS FIRST""")),


    // ---- X12: PII redaction -------------------------------------------------
    // Text-cleaning / policy-masking pass: emails and phone-shaped tokens are
    // replaced with typed placeholders and counted. The contact lines are
    // synthesized deterministically (the corpus has no real PII); patterns
    // stay in the regex subset Java and RE2 dialects share. Pure per-row
    // expressions — no shuffle until the final order.
    GQuery("x12_pii_redact",
      (s, d) => t(s, d, "documents")
        .filter(col("doc_id") < 300)
        .withColumn("raw", concat(
          lit("contact user"), col("doc_id"), lit("@mail.example.com or "),
          lit("555-"), (col("doc_id") * 7 % 10000), lit(" :: "), col("text")))
        .select(col("doc_id"),
          regexp_count(col("raw"), lit("[A-Za-z0-9.]+@[A-Za-z0-9.]+"))
            .cast("long").as("n_emails"),
          regexp_count(col("raw"), lit("555-[0-9]+")).cast("long").as("n_phones"),
          regexp_replace(
            regexp_replace(col("raw"), "[A-Za-z0-9.]+@[A-Za-z0-9.]+", "[EMAIL]"),
            "555-[0-9]+", "[PHONE]").as("clean"))
        .orderBy(col("doc_id")),
      Some("""WITH r AS (SELECT doc_id,
    'contact user' || doc_id || '@mail.example.com or 555-' || (doc_id * 7 % 10000)
      || ' :: ' || text AS raw
  FROM documents WHERE doc_id < 300)
SELECT doc_id,
  len(regexp_extract_all(raw, '[A-Za-z0-9.]+@[A-Za-z0-9.]+')) AS n_emails,
  len(regexp_extract_all(raw, '555-[0-9]+')) AS n_phones,
  regexp_replace(regexp_replace(raw, '[A-Za-z0-9.]+@[A-Za-z0-9.]+', '[EMAIL]', 'g'),
    '555-[0-9]+', '[PHONE]', 'g') AS clean
FROM r ORDER BY doc_id NULLS FIRST""")),


    // ---- X68: checksum-validated PII (Luhn) ---------------------------------
    // The precision upgrade over x12's shape-only regexes: 13-16 digit runs
    // are card CANDIDATES, but only those passing the Luhn check digit
    // (ISO/IEC 7812 — the public mod-10 algorithm every card number
    // satisfies) are redacted; plausible-but-invalid order numbers survive
    // untouched. False-positive PII masking destroys training text, so real
    // curation pipelines validate before they redact. Contact lines are
    // synthesized deterministically like x12 (the corpus has no real PII):
    // one ALWAYS-valid card built by computing its own check digit, and one
    // data-dependent number valid for ~10% of docs — so the oracle replays
    // candidate extraction, validation and the selective-redaction fold
    // exactly. Pure per-row integer/string expressions — no shuffle before
    // the presentation sort; streams at scan speed over 100 TB.
    GQuery("x68_luhn_pii",
      (s, d) => {
        // Luhn sum over a digit string: double every second digit from the
        // RIGHT (0-based odd index of the reversed sequence), 9-cap, sum.
        def luhnSum(c: String, parity: Int) =
          s"""aggregate(transform(
               reverse(transform(regexp_extract_all($c, '[0-9]', 0), x -> int(x))),
               (d, i) -> CASE WHEN i % 2 = $parity
                 THEN (CASE WHEN d * 2 > 9 THEN d * 2 - 9 ELSE d * 2 END)
                 ELSE d END),
             0, (a, x) -> a + x)"""
        spread(t(s, d, "documents"))
          .withColumn("pay",
            expr("lpad(CAST(doc_id * 37 + 11 AS STRING), 15, '0')"))
          .withColumn("card2",
            expr("lpad(CAST(doc_id * 91 + 7 AS STRING), 16, '0')"))
          // check digit lands at reversed index 0, so the payload's parity
          // flips: double at EVEN reversed indexes of the 15-digit payload
          .withColumn("cd",
            expr(s"(10 - ${luhnSum("pay", 0)} % 10) % 10"))
          .withColumn("raw", expr(
            "concat('order ', card2, ' pay ', pay, cd, ' :: ', text)"))
          .withColumn("cs",
            expr("regexp_extract_all(raw, '[0-9]{13,16}', 0)"))
          .withColumn("ok",
            expr(s"filter(cs, c -> ${luhnSum("c", 1)} % 10 = 0)"))
          .select(col("doc_id"),
            size(col("cs")).cast("long").as("n_candidates"),
            size(col("ok")).cast("long").as("n_valid"),
            expr("aggregate(ok, raw, (a, x) -> replace(a, x, '[CARD]'))")
              .as("clean"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH base AS (SELECT doc_id,
    lpad(CAST(doc_id * 37 + 11 AS VARCHAR), 15, '0') AS pay,
    lpad(CAST(doc_id * 91 + 7 AS VARCHAR), 16, '0') AS card2,
    text FROM documents),
chk AS (SELECT *,
    (10 - list_sum(list_transform(
        list_reverse(list_transform(regexp_extract_all(pay, '[0-9]'), x -> CAST(x AS INT))),
        (d, i) -> CASE WHEN (i - 1) % 2 = 0
          THEN CASE WHEN d * 2 > 9 THEN d * 2 - 9 ELSE d * 2 END
          ELSE d END)) % 10) % 10 AS cd
  FROM base),
r AS (SELECT doc_id,
    'order ' || card2 || ' pay ' || pay || cd || ' :: ' || text AS raw
  FROM chk),
cands AS (SELECT doc_id, raw,
    regexp_extract_all(raw, '[0-9]{13,16}') AS cs FROM r),
v AS (SELECT doc_id, raw, cs,
    list_filter(cs, c -> list_sum(list_transform(
        list_reverse(list_transform(regexp_extract_all(c, '[0-9]'), x -> CAST(x AS INT))),
        (d, i) -> CASE WHEN (i - 1) % 2 = 1
          THEN CASE WHEN d * 2 > 9 THEN d * 2 - 9 ELSE d * 2 END
          ELSE d END)) % 10 = 0) AS ok
  FROM cands)
SELECT doc_id, len(cs) AS n_candidates, len(ok) AS n_valid,
  list_reduce([raw] || ok, (a, x) -> replace(a, x, '[CARD]')) AS clean
FROM v ORDER BY doc_id NULLS FIRST""")),


    // ---- X14: repetition quality filter ------------------------------------
    // Gopher-style repetition heuristics, adapted to this corpus: per-doc
    // distinct-word fraction and most-common-bigram fraction, with a
    // keep/drop verdict. Entirely per-row higher-order expressions (the
    // bigram mode is a tiny per-row quadratic over ~40 words) — NO shuffle
    // at all before the final presentation sort, so it streams at scan
    // speed over 100 TB. O-class.
    GQuery("x14_repetition_filter",
      (s, d) => spread(t(s, d, "documents"))
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 2)
        .withColumn("bg", expr(
          "transform(sequence(1, size(w) - 1), i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"))
        // most-common-bigram multiplicity as a sorted run-length fold:
        // O(n log n) per row vs the naive O(n²) distinct×filter scan
        // (2.6 s → ~1 s over sf0.1; same value, the oracle recomputes it
        // as list_max over distinct multiplicities)
        .withColumn("top_bg", expr(
          """aggregate(array_sort(bg),
               named_struct('prev', '', 'run', 0L, 'best', 0L),
               (s, x) -> named_struct(
                 'prev', x,
                 'run', if(x = s.prev, s.run + 1L, 1L),
                 'best', greatest(s.best, if(x = s.prev, s.run + 1L, 1L))),
               s -> s.best)"""))
        .select(col("doc_id"),
          size(col("w")).cast("long").as("n_words"),
          (size(array_distinct(col("w"))).cast("double") / size(col("w")).cast("double"))
            .cast("decimal(18,6)").cast("double").as("distinct_frac"),
          (col("top_bg").cast("double") / size(col("bg")).cast("double"))
            .cast("decimal(18,6)").cast("double").as("top_bigram_frac"))
        .withColumn("keep",
          col("distinct_frac") >= 0.4 && col("top_bigram_frac") <= 0.1)
        .orderBy(col("doc_id")),
      Some("""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
b AS (SELECT doc_id, w,
    list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i + 1]) AS bg
  FROM tk WHERE len(w) >= 2),
m AS (SELECT doc_id, len(w) AS n_words,
    CAST(CAST(CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS DECIMAL(18,6)) AS DOUBLE)
      AS distinct_frac,
    CAST(CAST(CAST(list_max(list_transform(list_distinct(bg),
        x -> len(list_filter(bg, y -> y = x)))) AS DOUBLE) / len(bg)
      AS DECIMAL(18,6)) AS DOUBLE) AS top_bigram_frac
  FROM b)
SELECT doc_id, n_words, distinct_frac, top_bigram_frac,
  distinct_frac >= 0.4 AND top_bigram_frac <= 0.1 AS keep
FROM m ORDER BY doc_id NULLS FIRST""")),


    // ---- X17: unigram surprisal scoring ------------------------------------
    // Cheap LM-free quality proxy: each doc's mean negative log-likelihood
    // under the corpus's own unigram distribution (high = rare-word-heavy or
    // noisy). Two corpus passes: a hash agg builds the vocab (tiny — it is
    // the distinct word set), which BROADCASTS back onto the exploded words;
    // per-doc sums shuffle once by doc id. Rounded through decimal(18,6)
    // after the sum — ln() agrees across engines to 1 ulp and the ~50-term
    // sum keeps the error ~8 orders below the rounding grain. O-class.
    GQuery("x17_unigram_surprisal",
      (s, d) => {
        val words = t(s, d, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        // persist the (tiny) vocab so the normalizer's sum doesn't replay
        // the corpus-wide word count a second time
        val vocab = words.groupBy(col("w"))
          .agg(count(lit(1)).cast("double").as("c"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        vocab.count()
        val total = vocab.agg(sum(col("c")).as("tot"))
        val logp = vocab.join(broadcast(total))
          .select(col("w"), log(col("c") / col("tot")).as("lp"))
        words.join(broadcast(logp), "w")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_words"),
            (-sum(col("lp")) / count(lit(1)))
              .cast("decimal(18,6)").cast("double").as("surprisal"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
  FROM documents),
vocab AS (SELECT w, CAST(count(*) AS DOUBLE) AS c FROM words GROUP BY w),
tot AS (SELECT sum(c) AS tot FROM vocab),
logp AS (SELECT w, ln(c / tot) AS lp FROM vocab, tot)
SELECT doc_id, count(*) AS n_words,
  CAST(CAST(-sum(lp) / count(*) AS DECIMAL(18,6)) AS DOUBLE) AS surprisal
FROM words JOIN logp USING (w)
GROUP BY doc_id ORDER BY doc_id NULLS FIRST""")),


    // ---- X27: bigram-LM surprisal gate -------------------------------------
    // The CCNet/KenLM-shaped quality gate one level up from X17's unigram
    // model: per-doc mean negative log-likelihood under a corpus-self BIGRAM
    // model with add-one smoothing, p(w2|w1) = (c12+1)/(c1+V). Bigrams come
    // from a lead() window per doc (one doc-keyed shuffle — never a
    // positional self-join); the bigram/unigram count tables join
    // inverted-index style; V broadcasts as one row. Cross-engine float
    // discipline as in X17: ln() sums round at the decimal(18,6) grain
    // BEFORE comparison/threshold, so ULP noise cannot flip the gate. At
    // 100 TB the count tables shard by their gram keys and the model tables
    // are the only reused artifacts — this is perplexity filtering with the
    // LM trained on the corpus itself.
    GQuery("x27_bigram_surprisal",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("pos"))
        val toks = t(s, d, "documents")
          .select(col("doc_id"), posexplode(split(col("text"), " ")))
          .toDF("doc_id", "pos", "w")
        val bi = toks.withColumn("w2", lead(col("w"), 1).over(w))
          .filter(col("w2").isNotNull)
        val uni = toks.groupBy(col("w"))
          .agg(count(lit(1)).cast("double").as("c1"))
        val big = bi.groupBy(col("w"), col("w2"))
          .agg(count(lit(1)).cast("double").as("c12"))
        val v = uni.agg(count(lit(1)).cast("double").as("vsz"))
        val lp = big.join(uni, "w").join(broadcast(v))
          .select(col("w"), col("w2"),
            log((col("c12") + 1.0d) / (col("c1") + col("vsz"))).as("lp"))
        val nll = (-sum(col("lp")) / count(lit(1)))
          .cast("decimal(18,6)").cast("double")
        bi.join(lp, Seq("w", "w2"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_bigrams"), nll.as("nll"))
          .withColumn("action", when(col("nll") > 8.0, "flag").otherwise("keep"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
toks AS (SELECT doc_id, i AS pos, ws[i] AS w
  FROM t0, unnest(range(1, len(ws) + 1)) r(i)),
bi AS (SELECT doc_id, w,
    lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2 FROM toks),
bi2 AS (SELECT doc_id, w, w2 FROM bi WHERE w2 IS NOT NULL),
uni AS (SELECT w, CAST(count(*) AS DOUBLE) AS c1 FROM toks GROUP BY w),
big AS (SELECT w, w2, CAST(count(*) AS DOUBLE) AS c12 FROM bi2 GROUP BY w, w2),
v AS (SELECT CAST(count(*) AS DOUBLE) AS vsz FROM uni),
lp AS (SELECT w, w2, ln((c12 + 1) / (c1 + vsz)) AS lp
  FROM big JOIN uni USING (w), v),
agg AS (SELECT doc_id, count(*) AS n_bigrams,
    CAST(CAST(-sum(lp) / count(*) AS DECIMAL(18,6)) AS DOUBLE) AS nll
  FROM bi2 JOIN lp USING (w, w2) GROUP BY doc_id)
SELECT doc_id, n_bigrams, nll,
  CASE WHEN nll > 8.0 THEN 'flag' ELSE 'keep' END AS action
FROM agg ORDER BY doc_id NULLS FIRST""")),


    // ---- X45: vocabulary coverage / OOV-rate filter ------------------------
    // Tokenizer-facing curation: induce the top-20 corpus vocabulary
    // (freq desc, word asc — total order, so the cut is deterministic), then
    // score every document by its out-of-vocabulary token rate and flag
    // docs above 40% OOV (the cheap proxy for "not the language/domain the
    // tokenizer was trained for"). The vocab is aggregate-sized → broadcast;
    // the per-doc pass is one exploded join against it — linear, no global
    // state beyond the tiny vocab table.
    GQuery("x45_vocab_coverage",
      (s, d) => {
        // ONE explode of the corpus (VERDICT r7 #5: the words DF was
        // evaluated twice — vocab agg + per-doc join — doubling the
        // Generate). Pre-aggregate to per-doc word counts and materialize
        // them (localCheckpoint truncates the lineage so the vocab agg and
        // the per-doc join both read the materialized counts, not the
        // re-exploded corpus). At 100 TB this intermediate is the standard
        // "tokenize once, write the counts table" pipeline stage.
        val wc = t(s, d, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
          .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("c"))
          .localCheckpoint()
        val vocab = wc.groupBy(col("word")).agg(sum(col("c")).as("freq"))
          .orderBy(col("freq").desc, col("word")).limit(20)
          .select(col("word"), lit(1).as("iv"))
        val oov = (col("n_oov").cast("double") / col("n_tokens"))
          .cast("decimal(18,6)").cast("double")
        wc.join(broadcast(vocab), Seq("word"), "left")
          .groupBy(col("doc_id"))
          .agg(sum(col("c")).as("n_tokens"),
            sum(when(col("iv").isNull, col("c")).otherwise(0L)).as("n_oov"))
          .select(col("doc_id"), col("n_tokens"), col("n_oov"),
            oov.as("oov_rate"))
          .withColumn("flagged",
            (col("n_oov").cast("double") / col("n_tokens"))
              .cast("decimal(18,6)").cast("double") > 0.4)
          .orderBy(col("doc_id"))
      },
      Some("""WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
vocab AS (SELECT word FROM (SELECT word, count(*) AS freq FROM words GROUP BY 1)
          ORDER BY freq DESC, word LIMIT 20)
SELECT doc_id, count(*) AS n_tokens,
  CAST(count(*) FILTER (WHERE word NOT IN (SELECT word FROM vocab)) AS BIGINT)
    AS n_oov,
  CAST(CAST(CAST(count(*) FILTER (WHERE word NOT IN (SELECT word FROM vocab))
    AS DOUBLE) / count(*) AS DECIMAL(18,6)) AS DOUBLE) AS oov_rate,
  CAST(CAST(CAST(count(*) FILTER (WHERE word NOT IN (SELECT word FROM vocab))
    AS DOUBLE) / count(*) AS DECIMAL(18,6)) AS DOUBLE) > 0.4 AS flagged
FROM words GROUP BY doc_id ORDER BY doc_id NULLS FIRST""")),


    // ---- X51: intra-document self-repetition trim --------------------------
    // X43 excises chunks that repeat across the CORPUS; this trims chunks
    // that repeat within ONE document (copy-paste loops, boilerplate a
    // crawler stitched twice into the same page) — the repeated occurrence
    // is dropped, the FIRST kept, and the document reassembled in order.
    // Mechanics: fixed 4-word chunks; chunk i survives iff it is the first
    // occurrence of its text (array_position == i); the word remainder
    // (len % 4) is always kept. The rebuilt text is emitted as an md5 so the
    // oracle proves byte-exact reassembly without shipping full texts.
    // Deterministic self-repeat variants (first 8 words spliced in twice)
    // are planted so the trim path stays exercised on a repeat-free corpus.
    // Scale: 100% per-row higher-order functions — ZERO shuffles before the
    // presentation sort; a 100 TB corpus trims in one mapper pass.
    GQuery("x51_selfrep_trim",
      (s, d) => {
        val docs = t(s, d, "documents")
        val off = graft.GraftOps.imageVariantOffset(docs, col("doc_id"))
        val variants = docs.filter(col("doc_id") % 30 === 7)
          .select((col("doc_id") + off).as("doc_id"),
            array_join(concat(slice(split(col("text"), " "), 1, 8),
              slice(split(col("text"), " "), 1, 8),
              split(col("text"), " ")), " ").as("text"))
        spread(docs.select(col("doc_id"), col("text")).unionAll(variants))
          .withColumn("w", split(col("text"), " "))
          .withColumn("nc", (size(col("w")) / 4).cast("int"))
          .withColumn("chunks", expr(
            "if(nc >= 1, transform(sequence(1, nc), " +
              "i -> array_join(slice(w, (i - 1) * 4 + 1, 4), ' ')), " +
              "array())"))
          .withColumn("kept", expr(
            "filter(if(nc >= 1, sequence(1, nc), array()), " +
              "i -> array_position(chunks, element_at(chunks, i)) = i)"))
          .withColumn("kw", expr(
            "concat(flatten(transform(kept, i -> slice(w, (i - 1) * 4 + 1, 4))), " +
              "slice(w, nc * 4 + 1, size(w) - nc * 4))"))
          .select(col("doc_id"),
            size(col("w")).cast("long").as("n_words"),
            col("nc").cast("long").as("n_chunks"),
            (col("nc") - size(col("kept"))).cast("long").as("n_dup_chunks"),
            size(col("kw")).cast("long").as("kept_words"),
            when(col("nc") >= 1,
              ((col("nc") - size(col("kept"))).cast("double") / col("nc"))
                .cast("decimal(18,6)").cast("double")).as("dup_frac"),
            md5(array_join(col("kw"), " ")).as("trimmed_md5"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH mx AS (SELECT coalesce(max(doc_id) + 1, 1) AS off FROM documents),
u AS (SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + (SELECT off FROM mx) AS doc_id,
    array_to_string(
      string_split(text, ' ')[1:8] || string_split(text, ' ')[1:8]
        || string_split(text, ' '), ' ') AS text
  FROM documents WHERE doc_id % 30 = 7),
b AS (SELECT doc_id, string_split(text, ' ') AS w,
    CAST(floor(len(string_split(text, ' ')) / 4) AS INT) AS nc
  FROM u),
c AS (SELECT doc_id, w, nc,
    list_transform(range(1, nc + 1),
      i -> array_to_string(w[((i - 1) * 4 + 1):((i - 1) * 4 + 4)], ' ')) AS chunks
  FROM b),
k AS (SELECT doc_id, w, nc, chunks,
    list_filter(range(1, nc + 1),
      i -> list_position(chunks, chunks[i]) = i) AS kept
  FROM c),
r AS (SELECT doc_id, w, nc, kept,
    flatten(list_transform(kept,
      i -> w[((i - 1) * 4 + 1):((i - 1) * 4 + 4)]))
      || w[(nc * 4 + 1):len(w)] AS kw
  FROM k)
SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
  CAST(nc AS BIGINT) AS n_chunks,
  CAST(nc - len(kept) AS BIGINT) AS n_dup_chunks,
  CAST(len(kw) AS BIGINT) AS kept_words,
  CASE WHEN nc >= 1 THEN
    CAST(CAST(CAST(nc - len(kept) AS DOUBLE) / nc AS DECIMAL(18,6)) AS DOUBLE)
  END AS dup_frac,
  md5(array_to_string(kw, ' ')) AS trimmed_md5
FROM r ORDER BY doc_id NULLS FIRST""")),


    // ---- X52: curriculum schedule assignment -------------------------------
    // Deterministic training-order construction: each doc gets a quality
    // decile (distinct-word ratio — the x14 signal) and a seeded 64-way
    // batch from its content-free md5 (hex chars mapped to ints via strpos,
    // the only portable hex→int both engines share), so every batch draws
    // uniformly from every decile and the schedule is reproducible under
    // re-runs, repartitioning, and corpus growth (a doc's slot never
    // depends on other docs). The per-batch decile spread is aggregated and
    // broadcast back as the mixing diagnostic. The emitted sort keys
    // (batch, decile, cur_rank) ARE the curriculum — no global row_number
    // (a single-partition window at any scale); consumers range-sort.
    // Scale: per-row assignment + one 64-row aggregate broadcast — one scan.
    GQuery("x52_curriculum_order",
      (s, d) => {
        val hex = "0123456789abcdef"
        val w = split(col("text"), " ")
        val ddr = size(array_distinct(w)).cast("double") /
          greatest(size(w), lit(1)).cast("double")
        val h = md5(concat(lit("cur42:"), col("doc_id")))
        val b = ((expr(s"instr('$hex', substring(md5(concat('cur42:', doc_id)), 1, 1))") - 1) * 16 +
          (expr(s"instr('$hex', substring(md5(concat('cur42:', doc_id)), 2, 1))") - 1)) % 64
        val assigned = t(s, d, "documents")
          .select(col("doc_id"),
            least(floor(ddr * 10), lit(9)).cast("long").as("decile"),
            b.cast("long").as("batch"),
            h.as("cur_rank"))
        val spread = assigned.groupBy(col("batch"))
          .agg(count(lit(1)).as("batch_docs"),
            countDistinct(col("decile")).as("batch_deciles"))
        assigned.join(broadcast(spread), Seq("batch"))
          .select(col("doc_id"), col("decile"), col("batch"),
            col("cur_rank"), col("batch_docs"), col("batch_deciles"))
          .orderBy(col("batch"), col("decile"), col("cur_rank"), col("doc_id"))
      },
      Some("""WITH a AS (SELECT doc_id,
    least(CAST(floor((CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      / greatest(len(string_split(text, ' ')), 1)) * 10) AS BIGINT), 9) AS decile,
    CAST(((strpos('0123456789abcdef', substr(md5('cur42:' || doc_id), 1, 1)) - 1) * 16
      + (strpos('0123456789abcdef', substr(md5('cur42:' || doc_id), 2, 1)) - 1)) % 64
      AS BIGINT) AS batch,
    md5('cur42:' || doc_id) AS cur_rank
  FROM documents),
sp AS (SELECT batch, count(*) AS batch_docs,
    count(DISTINCT decile) AS batch_deciles
  FROM a GROUP BY batch)
SELECT doc_id, decile, a.batch, cur_rank, batch_docs, batch_deciles
FROM a JOIN sp ON a.batch = sp.batch
ORDER BY a.batch NULLS FIRST, decile NULLS FIRST, cur_rank NULLS FIRST,
  doc_id NULLS FIRST""")),


    // ---- X53: BPE tokenizer application ------------------------------------
    // The deployment half of x41's vocabulary induction: learn a merge
    // table on the corpus (frontier-batched trainer), broadcast it, and
    // ENCODE every document — per-doc token counts, chars-per-token
    // compression, and a boundary-witnessing md5 of the token stream
    // (GraftOps.bpeEncode). O-class since round 11 via the engine-identical
    // fold idiom (the q107 pattern): the oracle REPLAYS the whole trainer —
    // 6 unrolled frontier rounds of pair-count → top-(want·4) candidates →
    // greedy symbol-disjoint selection (a tagged-list list_reduce; keys
    // carry chr(1), symbols never do, and a [[]] seed makes short rounds
    // no-op) → batch re-segmentation — then encodes with the same
    // left-to-right fold; both engines walk the identical op tree, so the
    // boundary md5 is hash-exact (verified sf0.01 AND sf0.1). DuckDB v1.0
    // trap: CASE/struct with LIST result inside a list_reduce lambda
    // silently returns the last element — conditionals must be scalar CASE
    // inside list exprs or computed slice bounds (e[1:(cond::INT)]).
    // BpeSpec still pins the encoder against an independent reference
    // implementation, the concat-roundtrip identity, and merge-count
    // monotonicity.
    // Scale: merge table broadcasts (~1 MB at 50k merges); encode is one
    // mapPartitions scan with a per-partition word→tokens memo — zero
    // shuffles before the presentation sort.
    GQuery("x53_bpe_encode",
      (s, d) => {
        val docs = t(s, d, "documents")
        val merges = graft.GraftOps.bpeVocab(docs, col("text"),
          merges = 32, batch = 16)
        graft.GraftOps.bpeEncode(docs, col("doc_id"), col("text"), merges)
          .drop("tokens") // spec-only surface; stats + boundary-md5 suffice here
          .withColumn("compression",
            when(col("n_tokens") > 0,
              (col("n_chars").cast("double") / col("n_tokens"))
                .cast("decimal(18,6)").cast("double")))
          .orderBy(col("doc_id"))
      },
      Some(PipelineShared.bpeEncodeCte + """
SELECT d.doc_id,
  CAST(len(d.ws) AS BIGINT) AS n_words,
  CAST(coalesce(list_aggregate(list_transform(d.ws, w -> length(w)), 'sum'), 0) AS BIGINT) AS n_chars,
  CAST(coalesce(len(enc.toks), 0) AS BIGINT) AS n_tokens,
  md5(array_to_string(coalesce(enc.toks, []), chr(1))) AS tokens_md5,
  CASE WHEN coalesce(len(enc.toks), 0) > 0 THEN
    CAST(CAST(CAST(coalesce(list_aggregate(list_transform(d.ws, w -> length(w)), 'sum'), 0) AS DOUBLE)
      / len(enc.toks) AS DECIMAL(18,6)) AS DOUBLE) END AS compression
FROM dws d LEFT JOIN enc USING (doc_id)
ORDER BY d.doc_id NULLS FIRST""")),


    // ---- X11: HLL sketch build / merge -------------------------------------
    // The scalable distinct-count pattern: build one HLL sketch per stratum
    // (map-side mergeable binary state), union sketches for the rollup —
    // shuffle volume is sketch bytes, not row count. G-class by design
    // (estimates; SURVEY §2.3 excludes approx aggs from the oracle);
    // PipelineSpec pins determinism, merge consistency across
    // repartitionings, and error vs exact distinct.
    GQuery("x11_sketch_rollup",
      (s, d) => {
        val sk = graft.Tables.events(s, d)
          .groupBy(col("event_type"))
          .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"),
            countDistinct(col("user_id")).as("exact"))
          // |event_type| rows, two consumers (per-stratum + ALL rollup):
          // checkpoint so the sketch build scans the events once (round 17)
          .localCheckpoint(true)
        val per = sk.select(col("event_type"),
          hll_sketch_estimate(col("sk")).as("est"), col("exact"))
        val total = sk.agg(
          hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).as("est"))
          .select(lit("ALL").as("event_type"), col("est"), lit(null).cast("long").as("exact"))
        per.unionByName(total).orderBy(col("event_type"))
      },
      None),


    // ---- X25: Count-Min frequency sketch rollup ----------------------------
    // The frequency twin of X11's HLL distinct-count: per-stratum Count-Min
    // sketches (Spark's builtin `count_min_sketch` aggregate — mergeable
    // binary state, shuffle = sketch bytes not row count), probed with the
    // custom `cms_estimate` expression against a small fixed user set, with
    // the exact counts alongside. G-class by design (estimates are excluded
    // from the oracle; the CMS guarantee est ∈ [exact, exact + εN] and
    // partition-invariance are pinned by CountMinSpec). At 100 TB the
    // sketches are the only thing crossing the wire — heavy-hitter
    // candidates come from the sketch, exact verification from a keyed
    // lookup of just those candidates, never a full-corpus count.
    GQuery("x25_cms_freq",
      (s, d) => {
        val ev = graft.Tables.events(s, d)
        val sk = ev.groupBy(col("event_type"))
          .agg(count_min_sketch(col("user_id"), lit(0.001), lit(0.99), lit(42))
              .as("sk"),
            count(lit(1)).as("n_rows"))
        val probes = ev.filter(col("user_id") < 8)
          .groupBy(col("event_type"), col("user_id"))
          .agg(count(lit(1)).as("exact"))
        probes.join(sk, "event_type")
          .select(col("event_type"), col("user_id"), col("exact"),
            cms_estimate(col("sk"), col("user_id")).as("est"))
          .orderBy(col("event_type"), col("user_id"))
      },
      None),


    // ---- X47: quality-ensemble scorer --------------------------------------
    // The single keep-score real curation stacks produce from many weak
    // signals (C4/Gopher/RefinedWeb ensembles): distinct-word ratio, length
    // band, punctuation density, mean-word-length deviation and stopword
    // share combine linearly, then squash through the RATIONAL sigmoid
    // z/(1+|z|) — every operation is a correctly-rounded IEEE basic op
    // (+,*,/,abs), so unlike exp()-based logistic the score is bit-identical
    // across engines with no transcendental-libm dependence. Entirely
    // per-row (shuffle-free before the presentation sort); the weights are
    // spec'd literals, the score quantizes at decimal(18,6) before the
    // routing thresholds so the verdict can never straddle an ulp.
    GQuery("x47_quality_ensemble",
      (s, d) => {
        val ws = split(col("text"), " ")
        val nw = size(ws)
        val nwS = greatest(nw, lit(1))
        val stops = array(Seq("the", "a", "of", "and", "to", "in", "is", "for")
          .map(lit): _*)
        val ddr = size(array_distinct(ws)) / nwS
        val lenr = least(nw, lit(400)) / lit(400.0)
        val punct = length(col("text")) -
          length(regexp_replace(col("text"), "[.,!?;:]", ""))
        val pr = punct / greatest(length(col("text")), lit(1))
        val mwl = (length(col("text")) - (nw - lit(1))) / nwS
        val sr = size(filter(ws, w => array_contains(stops, w))) / nwS
        val z = lit(-1.0) + lit(2.4) * ddr + lit(1.2) * lenr -
          lit(3.0) * pr - lit(0.8) * abs(mwl - lit(5.0)) / lit(5.0) +
          lit(1.5) * sr
        val score = (lit(0.5) + lit(0.5) * (z / (lit(1.0) + abs(z))))
          .cast("decimal(18,6)").cast("double")
        spread(t(s, d, "documents"))
          .select(col("doc_id"), nw.cast("long").as("n_words"),
            score.as("score"),
            floor(score * 10).cast("long").as("decile"),
            when(score < 0.35, "drop").when(score < 0.6, "review")
              .otherwise("keep").as("verdict"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH f AS (SELECT doc_id,
    string_split(text, ' ') AS ws,
    len(string_split(text, ' ')) AS nw,
    greatest(len(string_split(text, ' ')), 1) AS nws,
    length(text) AS lt FROM documents),
z AS (SELECT doc_id, nw,
    -1.0 + 2.4 * (len(list_distinct(ws)) / nws)
         + 1.2 * (least(nw, 400) / 400.0)
         - 3.0 * ((lt - length(regexp_replace(text, '[.,!?;:]', '', 'g'))) / greatest(lt, 1))
         - 0.8 * abs(((lt - (nw - 1)) / nws) - 5.0) / 5.0
         + 1.5 * (len(list_filter(ws, w -> list_contains(['the','a','of','and','to','in','is','for'], w))) / nws)
      AS z
  FROM f JOIN documents USING (doc_id)),
sc AS (SELECT doc_id, nw,
    CAST(CAST(0.5 + 0.5 * (z / (1.0 + abs(z))) AS DECIMAL(18,6)) AS DOUBLE) AS score
  FROM z)
SELECT doc_id, CAST(nw AS BIGINT) AS n_words, score,
  CAST(floor(score * 10) AS BIGINT) AS decile,
  CASE WHEN score < 0.35 THEN 'drop' WHEN score < 0.6 THEN 'review'
    ELSE 'keep' END AS verdict
FROM sc ORDER BY doc_id NULLS FIRST""")),


    // ---- X44: source-reputation stats + blocklist --------------------------
    // Domain-level curation: per-source document count, size profile and
    // exact-duplicate ratio (1 - distinct md5 / n), with a block verdict for
    // sources whose dup ratio crosses 30% or whose docs average under 100
    // chars — the per-domain filtering every web-scale corpus applies before
    // doc-level work. One hash-partitioned aggregation; at 100 TB the md5
    // distinct-count can swap to HLL (x11) without changing the shape.
    GQuery("x44_source_reputation",
      (s, d) => {
        val dupRatio = (lit(1.0) - col("n_distinct").cast("double") / col("n_docs"))
          .cast("decimal(18,6)").cast("double")
        t(s, d, "documents")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"),
            countDistinct(md5(col("text"))).as("n_distinct"))
          .select(col("source"), col("n_docs"), col("avg_chars"),
            dupRatio.as("dup_ratio"),
            when(dupRatio > 0.3 || col("avg_chars") < 100.0, "block")
              .otherwise("keep").as("verdict"))
          .orderBy(col("source"))
      },
      Some("""SELECT source, count(*) AS n_docs,
  CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars,
  CAST(CAST(1.0 - CAST(count(DISTINCT md5(text)) AS DOUBLE) / count(*)
    AS DECIMAL(18,6)) AS DOUBLE) AS dup_ratio,
  CASE WHEN CAST(CAST(1.0 - CAST(count(DISTINCT md5(text)) AS DOUBLE) / count(*)
         AS DECIMAL(18,6)) AS DOUBLE) > 0.3
      OR CAST(sum(n_chars) AS DOUBLE) / count(*) < 100.0
    THEN 'block' ELSE 'keep' END AS verdict
FROM documents GROUP BY source ORDER BY source NULLS FIRST""")),


    // ---- X87: HTML text extraction (round 15, VERDICT r14 #2) --------------
    // The crawled-corpus ingestion lane the engine was missing: strip tags,
    // excise script/style, decode entities, normalize whitespace — the step
    // AHEAD of x43's chunk dedup in a real 100 TB pipeline. Proven with the
    // x70/x80 encode→parse identity recipe: each document is wrapped in a
    // synthesized page full of crawl-soup traps (PipelineShared.htmlPage),
    // html_text must recover EXACTLY the six known lines, and the oracle
    // reconstructs those lines in DuckDB from the raw columns — the
    // full-extraction md5 checksum pins every byte of the walk without
    // DuckDB ever parsing HTML. 100 TB shape: generation + extraction +
    // line stats are ONE per-row scan projection (zero joins), the rollup
    // is a map-side-combined groupBy onto |sources| rows.
    GQuery("x87_html_extract",
      (s, d) => {
        val docs = spread(t(s, d, "documents"))
          .filter(col("text").isNotNull && length(col("text")) > 0 &&
            col("lang").isNotNull && col("source").isNotNull)
        val ext = docs.select(col("doc_id"), col("source"), col("text"),
            html_text(htmlPage).as("ext"))
          .withColumn("lines", split(col("ext"), "\n"))
          .withColumn("h", expr(
            "CAST(conv(substr(md5(ext), 1, 15), 16, 10) AS BIGINT)"))
        ext.groupBy(col("source")).agg(
            count(lit(1)).as("n_docs"),
            sum(size(col("lines")).cast("long")).as("n_lines"),
            sum(length(col("ext")).cast("long")).as("n_chars"),
            sum(when(element_at(col("lines"), 4) === col("text"), 1L)
              .otherwise(0L)).as("n_roundtrip_ok"),
            expr("bit_xor(h)").as("checksum"))
          .orderBy(col("source"))
      },
      Some(s"""WITH d AS (SELECT doc_id, source, text FROM documents
  WHERE text IS NOT NULL AND length(text) > 0
    AND lang IS NOT NULL AND source IS NOT NULL),
e AS (SELECT doc_id, source, text, $htmlExpectedDuck AS ext FROM d)
SELECT source, count(*) AS n_docs,
  CAST(sum(len(string_split(ext, chr(10)))) AS BIGINT) AS n_lines,
  CAST(sum(length(ext)) AS BIGINT) AS n_chars,
  CAST(sum((string_split(ext, chr(10))[4] = text)::INT) AS BIGINT)
    AS n_roundtrip_ok,
  bit_xor(CAST(concat('0x', substr(md5(ext), 1, 15)) AS BIGINT)) AS checksum
FROM e GROUP BY source ORDER BY source NULLS FIRST""")),

    // X87b: boilerplate-line removal over the extracted corpus — the CCNet
    // step after tag-strip: a line that appears in ≥ 80% of a source's
    // documents (nav, footer chrome) is boilerplate and is excised; content
    // lines (title/heading/body carry the doc_id or the text) survive, and
    // the ~50%-frequency odd-doc aside proves the threshold bites. Integer-
    // exact test (df*10 >= n_docs*8). 100 TB shape: ONE (source, line)
    // map-side-combined shuffle builds the document-frequency table; the
    // boilerplate set is tiny by construction (≤ lines/0.8·n_docs per
    // source) and broadcasts back for the anti join — the corpus itself
    // shuffles once and never self-joins.
    GQuery("x87b_html_boilerplate",
      (s, d) => {
        val docs = spread(t(s, d, "documents"))
          .filter(col("text").isNotNull && length(col("text")) > 0 &&
            col("lang").isNotNull && col("source").isNotNull)
        val lines = docs
          .select(col("doc_id"), col("source"), html_text(htmlPage).as("ext"))
          .select(col("doc_id"), col("source"),
            explode(split(col("ext"), "\n")).as("line"))
        val dfreq = lines.groupBy(col("source"), col("line"))
          .agg(countDistinct(col("doc_id")).as("df"))
        val nsrc = docs.groupBy(col("source"))
          .agg(countDistinct(col("doc_id")).as("n_docs"))
        val boiler = dfreq.join(broadcast(nsrc), Seq("source"))
          .filter(col("df") * 10 >= col("n_docs") * 8)
          .select(col("source"), col("line"))
        val bAgg = boiler.groupBy(col("source"))
          .agg(count(lit(1)).as("n_boiler_lines"),
            sum(length(col("line")).cast("long")).as("boiler_chars"))
        val kept = lines.join(broadcast(boiler), Seq("source", "line"),
          "left_anti")
        val kAgg = kept.groupBy(col("source"))
          .agg(count(lit(1)).as("n_kept_lines"),
            sum(length(col("line")).cast("long")).as("kept_chars"))
        nsrc.join(bAgg, Seq("source")).join(kAgg, Seq("source"))
          .select(col("source"), col("n_docs"), col("n_boiler_lines"),
            col("boiler_chars"), col("n_kept_lines"), col("kept_chars"))
          .orderBy(col("source"))
      },
      Some(s"""WITH d AS (SELECT doc_id, source, text FROM documents
  WHERE text IS NOT NULL AND length(text) > 0
    AND lang IS NOT NULL AND source IS NOT NULL),
lines AS (
  SELECT doc_id, source, unnest(string_split($htmlExpectedDuck, chr(10)))
    AS line FROM d),
dfreq AS (SELECT source, line, count(DISTINCT doc_id) AS df
  FROM lines GROUP BY 1, 2),
nsrc AS (SELECT source, count(DISTINCT doc_id) AS n_docs FROM d GROUP BY 1),
boiler AS (SELECT dfreq.source, line FROM dfreq JOIN nsrc USING (source)
  WHERE df * 10 >= n_docs * 8),
bagg AS (SELECT source, count(*)::BIGINT AS n_boiler_lines,
    CAST(sum(length(line)) AS BIGINT) AS boiler_chars
  FROM boiler GROUP BY 1),
kept AS (SELECT l.source, l.line FROM lines l ANTI JOIN boiler b
  ON l.source = b.source AND l.line = b.line),
kagg AS (SELECT source, count(*)::BIGINT AS n_kept_lines,
    CAST(sum(length(line)) AS BIGINT) AS kept_chars
  FROM kept GROUP BY 1)
SELECT source, n_docs, n_boiler_lines, boiler_chars, n_kept_lines, kept_chars
FROM nsrc JOIN bagg USING (source) JOIN kagg USING (source)
ORDER BY source NULLS FIRST""")),


    // ---- X88: URL canonicalization + crawl-frontier dedup (round 15) -------
    // The step between x87's tag strip and any fetch queue or outlink
    // count: extract the page's anchors (html_links — script/comment
    // anchors excluded), canonicalize each (url_canon — case, default
    // ports, fragments, utm_* trackers, param order), and aggregate the
    // frontier per host. Proven by the identity recipe: the synthesized
    // pages carry every canonicalizer trap, DuckDB reconstructs the four
    // expected canonical URLs per document from raw columns, and the
    // md5-fold checksum pins every byte of extract+canonicalize. 100 TB
    // shape: per-row extraction (one scan, zero joins), one
    // map-side-combined groupBy onto |hosts| rows.
    GQuery("x88_url_canonicalize",
      (s, d) => {
        val docs = spread(t(s, d, "documents"))
          .filter(col("text").isNotNull && length(col("text")) > 0 &&
            col("lang").isNotNull && col("source").isNotNull)
        val canon = docs
          .select(col("doc_id"),
            explode(html_links(htmlLinkPage)).as("link"))
          .select(url_canon(col("link")).as("canon"))
          .withColumn("host",
            regexp_extract(col("canon"), "^[a-z]+://([^/:?#]+)", 1))
          .withColumn("h", expr(
            "CAST(conv(substr(md5(canon), 1, 15), 16, 10) AS BIGINT)"))
        canon.groupBy(col("host")).agg(
            count(lit(1)).as("n_links"),
            countDistinct(col("canon")).as("n_distinct"),
            expr("bit_xor(h)").as("checksum"))
          .orderBy(col("host"))
      },
      Some(s"""WITH d AS (SELECT doc_id, source FROM documents
  WHERE text IS NOT NULL AND length(text) > 0
    AND lang IS NOT NULL AND source IS NOT NULL),
canon AS (
  SELECT ${linkCanonDuck(0)} AS canon FROM d
  UNION ALL SELECT ${linkCanonDuck(1)} FROM d
  UNION ALL SELECT ${linkCanonDuck(2)} FROM d
  UNION ALL SELECT ${linkCanonDuck(3)} FROM d),
ch AS (SELECT canon, regexp_extract(canon, '^[a-z]+://([^/:?#]+)', 1) AS host,
    CAST(concat('0x', substr(md5(canon), 1, 15)) AS BIGINT) AS h
  FROM canon)
SELECT host, count(*) AS n_links,
  CAST(count(DISTINCT canon) AS BIGINT) AS n_distinct,
  bit_xor(h) AS checksum
FROM ch GROUP BY host ORDER BY host NULLS FIRST""")),

    // X89: outlink-graph PageRank — the crawl-graph composition: the
    // frontier EXTRACTED FROM REAL MARKUP (x88's lanes) becomes the edge
    // list of x39's Pregel-lowered PageRank. Documents (packed 2k) link to
    // the two deterministic targets their pages carry (packed 2t+1);
    // 3 exact iterations over stationary edges, top-20. The oracle
    // reconstructs the same edges from raw columns and unrolls the three
    // iterations in SQL (the proven x39 recipe) — so the chain
    // synthesize→extract→canonicalize→parse-target→rank is pinned
    // end-to-end. 100 TB shape: identical to x39 — destination-partitioned
    // stationary edges, decimal-quantized messages, broadcast rank deltas.
    GQuery("x89_outlink_pagerank",
      (s, d) => {
        val docs = spread(t(s, d, "documents"))
          .filter(col("text").isNotNull && length(col("text")) > 0 &&
            col("lang").isNotNull && col("source").isNotNull)
        val canon = docs
          .select(col("doc_id"), explode(html_links(htmlLinkPage)).as("link"))
          .select(col("doc_id"), url_canon(col("link")).as("canon"))
        val t1 = regexp_extract(col("canon"),
          "^http://example\\.com/doc/([0-9]+)\\?", 1)
        val t2 = regexp_extract(col("canon"),
          "\\.example\\.org/page/([0-9]+)/$", 1)
        val tgt = when(t1 =!= "", t1).when(t2 =!= "", t2)
        val base = canon.select(col("doc_id"), tgt.as("t"))
          .filter(col("t").isNotNull)
          .select((col("doc_id") * 2).as("a"),
            (col("t").cast("long") * 2 + 1).as("b")).distinct()
        val edges = base.select(expr(
          "inline(array(named_struct('a', a, 'b', b), " +
            "named_struct('a', b, 'b', a)))"))
        val r = graft.GraftOps.pageRank(edges, iters = 3)
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("r").desc, col("node"))
        r.orderBy(col("r").desc, col("node")).limit(20)
          .withColumn("rank", row_number().over(w).cast("long"))
          .select(col("rank"),
            when(col("node") % 2 === 0,
              concat(lit("d"), expr("node div 2")))
              .otherwise(concat(lit("t"), expr("node div 2"))).as("node"),
            col("r").cast("decimal(18,10)").cast("double").as("score"))
          .orderBy(col("rank"))
      },
      Some("""WITH d AS (SELECT doc_id FROM documents
  WHERE text IS NOT NULL AND length(text) > 0
    AND lang IS NOT NULL AND source IS NOT NULL),
base AS (
  SELECT DISTINCT a, b FROM (
    SELECT doc_id * 2 AS a, ((doc_id * 7 + 13) % 97) * 2 + 1 AS b FROM d
    UNION ALL
    SELECT doc_id * 2, ((doc_id * 3 + 5) % 97) * 2 + 1 FROM d)),
edges AS (SELECT a, b FROM base UNION ALL SELECT b AS a, a AS b FROM base),
outdeg AS (SELECT a, count(*) AS deg FROM edges GROUP BY a),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM outdeg),
r0 AS (SELECT a AS node, 1.0 / nn AS r FROM outdeg, nn),
m1 AS (SELECT e.b AS node, CAST(r.r / o.deg AS DECIMAL(28,12)) AS m
  FROM r0 r JOIN outdeg o ON r.node = o.a JOIN edges e ON e.a = o.a),
r1 AS (SELECT node, 0.15 / nn + 0.85 * CAST(sum(m) AS DOUBLE) AS r
  FROM m1, nn GROUP BY node, nn),
m2 AS (SELECT e.b AS node, CAST(r.r / o.deg AS DECIMAL(28,12)) AS m
  FROM r1 r JOIN outdeg o ON r.node = o.a JOIN edges e ON e.a = o.a),
r2 AS (SELECT node, 0.15 / nn + 0.85 * CAST(sum(m) AS DOUBLE) AS r
  FROM m2, nn GROUP BY node, nn),
m3 AS (SELECT e.b AS node, CAST(r.r / o.deg AS DECIMAL(28,12)) AS m
  FROM r2 r JOIN outdeg o ON r.node = o.a JOIN edges e ON e.a = o.a),
r3 AS (SELECT node, 0.15 / nn + 0.85 * CAST(sum(m) AS DOUBLE) AS r
  FROM m3, nn GROUP BY node, nn),
ranked AS (SELECT node, r,
    row_number() OVER (ORDER BY r DESC, node) AS rank FROM r3)
SELECT rank,
  CASE WHEN node % 2 = 0 THEN 'd' || (node // 2)
       ELSE 't' || (node // 2) END AS node,
  CAST(CAST(r AS DECIMAL(18,10)) AS DOUBLE) AS score
FROM ranked WHERE rank <= 20 ORDER BY rank NULLS FIRST""")),

    // ---- X90: robots.txt politeness gate (round 15) -------------------------
    // The fetch-or-not decision ahead of any crawl: each source publishes a
    // robots.txt (RFC 9309 core semantics — prefix rules, LONGEST match
    // wins, Allow wins ties, and a crawler's own group SHADOWS the '*'
    // group entirely), and every extracted+canonicalized outlink is gated
    // for two crawlers: 'graftbot' (has its own group: /page/ blocked but
    // /page/1 carved back out — the longest-match test) and a generic bot
    // (falls to '*': /doc/ and /asset/ blocked — and the graftbot
    // comparison proves the '*' rules do NOT leak into a specific group).
    // The oracle never parses robots: the expected verdict of every URL
    // class is analytic from the construction, so the whole
    // synthesize→extract→canonicalize→strip-origin→evaluate chain is
    // pinned by integer counts. 100 TB shape: pure per-row scan (zero
    // joins), |sources|-row rollup.
    GQuery("x90_robots_gate",
      (s, d) => {
        val robots = concat(
          lit("# robots for "), col("source"), lit("\n"),
          lit("User-agent: graftbot\nDisallow: /page/\nAllow: /page/1\n\n"),
          lit("User-agent: *\nDisallow: /asset/\nDisallow: /doc/\nCrawl-delay: 2\n"))
        val docs = spread(t(s, d, "documents"))
          .filter(col("text").isNotNull && length(col("text")) > 0 &&
            col("lang").isNotNull && col("source").isNotNull)
        val urls = docs
          .select(col("source"), robots.as("robots"),
            explode(html_links(htmlLinkPage)).as("link"))
          .select(col("source"), col("robots"),
            regexp_replace(url_canon(col("link")),
              "^[a-z]+://[^/]+", "").as("pathq"))
        urls.select(col("source"),
            robots_allowed(col("robots"), col("pathq"), "graftbot")
              .cast("int").as("bot"),
            robots_allowed(col("robots"), col("pathq"), "OtherBot")
              .cast("int").as("any"))
          .groupBy(col("source")).agg(
            count(lit(1)).as("n_urls"),
            sum(col("bot")).cast("long").as("n_bot_allowed"),
            sum(col("any")).cast("long").as("n_any_allowed"))
          .orderBy(col("source"))
      },
      Some("""WITH d AS (SELECT doc_id, source FROM documents
  WHERE text IS NOT NULL AND length(text) > 0
    AND lang IS NOT NULL AND source IS NOT NULL)
SELECT source, 4 * count(*) AS n_urls,
  CAST(sum(3 + (CAST((doc_id * 3 + 5) % 97 AS VARCHAR) LIKE '1%')::INT)
    AS BIGINT) AS n_bot_allowed,
  2 * count(*) AS n_any_allowed
FROM d GROUP BY source ORDER BY source NULLS FIRST""")),

    // ---- X93: politeness-scheduled crawl frontier (round 16) ----------------
    // The composition a crawler actually runs between discovery and fetch:
    // x88's extracted+canonicalized frontier, grouped by TARGET host,
    // gated by each host's robots.txt (x90's evaluator), de-duplicated,
    // deterministically ordered, and assigned politeness fetch slots —
    // slot = rank · Crawl-delay, with the delay read from the crawler's
    // OWN robots group (the new group-scoped robots_crawl_delay; the `*`
    // group's different delay must NOT leak in, same shadowing as rules)
    // and the host's Sitemap URLs surfaced (robots_sitemaps — global
    // directive). The oracle reconstructs every host's allowed set, the
    // string-ordered schedule and its checksum from raw columns without
    // parsing robots or HTML. 100 TB shape: one per-row extraction scan,
    // one (host, url) distinct + rank shuffle — exactly the frontier
    // dedup a crawl scheduler shards by host anyway; robots text rides
    // the row (in production: a broadcast per-host policy table).
    GQuery("x93_crawl_schedule",
      (s, d) => {
        val docs = spread(t(s, d, "documents"))
          .filter(col("text").isNotNull && length(col("text")) > 0 &&
            col("lang").isNotNull && col("source").isNotNull)
        val canon = docs
          .select(col("doc_id"), explode(html_links(htmlLinkPage)).as("link"))
          .select(url_canon(col("link")).as("url"))
          .filter(col("url").rlike("^https?://"))
          .withColumn("host", regexp_extract(col("url"), "^[a-z]+://([^/]+)", 1))
          .withColumn("pathq", regexp_replace(col("url"), "^[a-z]+://[^/]+", ""))
          .distinct()
        val robots = concat(
          lit("# robots for "), col("host"), lit("\n"),
          lit("User-agent: graftbot\nCrawl-delay: 3\n"),
          lit("Disallow: /page/\nAllow: /page/1\n"),
          lit("Sitemap: https://"), col("host"), lit("/sitemap.xml\n\n"),
          lit("User-agent: *\nDisallow: /asset/\nDisallow: /doc/\n"),
          lit("Crawl-delay: 2\n"))
        val gated = canon
          .withColumn("allowed",
            robots_allowed(robots, col("pathq"), "graftbot"))
          .withColumn("delay", robots_crawl_delay(robots, "graftbot"))
          .withColumn("n_sitemaps", size(robots_sitemaps(robots)).cast("long"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("host")).orderBy(col("url"))
        val sched = gated.filter(col("allowed"))
          .withColumn("slot", (row_number().over(w) - 1).cast("long") * col("delay"))
        val blocked = gated.filter(!col("allowed"))
          .groupBy(col("host")).agg(count(lit(1)).as("n_blocked"))
        sched.groupBy(col("host")).agg(
            count(lit(1)).as("n_allowed"),
            first(col("delay")).as("delay"),
            first(col("n_sitemaps")).as("n_sitemaps"),
            max(col("slot")).as("last_slot"),
            expr("bit_xor(CAST(conv(substr(md5(concat(url, ':', CAST(slot AS STRING))), 1, 15), 16, 10) AS BIGINT))")
              .as("sched_checksum"))
          .join(blocked, Seq("host"), "left")
          .select(col("host"), col("n_allowed"),
            coalesce(col("n_blocked"), lit(0L)).as("n_blocked"),
            col("delay"), col("n_sitemaps"), col("last_slot"),
            col("sched_checksum"))
          .orderBy(col("host"))
      },
      Some("""WITH d AS (SELECT doc_id, source FROM documents
  WHERE text IS NOT NULL AND length(text) > 0
    AND lang IS NOT NULL AND source IS NOT NULL),
urls AS (
  SELECT DISTINCT 'www.example.com' AS host,
    'https://www.example.com/home?x=1' AS url, true AS allowed FROM d
  UNION
  SELECT DISTINCT 'example.com',
    'http://example.com/doc/' || ((doc_id * 7 + 13) % 97) || '?a=1&b=2',
    true FROM d
  UNION
  SELECT DISTINCT 'cdn.example.com:8080',
    'https://cdn.example.com:8080/asset/' || doc_id || '.png?v=3',
    true FROM d
  UNION
  SELECT DISTINCT source || '.example.org',
    'https://' || source || '.example.org/page/' || ((doc_id * 3 + 5) % 97) || '/',
    CAST((doc_id * 3 + 5) % 97 AS VARCHAR) LIKE '1%' FROM d),
sched AS (SELECT host, url,
    3 * (row_number() OVER (PARTITION BY host ORDER BY url) - 1) AS slot
  FROM urls WHERE allowed),
agg AS (SELECT host, count(*)::BIGINT AS n_allowed,
    CAST(max(slot) AS BIGINT) AS last_slot,
    bit_xor(CAST(concat('0x',
      substr(md5(url || ':' || CAST(slot AS VARCHAR)), 1, 15)) AS BIGINT))
      AS sched_checksum
  FROM sched GROUP BY host),
blk AS (SELECT host, count(*)::BIGINT AS n_blocked FROM urls
  WHERE NOT allowed GROUP BY host)
SELECT a.host, a.n_allowed, coalesce(b.n_blocked, 0) AS n_blocked,
  CAST(3 AS BIGINT) AS delay, CAST(1 AS BIGINT) AS n_sitemaps,
  a.last_slot, a.sched_checksum
FROM agg a LEFT JOIN blk b USING (host)
ORDER BY a.host NULLS FIRST""")),

    // ---- X91: WARC ingestion round trip (round 15) --------------------------
    // The container a crawled corpus actually arrives in (Common Crawl
    // ships WARC, ISO 28500): each document becomes a genuine two-record
    // WARC shard — the request record and the response record whose
    // payload is the x87 trap-laden page — ENCODED by warc_record (version
    // line, named headers, Content-Length, the CRLFCRLF terminator) and
    // PARSED BACK by warc_extract walking header-declared lengths. The
    // response payload then flows the x87 extraction, so the FULL
    // ingestion chain — pack → parse → payload-identity → tag-strip — is
    // pinned by md5 checksums the oracle computes from raw columns without
    // ever parsing WARC or HTML. A shifted byte anywhere (wrong
    // Content-Length, missed terminator, header drift) breaks the
    // checksums. 100 TB shape: pure per-row scan, zero joins,
    // |sources|-row rollup.
    GQuery("x91_warc_ingest",
      (s, d) => {
        val docs = spread(t(s, d, "documents"))
          .filter(col("text").isNotNull && length(col("text")) > 0 &&
            col("lang").isNotNull && col("source").isNotNull)
        val m2 = ((col("doc_id") * 3 + 5) % 97).cast("string")
        val uri = concat(lit("https://"), col("source"),
          lit(".example.org/page/"), m2, lit("/"))
        val reqPay = concat(lit("GET /page/"), m2, lit("/")).cast("binary")
        val ts = lit(1723700000000L) + col("doc_id")
        val warc = concat(
          warc_record(uri, ts, reqPay, "request"),
          warc_record(uri, ts, htmlPage.cast("binary"), "response"))
        val rows = docs.select(col("doc_id"), col("source"), col("text"),
            uri.as("uri"), warc_extract(warc).as("recs"))
          .withColumn("req", element_at(col("recs"), 1))
          .withColumn("resp", element_at(col("recs"), 2))
          .withColumn("ext",
            html_text(col("resp.payload").cast("string")))
          .withColumn("ok",
            (size(col("recs")) === 2 &&
              col("req.wtype") === "request" &&
              col("resp.wtype") === "response" &&
              col("req.uri") === col("uri") &&
              col("resp.uri") === col("uri") &&
              element_at(split(col("ext"), "\n"), 4) === col("text"))
              .cast("int"))
        rows.groupBy(col("source")).agg(
            count(lit(1)).as("n_docs"),
            sum(size(col("recs")).cast("long")).as("n_records"),
            sum(col("ok")).cast("long").as("n_ok"),
            sum(col("req.n_bytes").cast("long")).as("req_bytes"),
            expr("bit_xor(CAST(conv(substr(md5(ext), 1, 15), 16, 10) AS BIGINT))")
              .as("text_checksum"),
            expr("bit_xor(CAST(conv(substr(md5(CAST(req.payload AS STRING)), 1, 15), 16, 10) AS BIGINT))")
              .as("req_checksum"))
          .orderBy(col("source"))
      },
      Some(s"""WITH d AS (SELECT doc_id, source, text FROM documents
  WHERE text IS NOT NULL AND length(text) > 0
    AND lang IS NOT NULL AND source IS NOT NULL),
e AS (SELECT doc_id, source, text,
    $htmlExpectedDuck AS ext,
    'GET /page/' || ((doc_id * 3 + 5) % 97) || '/' AS req
  FROM d)
SELECT source, count(*) AS n_docs,
  2 * count(*) AS n_records,
  count(*) AS n_ok,
  CAST(sum(length(req)) AS BIGINT) AS req_bytes,
  bit_xor(CAST(concat('0x', substr(md5(ext), 1, 15)) AS BIGINT)) AS text_checksum,
  bit_xor(CAST(concat('0x', substr(md5(req), 1, 15)) AS BIGINT)) AS req_checksum
FROM e GROUP BY source ORDER BY source NULLS FIRST""")),

    // ---- X92: warc.gz members + charset-aware decode (round 16) -------------
    // The REAL Common Crawl arrival shape (VERDICT r15 #1): each WARC
    // record compressed as its OWN gzip member, members concatenated into
    // the shard, and response payloads arriving as BYTES in a
    // declared-or-sniffed encoding. Per doc: a request record + a response
    // record whose payload is the x87 trap page encoded by doc_id%7 —
    // 0: UTF-8 declared in the Content-Type header (quoted param),
    // 1: UTF-16BE behind its BOM (no declaration — BOM sniff),
    // 2: UTF-16LE behind an explicit FF FE BOM,
    // 3: UTF-8 declared only by the page's own <meta charset> (prescan),
    // 4: windows-1252 bytes MISLABELLED iso-8859-1 (the WHATWG label
    //    remap arm — curly quotes/em-dash/€/0x81 in 0x80–0x9F),
    // 5: shift_jis by header, 6: iso-8859-2 via its `latin2` alias
    //    (see PipelineShared.warcGzShard for the full arm contract).
    // warc_gz_record → warc_gz_extract → decode_charset must reproduce the
    // page STRING exactly (ok pins full-page identity), and the decoded
    // output then feeds the x87 html_text lane, whose line checksums the
    // oracle computes from raw columns without gzip, WARC, charsets, or
    // HTML. 100 TB shape: pure per-row scan, zero joins; the gzip round
    // trip is the dominant (and inherent) CPU cost.
    GQuery("x92_warc_gz_charset",
      (s, d) => {
        val docs = spread(t(s, d, "documents"))
          .filter(col("text").isNotNull && length(col("text")) > 0 &&
            col("lang").isNotNull && col("source").isNotNull)
        // arm/ctype/shard: single-sourced with s72 (PipelineShared)
        val rows = docs.select(col("doc_id"), col("source"), col("text"),
            col("lang"), warcPageUri.as("uri"), warcGzArm.as("arm"),
            warcGzCtype.as("ctype"),
            warc_gz_extract(warcGzShard).as("recs"))
          .withColumn("req", element_at(col("recs"), 1))
          .withColumn("resp", element_at(col("recs"), 2))
          .withColumn("page",
            decode_charset(col("resp.payload"), col("ctype")))
          .withColumn("ext", html_text(col("page")))
          .withColumn("ok",
            (size(col("recs")) === 2 &&
              col("req.wtype") === "request" &&
              col("resp.wtype") === "response" &&
              col("req.uri") === col("uri") &&
              col("resp.uri") === col("uri") &&
              col("page") === warcGzPage &&
              element_at(split(col("ext"), "\n"), 4) === col("text"))
              .cast("int"))
        rows.groupBy(col("source")).agg(
            count(lit(1)).as("n_docs"),
            sum(col("ok")).cast("long").as("n_ok"),
            sum((col("arm") === 0).cast("int")).cast("long").as("n_hdr"),
            sum((col("arm") === 1 || col("arm") === 2).cast("int"))
              .cast("long").as("n_bom"),
            sum((col("arm") === 3).cast("int")).cast("long").as("n_meta"),
            sum((col("arm") >= 4).cast("int")).cast("long").as("n_legacy"),
            expr("bit_xor(CAST(conv(substr(md5(ext), 1, 15), 16, 10) AS BIGINT))")
              .as("text_checksum"))
          .orderBy(col("source"))
      },
      Some(s"""WITH d AS (SELECT doc_id, source, text FROM documents
  WHERE text IS NOT NULL AND length(text) > 0
    AND lang IS NOT NULL AND source IS NOT NULL),
e AS (SELECT doc_id, source, text, $htmlExpectedDuck AS ext FROM d)
SELECT source, count(*) AS n_docs, count(*) AS n_ok,
  CAST(sum((doc_id % 7 = 0)::INT) AS BIGINT) AS n_hdr,
  CAST(sum((doc_id % 7 IN (1, 2))::INT) AS BIGINT) AS n_bom,
  CAST(sum((doc_id % 7 = 3)::INT) AS BIGINT) AS n_meta,
  CAST(sum((doc_id % 7 >= 4)::INT) AS BIGINT) AS n_legacy,
  bit_xor(CAST(concat('0x', substr(md5(ext), 1, 15)) AS BIGINT)) AS text_checksum
FROM e GROUP BY source ORDER BY source NULLS FIRST"""))
  )
}
