package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.{bloom_agg, bloom_might_contain}

/** G-class evidence for x29: the Bloom decontamination gate must flag a
  * SUPERSET of the exact gate's flags (no false negatives — a contaminated
  * doc never escapes) with a false-positive tax bounded by the build fpp,
  * and the built filter must not depend on partitioning. */
class BloomSpec extends SparkSpec {

  private def flags(name: String): Map[Long, Boolean] =
    SparkEntry.queries(name)(spark, sf)
      .select(col("doc_id"), col("flagged")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap

  test("x29 bloom flags are a superset of x13's exact flags, FP-bounded") {
    val exact = flags("x13_decontaminate")
    val bloom = flags("x29_bloom_decontaminate")
    assert(exact.keySet === bloom.keySet)
    // no false negatives: every exactly-contaminated doc is bloom-flagged
    val escaped = exact.filter { case (id, f) => f && !bloom(id) }
    assert(escaped.isEmpty, s"contaminated docs escaped the bloom gate: $escaped")
    // false positives: docs flagged only by the bloom, bounded well above
    // the per-shingle fpp=1% (a doc flips only if enough shingles FP to
    // cross the 0.2 fraction — far rarer than a single FP)
    val clean = exact.count(!_._2)
    val fp = bloom.count { case (id, f) => f && !exact(id) }
    assert(clean > 0)
    assert(fp.toDouble / clean <= 0.05,
      s"bloom gate false-positive rate too high: $fp of $clean clean docs")
  }

  test("the built bloom binary is partition-invariant (bit-OR merge)") {
    val sh = Tables.table(spark, sf, "documents")
      .select(col("doc_id"),
        explode(graft.functions.GraftFunctions.word_shingles(col("text"), 3)).as("g"))
      .filter(col("doc_id") % 20 === 0)
    def build(parts: Int): Array[Byte] = sh.repartition(parts)
      .agg(bloom_agg(col("g"), 20000L, 0.01).as("bf"))
      .collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(build(2), build(13)),
      "bloom build depends on partitioning — merge is not a pure bit-OR")
  }

  test("probe agrees with a direct filter membership check") {
    import spark.implicits._
    val sh = Seq("alpha beta", "gamma delta").toDF("t")
      .select(explode(graft.functions.GraftFunctions.word_shingles(col("t"), 1)).as("g"))
    val bloom = sh.agg(bloom_agg(col("g"), 100L, 0.01).as("bf"))
    val hits = Seq("alpha", "beta", "zeta").toDF("probe")
      .join(broadcast(bloom))
      .select(col("probe"), bloom_might_contain(col("bf"), col("probe")).as("hit"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(hits("alpha") && hits("beta"), "present items must always hit")
  }

  test("s43's streamed bloom binary equals the batch build exactly") {
    val streamed = SparkEntry.queries("s43_stream_bloom")(spark, sf)
      .collect()(0).getString(0)
    val batch = Tables.table(spark, sf, "documents")
      .filter(col("doc_id") % 20 === 0)
      .select(explode(graft.functions.GraftFunctions
        .word_shingles(col("text"), 3)).as("g"))
      .agg(bloom_agg(col("g"), 20000L, 0.01).as("bf"))
      .select(md5(col("bf"))).collect()(0).getString(0)
    assert(streamed === batch,
      "streaming bloom diverged from the batch build — merge is not pure bit-OR")
  }

  test("bloom functions are SQL-registered") {
    Graft.registerFunctions(spark)
    Tables.registerViews(spark, sf, Seq("documents"))
    val row = spark.sql(
      """WITH sh AS (SELECT doc_id, explode(word_shingles(text, 3)) AS g
           FROM documents),
         bf AS (SELECT bloom_agg(g, 20000L, 0.01d) AS b
           FROM sh WHERE doc_id % 20 = 0)
         SELECT count(*) AS n,
           sum(CASE WHEN bloom_might_contain(b, g) THEN 1 ELSE 0 END) AS hits
         FROM sh, bf WHERE doc_id % 20 <> 0""").collect()(0)
    assert(row.getLong(0) > 0 && row.getLong(1) >= 0)
  }
}
