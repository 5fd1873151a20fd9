package graft

import java.util.concurrent.atomic.{AtomicLong, LongAdder}

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** Quantitative scale pins: measure ACTUAL shuffle-write bytes through a
  * SparkListener and assert the data-movement claims SCALE.md makes — plan
  * shape says an exchange exists, this says how many bytes cross it. The
  * assertions are comparative (designed path ≪ naive path on identical
  * inputs), so they hold at any scale factor and don't encode machine-
  * specific constants. */
class ShuffleVolumeSpec extends SparkSpec {

  private val sf01 = "/root/testdata/sf0.01"

  /** Total shuffle bytes written by all stages triggered by `action`.
    * Listener events are delivered asynchronously; wait for 500 ms of
    * event-bus quiescence (10 s cap) before reading the total. */
  private def shuffleBytes(action: => Unit): Long = {
    val total = new LongAdder
    val lastEvent = new AtomicLong(System.nanoTime())
    val l = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) total.add(m.shuffleWriteMetrics.bytesWritten)
        lastEvent.set(System.nanoTime())
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      action
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (System.nanoTime() - lastEvent.get() < 500L * 1000 * 1000 &&
        System.nanoTime() < deadline) Thread.sleep(50)
    } finally spark.sparkContext.removeSparkListener(l)
    total.sum()
  }

  test("decontamination shuffles per-doc counts, not corpus shingles") {
    val docs = Tables.table(spark, sf01, "documents")
    val eval = docs.filter(col("doc_id") % 20 === 0)
    val corpus = docs.filter(col("doc_id") % 20 =!= 0)
    val textBytes = corpus.agg(sum(length(col("text")))).head.getLong(0)

    // consume the hit counts, not just the group count — a bare .count() on
    // a grouped frame lets Catalyst ELIMINATE the probe join outright (group
    // cardinality doesn't need the hit column), turning both variants into
    // the same join-free plan
    val designed = shuffleBytes {
      GraftOps.decontaminate(corpus, eval, col("doc_id"), col("text"))
        .agg(sum(col("n_hits"))).head()
    }
    // the designed path's only exchange is one row per doc (partial-agg'd
    // counts) — far below the corpus text it would ship if shingles shuffled
    assert(designed < textBytes,
      s"decontaminate shuffled $designed B >= corpus text $textBytes B")

    // counter-factual: force the eval probe through a SHUFFLE (sort-merge)
    // join on the gram — every corpus shingle crosses the wire. (A
    // shuffle_hash hint is ignored here: the build side of a LEFT join can't
    // be the left, and the right fits broadcast; merge forces the exchange.)
    val naive = shuffleBytes {
      val evalGrams = GraftOps.shingles(eval, col("doc_id"), col("text"), 3)
        .select(explode(col("sh")).as("g")).distinct()
        .withColumn("hit", lit(1L))
      GraftOps.shingles(corpus, col("doc_id"), col("text"), 3)
        .select(col("id"), col("nsh"), explode(col("sh")).as("g"))
        .hint("merge")
        .join(evalGrams, Seq("g"), "left")
        .groupBy(col("id"), col("nsh"))
        .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
        .agg(sum(col("n_hits"))).head()
    }
    assert(naive > designed * 3,
      s"naive gram-shuffle join moved $naive B, designed path $designed B — " +
        "expected the broadcast-probe design to shuffle far less")
  }

  test("bucketed fact-fact join moves only aggregate rows over the wire") {
    val base = java.nio.file.Files.createTempDirectory("graft-shufb").toString
    spark.sql("DROP TABLE IF EXISTS sv_li_b")
    spark.sql("DROP TABLE IF EXISTS sv_ord_b")
    Tables.table(spark, sf01, "lineitem")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$base/li").mode("overwrite").saveAsTable("sv_li_b")
    Tables.table(spark, sf01, "orders")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$base/ord").mode("overwrite").saveAsTable("sv_ord_b")

    def agg(li: org.apache.spark.sql.DataFrame, ord: org.apache.spark.sql.DataFrame) =
      li.hint("merge").join(ord.hint("merge"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("q"))

    val bucketed = shuffleBytes {
      agg(spark.table("sv_li_b"), spark.table("sv_ord_b")).count()
    }
    val plain = shuffleBytes {
      agg(Tables.table(spark, sf01, "lineitem"),
        Tables.table(spark, sf01, "orders")).count()
    }
    // the unbucketed SMJ shuffles both fact sides; the bucketed one only
    // exchanges the 3-row aggregate
    assert(bucketed * 10 < plain,
      s"bucketed join shuffled $bucketed B vs plain $plain B — expected >10x less")
    spark.sql("DROP TABLE IF EXISTS sv_li_b")
    spark.sql("DROP TABLE IF EXISTS sv_ord_b")
  }

  test("x85 drift audit shuffles centroid-sized data, never the vectors") {
    // the claim in SCALE.md/SURVEY: the whole audit is a single shuffle of
    // (label, dim) partial sums — the raw embedding bytes (64 doubles per
    // vector) must NOT cross an exchange. Map-side partial aggregation
    // collapses each task's rows to at most |labels|x64 partials before
    // the one hash exchange.
    val vecBytes = Tables.table(spark, sf01, "embeddings")
      .agg(count(lit(1))).head.getLong(0) * 64 * 8
    val moved = shuffleBytes {
      SparkEntry.queries("x85_embedding_drift")(spark, sf01).collect()
    }
    // generous factor: partials + presentation-sort rows are far below
    // even a tenth of the raw vector volume
    assert(moved * 10 < vecBytes,
      s"x85 shuffled $moved B vs raw vectors $vecBytes B — the one-scan " +
        "conditional-sum design must move only centroid partials")
  }
}
