package graft

import org.apache.spark.sql.functions._

/** Round-12 curation-engineering operators: the LSH recall audit's
  * accounting identities, contrastive-pair determinism, entropy-gate
  * analytic ground truths, and the streaming blocklist twin's equivalence
  * to its batch query. */
class CurationSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("x73 audit: class accounting is consistent and hits/misses carry j >= 0.5") {
    val a = q("x73_lsh_recall_audit").cache()
    try {
      val rows = a.collect()
      assert(rows.nonEmpty, "audit must see at least one pair at sf0.001")
      val nTrue = rows.head.getAs[Long]("n_true")
      val nCand = rows.head.getAs[Long]("n_cand")
      val hits = rows.count(_.getAs[String]("cls") == "hit")
      val misses = rows.count(_.getAs[String]("cls") == "miss")
      val extras = rows.count(_.getAs[String]("cls") == "extra")
      assert(hits + misses === nTrue, "n_true must equal hit+miss rows")
      assert(hits + extras === nCand, "n_cand must equal hit+extra rows")
      // every TRUE pair carries its exact jaccard; extras carry none
      // (they were never verified — that is the point of the class)
      assert(rows.filter(r => r.getAs[String]("cls") != "extra")
        .forall(_.getAs[Double]("j") >= 0.5))
      assert(rows.filter(_.getAs[String]("cls") == "extra")
        .forall(_.isNullAt(a.columns.indexOf("j"))))
      // recall/precision on the row match the counted classes
      val recall = rows.head.getAs[Double]("recall")
      assert(math.abs(recall - hits.toDouble / (hits + misses)) < 1e-6)
    } finally a.unpersist()
  }

  test("x74 mining: negatives come from the 16-doc pool, deterministically") {
    val m1 = q("x74_contrastive_pairs").collect()
    val m2 = q("x74_contrastive_pairs").collect()
    assert(m1.toSeq === m2.toSeq, "mining must be a pure function of the corpus")
    assert(m1.nonEmpty)
    val pool = m1.map(_.getAs[Long]("negative")).toSet
    assert(pool.size <= 16, "negatives must draw from the bounded pool")
    // valid flag is exactly the no-collision predicate
    m1.foreach { r =>
      val ok = r.getAs[Long]("negative") != r.getAs[Long]("anchor") &&
        r.getAs[Long]("negative") != r.getAs[Long]("positive")
      assert(r.getAs[Boolean]("valid") === ok)
    }
  }

  test("x76 entropy: analytic ground truths and order invariance") {
    import spark.implicits._
    // single repeated char -> 0 bits; 4 equiprobable chars -> exactly 2 bits
    Seq((1L, "aaaaaaaa"), (2L, "abcdabcdabcdabcd"))
      .toDF("doc_id", "text").createOrReplaceTempView("docs_ent")
    val cnt = spark.table("docs_ent")
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, length(text)), i -> substring(text, i, 1))"))
        .as("ch"))
      .groupBy(col("doc_id"), col("ch")).agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy(col("doc_id")).agg(sum(col("c")).as("n"))
    val ent = cnt.join(tot, Seq("doc_id"))
      .withColumn("term",
        ((col("c").cast("double") / col("n").cast("double"))
          * log(col("n").cast("double") / col("c").cast("double")))
          .cast("decimal(18,9)"))
      .groupBy(col("doc_id"))
      .agg((sum(col("term")).cast("double") / log(lit(2.0)))
        .cast("decimal(18,6)").cast("double").as("h"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ent(1L) === 0.0)
    assert(ent(2L) === 2.0)
    // the registry query itself: entropy is a bag statistic — reversing
    // every document's text must not move a single bit
    val base = q("x76_char_entropy_gate").select("doc_id", "entropy_bits")
    val docs = Tables.table(spark, sf, "documents")
      .select(col("doc_id"), reverse(col("text")).as("text"))
    docs.createOrReplaceTempView("docs_rev")
    val cnt2 = spark.table("docs_rev")
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, length(text)), i -> substring(text, i, 1))"))
        .as("ch"))
      .groupBy(col("doc_id"), col("ch")).agg(count(lit(1)).as("c"))
    val tot2 = cnt2.groupBy(col("doc_id")).agg(sum(col("c")).as("n"))
    val rev = cnt2.join(tot2, Seq("doc_id"))
      .withColumn("term",
        ((col("c").cast("double") / col("n").cast("double"))
          * log(col("n").cast("double") / col("c").cast("double")))
          .cast("decimal(18,9)"))
      .groupBy(col("doc_id"))
      .agg((sum(col("term")).cast("double") / log(lit(2.0)))
        .cast("decimal(18,6)").cast("double").as("entropy_bits"))
    assert(base.exceptAll(rev).count() === 0 && rev.exceptAll(base).count() === 0)
  }

  test("x78 confusion audit: cells sum to the label totals and accuracy is the trace") {
    val rows = q("x78_langid_confusion").collect()
    assert(rows.nonEmpty)
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    byLang.foreach { case (_, cells) =>
      assert(cells.map(_.getAs[Long]("n")).sum === cells.head.getAs[Long]("n_lang"))
    }
    val total = byLang.values.map(_.head.getAs[Long]("n_lang")).sum
    val diag = rows.filter(r => r.getAs[String]("lang") == r.getAs[String]("guess"))
      .map(_.getAs[Long]("n")).sum
    val acc = rows.head.getAs[Double]("accuracy")
    assert(math.abs(acc - diag.toDouble / total) < 1e-6,
      s"accuracy $acc != trace $diag / total $total")
  }

  test("s62 streaming gate emits exactly x77's non-keep rows") {
    val batch = q("x77_blocklist_filter")
      .filter(col("action") =!= "keep")
      .select("doc_id", "speed_hits", "infra_hits", "action")
    val live = q("s62_stream_blocklist_gate")
      .select("doc_id", "speed_hits", "infra_hits", "action")
    assert(batch.exceptAll(live).count() === 0 && live.exceptAll(batch).count() === 0)
    assert(live.count() > 0, "gate must quarantine something at sf0.001")
  }
}
