package graft

import graft.functions.GraftFunctions._
import org.apache.spark.sql.functions._

/** UDAF (Aggregator), UDTF (Generator), IVF ANN, approximate aggregates. */
class ExtensionPointsSpec extends SparkSpec {

  test("CentroidAgg computes element-wise means with map-side partials") {
    import spark.implicits._
    val df = Seq((0, Array(1f, 3f)), (0, Array(3f, 5f)), (1, Array(10f, 10f)))
      .toDF("cl", "v").repartition(3)
    val centroid = udaf(new graft.functions.CentroidAgg(2),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]())
    val got = df.groupBy("cl").agg(centroid(col("v")).as("c"))
      .orderBy("cl").collect()
    assert(got(0).getSeq[Float](1) === Seq(2f, 4f))
    assert(got(1).getSeq[Float](1) === Seq(10f, 10f))
  }

  test("ShingleGenerator explodes (pos, shingle) rows like a Generator") {
    import spark.implicits._
    val df = Seq("a b c d e f").toDF("t")
    val rows = df.select(pos_shingles(col("t"), 5)).collect()
    assert(rows.length === 2)
    assert(rows(0).getInt(0) === 0 && rows(0).getString(1) === "a b c d e")
    assert(rows(1).getInt(0) === 1 && rows(1).getString(1) === "b c d e f")
    // short text degenerates to a single whole-text shingle
    val short = Seq("a b").toDF("t").select(pos_shingles(col("t"), 5)).collect()
    assert(short.length === 1 && short(0).getString(1) === "a b")
  }

  test("IVF ANN returns correct within-cluster neighbors") {
    // the UDAF-centroid IVF lane, exercised directly (its registry row was
    // superseded in round 13 by the exact-oracle x03b_ann_ivf_exact twin)
    val e = Tables.table(spark, sf, "embeddings")
    val res = graft.GraftOps.annTopKIvf(e, col("vec_id"), col("embedding"),
      col("label"), e.filter(col("vec_id") < 20), col("vec_id"),
      col("embedding"), k = 3, dim = 64)
    assert(res.count() > 0)
    // every query produces at most k=3 ranked neighbors, ranks contiguous
    val bad = res.groupBy("q_id").agg(count(lit(1)).as("n"), max("rank").as("mr"))
      .filter(col("n") > 3 || col("mr") > 3).count()
    assert(bad === 0)
  }

  test("TopKAgg: binary-state partial merge equals a global sort, any partitioning") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val vals = (1 to 997).map(i => ((i * 7919) % 1000).toDouble)
    val expected = vals.sorted.reverse.take(7)
    Seq(1, 3, 32).foreach { parts =>
      val got = vals.toDF("v").repartition(parts)
        .agg(graft.functions.GraftFunctions.topk_vals(col("v"), 7).as("tk"))
        .collect()(0).getSeq[Double](0)
      assert(got == expected, s"parts=$parts")
    }
    // SQL registration path too
    Graft.registerFunctions(spark)
    vals.toDF("v").createOrReplaceTempView("topk_in")
    val viaSql = spark.sql("SELECT topk_vals(v, 7) AS tk FROM topk_in")
      .collect()(0).getSeq[Double](0)
    assert(viaSql == expected)
  }

  test("approximate aggregates are within tolerance of exact counts") {
    val r = SparkEntry.queries("q35_approx_agg")(spark, sf).collect()(0)
    val exact = Tables.table(spark, sf, "lineitem")
      .agg(countDistinct(col("l_partkey")), countDistinct(col("l_orderkey")))
      .collect()(0)
    assert(math.abs(r.getLong(0) - exact.getLong(0)).toDouble / exact.getLong(0) < 0.1)
    assert(math.abs(r.getLong(1) - exact.getLong(1)).toDouble / exact.getLong(1) < 0.05)
  }

  test("unicode normalization: NFC unifies byte-variant twins; SQL surface works") {
    import spark.implicits._
    graft.Graft.registerFunctions(spark)
    // decomposed (e + U+0301) and precomposed é are DIFFERENT byte strings
    // that md5 would fingerprint apart; NFC must unify them exactly
    Seq(("café", "café")).toDF("a", "b")
      .createOrReplaceTempView("uni_in")
    val r = spark.sql(
      """SELECT a = b AS raw_eq,
        |  nfc_normalize(a) = nfc_normalize(b) AS nfc_eq,
        |  md5(a) = md5(b) AS md5_raw_eq,
        |  md5(nfc_normalize(a)) = md5(nfc_normalize(b)) AS md5_nfc_eq,
        |  strip_accents(a) AS sa,
        |  strip_accents(strip_accents(a)) AS saa FROM uni_in""".stripMargin).head
    assert(!r.getBoolean(0) && !r.getBoolean(2),
      "fixture must be a genuine byte-variant pair")
    assert(r.getBoolean(1) && r.getBoolean(3),
      "NFC must unify the twins (and their fingerprints)")
    assert(r.getString(4) == "cafe")
    assert(r.getString(5) == r.getString(4), "strip_accents must be idempotent")
  }

  test("q113b approx profile: every per-column estimate within 5% of q113 exact") {
    // the q35/X11 idiom: the G-class sketch lane is bounded against its
    // exact O-class twin — same report shape, rel-error <= 5% per column
    val exact = SparkEntry.queries("q113_column_profile")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val apx = SparkEntry.queries("q113b_column_profile_approx")(spark, sf)
      .collect()
    assert(apx.length == 4)
    apx.foreach { r =>
      val name = r.getString(0); val est = r.getLong(3); val ex = exact(name)
      assert(math.abs(est - ex).toDouble / ex <= 0.05,
        s"$name: approx=$est exact=$ex")
      // the non-sketch columns must agree exactly
      assert(r.getLong(2) == 0L, s"$name null count")
    }
  }
}
