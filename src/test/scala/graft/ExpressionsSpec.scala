package graft

import graft.functions.GraftFunctions._
import org.apache.spark.sql.functions._

/** Custom Catalyst expressions: codegen/interpreted agreement, partition
  * invariance, and basic semantics. */
class ExpressionsSpec extends SparkSpec {

  test("cosine_sim: codegen equals known values and is symmetric") {
    import spark.implicits._
    val df = Seq(
      (Array(1f, 0f, 0f), Array(0f, 1f, 0f), 0.0),
      (Array(1f, 2f, 3f), Array(1f, 2f, 3f), 1.0),
      (Array(1f, 0f), Array(1f, 1f), 1.0 / math.sqrt(2))).toDF("a", "b", "want")
    val got = df.select(cosine_sim(col("a"), col("b")).as("g"),
      cosine_sim(col("b"), col("a")).as("h"), col("want")).collect()
    got.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(2)) < 1e-12)
      assert(r.getDouble(0) === r.getDouble(1))
    }
  }

  test("minhash signatures are deterministic across repartitioning") {
    val docs = Tables.table(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
    val a = docs.select(col("doc_id"), minhash_sig(col("w"), 32, 7L).as("sig"))
    val b = docs.repartition(7).select(col("doc_id"), minhash_sig(col("w"), 32, 7L).as("sig"))
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  test("minhash similarity estimates track true jaccard") {
    import spark.implicits._
    // two token sets with jaccard 0.5 (overlap 2 of 4 distinct)
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    val sigs = df.select(minhash_sig(col("x"), 256, 1L).as("sx"),
      minhash_sig(col("y"), 256, 1L).as("sy"))
      .select(size(filter(zip_with(col("sx"), col("sy"), (a, b) => a === b),
        m => m)).as("matches")).collect()
    val est = sigs(0).getInt(0) / 256.0
    assert(math.abs(est - 0.5) < 0.15, s"estimate $est far from 0.5")
  }

  test("simhash of identical sets is identical; near sets are close") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"tok$i")
    val near = base.drop(2) ++ Seq("x1", "x2")
    val far = (100 to 140).map(i => s"tok$i")
    val df = Seq((base, base, near, far)).toDF("a", "b", "n", "f")
    val r = df.select(
      bit_count(simhash64(col("a")).bitwiseXOR(simhash64(col("b")))).as("d_same"),
      bit_count(simhash64(col("a")).bitwiseXOR(simhash64(col("n")))).as("d_near"),
      bit_count(simhash64(col("a")).bitwiseXOR(simhash64(col("f")))).as("d_far")).collect()(0)
    assert(r.getInt(0) === 0)
    assert(r.getInt(1) < r.getInt(2), "near docs must be closer than far docs")
  }

  test("winnow fingerprint: stable, and differs for different texts") {
    import spark.implicits._
    val df = Seq(("hello world of rolling hashes", "a different document"))
      .toDF("t1", "t2")
    val r = df.select(winnow_fp(col("t1")).as("f1"), winnow_fp(col("t1")).as("f1b"),
      winnow_fp(col("t2")).as("f2")).collect()(0)
    assert(r.getLong(0) === r.getLong(1))
    assert(r.getLong(0) !== r.getLong(2))
  }

  test("lang_id returns a code for every doc and zh for cjk text") {
    import spark.implicits._
    val zh = Seq("你好世界").toDF("t")
      .select(lang_id(col("t"))).collect()(0).getString(0)
    assert(zh === "zh")
    val n = Tables.table(spark, sf, "documents")
      .select(lang_id(col("text")).as("g"))
      .filter(col("g").isin("en", "es", "de", "fr", "zh", "und")).count()
    assert(n === Tables.table(spark, sf, "documents").count())
  }

  test("rp_bucket is deterministic and within range") {
    val e = Tables.table(spark, sf, "embeddings")
    val a = e.select(col("vec_id"), rp_bucket(col("embedding"), 4, 42L).as("b"))
    val b = e.repartition(5).select(col("vec_id"), rp_bucket(col("embedding"), 4, 42L).as("b"))
    assert(a.exceptAll(b).count() === 0)
    assert(a.filter(col("b") < 0 || col("b") > 15).count() === 0)
  }

  test("word_shingles equals the SQL split/transform/array_distinct chain") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val edge = Seq("", "one", "a b", "a b c d e", "x x x x x x x",
      "a  b", "trail ", " lead") // doubled/leading/trailing spaces
    val docs = (edge ++ (0 until 300).map { _ =>
      val n = rnd.nextInt(60)
      (0 until n).map(_ => s"w${rnd.nextInt(8)}").mkString(" ")
    }).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    for (k <- Seq(1, 3, 5)) {
      val native = docs.select(col("id"), word_shingles(col("text"), k).as("sh"))
      val sql = docs.select(col("id"), split(col("text"), " ").as("w"))
        .select(col("id"),
          array_distinct(when(size(col("w")) >= k,
            transform(sequence(lit(1), size(col("w")) - (k - 1)),
              i => array_join(slice(col("w"), i, lit(k)), " ")))
            .otherwise(array(array_join(col("w"), " ")))).as("sh"))
      assert(native.exceptAll(sql).count() === 0 &&
        sql.exceptAll(native).count() === 0, s"mismatch at k=$k")
    }
    // SQL registration round-trip
    graft.Graft.registerFunctions(spark)
    docs.createOrReplaceTempView("ws_docs")
    val viaSql = spark.sql("SELECT id, word_shingles(text, 3) AS sh FROM ws_docs")
    val direct = docs.select(col("id"), word_shingles(col("text"), 3).as("sh"))
    assert(viaSql.exceptAll(direct).count() === 0)
  }

  test("l2_dist matches the SQL fold and registers on the SQL surface") {
    graft.Graft.registerFunctions(spark)
    val e = Tables.table(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val pairs = e.as("a").join(e.as("b"),
        col("a.vec_id") + 1 === col("b.vec_id"))
      .select(col("a.vec_id").as("id"), col("a.v").as("x"), col("b.v").as("y"))
    pairs.createOrReplaceTempView("l2pairs")
    // kernel == the index-ordered SQL fold, bit-for-bit
    val viaSql = spark.sql(
      """SELECT id, sqrt(aggregate(zip_with(x, y, (a, b) -> (a-b)*(a-b)),
        |  0D, (acc, t) -> acc + t)) AS dist FROM l2pairs""".stripMargin)
    val direct = spark.sql("SELECT id, l2_dist(x, y) AS dist FROM l2pairs")
    assert(viaSql.exceptAll(direct).count() === 0)
    assert(direct.count() > 0)
    // symmetry + identity
    val sym = spark.sql(
      "SELECT count(*) FROM l2pairs WHERE l2_dist(x, y) <> l2_dist(y, x)")
    assert(sym.head.getLong(0) === 0)
    val self = spark.sql("SELECT max(l2_dist(x, x)) FROM l2pairs")
    assert(self.head.getDouble(0) === 0.0)
  }

  test("input-type contracts: implicit casts on the SQL surface") {
    graft.Graft.registerFunctions(spark)
    val e = Tables.table(spark, sf, "embeddings")
    e.createOrReplaceTempView("emb_native")
    // l2_dist on the NATIVE array<float> column: the declared contract makes
    // Catalyst insert an element cast to double, so the answer equals the
    // explicitly-cast form instead of silently reinterpreting float bytes
    val implicitCast = spark.sql(
      "SELECT vec_id, l2_dist(embedding, embedding) AS d FROM emb_native")
    assert(implicitCast.agg(max(col("d"))).head.getDouble(0) === 0.0)
    val cross = spark.sql(
      """SELECT l2_dist(a.embedding, b.embedding) AS d
        |FROM emb_native a JOIN emb_native b ON a.vec_id + 1 = b.vec_id
        |WHERE a.vec_id < 20""".stripMargin)
    val explicit = spark.sql(
      """SELECT l2_dist(CAST(a.embedding AS array<double>),
        |               CAST(b.embedding AS array<double>)) AS d
        |FROM emb_native a JOIN emb_native b ON a.vec_id + 1 = b.vec_id
        |WHERE a.vec_id < 20""".stripMargin)
    assert(cross.exceptAll(explicit).isEmpty && explicit.exceptAll(cross).isEmpty)
    // cms_estimate with an INT item column: widening cast keeps interpreted
    // and codegen paths consistent
    val cms = spark.sql(
      """WITH sk AS (SELECT count_min_sketch(CAST(vec_id AS long), 0.01d, 0.01d, 42)
        |  AS s FROM emb_native)
        |SELECT cms_estimate(s, CAST(7 AS int)) AS est FROM sk""".stripMargin)
    assert(cms.head.getLong(0) >= 1L)
    // bloom_agg spelled with a plain SQL decimal literal for fpp
    val bl = spark.sql(
      """WITH f AS (SELECT bloom_agg(CAST(vec_id AS string), 10000, 0.01) AS b
        |  FROM emb_native)
        |SELECT bloom_might_contain(b, '7') AS hit,
        |       bloom_might_contain(b, 'definitely-not-present-xyz') AS miss
        |FROM f""".stripMargin)
    val r = bl.head
    assert(r.getBoolean(0))
  }

  test("deflate_len is deterministic and discriminates repetition from noise") {
    import spark.implicits._
    val repeated = "the cat sat on the mat " * 40
    val noise = (1 to 200).map(i => ((i * 2654435761L) % 99991).toString).mkString(" ")
    val df = Seq(("rep", repeated), ("noise", noise)).toDF("kind", "t")
      .select(col("kind"),
        graft.functions.GraftFunctions.deflate_len(col("t")).as("z"),
        octet_length(col("t")).cast("long").as("n"))
    val m = df.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val rRatio = m("rep")._1.toDouble / m("rep")._2
    val nRatio = m("noise")._1.toDouble / m("noise")._2
    assert(rRatio < 0.2, s"repeated text should compress hard: $rRatio")
    assert(nRatio > rRatio * 2, s"noise must compress worse than repetition: $nRatio vs $rRatio")
    // partition-count invariance (pure per-row function)
    val base = Tables.table(spark, sf, "documents")
    val a = base.repartition(2)
      .select(col("doc_id"), graft.functions.GraftFunctions.deflate_len(col("text")).as("z"))
    val b = base.repartition(7)
      .select(col("doc_id"), graft.functions.GraftFunctions.deflate_len(col("text")).as("z"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
