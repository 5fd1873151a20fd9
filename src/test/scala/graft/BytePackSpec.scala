package graft

import graft.functions.GraftFunctions._
import org.apache.spark.sql.functions._

/** pack_bytes (round-17 optimization primitive): byte-identity to the
  * hex-string construction it replaced in the x80/s63 frame generators,
  * interpreted/codegen agreement, and the null-element contract. */
class BytePackSpec extends SparkSpec {

  test("pack_bytes equals the unhex(lpad(hex)) construction it replaced") {
    import spark.implicits._
    // covers 0, 255, mid values, and the exact x80/s63 byte formula
    val df = (0L until 500L).toDF("event_id")
    val oldForm = expr(
      "transform(sequence(0, 7 + CAST(event_id % 9 AS INT)), f -> " +
        "unhex(array_join(transform(sequence(0, 15), p -> " +
        "lpad(hex((event_id * 31 + f * 17 + p * 7) % 256), 2, '0')), " +
        "'')))")
    val newForm = transform(
      sequence(lit(0), lit(7) + (col("event_id") % 9).cast("int")),
      f => pack_bytes(transform(sequence(lit(0), lit(15)),
        p => ((col("event_id") * 31 + f * 17 + p * 7) % 256).cast("int"))))
    val bad = df.select(col("event_id"))
      .where(not(oldForm === newForm) || oldForm.isNull || newForm.isNull)
    assert(bad.count() === 0)
  }

  test("pack_bytes: full byte range, empty array, and truncation to low 8 bits") {
    import spark.implicits._
    val df = Seq(
      (1, (0 until 256).toArray),      // every byte value
      (2, Array.empty[Int]),           // empty → empty binary
      (3, Array(256, 257, -1, 511))    // low-8-bit truncation
    ).toDF("id", "a")
    val got = df.select(col("id"), pack_bytes(col("a")).as("b"))
      .orderBy(col("id")).collect()
    assert(got(0).getAs[Array[Byte]]("b").toSeq ===
      (0 until 256).map(_.toByte).toSeq)
    assert(got(1).getAs[Array[Byte]]("b").length === 0)
    assert(got(2).getAs[Array[Byte]]("b").toSeq ===
      Seq(0.toByte, 1.toByte, -1.toByte, -1.toByte))
  }

  test("pack_bytes: null element poisons the row; null array is null") {
    import spark.implicits._
    val df = Seq(
      (1, Some(Seq(Some(1), None, Some(3)))),
      (2, None: Option[Seq[Option[Int]]])
    ).toDF("id", "a")
    val got = df.select(col("id"),
      pack_bytes(col("a").cast("array<int>")).as("b")).orderBy(col("id"))
      .collect()
    assert(got(0).isNullAt(1) && got(1).isNullAt(1))
  }

  test("pack_bytes: interpreted and codegen paths agree") {
    import spark.implicits._
    val df = (0 until 64).map(i => (i, Array(i, i * 7 % 256, 255 - i)))
      .toDF("id", "a")
    val expect = df.select(col("id"), pack_bytes(col("a")).as("b")).collect()
      .map(r => r.getInt(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    val conf = spark.conf
    val prevWS = conf.get("spark.sql.codegen.wholeStage", "true")
    val prevFM = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    conf.set("spark.sql.codegen.wholeStage", "false")
    conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val got = df.select(col("id"), pack_bytes(col("a")).as("b")).collect()
        .map(r => r.getInt(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
      assert(got === expect)
    } finally {
      conf.set("spark.sql.codegen.wholeStage", prevWS)
      conf.set("spark.sql.codegen.factoryMode", prevFM)
    }
  }
}
