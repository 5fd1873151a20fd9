package graft

import graft.functions.GraftFunctions.{avro_decode, avro_encode}
import org.apache.spark.sql.functions._

/** The avro-core-backed envelope codec (functions/AvroExpressions.scala):
  * round-trip fidelity incl. nulls and binary, schema validation errors,
  * and agreement with a hand-decoded reference record. */
class AvroSpec extends SparkSpec {

  private val schema =
    """{"type":"record","name":"r","fields":[
      {"name":"id","type":"long"},
      {"name":"name","type":["null","string"],"default":null},
      {"name":"score","type":"double"},
      {"name":"blob","type":["null","bytes"],"default":null},
      {"name":"ok","type":"boolean"}]}"""

  test("encode/decode round-trips longs, nullable strings, doubles, bytes, booleans") {
    import spark.implicits._
    val rows = Seq(
      (1L, Some("alice"), 3.5, Some(Array[Byte](1, 2, 3)), true),
      (2L, None, -0.25, None, false),
      (3L, Some(""), Double.MaxValue, Some(Array.emptyByteArray), true))
    val df = rows.toDF("id", "name", "score", "blob", "ok")
    val rt = df
      .select(avro_encode(struct(col("id"), col("name"), col("score"),
        col("blob"), col("ok")), schema).as("payload"))
      .select(avro_decode(col("payload"), schema).as("r"))
      .select("r.id", "r.name", "r.score", "r.blob", "r.ok")
      .collect().sortBy(_.getLong(0))
    assert(rt.length === 3)
    assert(rt(0).getLong(0) === 1L && rt(0).getString(1) === "alice"
      && rt(0).getDouble(2) === 3.5
      && rt(0).getAs[Array[Byte]](3).toSeq === Seq[Byte](1, 2, 3)
      && rt(0).getBoolean(4))
    assert(rt(1).isNullAt(1) && rt(1).isNullAt(3) && !rt(1).getBoolean(4))
    assert(rt(2).getString(1) === "" && rt(2).getDouble(2) === Double.MaxValue
      && rt(2).getAs[Array[Byte]](3).length === 0)
  }

  test("decoded bytes agree with a directly-built avro record") {
    import spark.implicits._
    // hand-build the payload with the avro library, decode with the expression
    val s = new org.apache.avro.Schema.Parser().parse(schema)
    val rec = new org.apache.avro.generic.GenericData.Record(s)
    rec.put("id", 42L); rec.put("name", "zed"); rec.put("score", 1.5)
    rec.put("blob", java.nio.ByteBuffer.wrap(Array[Byte](9))); rec.put("ok", true)
    val bos = new java.io.ByteArrayOutputStream()
    val enc = org.apache.avro.io.EncoderFactory.get().binaryEncoder(bos, null)
    new org.apache.avro.generic.GenericDatumWriter[
      org.apache.avro.generic.GenericRecord](s).write(rec, enc)
    enc.flush()
    val got = Seq(Tuple1(bos.toByteArray)).toDF("payload")
      .select(avro_decode(col("payload"), schema).as("r"))
      .select("r.id", "r.name", "r.score").head
    assert(got.getLong(0) === 42L && got.getString(1) === "zed"
      && got.getDouble(2) === 1.5)
  }

  test("unsupported schemas are rejected with a clear error") {
    import spark.implicits._
    val nested = """{"type":"record","name":"n","fields":[
      {"name":"xs","type":{"type":"array","items":"long"}}]}"""
    val e = intercept[Exception] {
      Seq(Tuple1(Array[Byte](0))).toDF("payload")
        .select(avro_decode(col("payload"), nested)).collect()
    }
    assert(e.getMessage.contains("unsupported avro type")
      || Option(e.getCause).exists(_.getMessage.contains("unsupported avro type")))
  }
}
