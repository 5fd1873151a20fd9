package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.graft.shims
import graft.functions._

/** SQL-surface registration of the graft native expressions, so
  * `spark.sql("SELECT cosine_sim(a, b) ...")` works alongside the Column API
  * (GraftFunctions). Two paths:
  *
  *   - `Graft.registerFunctions(spark)` — runtime registration on an existing
  *     session (what the test/verify harnesses use);
  *   - `spark.sql.extensions=graft.GraftExtensions` — config-time injection
  *     for a cluster deployment.
  */
object Graft {
  // SQL fractional literals parse as DecimalType (whose value is Spark's
  // Decimal, not a java.lang.Number) — normalize before extracting, so
  // `bloom_agg(x, 10000, 0.01)` works as naturally spelled
  private def litNum(e: Expression): Number =
    e.asInstanceOf[Literal].value match {
      case d: org.apache.spark.sql.types.Decimal => d.toBigDecimal.bigDecimal
      case n: Number => n
      case other => throw new IllegalArgumentException(
        s"expected a numeric literal, got: $other")
    }
  private def lit2Int(e: Expression): Int = litNum(e).intValue()
  private def lit2Long(e: Expression): Long = litNum(e).longValue()
  private def lit2Double(e: Expression): Double = litNum(e).doubleValue()
  private def lit2Str(e: Expression): String =
    e.asInstanceOf[Literal].value.toString

  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> (es => CosineSimilarity(es(0), es(1))),
    "l2_dist" -> (es => L2Distance(es(0), es(1))),
    "deflate_len" -> (es => DeflateLength(es(0))),
    "minhash_sig" -> (es => MinHashSignature(es(0),
      if (es.length > 1) lit2Int(es(1)) else 64,
      if (es.length > 2) lit2Long(es(2)) else 42L)),
    "simhash64" -> (es => SimHash64(es(0))),
    "winnow_fp" -> (es => WinnowFingerprint(es(0),
      if (es.length > 1) lit2Int(es(1)) else 8,
      if (es.length > 2) lit2Int(es(2)) else 4)),
    "lang_id" -> (es => LanguageId(es(0))),
    "rp_bucket" -> (es => RandomProjectionBucket(es(0),
      if (es.length > 1) lit2Int(es(1)) else 16,
      if (es.length > 2) lit2Long(es(2)) else 42L)),
    "topk_vals" -> (es => TopKAgg(es(0),
      if (es.length > 1) lit2Int(es(1)) else 10)),
    "avro_decode" -> (es => AvroDecode(es(0), lit2Str(es(1)))),
    "avro_encode" -> (es => AvroEncode(es(0), lit2Str(es(1)))),
    "pos_shingles" -> (es => ShingleGenerator(es(0),
      if (es.length > 1) lit2Int(es(1)) else 5)),
    "word_shingles" -> (es => WordShingles(es(0),
      if (es.length > 1) lit2Int(es(1)) else 5)),
    "avg_hash64" -> (es => AvgHash64(es(0))),
    "pack_bytes" -> (es => PackBytes(es(0))),
    "wav_pcm16" -> (es => WavEncodePcm16(es(0), es(1))),
    "wav_stats" -> (es => WavStats(es(0))),
    "nfc_normalize" -> (es => NfcNormalize(es(0))),
    "strip_accents" -> (es => StripAccents(es(0))),
    "cms_estimate" -> (es => CmsEstimate(es(0), es(1))),
    "bloom_agg" -> (es => BloomAgg(es(0),
      if (es.length > 1) lit2Long(es(1)) else 10000L,
      if (es.length > 2) lit2Double(es(2)) else 0.01)),
    "bloom_might_contain" -> (es => BloomMightContain(es(0), es(1))))

  def registerFunctions(spark: SparkSession): Unit =
    builders.foreach { case (name, b) => shims.registerFunction(spark, name, b) }
}

/** `spark.sql.extensions` entry point: native functions + the as-of-join
  * planner strategy. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    Graft.builders.foreach { case (name, b) =>
      e.injectFunction((new org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft.functions", name),
        b))
    }
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    e.injectOptimizerRule(_ => graft.plans.PushFilterThroughAsOfJoin)
  }
}
