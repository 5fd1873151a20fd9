package graft

import java.nio.file.Files
import graft.sources.replay.ReplayLog
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test in the spirit of the reference harness's self-test
  * (/root/reference/tests/utils.rs:226-240): N produced messages round-trip
  * with offsets exactly 0..N per partition — here for generated N and payload
  * shapes, through the real DSv2 batch reader. (Plain ScalaCheck generators
  * with fixed seeds; the scalatest-scalacheck bridge isn't on the offline
  * classpath.) */
class ReplayPropertySpec extends SparkSpec {

  private val params = Gen.Parameters.default

  test("N written envelope records round-trip with offsets exactly 0..N-1") {
    (0 until 8).foreach { trial =>
      val n = Gen.chooseNum(1, 200).pureApply(params, Seed(trial.toLong))
      val tsBase = Gen.chooseNum(0L, 1000000L).pureApply(params, Seed(trial + 100L))
      val dir = Files.createTempDirectory("proplog").toString
      ReplayLog.writePartitionFile(dir, 0, (0 until n).iterator.map(i =>
        Row(s"Key $i".getBytes("UTF-8"), s"Message $i".getBytes("UTF-8"),
          tsBase + i)))
      val df = spark.read.format("graft-replay").option("path", dir).load()
      assert(df.count() === n)
      val offs = df.select("offset").collect().map(_.getLong(0)).sorted
      assert(offs.toSeq === (0L until n.toLong))
      val r = df.filter(col("offset") === (n - 1))
        .selectExpr("cast(value as string)").collect()(0).getString(0)
      assert(r === s"Message ${n - 1}")
    }
  }

  test("arbitrary binary payloads (incl. empty and null) round-trip bytewise") {
    val genPayload: Gen[Array[Byte]] =
      Gen.oneOf(Gen.const(null.asInstanceOf[Array[Byte]]),
        Gen.const(Array.emptyByteArray),
        Gen.containerOf[Array, Byte](Gen.chooseNum(Byte.MinValue, Byte.MaxValue)))
    (0 until 5).foreach { trial =>
      val payloads = Gen.listOfN(20, genPayload).pureApply(params, Seed(trial.toLong))
      val dir = Files.createTempDirectory("proplog2").toString
      ReplayLog.writePartitionFile(dir, 0,
        payloads.iterator.zipWithIndex.map { case (p, i) => Row(p, p, i.toLong) })
      val got = spark.read.format("graft-replay").option("path", dir).load()
        .orderBy("offset").select("value").collect()
        .map(r => Option(r.getAs[Array[Byte]](0)).map(_.toSeq))
      val want = payloads.map(p => Option(p).map(_.toSeq))
      assert(got.toSeq === want)
    }
  }
}
