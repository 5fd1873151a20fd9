package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

/** The tar lane (x82): tar_pack must emit archives an INDEPENDENT decoder
  * (the system tar(1)) lists and extracts bit-for-bit, and tar_index must
  * be a real ustar header walk — checksum re-verification, octal parsing,
  * block skipping, poisoned-payload rejection — not a fixed-offset peek. */
class TarSpec extends SparkSpec {

  private def packDf(entries: Seq[(String, Array[Byte])]) = {
    val df = spark.createDataFrame(Seq(Tuple1(entries)))
      .toDF("raw")
      .select(expr(
        "transform(raw, e -> struct(e._1 AS name, e._2 AS data))")
        .as("entries"))
    df.select(GraftFunctions.tar_pack(col("entries")).as("tar"))
  }

  private def packBytes(entries: Seq[(String, Array[Byte])]): Array[Byte] =
    packDf(entries).collect()(0).getAs[Array[Byte]](0)

  private def indexOf(tar: Array[Byte]) = {
    val rows = spark.createDataFrame(Seq(Tuple1(tar))).toDF("tar")
      .select(GraftFunctions.tar_index(col("tar")).as("idx"))
      .collect()(0)
    if (rows.isNullAt(0)) None
    else Some(rows.getSeq[org.apache.spark.sql.Row](0).map(r =>
      (r.getString(0), r.getLong(1), r.getBoolean(2), r.getLong(3),
        r.getInt(4))))
  }

  private val sample = Seq(
    "a.txt" -> "hello tar world".getBytes("UTF-8"),
    "b.meta" -> Array.tabulate(600)(i => (i % 251).toByte), // >1 block
    "c.bin" -> Array[Byte]())                               // empty file

  test("system tar(1) lists and extracts the archive bit-for-bit") {
    val tarBin = new java.io.File("/usr/bin/tar")
    assume(tarBin.exists(), "system tar not present")
    val tmp = java.io.File.createTempFile("graft", ".tar")
    try {
      java.nio.file.Files.write(tmp.toPath, packBytes(sample))
      val list = new String(new ProcessBuilder("tar", "-tf", tmp.getPath)
        .start().getInputStream.readAllBytes(), "UTF-8").trim
        .split("\n").toSeq
      assert(list === sample.map(_._1),
        "an independent decoder must list the exact entry names in order")
      sample.foreach { case (name, data) =>
        val p = new ProcessBuilder("tar", "-xOf", tmp.getPath, name).start()
        val got = p.getInputStream.readAllBytes()
        assert(p.waitFor() === 0 && java.util.Arrays.equals(got, data),
          s"tar -xO must recover $name bit-for-bit")
      }
    } finally tmp.delete()
  }

  test("tar_index walks headers back out with verified checksums") {
    val Some(idx) = indexOf(packBytes(sample))
    assert(idx.map(e => (e._1, e._2)) ===
      Seq(("a.txt", 15L), ("b.meta", 600L), ("c.bin", 0L)))
    assert(idx.forall(_._3), "every re-computed checksum must match")
    assert(idx(0)._4 === "hello tar world".getBytes("UTF-8")
      .map(_ & 0xFF).sum.toLong)
    assert(idx(1)._4 === (0 until 600).map(_ % 251).sum.toLong)
    assert(idx(1)._5 === 250 && idx(2)._4 === 0L)
  }

  test("a flipped header byte flips chksum_ok; poisoned archives are NULL") {
    val tar = packBytes(sample)
    val flipped = tar.clone(); flipped(0) = 'z'.toByte // a.txt -> z.txt
    val Some(idx) = indexOf(flipped)
    assert(!idx(0)._3 && idx(1)._3,
      "only the tampered entry's checksum must fail")
    assert(indexOf(tar.take(1024)) === None, "chain without EOF blocks")
    val badMagic = tar.clone(); badMagic(257) = 'X'.toByte
    assert(indexOf(badMagic) === None, "bad ustar magic")
    val badSize = tar.clone(); badSize(124) = 'q'.toByte
    assert(indexOf(badSize) === None, "non-octal size field")
    val overSize = tar.clone()
    // size field claims more data than the archive holds
    "77777777777".getBytes.zipWithIndex
      .foreach { case (b, i) => overSize(124 + i) = b }
    assert(indexOf(overSize) === None, "size beyond the archive")
  }

  test("pack rejects malformed entries in BOTH codegen modes") {
    for (mode <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try {
        assert(packDf(Seq("x" * 101 -> Array[Byte](1)))
          .collect()(0).isNullAt(0), s"name over 100 bytes ($mode)")
        assert(packDf(Seq("" -> Array[Byte](1)))
          .collect()(0).isNullAt(0), s"empty name ($mode)")
        val ok = packDf(sample).collect()(0)
        assert(!ok.isNullAt(0), s"valid entries must pack ($mode)")
      } finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
