package graft

import org.apache.spark.sql.functions._
import graft.functions.AvgHash64

/** Property pins for the perceptual image near-dup operator (x40):
  * the Hamming-band join must return EXACTLY the brute-force pair set at
  * maxHamming ≤ 3 (pigeonhole over 4×16-bit bands — banding is candidate
  * generation, never recall loss), and planted exact / near-identical
  * images must surface. */
class ImageHashSpec extends SparkSpec {

  // deterministic pseudo-random 4 KB "image" per id (counter-based hash —
  // identical on every run and executor)
  private def img(seed: Long): Array[Byte] = {
    val b = new Array[Byte](4096)
    var i = 0
    while (i < b.length) {
      b(i) = (graft.functions.Hashing.splitmix64(seed ^ i.toLong) & 0xff).toByte
      i += 1
    }
    b
  }

  test("band join equals brute force; planted near-identicals are found") {
    import spark.implicits._
    val base = (0L until 200L).map(i => (i, img(i * 7919L)))
    // exact copies at id+1000
    val exact = base.filter(_._1 % 50 == 0).map { case (i, b) => (i + 1000L, b.clone()) }
    // near-identicals at id+2000: +1 on the first 16 bytes — one 64-byte
    // cell shifts by ~0.25/255, so at most the cell-0 bit can flip
    val near = base.filter(_._1 % 60 == 0).map { case (i, b) =>
      val c = b.clone()
      (0 until 16).foreach(j => c(j) = (c(j) + 1).toByte)
      (i + 2000L, c)
    }
    val all = base ++ exact ++ near
    val df = all.toDF("id", "img")

    val found = GraftOps.imageNearDups(df, col("id"), col("img"), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

    // local brute force on the same hash function
    val hashes = all.map { case (i, b) => i -> AvgHash64.hash(b) }
    val brute = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ia, ib) -> d.toLong).toMap

    assert(found === brute,
      s"band join diverged from brute force (found ${found.size}, brute ${brute.size})")
    // every planted exact copy is a hamming-0 pair
    exact.foreach { case (pid, _) =>
      assert(found.get((pid - 1000L, pid)).contains(0L),
        s"planted exact pair ${pid - 1000} <-> $pid missing")
    }
    // every planted near-identical survives at hamming <= 1
    near.foreach { case (pid, _) =>
      val d = found.get((pid - 2000L, pid))
      assert(d.exists(_ <= 1L),
        s"planted near pair ${pid - 2000} <-> $pid missing or too far: $d")
    }
    // sanity: unrelated random images sit near hamming ~32, far above 3
    assert(found.size < all.size * 3, "pair set exploded — banding broken?")
  }

  test("x40 query surfaces its planted re-encode variants (rows > 0)") {
    val pairs = SparkEntry.queries("x40_image_phash")(spark, sf).collect()
    assert(pairs.nonEmpty, "x40 found no near-dup payloads — planting broken")
    // every planted (base, base+offset) pair is present at small Hamming
    val found = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    val docs = Tables.table(spark, sf, "documents")
    val off = GraftOps.imageVariantOffset(docs, col("doc_id"))
    val expected = docs
      .filter(col("doc_id") % 25 === 0 && length(col("text")) > 64)
      .select(col("doc_id")).collect().map(_.getLong(0))
    expected.foreach { id =>
      assert(found.contains((id, id + off)),
        s"planted re-encode pair $id <-> ${id + off} missing")
    }
  }

  test("s48 streaming phash dedup equals the batch distinct-hash set") {
    val streamed = SparkEntry.queries("s48_stream_phash_dedup")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val log = graft.sources.replay.ReplayLog.ensureLog(spark, sf)
    val batch = spark.read.format("graft-replay").option("path", log).load()
      .select(graft.functions.GraftFunctions.avg_hash64(col("value")).as("h64"))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(streamed === batch, "streaming dedup state diverged from batch distinct")
    assert(streamed.nonEmpty)
  }

  // deterministic 64×48 gradient-plus-stripes test image (structured, so
  // its aHash has both set and unset bits) rendered to a BufferedImage
  private def testImage(seed: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(64, 48,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 48; x <- 0 until 64) {
      val v = ((x * 4 + y * 2 + seed) % 256 + (if ((x / 8 + y / 8) % 2 == 0) 64 else 0)) % 256
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def encode(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bo), s"no $fmt writer")
    bo.toByteArray
  }

  test("real decode: PNG/BMP re-encodings of the same pixels hash identically") {
    // the round-9 caveat ("decode step stubbed — no codecs in sandbox") is
    // gone: javax.imageio ships PNG/JPEG/BMP/GIF codecs in the JDK. A
    // lossless re-encode changes the BYTES completely but not the pixels,
    // so the hashes must be equal — impossible under raw-bytes hashing.
    val a = testImage(0)
    val png = encode(a, "png")
    val bmp = encode(a, "bmp")
    // different byte streams (different container + filters)
    assert(!java.util.Arrays.equals(png, bmp))
    assert(AvgHash64.hash(png) == AvgHash64.hash(bmp),
      "lossless re-encodings must hash identically through the decode lane")
    // a genuinely different image must not collide
    val other = encode(testImage(128), "png")
    assert(AvgHash64.hash(png) != AvgHash64.hash(other))
  }

  test("real decode: lossy JPEG re-encode lands within banding range (<=3 bits)") {
    val a = testImage(0)
    val png = encode(a, "png")
    val jpg = encode(a, "jpg")
    val d = java.lang.Long.bitCount(AvgHash64.hash(png) ^ AvgHash64.hash(jpg))
    assert(d <= 3, s"JPEG re-encode drifted $d bits — decode lane broken?")
  }

  test("banding finds a planted real re-encoded PNG pair among raw payloads") {
    import spark.implicits._
    // the production mixed-payload case: mostly opaque blobs (raw lane),
    // plus one real image present as two different encodings of the same
    // pixels — the pair must surface at Hamming 0 through the band join
    val base = (0L until 100L).map(i => (i, img(i * 7919L)))
    val pic = testImage(7)
    val planted = Seq((5000L, encode(pic, "png")), (5001L, encode(pic, "bmp")))
    val df = (base ++ planted).toDF("id", "img")
    val found = GraftOps.imageNearDups(df, col("id"), col("img"), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(found.get((5000L, 5001L)).contains(0L),
      s"planted PNG/BMP re-encode pair missing: $found")
  }

  test("avg_hash64 registers on the SQL surface and is payload-deterministic") {
    import spark.implicits._
    graft.Graft.registerFunctions(spark)
    // seeds must differ beyond the low 6 bits: adjacent seeds produce a
    // within-block byte permutation, which aHash is (correctly) blind to
    Seq((1L, img(42L * 7919L)), (2L, img(42L * 7919L)), (3L, img(43L * 7919L)))
      .toDF("id", "img")
      .createOrReplaceTempView("ih_imgs")
    val r = spark.sql(
      """SELECT count(DISTINCT avg_hash64(img)) AS n_hashes,
        |       count(*) AS n FROM ih_imgs""".stripMargin).head
    assert(r.getLong(1) === 3L)
    assert(r.getLong(0) === 2L, "same payload must hash identically, different must differ")
  }
}
