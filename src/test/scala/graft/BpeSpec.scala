package graft

import org.apache.spark.sql.functions._

import scala.util.Random

/** x41: the distributed BPE vocabulary trainer must equal an independent
  * in-memory reference implementation (same greedy left-to-right merge,
  * same (count desc, left, right) tie-break) — on a hand-computed corpus
  * and on randomized corpora. */
class BpeSpec extends SparkSpec {

  /** In-memory greedy left-to-right merge of one learned pair. */
  private def mergeWord(syms: List[String], a: String, b: String): List[String] =
    syms match {
      case x :: y :: rest if x == a && y == b => (a + b) :: mergeWord(rest, a, b)
      case x :: rest => x :: mergeWord(rest, a, b)
      case Nil => Nil
    }

  /** Independent single-machine BPE trainer (the textbook algorithm). */
  private def refBpe(corpus: Seq[String], merges: Int): Seq[(Int, String, String, String, Long)] = {
    var wf: Map[List[String], Long] = corpus.flatMap(_.toLowerCase.split(" "))
      .filter(_.nonEmpty).groupBy(identity)
      .map { case (w, ws) => w.toList.map(_.toString) -> ws.size.toLong }
    val out = Seq.newBuilder[(Int, String, String, String, Long)]
    var rank = 0
    var go = true
    while (rank < merges && go) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for ((syms, f) <- wf; p <- syms.sliding(2) if p.size == 2)
        counts((p(0), p(1))) += f
      if (counts.isEmpty) go = false
      else {
        val ((a, b), c) = counts.toSeq.minBy { case ((l, r), n) => (-n, l, r) }
        out += ((rank, a, b, a + b, c))
        wf = wf.map { case (syms, f) => mergeWord(syms, a, b) -> f }
        rank += 1
      }
    }
    out.result()
  }

  private def distBpe(corpus: Seq[String], merges: Int): Seq[(Int, String, String, String, Long)] = {
    import spark.implicits._
    GraftOps.bpeVocab(corpus.toDF("text"), col("text"), merges)
      .collect().toSeq
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
  }

  test("hand-computed corpus: merges and counts are exact") {
    // "aaab"x2 + "ab": pairs (a,a)=4 (overlapping counted), (a,b)=3
    // -> merge (a,a); then (a,b)=3 beats (aa,a)=2; then (aa,ab)=2.
    val got = distBpe(Seq("aaab aaab ab"), 3)
    assert(got === Seq(
      (0, "a", "a", "aa", 4L),
      (1, "a", "b", "ab", 3L),
      (2, "aa", "ab", "aaab", 2L)))
  }

  test("randomized corpora: distributed trainer == in-memory reference") {
    val rnd = new Random(42)
    for (trial <- 0 until 3) {
      val words = Seq.fill(120)(
        Seq.fill(1 + rnd.nextInt(7))("abcd" (rnd.nextInt(4))).mkString)
      val corpus = words.grouped(10).map(_.mkString(" ")).toSeq
      val merges = 6 + trial
      assert(distBpe(corpus, merges) === refBpe(corpus, merges),
        s"trial $trial diverged")
    }
  }

  test("exhausts gracefully when fewer pairs exist than requested merges") {
    val got = distBpe(Seq("ab ab"), 10)
    assert(got.size < 10 && got.head == ((0, "a", "b", "ab", 2L)))
  }

  // ---- frontier batching (the driver-pacing path for real vocab sizes) ----

  /** One left-to-right pass applying a whole symbol-disjoint batch — the
    * in-memory mirror of the batched fold in GraftOps.bpeVocab. */
  private def mergeBatchWord(syms: List[String],
      sel: Seq[(String, String, Long)]): List[String] =
    syms.foldLeft(List.empty[String]) { (acc, s) =>
      acc match {
        case last :: rest if sel.exists { case (a, b, _) => last == a && s == b } =>
          (last + s) :: rest
        case _ => s :: acc
      }
    }.reverse

  /** In-memory frontier-batched BPE: same candidate order, same greedy
    * symbol-disjoint prefix, same one-pass application. */
  private def refBpeBatched(corpus: Seq[String], merges: Int,
      batch: Int): Seq[(Int, String, String, String, Long)] = {
    var wf: Map[List[String], Long] = corpus.flatMap(_.toLowerCase.split(" "))
      .filter(_.nonEmpty).groupBy(identity)
      .map { case (w, ws) => w.toList.map(_.toString) -> ws.size.toLong }
    val out = Seq.newBuilder[(Int, String, String, String, Long)]
    var rank = 0
    var go = true
    while (rank < merges && go) {
      val want = math.min(batch, merges - rank)
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for ((syms, f) <- wf; p <- syms.sliding(2) if p.size == 2)
        counts((p(0), p(1))) += f
      if (counts.isEmpty) go = false
      else {
        val cand = counts.toSeq.sortBy { case ((l, r), n) => (-n, l, r) }
          .take(want * 4)
        val used = scala.collection.mutable.Set.empty[String]
        val sel = cand.iterator.flatMap { case ((a, b), n) =>
          if (used(a) || used(b) || used(a + b)) None
          else { used ++= Seq(a, b, a + b); Some((a, b, n)) }
        }.take(want).toVector
        sel.foreach { case (a, b, n) => out += ((rank, a, b, a + b, n)); rank += 1 }
        wf = wf.map { case (syms, f) => mergeBatchWord(syms, sel) -> f }
      }
    }
    out.result()
  }

  private def distBpeBatched(corpus: Seq[String], merges: Int,
      batch: Int): Seq[(Int, String, String, String, Long)] = {
    import spark.implicits._
    GraftOps.bpeVocab(corpus.toDF("text"), col("text"), merges, batch)
      .collect().toSeq
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
  }

  test("batch=1 is the exact classic algorithm; batch=K == batched reference") {
    val rnd = new Random(7)
    val words = Seq.fill(150)(
      Seq.fill(1 + rnd.nextInt(6))("abcde" (rnd.nextInt(5))).mkString)
    val corpus = words.grouped(10).map(_.mkString(" ")).toSeq
    assert(distBpeBatched(corpus, 8, 1) === refBpe(corpus, 8),
      "batch=1 must be byte-identical to classic BPE")
    for (batch <- Seq(3, 8)) {
      assert(distBpeBatched(corpus, 8, batch) === refBpeBatched(corpus, 8, batch),
        s"batch=$batch diverged from the in-memory batched reference")
    }
  }

  test("every batched round is symbol-disjoint and ranks stay contiguous") {
    val got = distBpeBatched(Seq("aaab aaab ab cdcd cd dce"), 6, 3)
    assert(got.map(_._1) === got.indices.toList, "ranks must be 0..n-1")
    got.foreach { case (_, a, b, m, _) => assert(m === a + b) }
  }

  // ---- encode (x53: applying the learned merge table) ----------------------

  /** Independent reference encoder: one greedy left-to-right pass per merge,
    * in rank order — the procedure the trainer's own re-segmentation runs. */
  private def refEncode(word: String,
      merges: Seq[(String, String)]): List[String] =
    merges.foldLeft(word.toLowerCase.toList.map(_.toString)) {
      case (syms, (a, b)) => mergeWord(syms, a, b)
    }

  test("distributed encoder == reference on every distinct corpus word") {
    import spark.implicits._
    val rnd = new Random(11)
    val words = Seq.fill(200)(
      Seq.fill(1 + rnd.nextInt(8))("abcde" (rnd.nextInt(5))).mkString)
    val corpus = words.grouped(8).map(_.mkString(" ")).toSeq
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val mergesDf = GraftOps.bpeVocab(docs, col("text"), merges = 12)
    val merges = mergesDf.orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val enc = GraftOps.bpeEncode(docs, col("doc_id"), col("text"), mergesDf)
      .orderBy("doc_id").collect()
    corpus.zipWithIndex.foreach { case (text, i) =>
      val expected = text.toLowerCase.split(" ").filter(_.nonEmpty)
        .flatMap(w => refEncode(w, merges)).toSeq
      val got = enc(i).getSeq[String](enc(i).fieldIndex("tokens"))
      assert(got === expected, s"doc $i segmentation diverged")
      // concat-roundtrip identity: token boundaries partition the word chars
      assert(got.mkString === text.toLowerCase.split(" ")
        .filter(_.nonEmpty).mkString, s"doc $i roundtrip broke")
      assert(enc(i).getLong(enc(i).fieldIndex("n_tokens")) === got.size.toLong)
    }
  }

  test("more merges never increase a document's token count") {
    import spark.implicits._
    val rnd = new Random(13)
    val corpus = Seq.fill(20)(
      Seq.fill(12)(Seq.fill(2 + rnd.nextInt(5))("abc" (rnd.nextInt(3))).mkString)
        .mkString(" "))
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    def counts(m: Int): Seq[Long] =
      GraftOps.bpeEncode(docs, col("doc_id"), col("text"),
          GraftOps.bpeVocab(docs, col("text"), merges = m))
        .orderBy("doc_id").collect().map(_.getLong(3)).toSeq
    val (few, many) = (counts(3), counts(10))
    few.zip(many).foreach { case (f, m) =>
      assert(m <= f, "a longer rank-prefix merge table must only compress")
    }
  }
}
