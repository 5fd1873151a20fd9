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
}
