package graft

/** Semantic pin for x83_mmr_rerank: the oracle proves both engines compute
  * the same greedy selection, but not that the selection DOES what MMR is
  * for. This crafts a pool where pure-relevance top-5 would be a block of
  * near-identical vectors and asserts MMR escapes the block after one pick.
  *
  * Geometry (64-dim unit vectors, dims indexed from 0):
  *   - query q0           = e0
  *   - A block (ids 10-15): 0.9·e0 + √0.19·e1 — six IDENTICAL vectors,
  *     rel 0.9 (the relevance winners), pairwise sim exactly 1.0
  *   - B block (ids 20-24): 0.85·e0 + √0.2775·e_k, distinct k per id —
  *     rel 0.85, sim(A,B)=0.765, sim(B,B')=0.7225
  *   - fillers (ids 30-36): rel 0.3, pads the top-12 pool
  * Step 1 takes A (highest rel, tie → id 10). From step 2 on:
  *   A: 0.7·0.9 − 0.3·1.0    = 0.33
  *   B: 0.7·0.85 − 0.3·0.765 = 0.3655  → B wins every remaining round,
  * in id order (equal scores tie-break on n_id). Margins are ~0.03, far
  * above float32 embedding noise.
  */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  test("MMR escapes a redundant relevance block after one pick") {
    val dim = 64
    def v(parts: (Int, Double)*): Array[Float] = {
      val a = Array.fill(dim)(0f)
      parts.foreach { case (i, x) => a(i) = x.toFloat }
      a
    }
    val a2 = math.sqrt(1 - 0.81)
    val b2 = math.sqrt(1 - 0.7225)
    val f2 = math.sqrt(1 - 0.09)
    val rows: Seq[(Long, Array[Float])] =
      Seq((0L, v(0 -> 1.0))) ++
        // other query ids (< 5), orthogonal to everything above dim 39:
        // their selections exist but are not asserted here
        (1 to 4).map(i => (i.toLong, v((40 + i) -> 1.0))) ++
        (10 to 15).map(i => (i.toLong, v(0 -> 0.9, 1 -> a2))) ++
        (20 to 24).map(i => (i.toLong, v(0 -> 0.85, (i - 18) -> b2))) ++
        (30 to 36).map(i => (i.toLong, v(0 -> 0.3, (i - 10) -> f2)))
    val dir = java.nio.file.Files.createTempDirectory("mmr-spec").toString
    rows.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val out = SparkEntry.queries("x83_mmr_rerank")(spark, dir)
      .collect().filter(_.getLong(0) == 0L)
      .sortBy(_.getLong(1))
      .map(r => r.getLong(1) -> r.getLong(2))

    assert(out.length == 5, s"expected 5 MMR picks for q0: ${out.toSeq}")
    assert(out(0) == (1L, 10L),
      s"step 1 must take the relevance winner (tie → min id): ${out.toSeq}")
    assert(out.drop(1).map(_._2).toSeq == Seq(20L, 21L, 22L, 23L),
      "steps 2-5 must leave the redundant A block for the diverse B block " +
        s"in id order: ${out.toSeq}")
  }
}
