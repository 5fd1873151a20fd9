package graft

import org.apache.spark.sql.functions._

/** The kc > 1 branch of x37's IVF-style two-level assignment (round 12).
  * The oracle tiers (≤ 2000 vectors → k = 8 → kc = 1) run the exact flat
  * algorithm, so without this spec the coarse-quantized path would only
  * ever execute in manual sf10 runs. A 40k-vector synthetic embeddings
  * table forces k = 79, kc = 9 and pins the properties the approximation
  * must keep for SemDeDup semantics:
  *   - total function: every vector assigned to exactly one cluster;
  *   - locality: identical vectors share a cluster, and exactly one of an
  *     identical pair survives (the other is 'drop' at cosine 1 ≥ 0.45);
  *   - partition quality: clusters stay near the 512 occupancy target
  *     (no giant catch-all cell — the failure mode of a broken router).
  */
class TwoLevelAssignSpec extends SparkSpec {

  test("x37's coarse-quantized assignment at kc > 1: total, local, balanced") {
    import spark.implicits._
    val n = 40000
    // 8 well-separated anchors in 4-d, each vector = anchor + tiny jitter;
    // vectors 0 and 1 are byte-identical (the planted near-dup pair)
    val dir = java.nio.file.Files.createTempDirectory("twolevel").toString
    val rows = (0 until n).map { i =>
      val a = (if (i <= 1) 0 else i) % 8
      val j = if (i <= 1) 0.0 else (i / 8 % 97) / 3000.0
      (i.toLong, Array(
        (a % 2 * 10).toFloat + j.toFloat,
        (a / 2 % 2 * 10).toFloat + (j / 2).toFloat,
        (a / 4 % 2 * 10).toFloat + (j / 3).toFloat,
        1.0f))
    }
    rows.toDF("vec_id", "embedding")
      .repartition(8)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val out = graft.operators.PipelineQueries.all
      .find(_.name == "x37_kmeans_semdedup").get
      .fn(spark, dir)
      .cache()

    // total: one row per vector, no nulls
    assert(out.count() === n.toLong)
    assert(out.filter(col("cluster").isNull).count() === 0L)

    // k = ceil(40000/512) = 79 → kc = ceil(sqrt(79)) = 9: the two-level
    // branch ran. Cluster count lands near k (some seeds may lose all
    // members to Lloyd movement, never more than k).
    val clusters = out.select(col("cluster")).distinct().count()
    assert(clusters > 8 && clusters <= 79L,
      s"expected a real k≈79 partition, got $clusters clusters")

    // locality: the identical pair shares a cluster and dedups to one keeper
    val pair = out.filter(col("vec_id") <= 1)
      .select(col("vec_id"), col("cluster"), col("action"))
      .collect().sortBy(_.getLong(0))
    assert(pair(0).getLong(1) === pair(1).getLong(1),
      "identical vectors must land in one cluster")
    assert(pair.map(_.getString(2)).count(_ == "drop") === 1,
      "exactly one of an identical pair is dropped at cosine 1")

    // balance: no catch-all cluster (a broken coarse router funnels
    // everything through one cell). 8 anchors × ~10 clusters each: the
    // biggest cluster must stay within a small multiple of the 512 target.
    val maxSize = out.groupBy(col("cluster")).count()
      .agg(max(col("count"))).head().getLong(0)
    assert(maxSize < 512L * 8,
      s"largest cluster $maxSize — coarse routing collapsed")

    out.unpersist()
  }
}
