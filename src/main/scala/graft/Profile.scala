package graft

import org.apache.spark.sql.SparkSession

/** Dev-side single-query profiler: `Profile <sfDir> <name>[,<name>...] [reps]`
  * runs just the named registry queries (noop sink, per-rep timing printed) so
  * a slow query can be iterated on without paying a full Bench pass. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',').toSeq
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", (16L << 20).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val byName = SparkEntry.registry.map(q => q.name -> q).toMap
    for (rep <- 1 to reps; n <- names) {
      if (rep > 1) operators.PipelineQueries.resetMemo()
      val q = byName.getOrElse(n, sys.error(s"no such query: $n"))
      val t0 = System.nanoTime()
      q.fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[profile] rep=$rep $n%-30s $dt%8.3f s")
    }
    spark.stop()
  }
}
