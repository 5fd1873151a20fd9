package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [queryName...] — names (dev-only) restrict the
    // dump to a subset; the driver always invokes the 2-arg full form
    val Array(sfDir, outDir) = args.take(2)
    val only: Set[String] = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // the testdata ships one parquet FILE per table (the DuckDB oracle
      // needs that layout), so the default 128 MB split size reads a whole
      // table as ONE task and serializes every pre-shuffle stage (generate/
      // shingle/join chains measured 5+ min single-threaded at sf1). 16 MB
      // splits restore scan parallelism; row groups are ~4 MB so splits
      // stay real. On a real cluster the table is many files and the
      // default is right — this tracks the file:core ratio, not data size.
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PART_BYTES", (16L << 20).toString))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Testdata-schema canary (VERDICT r7 #4): if the driver regenerated a
    // fixture with a dtype the engine doesn't handle, say so in ONE loud
    // line up front instead of 68 scattered per-query failures below. The
    // canary itself must never kill the sweep (a missing/corrupt fixture
    // should still let every other table's queries run and report).
    try {
      System.err.println("[verify] CANARY: events.ts encoding = " +
        Tables.eventTsEncoding(spark, sfDir))
      Tables.schemaCanary(spark, sfDir)
        .foreach(p => System.err.println(s"[verify] CANARY: $p"))
    } catch { case e: Throwable =>
      System.err.println(s"[verify] CANARY probe failed: ${e.getMessage}")
    }
    // dev knob: resume an interrupted sweep (the driver never sets this)
    val skipExisting = sys.env.get("SPARK_GRAFT_SKIP_EXISTING").contains("1")
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
      .foreach { case (name, fn) =>
        val dest = Paths.get(s"$outDir/$name")
        if (skipExisting && Files.exists(dest.resolve("_SUCCESS"))) ()
        else try {
          System.err.println(s"[verify] running $name")
          val t0 = System.nanoTime()
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          System.err.println(
            f"[verify] $name done in ${(System.nanoTime() - t0) / 1e9}%.1f s")
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.isEmpty || only.contains(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
