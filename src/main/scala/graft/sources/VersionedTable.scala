package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal versioned-parquet table with a manifest commit log — the
  * `VERSION AS OF` read path (the storage idiom Delta/Iceberg formalize,
  * reduced to its load-bearing parts):
  *
  *   root/v=N/          full snapshot N as plain parquet
  *   root/_manifest/N.json   commit record, written AFTER the snapshot
  *
  * The manifest entry is created by write-to-temp + atomic rename only once
  * the version directory is fully written, so a reader listing the manifest
  * can never observe a half-written snapshot — the same
  * write-data-then-publish-pointer protocol every table format uses. Works
  * against any Hadoop filesystem (HDFS / S3A / local), and reading a
  * snapshot is an ordinary parquet scan: column pruning, predicate pushdown
  * and partition-parallel splits all apply unchanged at 100 TB.
  */
object VersionedTable {

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  /** Write `df` as the next snapshot version; returns the version number. */
  def commit(df: DataFrame, root: String): Int = {
    val spark = df.sparkSession
    val next = latest(spark, root).getOrElse(0) + 1
    df.write.mode("overwrite").parquet(s"$root/v=$next")
    val f = fs(spark, root)
    val mdir = new Path(s"$root/_manifest")
    f.mkdirs(mdir)
    val tmp = new Path(mdir, s".$next.json.tmp")
    val out = f.create(tmp, true)
    try out.write(
      s"""{"version":$next,"path":"v=$next"}""".getBytes("UTF-8"))
    finally out.close()
    f.rename(tmp, new Path(mdir, s"$next.json"))
    next
  }

  /** Highest committed version, if any. */
  def latest(spark: SparkSession, root: String): Option[Int] = {
    val f = fs(spark, root)
    val mdir = new Path(s"$root/_manifest")
    if (!f.exists(mdir)) None
    else {
      val vs = f.listStatus(mdir).map(_.getPath.getName)
        .filter(n => n.endsWith(".json") && !n.startsWith("."))
        .map(_.stripSuffix(".json").toInt)
      if (vs.isEmpty) None else Some(vs.max)
    }
  }

  /** `VERSION AS OF asOf` read; latest committed version when None. */
  def snapshot(spark: SparkSession, root: String,
      asOf: Option[Int] = None): DataFrame = {
    val v = asOf.orElse(latest(spark, root)).getOrElse(
      throw new IllegalArgumentException(s"no committed versions at $root"))
    require(fs(spark, root).exists(new Path(s"$root/_manifest/$v.json")),
      s"version $v was never committed at $root")
    spark.read.parquet(s"$root/v=$v")
  }

  /** Drop the whole table (tests / scratch rebuilds). */
  def reset(spark: SparkSession, root: String): Unit = {
    fs(spark, root).delete(new Path(root), true)
    ()
  }
}
