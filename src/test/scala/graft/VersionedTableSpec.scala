package graft

import org.apache.spark.sql.functions._
import graft.sources.VersionedTable

/** Commit-protocol pins for the versioned parquet table (q110 pins the
  * time-travel diff content against the DuckDB replay). */
class VersionedTableSpec extends SparkSpec {

  test("commit / VERSION AS OF / latest resolution and manifest gating") {
    import spark.implicits._
    val root = Scratch.dir("vt-spec", sf)
    VersionedTable.reset(spark, root)

    assert(VersionedTable.latest(spark, root).isEmpty)
    intercept[IllegalArgumentException] {
      VersionedTable.snapshot(spark, root)
    }

    val d1 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val d2 = Seq((1L, "a"), (2L, "B"), (3L, "c")).toDF("k", "v")
    assert(VersionedTable.commit(d1, root) === 1)
    assert(VersionedTable.commit(d2, root) === 2)
    assert(VersionedTable.latest(spark, root) === Some(2))

    val v1 = VersionedTable.snapshot(spark, root, Some(1))
    val v2 = VersionedTable.snapshot(spark, root)
    assert(v1.exceptAll(d1).isEmpty && d1.exceptAll(v1).isEmpty,
      "VERSION AS OF 1 must return the first snapshot untouched")
    assert(v2.exceptAll(d2).isEmpty && d2.exceptAll(v2).isEmpty,
      "default read must resolve to the latest committed version")

    // a version that was never committed must refuse, even if a stray data
    // directory exists (the manifest is the source of truth)
    intercept[IllegalArgumentException] {
      VersionedTable.snapshot(spark, root, Some(3))
    }

    // a committed version stays readable after later commits (time travel)
    VersionedTable.commit(d1.withColumn("v", lit("z")), root)
    assert(VersionedTable.snapshot(spark, root, Some(1))
      .exceptAll(d1).isEmpty)
    VersionedTable.reset(spark, root)
  }
}
