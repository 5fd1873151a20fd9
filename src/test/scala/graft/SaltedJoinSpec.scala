package graft

import org.apache.spark.sql.functions._

/** Skew-mitigation: salted join must equal the plain join bit-for-bit. */
class SaltedJoinSpec extends SparkSpec {

  test("salted join equals plain join on a skewed key distribution") {
    val li = Tables.table(spark, sf, "lineitem")
    val ord = Tables.table(spark, sf, "orders")
    val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("o_orderstatus"))
    val salted = GraftOps.saltedJoin(li, ord,
        col("l_orderkey"), col("o_orderkey"), salt = 8,
        leftSaltSource = col("l_partkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("o_orderstatus"))
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
    assert(salted.count() === plain.count())
  }

  test("AQE splits a skewed sort-merge join partition at runtime (skew=true)") {
    // The automatic complement to manual salting (q80): when one key
    // dominates a shuffle join, AQE's OptimizeSkewedJoin splits the fat
    // partition into advisory-sized slices at runtime. Thresholds are scaled
    // down to fire at test size; at 100 TB the defaults fire on genuinely
    // skewed keys. Salting remains the escape hatch for a SINGLE giant key
    // (AQE cannot split one key's sorted run across its join partner).
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val prev = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set(keys(0), "true")
      conf.set(keys(1), "16KB")
      conf.set(keys(2), "2")   // fat partition must exceed 2x the median
      conf.set(keys(3), "8KB") // split slices target
      conf.set(keys(4), "false") // coalescing first would hide the skew split
      conf.set(keys(5), "-1")    // neither side may broadcast (the 100 TB case)
      // 80% of lineitem lands on skew_key=0, the rest on 8/9. Two details
      // make this honest at test scale: (a) repartition(8) — a skewed REDUCE
      // partition can only split along MAP-output ranges, so a single-split
      // parquet input (1 mapper) is unsplittable no matter how fat (at scale
      // there are always many mappers); (b) an incompressible sha2 payload —
      // the skew detector reads compressed shuffle bytes, and a constant pad
      // compresses to nothing.
      val li = Tables.table(spark, sf, "lineitem")
        .repartition(8)
        .withColumn("skew_key",
          when(col("l_orderkey") % 10 < 8, lit(0L)).otherwise(col("l_orderkey") % 10))
        .withColumn("pad", sha2(concat(col("l_orderkey"), lit("-"),
          col("l_linenumber")).cast("binary"), 512))
      val dim = spark.range(0, 10).select(col("id").as("skew_key"),
        concat(lit("grp-"), col("id")).as("grp"))
      // the bare join, no downstream exchange: OptimizeSkewedJoin declines a
      // split that would ADD a shuffle for a later stage, so pin the pure
      // join-stage behavior (exactly q80's shape before its aggregation)
      val joined = li.join(dim, Seq("skew_key"))
        .select(col("skew_key"), col("l_linenumber"), col("grp"), col("pad"))
      joined.collect() // AQE decides skew splits in the FINAL adaptive plan
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"OptimizeSkewedJoin did not split the skewed partition:\n$p")
    } finally prev.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _)) }
  }
}
