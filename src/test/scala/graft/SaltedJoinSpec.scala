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
}
