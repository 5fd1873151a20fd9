package graft

/** SQL-surface registration of the native expressions. */
class SqlFunctionsSpec extends SparkSpec {

  test("registered functions are callable from SQL") {
    Graft.registerFunctions(spark)
    val r = spark.sql(
      """SELECT cosine_sim(array(cast(1.0 as float), cast(0.0 as float)),
        |                  array(cast(1.0 as float), cast(0.0 as float))) AS c,
        |       simhash64(array('a','b','c')) AS sh,
        |       lang_id('the quick brown fox jumps over the lazy dog') AS lid,
        |       winnow_fp('some document text for fingerprinting') AS fp,
        |       size(minhash_sig(array('a','b'), 16, 7)) AS k
        |""".stripMargin).collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getString(2).nonEmpty)
    assert(r.getInt(4) === 16)
  }
}
