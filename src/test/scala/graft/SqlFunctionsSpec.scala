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

  test("avro codec and shingle generator are callable from SQL") {
    Graft.registerFunctions(spark)
    val schema =
      """{"type":"record","name":"r","fields":[{"name":"id","type":"long"}]}"""
    val rt = spark.sql(
      s"""SELECT avro_decode(avro_encode(named_struct('id', 7L), '$schema'),
         |                   '$schema').id AS id""".stripMargin).collect()(0)
    assert(rt.getLong(0) === 7L)
    val sh = spark.sql(
      """SELECT pos, shingle
        |FROM (SELECT 'a b c d e f' AS t)
        |LATERAL VIEW pos_shingles(t, 5) AS pos, shingle""".stripMargin).collect()
    assert(sh.length === 2 && sh(0).getString(1) === "a b c d e")
  }
}
