package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the cross-engine determinism rule (SURVEY.md §2.3 rule 2): a SUM
  * over a raw DOUBLE column is merge-order-dependent, so Spark and the DuckDB
  * oracle can land on different last-ulp values (q77 failed exactly this way
  * in round 3 — rows/schema matched, hash didn't). Every double column must be
  * cast to DECIMAL *inside* the SUM argument, making the reduction exact
  * integer arithmetic on both engines.
  *
  * The audit runs over the oracle SQL (the contract surface): every occurrence
  * of a known double column inside a SUM(...) argument must appear as
  * `CAST(<col> AS DECIMAL...`. AVG is held to the same rule (it is a
  * double-sum divided by a count).
  */
class DeterminismAuditSpec extends AnyFunSuite {

  /** Double columns of the driver fixtures (FIXTURES.md table schemas). */
  private val doubleCols = Seq(
    "l_quantity", "l_extendedprice", "l_discount", "l_tax",
    "o_totalprice", "c_acctbal", "s_acctbal", "p_retailprice", "value")

  /** Spans of every `sum(...)` / `avg(...)` argument, balanced-paren scan. */
  private def aggArgs(sql: String): Seq[String] = {
    val lower = sql.toLowerCase
    val out = Seq.newBuilder[String]
    for (fn <- Seq("sum(", "avg(")) {
      var from = 0
      var i = lower.indexOf(fn, from)
      while (i >= 0) {
        var depth = 1
        var j = i + fn.length
        while (j < sql.length && depth > 0) {
          sql(j) match {
            case '(' => depth += 1
            case ')' => depth -= 1
            case _ =>
          }
          j += 1
        }
        out += sql.substring(i + fn.length, j - 1)
        from = i + fn.length
        i = lower.indexOf(fn, from)
      }
    }
    out.result()
  }

  /** Spans [start, end) of every `cast( ... as decimal...)` inside `s` —
    * a double expression is safe once it is inside one of these (the per-row
    * value is deterministic; only the double *accumulation* is order-
    * dependent). */
  private def decimalCastSpans(s: String): Seq[(Int, Int)] = {
    val lower = s.toLowerCase
    val out = Seq.newBuilder[(Int, Int)]
    var i = lower.indexOf("cast(")
    while (i >= 0) {
      var depth = 1
      var j = i + 5
      while (j < s.length && depth > 0) {
        s(j) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case _ =>
        }
        j += 1
      }
      if (lower.substring(i, j).contains("as decimal")) out += ((i, j))
      i = lower.indexOf("cast(", i + 5)
    }
    out.result()
  }

  test("no oracle SQL sums a raw double column (cast-before-sum rule)") {
    val offenders = for {
      (name, sql) <- SparkEntry.oracleSql.toSeq.sortBy(_._1)
      arg <- aggArgs(sql)
      spans = decimalCastSpans(arg)
      col <- doubleCols
      // every occurrence of the column inside the agg argument must sit
      // inside a CAST(... AS DECIMAL) span of that argument.
      idx <- Iterator.iterate(arg.toLowerCase.indexOf(col))(
          p => arg.toLowerCase.indexOf(col, p + 1)).takeWhile(_ >= 0)
      if !spans.exists { case (a, b) => idx >= a && idx < b }
      // a column name that is a substring of a longer identifier is fine
      // (e.g. `value` inside `values` / `ws_value`): require a word boundary.
      if !(idx > 0 && (arg(idx - 1).isLetterOrDigit || arg(idx - 1) == '_')) &&
        !(idx + col.length < arg.length &&
          (arg(idx + col.length).isLetterOrDigit || arg(idx + col.length) == '_'))
    } yield s"$name: SUM/AVG argument `${arg.trim.take(80)}` uses raw `$col`"

    assert(offenders.isEmpty,
      "\nraw double columns inside SUM/AVG (wrap in CAST(col AS DECIMAL(..)) " +
        "on BOTH engines):\n  " + offenders.mkString("\n  "))
  }

  test("audit harness actually detects an offending SUM") {
    val bad = "SELECT sum(l_extendedprice) FROM lineitem"
    val hit = aggArgs(bad).exists(a => a.contains("l_extendedprice") &&
      !a.toLowerCase.contains("cast("))
    assert(hit, "self-test: the audit must flag a raw double sum")
  }
}

/** Guards determinism rule 3 (learned the hard way on q77, rounds 3–4): the
  * driver hashes RENDERED values, and DuckDB results pass through pandas,
  * which converts DECIMAL to float64. A Spark result column left as
  * DecimalType therefore renders trailing-zero cents ("818372.70") that the
  * oracle's float64 ("818372.7") does not — rows and schema match, hash
  * doesn't, and only on rows whose value happens to land on a trailing zero
  * (q77 broke on 163/1714 rows; q80/q78 carried the identical latent hazard).
  * The mechanical fix is `CAST(decimal_expr AS DOUBLE)` on BOTH engines
  * (exact for < 2^53 scaled units); this spec bans the whole class: no
  * oracle-checked batch query may leave a DECIMAL column in its final schema.
  *
  * TimestampType output keys carry the same rendering risk (engine-dependent
  * second/fraction rendering) — queries group on DATE-cast keys instead
  * (q60/q77 pattern); the timestamp audit pins the ones already clean.
  */
class OutputSchemaAuditSpec extends SparkSpec {
  import org.apache.spark.sql.types.{DataType, DecimalType, StructType, ArrayType, MapType, TimestampType}

  private def typesOf(dt: DataType): Iterator[DataType] = dt match {
    case s: StructType => Iterator(s) ++ s.fields.iterator.flatMap(f => typesOf(f.dataType))
    case a: ArrayType => Iterator(a) ++ typesOf(a.elementType)
    case m: MapType => Iterator(m) ++ typesOf(m.keyType) ++ typesOf(m.valueType)
    case other => Iterator(other)
  }

  /** Batch O-queries: every oracle-hashed query whose DataFrame can be built
    * without running a stream (s* queries execute micro-batch runs on
    * construction; their outputs are audited at the source — all money sums
    * are dbl(sum(dec2(...))) and all keys long/string/window-struct). */
  private lazy val batchOracleQueries: Seq[String] =
    SparkEntry.oracleSql.keys.filter(!_.startsWith("s")).toSeq.sorted

  test("no oracle-checked batch query outputs a DECIMAL column (rule 3)") {
    val offenders = for {
      name <- batchOracleQueries
      df = SparkEntry.queries(name)(spark, sf)
      f <- df.schema.fields
      t <- typesOf(f.dataType)
      if t.isInstanceOf[DecimalType]
    } yield s"$name: column `${f.name}` is ${f.dataType.simpleString}"
    assert(offenders.isEmpty,
      "\nDECIMAL in an O-query final schema renders trailing zeros the " +
        "float64 oracle does not — CAST(... AS DOUBLE) on BOTH engines:\n  " +
        offenders.mkString("\n  "))
  }

  test("no oracle-checked batch query outputs a raw TIMESTAMP column") {
    val offenders = for {
      name <- batchOracleQueries
      df = SparkEntry.queries(name)(spark, sf)
      f <- df.schema.fields
      if f.dataType == TimestampType
    } yield s"$name: column `${f.name}` is TIMESTAMP (group/output on a " +
      "DATE cast or epoch micros instead — q60/q77 pattern)"
    assert(offenders.isEmpty,
      "\nraw TIMESTAMP output columns risk cross-engine rendering drift:\n  " +
        offenders.mkString("\n  "))
  }
}
