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
