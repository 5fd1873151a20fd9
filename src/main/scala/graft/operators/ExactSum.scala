package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact money/moment sums on LONG hot paths.
  *
  * `sum(decimal)` whose result precision exceeds 18 keeps its aggregation
  * buffer as serialized BigDecimal bytes inside the hash-agg row — a
  * per-input-row deserialize/add/reserialize that dominated every
  * revenue-style aggregation in the sf0.1→sf1 scale sweep (q79 33.8×, q59
  * 23.1×, q78 20.1×, q14_stats_agg 13.1× on 10× data). These helpers move
  * the reduction onto plain LONG columns (whole-stage codegen, 8-byte
  * compact buffers), carrying values as 10^-2 ("cents") or 10^-4
  * fixed-point integers, and convert back through an EXACT decimal descale
  * at the end — one decimal division per GROUP instead of one BigDecimal
  * round-trip per row.
  *
  * Bit-parity argument (vs `sum(dec2(c)).cast("double")`, the pattern the
  * DuckDB oracles replay): the long sum and the decimal sum are the same
  * exact integer; the final decimal division is exact (the value has ≤ 2 or
  * 4 fractional digits, the division result carries scale 6); so the single
  * double rounding is a correctly-rounded cast of the SAME rational number
  * on both paths — IEEE-754 identical outputs.
  *
  * Overflow headroom (non-ANSI long sums wrap silently, so the margins are
  * part of the contract): cents ≤ 1e7 per row → ~9·10^11 rows per group
  * before a partial sum can wrap; scale-4 products ≤ 1e14 per row are SPLIT
  * into (hi = p >> 30, lo = p & (2^30−1)) partial sums → ~8·10^9 rows on
  * the lo bound. Beyond those scales, pre-aggregate under an extra group
  * key (e.g. a date bucket) first — same plan shape, one more exchange.
  */
object ExactSum {
  private val SPLIT = 1L << 30

  /** dec2-rounded cents as long: `(cast(c as decimal(12,2)) * 100)` — the
    * EXACT rounding `dec2` applies, so oracle parity is preserved. */
  def cents(c: Column): Column =
    (c.cast("decimal(12,2)") * lit(100)).cast("long")

  /** Scale-2 discount multiplier in cents: `(1 − rate) as decimal(4,2) ×
    * 100` — mirrors the `(lit(1) - rate(c)).cast("decimal(4,2)")` factor of
    * the TPC-H revenue queries. */
  def rateCents(c: Column): Column =
    ((lit(1) - c.cast("decimal(4,2)")).cast("decimal(4,2)") * lit(100))
      .cast("long")

  /** Scale-2 tax multiplier: `(1 + rate) as decimal(4,2) × 100`. */
  def plusRateCents(c: Column): Column =
    ((lit(1) + c.cast("decimal(4,2)")).cast("decimal(4,2)") * lit(100))
      .cast("long")

  /** Exact descale of an integer-valued decimal by 10^pow, then ONE double
    * rounding. The divisor decimal is exact and the quotient needs ≤ pow
    * fractional digits < result scale 6, so no precision is lost before the
    * final cast. */
  private def descale(x: Column, pow: Int): Column =
    (x / lit(math.pow(10, pow).toLong).cast(s"decimal(${pow + 1},0)"))
      .cast("double")

  /** `dbl(sum(dec2(c)))` on a long-cents column: pass [[cents]] (possibly
    * wrapped in `when`) and get the bit-identical double. */
  def dblSum2(centsCol: Column): Column =
    descale(sum(centsCol).cast("decimal(38,0)"), 2)

  /** Sum of a 10^-pow fixed-point long bounded by ~1e9 per row (e.g.
    * cents × rateCents at pow=4) → double; == `dbl(sum(dec2(a) *
    * (1-rate)))`. */
  def dblSum(prod: Column, pow: Int): Column =
    descale(sum(prod).cast("decimal(38,0)"), pow)

  /** Split sum of a 10^-pow fixed-point long up to ~1e14 per row (cents ×
    * cents second moments at pow=4; price×rate×tax at pow=6) → double. Two
    * long sums, reassembled exactly in decimal once per group. */
  def dblSumSplit(prod: Column, pow: Int): Column = {
    val hi = sum(shiftright(prod, 30))
    val lo = sum(prod.bitwiseAND(lit(SPLIT - 1)))
    descale(hi.cast("decimal(28,0)") * lit(SPLIT).cast("decimal(10,0)")
      + lo.cast("decimal(20,0)"), pow)
  }
}
