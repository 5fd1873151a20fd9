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
  * part of the contract): cents per row reach ~10^8 in this schema
  * (o_totalprice ~5·10^7 cents; l_extendedprice ~10^7) → ~9·10^10 rows per
  * group before a partial sum can wrap; scale-4 products ≤ 1e14 per row are
  * SPLIT into (hi = p >> 30, lo = p & (2^30−1)) partial sums → ~8·10^9 rows
  * on the lo bound. Those bounds are BELOW plausible 100 TB group sizes
  * (a global agg over 10^12 rows wraps the lo partial), so the `Guarded`
  * variants add a per-group row-count assertion that fails LOUDLY instead
  * of returning a silently wrapped sum — use them anywhere group sizes are
  * not structurally bounded. Beyond the bounds, pre-aggregate under an
  * extra group key (e.g. a date bucket) first — same plan shape, one more
  * exchange — and the guard tells you when.
  */
object ExactSum {
  private val SPLIT = 1L << 30

  /** Max rows/group before a sum of ≤1e8-cent rows can wrap a long. */
  val MaxRowsCents: Long = Long.MaxValue / 100000000L // ≈ 9.2·10^10
  /** Max rows/group before the lo partial of [[dblSumSplit]] can wrap. */
  val MaxRowsSplit: Long = Long.MaxValue / (SPLIT - 1) // ≈ 8.6·10^9

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

  /** Wraps a fixed-point sum with a per-group overflow guard: long partials
    * wrap SILENTLY, so fail the job loudly instead of returning a
    * plausible-looking wrong total. The guard asserts BOTH halves of the
    * no-wrap argument — every row within the assumed magnitude bound AND
    * the group within the derived row-count bound — so it is sound, not
    * assumption-based. `assert_true` yields NULL when the bounds hold, so
    * the coalesce is the sum itself; past either bound the task throws with
    * a remediation hint. Costs one count + one max slot in the same
    * hash-agg row — no extra pass, stays in whole-stage codegen. */
  private def guarded(inner: Column, in: Column, perRowBound: Long,
      maxRows: Long): Column =
    coalesce(
      assert_true(count(in) <= lit(maxRows) &&
          coalesce(max(abs(in)), lit(0L)) <= lit(perRowBound),
        lit(s"ExactSum overflow guard: a group exceeds $maxRows rows or a " +
          s"row exceeds magnitude $perRowBound — pre-aggregate under an " +
          "extra group key (e.g. a date bucket) or raise the split"))
        .cast("double"),
      inner)

  /** [[dblSum2]] + overflow guard (default per-row bound 10^8 cents). */
  def dblSum2Guarded(centsCol: Column,
      perRowBound: Long = 100000000L): Column =
    guarded(dblSum2(centsCol), centsCol, perRowBound,
      Long.MaxValue / perRowBound)

  /** [[dblSum]] + overflow guard: pass the per-row magnitude bound of
    * `prod`; the guard asserts it and derives the safe row count. */
  def dblSumGuarded(prod: Column, pow: Int, perRowBound: Long): Column =
    guarded(dblSum(prod, pow), prod, perRowBound, Long.MaxValue / perRowBound)

  /** [[dblSumSplit]] + overflow guard: lo partial binds at [[MaxRowsSplit]]
    * rows; the hi partial additionally binds when `perRowBound >> 30` is
    * large. Default per-row bound 4·10^14: price×price second moments with
    * prices up to 2·10^5 dollars (2·10^7 cents) — the schema's observed max
    * is ~1.05·10^5 dollars, i.e. ~1.1·10^14 per row. */
  def dblSumSplitGuarded(prod: Column, pow: Int,
      perRowBound: Long = 400000000000000L): Column =
    guarded(dblSumSplit(prod, pow), prod, perRowBound,
      math.min(MaxRowsSplit, Long.MaxValue / math.max(perRowBound >> 30, 1L)))
}
