package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, LongType, StringType}
import org.apache.spark.util.sketch.CountMinSketch

/** Point query against a serialized Count-Min sketch (the binary produced by
  * Spark's `count_min_sketch` aggregate): `cms_estimate(sketch, item)` →
  * upper-bound frequency estimate of `item`. Codegen via a static helper.
  *
  * The deserialization happens per evaluation — correct for the rollup shape
  * this serves (a handful of probe rows against per-stratum sketches). A
  * probe of millions of items against ONE sketch should broadcast the
  * deserialized sketch instead (same pattern as the ANN query side).
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"
  // int items get an implicit widening cast, so the interpreted path's
  // asInstanceOf[Long] and the codegen path agree on every input type
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbsType] = Seq(BinaryType, LongType)

  override def nullSafeEval(sk: Any, item: Any): Any =
    CmsEstimate.estimate(sk.asInstanceOf[Array[Byte]], item.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, i) =>
      s"${ev.value} = graft.functions.CmsEstimate.estimate($s, $i);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CmsEstimate {
  /** Static body shared by eval and generated code. */
  def estimate(bytes: Array[Byte], item: Long): Long =
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
      .estimateCount(java.lang.Long.valueOf(item))
}

/** Bloom-filter build as a `TypedImperativeAggregate` — the mergeable
  * set-membership sketch that replaces X13's broadcast-exact eval set once
  * the eval corpus outgrows a broadcast: ~1.2 KB per 1k items at 1% FP vs
  * the full shingle strings. Partial buffers bit-OR together, so the built
  * filter is partition-invariant; no false negatives by construction. */
case class BloomAgg(child: Expression, expectedItems: Long, fpp: Double,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate
      .TypedImperativeAggregate[org.apache.spark.util.sketch.BloomFilter] {
  import org.apache.spark.util.sketch.BloomFilter

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def prettyName: String = "bloom_agg"

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(b: BloomFilter,
      input: org.apache.spark.sql.catalyst.InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) b.putString(v.toString)
    b
  }

  override def merge(b: BloomFilter, o: BloomFilter): BloomFilter =
    { b.mergeInPlace(o); b }

  override def eval(b: BloomFilter): Any = serialize(b)

  override def serialize(b: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    b.writeTo(out); out.toByteArray
  }
  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(o: Int)
      : org.apache.spark.sql.catalyst.expressions.aggregate.ImperativeAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int)
      : org.apache.spark.sql.catalyst.expressions.aggregate.ImperativeAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(child = cs(0))
}

/** `deflate_len(text)` — the DEFLATE-compressed byte length of a string's
  * UTF-8 bytes (zlib level 6, raw). Compressed-size / raw-size is the
  * compression-ratio quality signal training-data pipelines use to catch
  * boilerplate and repetition (highly compressible → templated/duplicated
  * content) — a single per-row number, no shuffle, no model. Deterministic
  * for a given JDK zlib; cross-engine oracles are therefore out of scope
  * (G-class) and the behavioral guarantees live in the spec. */
case class DeflateLength(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {

  override def dataType: DataType = LongType
  override def prettyName: String = "deflate_len"
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbsType] = Seq(StringType)

  override def nullSafeEval(v: Any): Any =
    DeflateLength.compressedLen(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DeflateLength.compressedLen($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object DeflateLength {
  // one native Deflater per executor thread, reset() between rows — a
  // full-corpus scan (x34) would otherwise allocate and finalize one native
  // zlib stream per document
  private val localDeflater = ThreadLocal.withInitial[java.util.zip.Deflater](
    () => new java.util.zip.Deflater(6, true))

  def compressedLen(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val in = s.getBytes
    val d = localDeflater.get()
    d.reset()
    d.setInput(in); d.finish()
    val buf = new Array[Byte](8192)
    var n = 0L
    while (!d.finished()) n += d.deflate(buf)
    n
  }
}

/** `bloom_might_contain(bloomBytes, item)` — probe a serialized Bloom filter.
  * The filter typically arrives via a broadcast one-row join (every probe
  * row carries the same bytes), so deserialization is memoized behind a
  * content-verified cache: hash lookup + byte-compare per row, deserialize
  * once per distinct filter per thread. In a pure-SQL plan the idiomatic
  * form is a scalar subquery (evaluated once); this expression keeps the
  * DataFrame-join form cheap too. */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "bloom_might_contain"
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbsType] = Seq(BinaryType, StringType)

  override def nullSafeEval(bloom: Any, item: Any): Any =
    BloomMightContain.contains(bloom.asInstanceOf[Array[Byte]], item.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, i) =>
      s"${ev.value} = graft.functions.BloomMightContain.contains($b, $i.toString());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BloomMightContain {
  import org.apache.spark.util.sketch.BloomFilter
  private val cache = new ThreadLocal[(Array[Byte], BloomFilter)]

  def contains(bytes: Array[Byte], item: String): Boolean = {
    val c = cache.get()
    val f =
      if (c != null && ((c._1 eq bytes) || java.util.Arrays.equals(c._1, bytes)))
        c._2
      else {
        val nf = BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
        cache.set((bytes, nf))
        nf
      }
    f.mightContainString(item)
  }
}
