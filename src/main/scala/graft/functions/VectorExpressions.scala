package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Cosine similarity over two `array<float>` embedding columns, computed in a
  * single fused double-accumulating loop with whole-stage codegen — the hot
  * inner kernel of the brute-force ANN scan (SURVEY.md §2.4 X03). Unlike a
  * Scala UDF there is no serialization or boxing per row: the generated Java
  * reads the unsafe array data in place.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  // the kernel reads float-backed ArrayData; declaring the contract makes
  // Catalyst insert an element-wise cast (or fail analysis) instead of
  // letting getFloat reinterpret differently-typed bytes
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbsType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0; var dot = 0.0; var nx = 0.0; var ny = 0.0
    while (i < n) {
      // widen BEFORE multiplying: float*float rounds each product to float
      // (1e-8 noise); double products keep the whole accumulation exact
      // enough to hash-match an external double implementation at 1 ULP
      val xv = x.getFloat(i).toDouble; val yv = y.getFloat(i).toDouble
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny"); val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv"); val denom = ctx.freshName("denom")
      s"""
        int $n = Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0, $nx = 0.0, $ny = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $xv = (double) $a.getFloat($i); double $yv = (double) $b.getFloat($i);
          $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
        }
        double $denom = Math.sqrt($nx) * Math.sqrt($ny);
        ${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Euclidean (L2) distance over two `array<double>` columns: one fused
  * double-accumulating loop in index order, sqrt at the end — the exact
  * accumulation contract of DuckDB's `list_distance` over `DOUBLE[]`, which
  * is what lets the k-means assignment step (x37) hash-match an external
  * replay bit-for-bit. Same codegen treatment as [[CosineSimilarity]]. */
case class L2Distance(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_dist"
  // getDouble on a float-backed array would reinterpret bytes; the declared
  // contract makes SQL callers with array<float> columns get an implicit
  // element cast to double instead of silently wrong distances
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbsType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0; var acc = 0.0
    while (i < n) {
      val dv = x.getDouble(i) - y.getDouble(i)
      acc += dv * dv
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val dv = ctx.freshName("dv")
      s"""
        int $n = Math.min($a.numElements(), $b.numElements());
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $dv = $a.getDouble($i) - $b.getDouble($i);
          $acc += $dv * $dv;
        }
        ${ev.value} = Math.sqrt($acc);
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Sign-of-random-projection LSH bucket for an `array<float>` embedding:
  * `planes` pseudo-random hyperplanes with components derived from
  * splitmix64(seed, plane, dim) mapped to ±1, packed into an int bucket id.
  * The scale path for ANN: vectors shuffle by bucket, candidate generation is
  * a bucket-local join instead of an all-pairs cross product. */
case class RandomProjectionBucket(child: Expression, planes: Int, seed: Long)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(planes > 0 && planes <= 30, "planes must be in 1..30")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "rp_bucket"
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbsType] = Seq(ArrayType(FloatType))

  // same hash-derived ±1 plane loop in generated Java: the near-dup candidate
  // generator evaluates this `tables` times per row, so it must stay inside
  // whole-stage codegen like the cosine kernel it feeds
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n"); val bucket = ctx.freshName("bucket")
      val p = ctx.freshName("p"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val h = ctx.freshName("h")
      s"""
        int $n = $c.numElements();
        int $bucket = 0;
        for (int $p = 0; $p < $planes; $p++) {
          double $dot = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            long $h = graft.functions.Hashing.splitmix64(
              ${seed}L ^ ((long) $p << 32) ^ (long) $i);
            $dot += ((($h & 1L) == 0L) ? 1.0 : -1.0) * $c.getFloat($i);
          }
          if ($dot >= 0) $bucket |= (1 << $p);
        }
        ${ev.value} = $bucket;
      """
    })

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    var bucket = 0
    var p = 0
    while (p < planes) {
      var dot = 0.0
      var i = 0
      while (i < n) {
        // ±1 plane component from a counter-based hash — no stored planes,
        // identical on every executor
        val h = Hashing.splitmix64(seed ^ (p.toLong << 32) ^ i.toLong)
        val sign = if ((h & 1L) == 0L) 1.0 else -1.0
        dot += sign * x.getFloat(i)
        i += 1
      }
      if (dot >= 0) bucket |= (1 << p)
      p += 1
    }
    bucket
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
