package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass distinct k-gram word shingles (`string` → `array<string>`) —
  * the native form of the split → transform(sequence) → array_join →
  * array_distinct chain in [[graft.GraftOps.shingles]]: one tokenize, one
  * reused string builder per shingle, one insertion-ordered set, zero
  * intermediate arrays. Exact parity with the SQL chain (including the
  * whole-text fallback for docs shorter than k, Spark's keep-trailing-empty
  * split semantics, and array_distinct's first-occurrence order). Feeds
  * every near-dup/decontamination pipeline, so it stays inside whole-stage
  * codegen via a single static call. */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression {

  require(k > 0, "k must be positive")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(v: Any): Any =
    WordShingles.compute(v.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingles.compute($c, $k);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object WordShingles {
  /** Static body shared by eval and generated code. */
  def compute(s: UTF8String, k: Int): ArrayData = {
    // limit -1 keeps trailing empty tokens, matching Spark's split()
    val words = s.toString.split(" ", -1)
    if (words.length < k)
      return new GenericArrayData(
        Array[Any](UTF8String.fromString(words.mkString(" "))))
    val seen = new java.util.LinkedHashSet[String](words.length * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= words.length - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var idx = 0
    while (it.hasNext) { out(idx) = UTF8String.fromString(it.next()); idx += 1 }
    new GenericArrayData(out)
  }
}

/** MinHash signature of a token/shingle set (`array<string>` → `array<long>`,
  * length k). One pass over the tokens: each token is hashed once, then run
  * through k cheap splitmix permutations, tracking the per-permutation min —
  * O(tokens × k) with zero allocation besides the output. Partition-local and
  * seed-deterministic, so signatures computed on different executors agree
  * (the property LSH banding relies on). SURVEY.md §2.4 X02. */
case class MinHashSignature(child: Expression, k: Int, seed: Long)
    extends UnaryExpression {

  require(k > 0 && k <= 1024, "k must be in 1..1024")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  @transient private lazy val seeds: Array[Long] = Hashing.permSeeds(seed, k)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = Hashing.hashUTF8(arr.getUTF8String(i))
        var j = 0
        while (j < k) {
          val hj = Hashing.splitmix64(h ^ seeds(j))
          if (hj < mins(j)) mins(j) = hj
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  // same loop in generated Java, so the signature computation stays inside
  // whole-stage codegen (a CodegenFallback here would collapse the stage)
  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val seedsRef = ctx.addReferenceObj("minhashSeeds", seeds, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val mins = ctx.freshName("mins"); val n = ctx.freshName("n")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val h = ctx.freshName("h"); val hj = ctx.freshName("hj")
      s"""
        long[] $mins = new long[$k];
        java.util.Arrays.fill($mins, Long.MAX_VALUE);
        int $n = $c.numElements();
        for (int $i = 0; $i < $n; $i++) {
          if (!$c.isNullAt($i)) {
            long $h = graft.functions.Hashing.hashUTF8($c.getUTF8String($i));
            for (int $j = 0; $j < $k; $j++) {
              long $hj = graft.functions.Hashing.splitmix64($h ^ $seedsRef[$j]);
              if ($hj < $mins[$j]) $mins[$j] = $hj;
            }
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
      """
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit SimHash (Charikar, "Similarity estimation techniques from
  * rounding algorithms", STOC'02) of a token multiset
  * (`array<string>` → long): every token
  * hash votes ±1 on each of 64 bit positions; the sign of the vote sum forms
  * the output bit. Near-duplicate docs land within a small Hamming distance.
  * SURVEY.md §2.4 X02. */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val votes = ctx.freshName("votes"); val n = ctx.freshName("n")
      val i = ctx.freshName("i"); val b = ctx.freshName("b")
      val h = ctx.freshName("h"); val out = ctx.freshName("out")
      s"""
        int[] $votes = new int[64];
        int $n = $c.numElements();
        for (int $i = 0; $i < $n; $i++) {
          if (!$c.isNullAt($i)) {
            long $h = graft.functions.Hashing.hashUTF8($c.getUTF8String($i));
            for (int $b = 0; $b < 64; $b++) {
              $votes[$b] += ((($h >>> $b) & 1L) == 1L) ? 1 : -1;
            }
          }
        }
        long $out = 0L;
        for (int $b = 0; $b < 64; $b++) {
          if ($votes[$b] > 0) $out |= (1L << $b);
        }
        ${ev.value} = $out;
      """
    })

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = Hashing.hashUTF8(arr.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** JVM-static kernels for the text expressions below. Top-level object ⇒
  * Scala emits static forwarders, so generated Java calls these directly
  * (`graft.functions.TextKernels.winnow(...)`) — the same pattern the
  * minhash/simhash codegen uses for [[Hashing]]. Keeping the loop in ONE
  * compiled method instead of inlining it per call site also keeps the
  * generated class under Janino's method-size limits. */
object TextKernels {

  /** winnowing fingerprint body — see [[WinnowFingerprint]]. */
  final def winnow(v: UTF8String, k: Int, w: Int): Long = {
    val s = v.toString
    val n = s.length
    if (n < k) return Hashing.hashBytes(s.getBytes("UTF-8"))
    val m = n - k + 1
    val grams = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < k) { h = (h ^ s.charAt(i + j).toLong) * 0x100000001b3L; j += 1 }
      grams(i) = Hashing.splitmix64(h)
      i += 1
    }
    var out = 0L
    var lastPicked = -1
    i = 0
    val windows = math.max(m - w + 1, 1)
    while (i < windows) {
      var minIdx = i
      var j = i + 1
      val end = math.min(i + w, m)
      while (j < end) { if (grams(j) < grams(minIdx)) minIdx = j; j += 1 }
      if (minIdx != lastPicked) { out ^= grams(minIdx); lastPicked = minIdx }
      i += 1
    }
    out
  }

  /** language-id body — see [[LanguageId]]. */
  final def langId(v: UTF8String): UTF8String = {
    val s = v.toString.toLowerCase(java.util.Locale.ROOT)
    if (s.exists(c => c >= 0x4E00 && c <= 0x9FFF)) return UTF8String.fromString("zh")
    val counts = new Array[Long](26)
    var total = 0L
    s.foreach { c => if (c >= 'a' && c <= 'z') { counts(c - 'a') += 1; total += 1 } }
    if (total == 0) return UTF8String.fromString("und")
    var best = "und"; var bestDist = Long.MaxValue
    LanguageId.profiles.foreach { case (code, prof) =>
      var dist = 0L
      prof.foreach { case (ch, permille) =>
        val d = 1000L * counts(ch - 'a') - permille * total
        dist += d * d
      }
      if (dist < bestDist) { bestDist = dist; best = code }
    }
    UTF8String.fromString(best)
  }
}

/** Winnowing document fingerprint (string → long): rolling polynomial hash of
  * every k-gram of characters, then the minimum hash of each window of w
  * consecutive k-gram hashes is selected (recording a position only once);
  * the selected mins are XOR-folded into one 64-bit fingerprint. Order of
  * selection doesn't matter (XOR is commutative), so the fingerprint is
  * stable. Standard winnowing scheme (Schleimer, Wilkerson, Aiken; SIGMOD'03).
  */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k > 0 && w > 0, "k and w must be positive")
  override def dataType: DataType = LongType
  override def prettyName: String = "winnow_fp"

  override def nullSafeEval(v: Any): Any =
    TextKernels.winnow(v.asInstanceOf[UTF8String], k, w)

  // one static call keeps the fingerprint stage inside whole-stage codegen
  // (this was a CodegenFallback — each row paid an eval() virtual dispatch
  // AND collapsed the surrounding stage)
  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.winnow($c, $k, $w)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Character-frequency language-ID heuristic (string → string lang code).
  * Scores the letter-frequency profile of the text against small built-in
  * profiles (top-letter per-mille frequencies of en/es/de/fr + a
  * cjk-codepoint check) and returns the closest code. A real system would use
  * trigram profiles; the interface and the distributed execution shape are
  * what matter here (plain per-row expression — no shuffle).
  *
  * The distance is EXACT integer arithmetic:
  * `Σ (1000·cnt_ch − F_ch·total)²` per profile (F in per-mille), which equals
  * the squared-error distance scaled by the constant `(1000·total)²` — so the
  * argmin is identical to the floating formulation, but reproducible
  * bit-for-bit on any engine (O-class: the DuckDB oracle replays the same
  * counts and formula in SQL). Ties go to the earlier profile (en,es,de,fr).
  */
case class LanguageId(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  override def nullSafeEval(v: Any): Any =
    TextKernels.langId(v.asInstanceOf[UTF8String])

  // static-call codegen (profile scoring loop lives in TextKernels once,
  // not re-inlined into every generated class)
  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.langId($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object LanguageId {
  /** letter → per-mille frequency (public letter-frequency tables), ordered:
    * earlier profile wins distance ties. */
  val profiles: Seq[(String, Seq[(Char, Long)])] = Seq(
    "en" -> Seq('e' -> 127L, 't' -> 91L, 'a' -> 82L, 'o' -> 75L, 'i' -> 70L,
      'n' -> 67L, 's' -> 63L, 'h' -> 61L, 'r' -> 60L),
    "es" -> Seq('e' -> 137L, 'a' -> 125L, 'o' -> 86L, 's' -> 80L, 'r' -> 69L,
      'n' -> 67L, 'i' -> 63L, 'd' -> 58L, 'l' -> 50L),
    "de" -> Seq('e' -> 164L, 'n' -> 98L, 'i' -> 76L, 's' -> 73L, 'r' -> 70L,
      'a' -> 65L, 't' -> 61L, 'd' -> 51L, 'h' -> 48L),
    "fr" -> Seq('e' -> 147L, 'a' -> 76L, 'i' -> 75L, 's' -> 79L, 'n' -> 71L,
      'r' -> 66L, 't' -> 72L, 'o' -> 58L, 'l' -> 55L))

  /** The same distance formula as DuckDB SQL, for the oracle of x04_langid:
    * counts via length-difference, total via strip-non-letters, argmin via a
    * first-wins CASE chain. */
  def oracleSql: String = {
    val letters = profiles.flatMap(_._2.map(_._1)).distinct.sorted
    val cnts = letters.map(ch =>
      s"length(t) - length(replace(t, '$ch', '')) AS c_$ch").mkString(",\n    ")
    def dist(prof: Seq[(Char, Long)]): String =
      prof.map { case (ch, f) => s"(1000*c_$ch - $f*tot)*(1000*c_$ch - $f*tot)" }
        .mkString(" + ")
    val Seq(en, es, de, fr) = profiles.map(p => dist(p._2))
    s"""WITH low AS (SELECT doc_id, lang, lower(text) AS t FROM documents),
cnt AS (SELECT doc_id, lang, t,
    length(regexp_replace(t, '[^a-z]', '', 'g')) AS tot,
    $cnts
  FROM low),
d AS (SELECT doc_id, lang, t, tot,
    $en AS d_en, $es AS d_es, $de AS d_de, $fr AS d_fr
  FROM cnt)
SELECT doc_id,
  CASE WHEN regexp_matches(t, '[\\x{4E00}-\\x{9FFF}]') THEN 'zh'
       WHEN tot = 0 THEN 'und'
       WHEN d_en <= d_es AND d_en <= d_de AND d_en <= d_fr THEN 'en'
       WHEN d_es <= d_de AND d_es <= d_fr THEN 'es'
       WHEN d_de <= d_fr THEN 'de'
       ELSE 'fr' END AS guess,
  lang
FROM d ORDER BY doc_id NULLS FIRST"""
  }
}
