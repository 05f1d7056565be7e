package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.text.TextParams

/**
 * Native Catalyst expressions for the training-data hot paths. Semantics are
 * EXACTLY the canonical TextParams definitions (char-polynomial folds,
 * sequential-fold float reductions) — the same arithmetic the DuckDB oracle
 * runs — just executed as tight JVM loops instead of interpreted
 * higher-order-function trees (ArrayTransform/ArrayAggregate have no
 * codegen; at 10^12 rows the lambda-dispatch overhead dominates).
 *
 * Inputs are ASCII by construction (tokens are [a-z0-9]+ runs, md5 hex),
 * so byte-wise folds equal the `ascii(char)` folds of the SQL face.
 */
object TextVecOps {

  /** fold (acc * mult + byte) % mod over the UTF8 bytes (ASCII contract). */
  def charFoldHash(s: UTF8String, mult: Long, mod: Long): Long = {
    val n = s.numBytes()
    var acc = 0L
    var i = 0
    while (i < n) {
      acc = (acc * mult + (s.getByte(i) & 0xff)) % mod
      i += 1
    }
    acc
  }

  def hash60(s: UTF8String): Long = {
    import TextParams._
    charFoldHash(s, M1, P1) | (charFoldHash(s, M2, P2) << H2Shift)
  }

  /** sequential-fold dot product; elements widened to double first. */
  def dotSeq(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc = acc + x * y
      i += 1
    }
    acc
  }

  /** all NumHashes permutation minima over a precomputed hash array. */
  def minhashSig(hashes: ArrayData): ArrayData = {
    import TextParams._
    val n = hashes.numElements()
    val out = new Array[Long](NumHashes)
    var j = 0
    while (j < NumHashes) {
      val a = aCoef(j); val b = bCoef(j)
      var m = Long.MaxValue
      var i = 0
      while (i < n) {
        val v = (hashes.getLong(i) * a + b) % P1
        if (v < m) m = v
        i += 1
      }
      out(j) = m
      j += 1
    }
    new GenericArrayData(out)
  }

  /** 60-bit majority-vote simhash over a precomputed token-hash array. */
  def simhash60(hashes: ArrayData): Long = {
    import TextParams._
    val votes = new Array[Int](SimHashBits)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var k = 0
      while (k < SimHashBits) {
        votes(k) += (((h >>> k) & 1L).toInt << 1) - 1
        k += 1
      }
      i += 1
    }
    var sig = 0L
    var k = 0
    while (k < SimHashBits) {
      if (votes(k) > 0) sig |= 1L << k
      k += 1
    }
    sig
  }

  /** token-hash array: H1 per element of a string array (shingles/tokens). */
  def tokenHashes(arr: ArrayData, mult: Long, mod: Long): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = charFoldHash(arr.getUTF8String(i), mult, mod)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** continue a char fold across one more string (no allocation). */
  private def foldOver(acc0: Long, s: UTF8String, mult: Long, mod: Long): Long = {
    val n = s.numBytes()
    var acc = acc0
    var i = 0
    while (i < n) {
      acc = (acc * mult + (s.getByte(i) & 0xff)) % mod
      i += 1
    }
    acc
  }

  /**
   * Hashes of all token trigrams "t_i t_{i+1} t_{i+2}" — bit-identical to
   * hashing the materialized shingle strings (the space byte is folded in
   * between tokens) but with no string concatenation or shingle arrays.
   * Duplicates are NOT removed: minhash minima are multiset-invariant, so
   * the signature equals the one computed over distinct shingles.
   * Under 3 tokens: one hash over all tokens space-joined (the shingle
   * fallback, TextParams.sqlShingles).
   */
  def trigramHashes(toks: ArrayData, mult: Long, mod: Long): ArrayData = {
    val n = toks.numElements()
    if (n < 3) {
      var acc = 0L
      var i = 0
      while (i < n) {
        if (i > 0) acc = (acc * mult + 0x20) % mod
        acc = foldOver(acc, toks.getUTF8String(i), mult, mod)
        i += 1
      }
      return new GenericArrayData(Array(acc))
    }
    val out = new Array[Long](n - 2)
    var i = 0
    while (i < n - 2) {
      var acc = foldOver(0L, toks.getUTF8String(i), mult, mod)
      acc = (acc * mult + 0x20) % mod
      acc = foldOver(acc, toks.getUTF8String(i + 1), mult, mod)
      acc = (acc * mult + 0x20) % mod
      acc = foldOver(acc, toks.getUTF8String(i + 2), mult, mod)
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  def hash60Array(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = hash60(arr.getUTF8String(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** DISTINCT 60-bit combined hashes of all token trigrams, sorted
   * ascending — bit-identical to `hash60` over the materialized distinct
   * shingle strings (TextParams.sqlHash60 reproduces it in DuckDB): both
   * 30-bit lanes folded in one pass, no string concatenation, no shingle
   * string arrays. Under 3 tokens: one hash over all tokens space-joined
   * (the shingle fallback, TextParams.sqlShingles). Lets the exact
   * n-gram-Jaccard plan carry shingles as longs end to end: set sizes and
   * intersections over the hash sets equal those over the string sets up
   * to 60-bit collisions, and the DuckDB oracle hashes the same way, so
   * engine and oracle agree by construction. */
  def trigram60(toks: ArrayData): ArrayData = {
    import graft.text.TextParams._
    val n = toks.numElements()
    if (n < 3) {
      var a1 = 0L; var a2 = 0L
      var i = 0
      while (i < n) {
        if (i > 0) { a1 = (a1 * M1 + 0x20) % P1; a2 = (a2 * M2 + 0x20) % P2 }
        val s = toks.getUTF8String(i)
        a1 = foldOver(a1, s, M1, P1); a2 = foldOver(a2, s, M2, P2)
        i += 1
      }
      return new GenericArrayData(Array(a1 | (a2 << H2Shift)))
    }
    val out = new Array[Long](n - 2)
    var i = 0
    while (i < n - 2) {
      var a1 = 0L; var a2 = 0L
      var j = 0
      while (j < 3) {
        if (j > 0) { a1 = (a1 * M1 + 0x20) % P1; a2 = (a2 * M2 + 0x20) % P2 }
        val s = toks.getUTF8String(i + j)
        a1 = foldOver(a1, s, M1, P1); a2 = foldOver(a2, s, M2, P2)
        j += 1
      }
      out(i) = a1 | (a2 << H2Shift)
      i += 1
    }
    java.util.Arrays.sort(out)
    var w = 0; var r = 0
    while (r < out.length) {
      if (w == 0 || out(r) != out(w - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }
}

/** vec_dot(a, b) -> double; a/b array<float|double>, sequential fold. */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  // children may be unresolved at construction; resolve types lazily
  private lazy val aF = isFloat(left)
  private lazy val bF = isFloat(right)
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextVecOps.dotSeq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aF, bF)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextVecOps.dotSeq($a, $b, $aF, $bF)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** char_fold_hash(s, mult, mod) -> long. */
case class CharFoldHash(str: Expression, mult: Expression, mod: Expression)
    extends TernaryExpression {
  override def first: Expression = str
  override def second: Expression = mult
  override def third: Expression = mod
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override protected def nullSafeEval(s: Any, m: Any, p: Any): Any =
    TextVecOps.charFoldHash(s.asInstanceOf[UTF8String], m.asInstanceOf[Long], p.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, m, p) => s"graft.functions.TextVecOps.charFoldHash($s, $m, $p)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(str = f, mult = s, mod = t)
}

/** token_hashes(arr, mult, mod) -> array<long> (H per string element). */
case class TokenHashes(arr: Expression, mult: Expression, mod: Expression)
    extends TernaryExpression with CodegenFallback {
  override def first: Expression = arr
  override def second: Expression = mult
  override def third: Expression = mod
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(a: Any, m: Any, p: Any): Any =
    TextVecOps.tokenHashes(a.asInstanceOf[ArrayData], m.asInstanceOf[Long], p.asInstanceOf[Long])
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(arr = f, mult = s, mod = t)
}

/** trigram_hashes(toks, mult, mod) -> array<long> (per token-trigram). */
case class TrigramHashes(arr: Expression, mult: Expression, mod: Expression)
    extends TernaryExpression with CodegenFallback {
  override def first: Expression = arr
  override def second: Expression = mult
  override def third: Expression = mod
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(a: Any, m: Any, p: Any): Any =
    TextVecOps.trigramHashes(a.asInstanceOf[ArrayData], m.asInstanceOf[Long], p.asInstanceOf[Long])
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(arr = f, mult = s, mod = t)
}

/** trigram60(toks) -> array<long>: DISTINCT sorted 60-bit trigram-shingle
 * hashes (== hash60 of the distinct shingle strings). */
case class Trigram60(child: Expression) extends UnaryExpression with CodegenFallback {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(a: Any): Any =
    TextVecOps.trigram60(a.asInstanceOf[ArrayData])
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** hash60_array(arr) -> array<long> (60-bit combined hash per element). */
case class Hash60Array(child: Expression) extends UnaryExpression with CodegenFallback {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(a: Any): Any =
    TextVecOps.hash60Array(a.asInstanceOf[ArrayData])
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** minhash_sig(hashes) -> array<long>[NumHashes]. */
case class MinHashSig(child: Expression) extends UnaryExpression with CodegenFallback {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(a: Any): Any =
    TextVecOps.minhashSig(a.asInstanceOf[ArrayData])
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** simhash60(hashes) -> long. */
case class SimHash60(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any): Any =
    TextVecOps.simhash60(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextVecOps.simhash60($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}
