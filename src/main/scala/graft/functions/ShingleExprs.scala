package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass w-gram shingle builders.
  *
  * The HOF formulations in graft.ops.Dedup
  * (`transform(sequence(0, n-w), i -> concat_ws(" ", element_at(...)))`)
  * walk the interpreted expression tree per shingle position — measured
  * ~2.5 s for a 260 k-shingle corpus where one compiled loop per row
  * runs in well under 100 ms (the same HOF-vs-native gap TextHashExprs
  * documents for minhash). Shingling fronts the ENTIRE dedup/text
  * family (minhash, winnowing, PPJoin, phrase postings, calibration),
  * so this is the hottest few lines in the library. Both expressions
  * are bit-parity with their HOF twins (spec'd), which stay in Dedup
  * as the readable reference formulation. Round 10: `doGenCode` keeps
  * both inside whole-stage codegen (CodegenFallback forced an
  * InternalRow materialization + one boxed eval per row at the span
  * break — part of round 9's GC bill).
  */
object ShingleKernels {

  private val sep = UTF8String.fromString(" ")

  /** w-gram shingles of a token array as space-joined strings. n < w →
    * empty array. Called from eval AND generated code. */
  def shingles(arr: ArrayData, w: Int): ArrayData = {
    val n = arr.numElements()
    if (n < w) return new GenericArrayData(Array.empty[AnyRef])
    val toks = new Array[UTF8String](n)
    var j = 0
    while (j < n) {
      toks(j) = if (arr.isNullAt(j)) null else arr.getUTF8String(j)
      j += 1
    }
    val out = new Array[AnyRef](n - w + 1)
    val parts = new Array[UTF8String](w)
    var i = 0
    while (i <= n - w) {
      var k = 0
      while (k < w) { parts(k) = toks(i + k); k += 1 }
      // concatWs skips nulls — same as the HOF concat_ws
      out(i) = UTF8String.concatWs(sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** xxhash64 shingle identities (seed 42, running-hash chaining, nulls
    * skipped — Spark's `xxhash64(t_i, …, t_{i+w-1})` semantics). */
  def hashedShingles(arr: ArrayData, w: Int): ArrayData = {
    val n = arr.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Long])
    val toks = new Array[UTF8String](n)
    var j = 0
    while (j < n) {
      toks(j) = if (arr.isNullAt(j)) null else arr.getUTF8String(j)
      j += 1
    }
    val out = new Array[Long](n - w + 1)
    var i = 0
    while (i <= n - w) {
      var h = 42L
      var k = 0
      while (k < w) {
        val t = toks(i + k)
        if (t != null)
          h = XXH64.hashUTF8String(t, h)
        k += 1
      }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** w-gram shingles of a token array as space-joined strings — the
  * compiled twin of [[graft.ops.Dedup.shinglesHof]]. n < w → empty
  * array (a doc shorter than one shingle has no shingle set).
  */
case class ShinglesExpr(child: Expression, w: Int)
    extends UnaryExpression {
  require(w >= 1, s"shingle width must be >= 1, got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingles requires array<string>, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    ShingleKernels.shingles(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleKernels.shingles($c, $w)")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)

  override def prettyName: String = "shingles_fast"
}

/** w-gram shingle IDENTITIES as xxhash64 of the w tokens (8-byte keys,
  * no string concatenation) — the compiled twin of
  * [[graft.ops.Dedup.hashedShinglesHof]]. Bit-parity with Spark's
  * `xxhash64(t_i, …, t_{i+w-1})` builtin: seed 42, each token's bytes
  * hashed with the running hash as seed, nulls skipped.
  */
case class HashedShinglesExpr(child: Expression, w: Int)
    extends UnaryExpression {
  require(w >= 1, s"shingle width must be >= 1, got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hashed_shingles requires array<string>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    ShingleKernels.hashedShingles(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleKernels.hashedShingles($c, $w)")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)

  override def prettyName: String = "hashed_shingles_fast"
}
