package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass implementations of the hash-sketch hot loops.
  *
  * The equivalent built-in higher-order-function formulations are kept in
  * graft.ops.Dedup (tests assert bit-parity), but HOFs evaluate their
  * lambda through the interpreted expression walker per array element —
  * for an 8-seed minhash over ~50 shingles that is ~400 boxed expression
  * evaluations per row and dominates the dedup pipeline. Each expression
  * here is one compiled-Scala loop per row; CodegenFallback costs a single
  * virtual call per row, which is noise at that granularity.
  *
  * All hashing is md5 (hex), so the DuckDB oracle replays results exactly.
  */
object HashUtil {
  private val hexChars = "0123456789abcdef".toCharArray

  def md5Hex(bytes: Array[Byte]): String = {
    val d = MessageDigest.getInstance("MD5").digest(bytes)
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** First 16 bits of md5 (== first 4 hex nibbles, the oracle's decode). */
  def md5_16(bytes: Array[Byte]): Int = {
    val d = MessageDigest.getInstance("MD5").digest(bytes)
    ((d(0) & 0xff) << 8) | (d(1) & 0xff)
  }

  /** First 60 bits of md5 (== first 15 hex nibbles) as a non-negative
    * long — 60 rather than 64 keeps the value positive in both engines
    * (DuckDB BIGINT is signed; a 64-bit value's top bit would flip sign).
    */
  def md5_60(bytes: Array[Byte]): Long = {
    val d = MessageDigest.getInstance("MD5").digest(bytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) >> 4) & 0xfL)
  }

  /** First 32 bits of md5 (== first 8 hex nibbles) as a non-negative
    * long — the `conv(substring(md5(s), 1, 8), 16, 10)` decode the
    * q133/q134/q136 family uses, compiled.
    */
  def md5_32(bytes: Array[Byte]): Long = {
    val d = MessageDigest.getInstance("MD5").digest(bytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }
}

/** Per-element first-8-nibble md5 of a string array, as array<bigint> —
  * the compiled form of `transform(arr, s -> conv(substring(md5(s), 1,
  * 8), 16, 10))`: the HOF form walks the interpreted expression tree
  * per element (measured ~10 s over a 1 M-shingle corpus where this
  * runs in ~100 ms). Feeds the winnowing selection (q207/q208).
  */
case class Md5Hex8ArrExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_hex8_arr requires array<string>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = HashUtil.md5_32(
        arr.getUTF8String(i).getBytes)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)

  override def prettyName: String = "md5_hex8_arr"
}

/** MinHash signature over a shingle array: for seed s in [0, k), the
  * lexicographic minimum over shingles of md5Hex(s + ":" + shingle);
  * "~empty" sentinel when the row has no shingles. Matches
  * graft.ops.Dedup.minhashSignature (HOF form) bit-for-bit.
  */
case class MinHashSigExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string>, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[AnyRef](k)
    var s = 0
    while (s < k) {
      var min: String = null
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val h = HashUtil.md5Hex(
            (s + ":" + arr.getUTF8String(i).toString)
              .getBytes("UTF-8"))
          if (min == null || h.compareTo(min) < 0) min = h
        }
        i += 1
      }
      out(s) = UTF8String.fromString(if (min == null) "~empty" else min)
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

/** 16-bit SimHash over a token array: bit b of the output is set iff the
  * sum over tokens of (2*bit_b(md5_16(token)) - 1) is positive. Matches
  * graft.ops.Dedup.simhash16(tokenHashes16(...)) (HOF form) exactly.
  */
case class SimHash16Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash16 requires array<string>, got $t")
  }

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val planes = new Array[Int](16)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = HashUtil.md5_16(arr.getUTF8String(i).getBytes)
        var b = 0
        while (b < 16) {
          planes(b) += ((h >> b) & 1) * 2 - 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0
    var b = 0
    while (b < 16) {
      if (planes(b) > 0) sig |= 1 << b
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)

  override def prettyName: String = "simhash16"
}

/** 60-bit SimHash over a token array — the corpus-scale variant: 4 bands
  * of 15 bits give 32768 LSH buckets per band (vs 16 for the 16-bit
  * signature), which is what keeps the banded pair join sub-quadratic on
  * large corpora. Same algorithm as [[SimHash16Expr]] over md5_60.
  */
case class SimHash60Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash60 requires array<string>, got $t")
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val planes = new Array[Int](60)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = HashUtil.md5_60(arr.getUTF8String(i).getBytes)
        var b = 0
        while (b < 60) {
          planes(b) += (((h >> b) & 1L).toInt * 2) - 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) {
      if (planes(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)

  override def prettyName: String = "simhash60"
}
