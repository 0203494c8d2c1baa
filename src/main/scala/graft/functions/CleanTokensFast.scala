package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused clean_text + tokenize:
  * `filter(split(clean_text(s), " "), t -> t <> '')` as ONE byte scan —
  * no intermediate cleaned string, no split regex, tokens sliced
  * directly out of the scan buffer. This is the front of every dedup /
  * TF-IDF / BM25 / shingle pipeline; the two-step formulation scans the
  * document three times (clean NFA, materialize, split regex), this
  * scans once.
  *
  * Token semantics mirror the composed form exactly: tokens are the
  * non-empty segments BETWEEN SPACES of the cleaned text, so non-space
  * whitespace (\t \n \x0B \f \r survives cleaning) stays INSIDE tokens,
  * and the clean trim is irrelevant (edge spaces only produce empty
  * segments, which are filtered). TextSpec proves element-equality
  * against the composed regex formulation on adversarial inputs and the
  * fixture corpus; the DuckDB oracle keeps
  * `list_filter(string_split(<clean regex>, ' '), ...)`.
  */
case class CleanTokensFast(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"clean_tokens_fast requires string, got $t")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    CleanTokensFast.tokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CleanTokensFast.tokens($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)

  override def prettyName: String = "clean_tokens_fast"
}

object CleanTokensFast {

  /** Registration triple for SparkSessionExtensions.injectFunction. */
  val descriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("clean_tokens_fast"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[CleanTokensFast].getName, "clean_tokens_fast"),
    (children: Seq[Expression]) => CleanTokensFast(children.head)
  )

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' ||
      b == '\r'

  @inline private def isLetter(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')

  private def urlRunAt(bytes: Array[Byte], i: Int, lit: Array[Byte])
      : Boolean = {
    val end = i + lit.length
    if (end >= bytes.length) return false
    var j = 0
    while (j < lit.length) {
      if (bytes(i + j) != lit(j)) return false
      j += 1
    }
    !isWs(bytes(end))
  }

  private val HTTP = "http".getBytes("US-ASCII")
  private val WWW = "www".getBytes("US-ASCII")

  /** Same scan as CleanTextFast.clean, flushing a token at each SPACE
    * boundary of the would-be output instead of materializing it.
    */
  def tokens(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val buf = new Array[Byte](n)
    var b0 = 0  // current token length
    val out = new java.util.ArrayList[UTF8String](8)
    def flush(): Unit = {
      if (b0 > 0) {
        out.add(UTF8String.fromBytes(java.util.Arrays.copyOf(buf, b0)))
        b0 = 0
      }
    }
    var i = 0
    while (i < n) {
      val b = bytes(i)
      if ((b == 'h' && urlRunAt(bytes, i, HTTP)) ||
          (b == 'w' && urlRunAt(bytes, i, WWW))) {
        i += 1
        while (i < n && !isWs(bytes(i))) i += 1
      } else {
        if (b == ' ') flush()           // token boundary
        else if (isLetter(b)) {
          buf(b0) = (b | 0x20).toByte   // lowercase
          b0 += 1
        } else if (isWs(b)) {           // \t \n \x0B \f \r stay IN tokens
          buf(b0) = b
          b0 += 1
        }
        // anything else: dropped by the clean
        i += 1
      }
    }
    flush()
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }
}
