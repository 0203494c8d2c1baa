package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-scan implementation of the reference's `clean_text`
  * (reddit_etl_proj/etl_pipeline.py:73-75):
  * `lower(trim(regexp_replace(s, "http\\S+|www\\S+|[^a-zA-Z\\s]", "")))`.
  *
  * The regex formulation runs a 3-alternative NFA at every character of
  * every document — the single hottest expression in the engine (the
  * clean pass feeds sentiment, dedup, TF-IDF, BM25 and the prep
  * composite; at 100 TB it IS the scan cost). This expression replaces
  * it with one branchy byte scan over the UTF8String buffer, exactly
  * replicating the Java-regex semantics:
  *
  *  - at each position, alternatives in order: literal "http" followed by
  *    >= 1 non-whitespace consumes through the non-whitespace run;
  *    likewise "www"; else a single char outside [a-zA-Z] and outside
  *    Java `\s` = [ \t\n\x0B\f\r] is dropped; else the char is kept.
  *    (Case-sensitive: "HTTP://x" keeps its letters, matching the regex.)
  *  - non-ASCII characters are outside [a-zA-Z\s], so they are dropped;
  *    byte-wise scanning is safe because UTF-8 continuation bytes are
  *    >= 0x80 and never collide with the ASCII classes tested.
  *  - the surviving bytes are ASCII letters + whitespace, so trim+lower
  *    reduce to edge-whitespace stripping and the +32 bump.
  *
  * CleanTextSpec proves byte-equality against the regex formulation on
  * adversarial generated inputs and on the full documents fixture; the
  * DuckDB oracle keeps the regex form, so the correctness gate also
  * cross-checks every query that uses this path.
  */
case class CleanTextFast(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"clean_text_fast requires string, got $t")
    }

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    CleanTextFast.clean(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CleanTextFast.clean($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)

  override def prettyName: String = "clean_text_fast"
}

object CleanTextFast {

  /** Registration triple for SparkSessionExtensions.injectFunction,
    * making the expression available as SQL `clean_text_fast(s)`.
    */
  val descriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("clean_text_fast"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[CleanTextFast].getName, "clean_text_fast"),
    (children: Seq[Expression]) => CleanTextFast(children.head)
  )

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' ||
      b == '\r'

  @inline private def isLetter(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')

  /** True iff bytes[i..] starts with the ASCII `lit` AND at least one
    * non-whitespace byte follows it (the `\S+` of the URL alternatives).
    */
  private def urlRunAt(bytes: Array[Byte], i: Int, lit: Array[Byte])
      : Boolean = {
    val end = i + lit.length
    if (end >= bytes.length) return false  // no room for the \S+ byte
    var j = 0
    while (j < lit.length) {
      if (bytes(i + j) != lit(j)) return false
      j += 1
    }
    !isWs(bytes(end))
  }

  private val HTTP = "http".getBytes("US-ASCII")
  private val WWW = "www".getBytes("US-ASCII")

  /** The full clean_text transform; called from both eval and codegen. */
  def clean(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    val n = bytes.length
    val out = new Array[Byte](n)
    var o = 0
    var i = 0
    while (i < n) {
      val b = bytes(i)
      if ((b == 'h' && urlRunAt(bytes, i, HTTP)) ||
          (b == 'w' && urlRunAt(bytes, i, WWW))) {
        // consume the whole non-whitespace run (the literal + \S+)
        i += 1
        while (i < n && !isWs(bytes(i))) i += 1
      } else {
        if (isLetter(b)) {
          out(o) = (b | 0x20).toByte  // lowercase
          o += 1
        } else if (isWs(b)) {
          out(o) = b
          o += 1
        }
        // anything else (digits, punctuation, any non-ASCII byte): drop
        i += 1
      }
    }
    // trim: Spark's trim() strips SPACE (0x20) only — not tabs/newlines
    // (unlike java.lang.String.trim) — mirror that exactly
    var lo = 0
    while (lo < o && out(lo) == ' ') lo += 1
    var hi = o
    while (hi > lo && out(hi - 1) == ' ') hi -= 1
    UTF8String.fromBytes(out, lo, hi - lo)
  }
}
