package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.util.sketch.BloomFilter

/** Native codegen'd Bloom-filter membership probe over a string column.
  *
  * `mightContainString(s)` is TRUE for every string that was put into the
  * filter and true-with-probability-fpp for the rest — a scan-local
  * superset prefilter. The filter itself is built once on the driver
  * (`DataFrameStatFunctions.bloomFilter`) and rides the expression into
  * every task; at 1% fpp it costs ~9.6 bits per distinct key, so a
  * probe set whose EXACT hash table would blow the broadcast budget
  * (strings at ~50-100 bytes each) still fits as a filter two orders of
  * magnitude smaller. The exact join that follows keeps results exact —
  * the filter only bounds how many rows reach it.
  *
  * Spark's own runtime row-level filtering (`BloomFilterMightContain`)
  * applies the same idea automatically to some shuffle joins, but it is
  * not plannable from the public API against a PRE-BUILT reusable filter
  * (e.g. one persisted beside an eval split and applied to every future
  * corpus snapshot); this expression is that piece.
  *
  * Null semantics: NULL in, NULL out (`UnaryExpression` default null
  * intolerance) — a NULL shingle is never "maybe present".
  */
case class BloomMightContainStr(child: Expression, filter: BloomFilter)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain_str requires string, got $t")
    }

  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(input: Any): Any =
    filter.mightContainBinary(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val bloomRef = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $bloomRef.mightContainBinary($c.getBytes());")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)

  override def prettyName: String = "bloom_might_contain_str"
}
