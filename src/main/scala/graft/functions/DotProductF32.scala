package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd dot product over two `array<float>` columns,
  * accumulated in double left-to-right.
  *
  * This is the one place we drop below the DataFrame API for performance:
  * the equivalent built-in formulation
  * `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)` is correct but
  * higher-order functions are CodegenFallback — every element goes through
  * an interpreted lambda with boxing, which dominates the similarity-search
  * hot path (one dot product per candidate pair). Here `doGenCode` emits a
  * tight primitive loop over the two ArrayData buffers.
  *
  * Null semantics match the HOF formulation exactly so the DuckDB oracle
  * (`list_sum(list_transform(...))`) is unaffected: result is NULL when
  * either array is NULL, when lengths differ (zip_with pads with null), or
  * when any element is NULL.
  */
case class DotProductF32(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_f32 requires (array<float>, array<float>), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int ${ev.value}_n = $a.numElements();
         |if (${ev.value}_n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double ${ev.value}_s = 0.0;
         |  for (int i = 0; i < ${ev.value}_n; i++) {
         |    if ($a.isNullAt(i) || $b.isNullAt(i)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    ${ev.value}_s +=
         |      (double) $a.getFloat(i) * (double) $b.getFloat(i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = ${ev.value}_s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_f32"
}

object DotProductF32 {
  /** Registration triple for SparkSessionExtensions.injectFunction, making
    * the expression available as SQL `dot_f32(a, b)`.
    */
  val descriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("dot_f32"),
    new ExpressionInfo(classOf[DotProductF32].getName, "dot_f32"),
    (children: Seq[Expression]) => DotProductF32(children(0), children(1))
  )
}
