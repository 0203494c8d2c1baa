package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/** Native Johnson-Lindenstrauss projection: out[i] =
  * (float) Σ_j (double) vec[j] · (double) signs[i][j], j ascending —
  * the whole sign matrix rides along as ONE codegen reference object
  * and the projection is ONE expression node.
  *
  * This replaces `array(dot(vec, typedLit(row_0)), ..., dot(vec,
  * typedLit(row_63)))` — 64 independent DotProductF32 nodes, each with
  * its own embedded literal array, whose per-execution analysis +
  * janino compile dominated q267 (the PqExprs fixed-cost rule: never
  * compose hot-path arithmetic from unrolled literal trees; measured
  * ~2.4 s per construction for the 64-dim corpus projection, ~0.1 s
  * with this node).
  *
  * Null semantics replicate the array-of-dots form EXACTLY: the array
  * itself is never null; every element is null when the input vector
  * is null, its length differs from the sign rows' length, or any of
  * its elements is null (each dot hit the same condition). Arithmetic
  * is bit-identical: per output row, ascending-j double accumulation,
  * one final double→float cast.
  */
case class JlProjectExpr(child: Expression, signs: Array[Array[Float]])
    extends UnaryExpression {

  require(signs.nonEmpty && signs.forall(_.length == signs(0).length),
    "jl_project needs a non-empty rectangular sign matrix")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"jl_project requires array<float>, got $t")
    }

  override def dataType: DataType = ArrayType(FloatType, containsNull = true)

  override def nullable: Boolean = false

  // the array itself is produced even for a NULL input (array() of
  // null dots) — so eval overrides the null-propagating default
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    val outDim = signs.length
    val dim = signs(0).length
    if (v == null) return new GenericArrayData(new Array[Any](outDim))
    val x = v.asInstanceOf[ArrayData]
    if (x.numElements() != dim)
      return new GenericArrayData(new Array[Any](outDim))
    var j = 0
    while (j < dim) {
      if (x.isNullAt(j))
        return new GenericArrayData(new Array[Any](outDim))
      j += 1
    }
    val out = new Array[Any](outDim)
    var i = 0
    while (i < outDim) {
      val row = signs(i)
      var s = 0.0
      var k = 0
      while (k < dim) {
        s += x.getFloat(k).toDouble * row(k).toDouble
        k += 1
      }
      out(i) = s.toFloat
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val signsRef = ctx.addReferenceObj("jlSigns", signs, "float[][]")
    val c = child.genCode(ctx)
    val outDim = signs.length
    val dim = signs(0).length
    val arr = ctx.freshName("jlOut")
    val ok = ctx.freshName("jlOk")
    val i = ctx.freshName("i")
    val k = ctx.freshName("k")
    val s = ctx.freshName("s")
    ev.copy(
      isNull = FalseLiteral,
      code = code"""
        ${c.code}
        Object[] $arr = new Object[$outDim];
        boolean $ok = !${c.isNull} &&
          ${c.value}.numElements() == $dim;
        if ($ok) {
          for (int $k = 0; $k < $dim; $k++) {
            if (${c.value}.isNullAt($k)) { $ok = false; break; }
          }
        }
        if ($ok) {
          for (int $i = 0; $i < $outDim; $i++) {
            double $s = 0.0;
            float[] ${s}_row = $signsRef[$i];
            for (int $k = 0; $k < $dim; $k++) {
              $s += (double) ${c.value}.getFloat($k) *
                (double) ${s}_row[$k];
            }
            $arr[$i] = (float) $s;
          }
        }
        final org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
      """)
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)

  override def prettyName: String = "jl_project"
}
