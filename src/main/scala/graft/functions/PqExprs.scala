package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native PQ codeword assignment / ADC-LUT expressions — the compact
  * replacements for the unrolled literal-arithmetic forms Sim's PQ
  * family originally composed (`array_min` over k structs each holding
  * a subDim-term expanded squared-L2): that expansion builds
  * k·subDim-term Catalyst trees PER SUBSPACE (512 terms at m=4/k=8,
  * 1024 at m=8/k=16), and every action re-pays tree analysis plus
  * multi-MB janino codegen — measured 6-12 s of pure fixed cost per PQ
  * query at any data size. Each expression here is ONE tree node whose
  * generated code is a loop over a reference-object codebook: analysis
  * is O(1), the compiled scan is tighter than the unrolled form, and
  * the arithmetic is bit-identical (left-to-right double accumulation
  * from 0.0 — adding 0.0 to a non-negative square is exact — the same
  * fold the oracle's list_sum performs; floor at 9 dp before the
  * argmin; ties to the LOWEST code via strict `<`).
  */
object PqExprs {

  /** True when any of the first `len` array slots is a null element —
    * ArrayData.getFloat on a null slot reads garbage/0, so every entry
    * point below checks this first and propagates SQL null instead
    * (matching the composed element_at arithmetic these expressions
    * replaced, where a null element nulled the distance/code).
    */
  private def hasNullElement(sv: ArrayData, len: Int): Boolean = {
    var i = 0
    while (i < len) {
      if (sv.isNullAt(i)) return true
      i += 1
    }
    false
  }

  /** Left-to-right squared L2 between a float subvector and a double
    * codeword — the [[graft.ops.Num.floorAtD]]-compatible raw sum.
    */
  def l2sq(sv: ArrayData, c: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < c.length) {
      val d = sv.getFloat(i).toDouble - c(i)
      acc += d * d
      i += 1
    }
    acc
  }

  /** Argmin codeword (9dp-floored distance, ties to the lowest code);
    * -1 signals a null array element (callers surface SQL null).
    */
  def assign(sv: ArrayData, books: Array[Array[Double]]): Int = {
    if (books.length > 0 && hasNullElement(sv, books(0).length)) return -1
    var best = 0
    var bestD = Double.PositiveInfinity
    var j = 0
    while (j < books.length) {
      val fl = math.floor(l2sq(sv, books(j)) * 1.0e9) / 1.0e9
      if (fl < bestD) { bestD = fl; best = j }
      j += 1
    }
    best
  }

  /** [[assign]] against the `s`-th of m codebooks — the trainer's
    * per-row dispatch over exploded (s, subvector) rows. -1 signals a
    * null array element.
    */
  def assignAt(s: Int, sv: ArrayData,
               books: Array[Array[Array[Double]]]): Int =
    assign(sv, books(s))

  /** The query's RAW (unfloored) distance to each codeword — the ADC
    * lookup table; the retriever floors only the summed distance,
    * mirroring the oracle. Null (SQL null result) when the subvector
    * carries a null element.
    */
  def lut(sv: ArrayData, books: Array[Array[Double]]): ArrayData = {
    if (books.length > 0 && hasNullElement(sv, books(0).length))
      return null
    val out = new Array[Double](books.length)
    var j = 0
    while (j < books.length) { out(j) = l2sq(sv, books(j)); j += 1 }
    new GenericArrayData(out)
  }

  private[functions] def checkFloatArray(t: DataType,
                                         name: String): TypeCheckResult =
    t match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name requires array<float>, got $other")
    }
}

/** Codeword id (int) of `child` (array&lt;float&gt; subvector) under one
  * subspace's k×subDim codebook.
  */
case class PqAssignExpr(child: Expression, books: Array[Array[Double]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    PqExprs.checkFloatArray(child.dataType, prettyName)

  override def dataType: DataType = IntegerType

  // a null array ELEMENT nulls the code even when the array itself is
  // non-nullable
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val r = PqExprs.assign(input.asInstanceOf[ArrayData], books)
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("books", books, "double[][]")
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.PqExprs.assign($c, $ref);
      |if (${ev.value} < 0) { ${ev.isNull} = true; }
      |""".stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)

  override def prettyName: String = "pq_assign"
}

/** Codeword id of `right` (subvector) under the `left`-th (int subspace
  * index) of m codebooks — one node for the trainer's whole
  * exploded-subspace assignment projection.
  */
case class PqAssignAtExpr(left: Expression, right: Expression,
                          books: Array[Array[Array[Double]]])
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an int subspace index, got ${left.dataType}")
    else PqExprs.checkFloatArray(right.dataType, prettyName)

  override def dataType: DataType = IntegerType

  override def nullable: Boolean = true

  override def nullSafeEval(s: Any, sv: Any): Any = {
    val r = PqExprs.assignAt(s.asInstanceOf[Int],
      sv.asInstanceOf[ArrayData], books)
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("books", books, "double[][][]")
    nullSafeCodeGen(ctx, ev, (s, sv) => s"""
      |${ev.value} = graft.functions.PqExprs.assignAt($s, $sv, $ref);
      |if (${ev.value} < 0) { ${ev.isNull} = true; }
      |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "pq_assign_at"
}

/** ADC lookup table (array&lt;double&gt; of k raw distances) of `child`
  * (query subvector) under one subspace's codebook.
  */
case class PqLutExpr(child: Expression, books: Array[Array[Double]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    PqExprs.checkFloatArray(child.dataType, prettyName)

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    PqExprs.lut(input.asInstanceOf[ArrayData], books)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("books", books, "double[][]")
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.PqExprs.lut($c, $ref);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)

  override def prettyName: String = "pq_lut"
}
