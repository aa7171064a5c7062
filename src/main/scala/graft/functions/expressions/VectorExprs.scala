package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native vector math over `array<double>` embedding columns.
  *
  * The declarative forms (`aggregate(zip_with(a, b, _*_), 0d, _+_)`)
  * are interpreted — higher-order functions fall out of whole-stage
  * codegen and allocate per element. These expressions are single
  * primitive loops, codegen'd via static calls, and keep the EXACT
  * sequential left-fold accumulation order of the declarative versions
  * (and of DuckDB's `list_reduce`), so cross-engine results stay
  * bit-identical before rounding.
  *
  * Element nulls are not supported (embedding vectors are dense);
  * a null element surfaces as the standard toDoubleArray error.
  */
object VectorExprs {
  private[expressions] def checkVec(e: Expression, name: String): TypeCheckResult =
    e.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name requires array<double>, got ${other.catalogString}")
    }

  def dot(a: ArrayData, b: ArrayData): Double = {
    val x = a.toDoubleArray(); val y = b.toDoubleArray()
    val n = math.min(x.length, y.length)
    var s = 0.0d; var i = 0
    while (i < n) { s += x(i) * y(i); i += 1 }
    s
  }

  def pqAdc(codes: ArrayData, qtab: ArrayData): Double = {
    val n = math.min(codes.numElements(), qtab.numElements())
    var s = 0.0d; var i = 0
    while (i < n) {
      val row = qtab.getArray(i)
      val code = codes.getInt(i)
      // pq_adc is a public SQL function: an out-of-range code against
      // UnsafeArrayData would silently read out-of-bounds memory and
      // return garbage — fail loudly instead (the branch is noise next
      // to the table lookup)
      if (code < 0 || code >= row.numElements())
        throw new IllegalArgumentException(
          s"pq_adc: code $code at subspace $i out of range " +
            s"[0, ${row.numElements()})")
      s += row.getDouble(code)
      i += 1
    }
    s
  }

  def l2normalize(a: ArrayData): ArrayData = {
    val x = a.toDoubleArray()
    var s = 0.0d; var i = 0
    while (i < x.length) { s += x(i) * x(i); i += 1 }
    val nrm = math.sqrt(s)
    val out = new Array[Double](x.length)
    i = 0
    while (i < x.length) { out(i) = x(i) / nrm; i += 1 }
    new GenericArrayData(out)
  }
}

/** Dot product of two `array<double>` columns (length = min of both,
  * matching `zip_with` semantics). */
case class VectorDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    Seq(VectorExprs.checkVec(left, prettyName), VectorExprs.checkVec(right, prettyName))
      .find(_ != TypeCheckResult.TypeCheckSuccess)
      .getOrElse(TypeCheckResult.TypeCheckSuccess)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorExprs.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.VectorExprs.dot($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VectorDot = copy(left = newLeft, right = newRight)
}

/** PQ asymmetric-distance accumulation: `Σᵢ qtab[i][codes[i]]` over an
  * `array<int>` code vector and an `array<array<double>>` per-query
  * lookup table — the ADC inner loop (Jégou et al. TPAMI'11 eq. 13).
  * The declarative `aggregate(zip_with(codes, qtab, ...))` spelling is
  * interpreted (HOFs fall out of whole-stage codegen) and allocates a
  * zipped array per CANDIDATE — measured 44× at a 16× corpus probe
  * before this expression; the scan is the hot path the m-byte index
  * exists for, so it gets the same native treatment as [[VectorDot]].
  * Accumulation order is ascending subspace index on both paths. */
case class PqAdc(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.IntegerType, _),
            ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<int>, array<array<double>>), " +
          s"got (${l.catalogString}, ${r.catalogString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorExprs.pqAdc(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.VectorExprs.pqAdc($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqAdc = copy(left = newLeft, right = newRight)
}

/** `v / ||v||₂` in one pass (norm accumulated in ascending index order,
  * like the `aggregate` fold it replaces). */
case class L2Normalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "l2_normalize"

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprs.checkVec(child, prettyName)

  override protected def nullSafeEval(a: Any): Any =
    VectorExprs.l2normalize(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.expressions.VectorExprs.l2normalize($a)")

  override protected def withNewChildInternal(newChild: Expression): L2Normalize =
    copy(child = newChild)
}
