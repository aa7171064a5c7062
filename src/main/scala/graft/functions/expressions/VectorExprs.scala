package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

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

  def longDot(a: ArrayData, b: ArrayData): Long = {
    val x = a.toLongArray(); val y = b.toLongArray()
    val n = math.min(x.length, y.length)
    var s = 0L; var i = 0
    while (i < n) { s += x(i) * y(i); i += 1 }
    s
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
/** Exact long-array dot product — the integer companion of
  * [[VectorDot]] for fixed-point vectors (F20/F21): products up to
  * ~10^12 and 64-element sums exceed 2^53, so a double accumulation
  * would silently lose exactness; this keeps every step a long. The
  * declarative `aggregate(zip_with(...))` spelling is interpreted and
  * allocates per element — on F21's within-cell pair expansion that
  * was the dominant cost. */
case class LongVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "long_vector_dot"

  private def checkLongVec(e: Expression): TypeCheckResult =
    e.dataType match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got ${other.catalogString}")
    }

  override def checkInputDataTypes(): TypeCheckResult =
    Seq(checkLongVec(left), checkLongVec(right))
      .find(_ != TypeCheckResult.TypeCheckSuccess)
      .getOrElse(TypeCheckResult.TypeCheckSuccess)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorExprs.longDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.VectorExprs.longDot($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): LongVectorDot =
    copy(left = newLeft, right = newRight)
}

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

/** A trained PQ codebook evaluated as one native loop. The declarative
  * spelling (m subspace `slice`s, then per code an `array_max` over
  * `struct(dot − ‖c‖²/2, code)`) allocates m·nCodes structs + m arrays
  * PER ROW and bloats codegen with m·nCodes expression subtrees; the
  * encode pass is corpus × dim × nCodes multiplies — the hottest PQ
  * pass after the ADC scan, and the reason [[PqEncode]] gets the same
  * native treatment as [[PqAdc]]. Argmin L2 is spelled argmax of
  * `x·c − ‖c‖²/2` (the `‖x‖²` term is constant per row). Bit-equal to
  * the declarative form: dots accumulate in ascending index order,
  * `‖c‖²` uses the same sequential fold, and score comparison mirrors
  * Spark's struct ordering (`==` short-circuit so −0.0 ties 0.0, then
  * `Double.compare` so NaN is greatest; ties to the higher code). A
  * vector shorter than `sub·d` contributes an empty dot (= `slice`
  * past the end), matching the min-length dot contract. */
class PqCodebook(cb: Array[Array[Array[Double]]]) extends Serializable {
  private val halfSS: Array[Array[Double]] = cb.map(_.map { cv =>
    var s = 0.0d; var i = 0
    while (i < cv.length) { s += cv(i) * cv(i); i += 1 }
    s / 2
  })

  def encode(a: ArrayData): ArrayData = {
    val x = a.toDoubleArray()
    val out = new Array[Int](cb.length)
    var sub = 0; var off = 0
    while (sub < cb.length) {
      val codes = cb(sub); val hs = halfSS(sub)
      var best = 0.0d; var bestCode = 0
      var code = 0
      while (code < codes.length) {
        val cv = codes(code)
        var s = 0.0d; var j = 0
        val n = math.min(cv.length, x.length - off)
        while (j < n) { s += x(off + j) * cv(j); j += 1 }
        s -= hs(code)
        val cmp = if (s == best) 0 else java.lang.Double.compare(s, best)
        if (code == 0 || cmp >= 0) { best = s; bestCode = code }
        code += 1
      }
      out(sub) = bestCode
      if (codes.nonEmpty) off += codes(0).length
      sub += 1
    }
    new GenericArrayData(out)
  }
}

/** PQ code assignment against a driver-trained [[PqCodebook]]:
  * `array<double>` vector → `array<int>` of `m` subspace codes. The
  * model rides the codegen reference array (one object per executor),
  * not the expression tree. */
case class PqEncode(child: Expression, model: PqCodebook) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprs.checkVec(child, prettyName)

  override protected def nullSafeEval(a: Any): Any =
    model.encode(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebook", model, classOf[PqCodebook].getName)
    defineCodeGen(ctx, ev, a => s"$ref.encode($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Trained IVF centroids evaluated as one native argmax loop — the
  * corpus-side cell assignment ([[BestCell]]), replacing an `array_max`
  * over nCells `struct(dot, cell)` subtrees that allocated per row.
  * Comparison is lexicographic on (score, cell id) with the same
  * double semantics as [[PqCodebook]] — exactly Spark's struct-max
  * tie-break (highest dot, ties to the highest cell id), which is also
  * the oracle's `ORDER BY dot DESC, cell DESC` pick. */
class CellCentroids(cids: Array[Int], cents: Array[Array[Double]])
    extends Serializable {
  require(cids.length == cents.length, "cell ids and centroids must align")

  def best(a: ArrayData): Int = {
    val x = a.toDoubleArray()
    var bestS = 0.0d; var bi = 0
    var i = 0
    while (i < cents.length) {
      val cv = cents(i)
      var s = 0.0d; var j = 0
      val n = math.min(cv.length, x.length)
      while (j < n) { s += x(j) * cv(j); j += 1 }
      val cmp = if (s == bestS) 0 else java.lang.Double.compare(s, bestS)
      if (i == 0 || cmp > 0 || (cmp == 0 && cids(i) > cids(bi))) {
        bestS = s; bi = i
      }
      i += 1
    }
    cids(bi)
  }
}

/** IVF cell assignment against driver-trained [[CellCentroids]]:
  * `array<double>` vector → `int` cell id. */
case class BestCell(child: Expression, model: CellCentroids) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "best_cell"

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprs.checkVec(child, prettyName)

  override protected def nullSafeEval(a: Any): Any =
    model.best(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cellCentroids", model, classOf[CellCentroids].getName)
    defineCodeGen(ctx, ev, a => s"$ref.best($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): BestCell =
    copy(child = newChild)
}
