package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StructField, StructType}

/** All ordered element pairs {a: arr[i], b: arr[j]} (i < j) of an
  * array, as one native expression — the bucket→candidate-pair
  * expansion at the heart of every LSH-style dedup variant.
  *
  * The declarative spelling (`flatten(transform(arr, (x, i) =>
  * transform(slice(...), ...)))`) is three nested interpreted
  * higher-order functions with a fresh lambda evaluation and slice
  * allocation per element; this is a single m(m-1)/2 loop and keeps
  * the surrounding projection in whole-stage codegen. Callers bound
  * bucket sizes (stop-shingle caps) so the quadratic output is by
  * construction small per bucket.
  *
  * Works for any element type; for sorted input arrays the emitted
  * pairs satisfy a <= b in the array ordering (strictness is the
  * caller's filter, mirroring the oracle's `a.doc < b.doc` join). */
case class OrderedPairs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ordered_pairs requires ARRAY input, got ${other.catalogString}")
  }

  private lazy val elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType
  private lazy val elemNullable: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("a", elemType, elemNullable),
    StructField("b", elemType, elemNullable))), containsNull = false)
  override def prettyName: String = "ordered_pairs"

  override protected def nullSafeEval(input: Any): Any =
    OrderedPairs.compute(input.asInstanceOf[ArrayData], elemType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val et = ctx.addReferenceObj("elemType", elemType)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.OrderedPairs.compute($c, (org.apache.spark.sql.types.DataType) $et)")
  }

  override protected def withNewChildInternal(newChild: Expression): OrderedPairs =
    copy(child = newChild)
}

object OrderedPairs {
  def compute(arr: ArrayData, et: DataType): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any]((n.toLong * (n - 1) / 2).toInt)
    var k = 0
    var i = 0
    while (i < n) {
      val ai = arr.get(i, et)
      var j = i + 1
      while (j < n) {
        out(k) = new GenericInternalRow(Array[Any](ai, arr.get(j, et)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
