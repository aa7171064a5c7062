package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Average-hash perceptual fingerprint over a binary payload: bit `j`
  * set iff payload slot `j`'s byte mass is above the payload's average
  * slot mass (`slots · sum_j > total` — pure integer compare, no float
  * threshold, bit-exact in any engine). The block-mean aHash every
  * image-dedup pipeline starts with, computed here on byte-slot sums (a
  * real decoder swaps in pixel block means; the hash construction is
  * unchanged). ≤ 60 bits so the signature and every downstream
  * chunk/hamming stage stays positive BIGINT ([[SimHash60]]'s
  * contract); empty payloads hash to 0.
  *
  * A [[TextProfile]]-style native expression — one codegen'd pass over
  * the payload bytes in the projection — replacing the Dataset
  * `mapPartitions` spelling that broke whole-stage codegen for the g5
  * signing pass (a REAL decoder needs mapPartitions for codec-handle
  * amortization; the stub doesn't).
  */
case class PerceptualHash(child: Expression, slots: Int)
    extends UnaryExpression {
  require(slots > 0 && slots <= 60, s"slots must be in [1, 60], got $slots")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"perceptual_hash requires BINARY input, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "perceptual_hash"

  override protected def nullSafeEval(input: Any): Any =
    PerceptualHash.compute(input.asInstanceOf[Array[Byte]], slots)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.PerceptualHash.compute($c, $slots)")

  override protected def withNewChildInternal(newChild: Expression): PerceptualHash =
    copy(child = newChild)
}

object PerceptualHash {
  def compute(bytes: Array[Byte], slots: Int): Long = {
    val sums = new Array[Long](slots)
    var i = 0
    while (i < bytes.length) { sums(i % slots) += (bytes(i) & 0xFF); i += 1 }
    var total = 0L
    var j = 0
    while (j < slots) { total += sums(j); j += 1 }
    var h = 0L
    j = 0
    while (j < slots) {
      if (slots * sums(j) > total) h |= (1L << j)
      j += 1
    }
    h
  }
}
