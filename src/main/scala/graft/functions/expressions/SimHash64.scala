package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a document as ONE native expression.
  *
  * Semantics (bit-identical to the declarative pipeline it replaces):
  * tokens = runs of non-whitespace (Java regex `\s` ASCII class) of the
  * input string; per token OCCURRENCE h = Spark `xxhash64(token)` (XXH64
  * over the token's UTF-8 bytes, seed 42); vote(j) += bit j of h ? +1 :
  * -1; signature bit j = vote(j) > 0. Zero tokens → signature 0.
  *
  * Why an expression: the explode → xxhash64 → 64-conditional-sum
  * groupBy formulation shuffles one row per token occurrence and runs a
  * 64-column aggregation; this is a single pass over the document bytes
  * in the projection — no explode, no shuffle, no per-token UTF8String
  * allocation (tokens are hashed as slices of the doc's byte array) —
  * and `doGenCode` keeps the projection inside whole-stage codegen.
  *
  * Reference analog: content fingerprinting for near-dup detection of
  * training documents (SURVEY.md §2 E4).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires STRING input, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  private val Seed = 42L // Spark's xxhash64 default seed

  private def isWs(b: Byte): Boolean = // Java regex \s (ASCII); all 1-byte in UTF-8
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Single pass: tokenize bytes → hash slice → bit votes. Called from
    * both the interpreted path and the generated code. */
  def compute(s: UTF8String): Long = {
    val bytes = s.getBytes
    val votes = new Array[Int](64)
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start) {
        val h = XXH64.hashUnsafeBytes(
          bytes, Platform.BYTE_ARRAY_OFFSET + start, i - start, Seed)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}
