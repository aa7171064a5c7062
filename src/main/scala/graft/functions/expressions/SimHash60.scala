package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit SimHash with a cross-engine-portable hash family.
  *
  * Identical to [[SimHash64]] except the per-token hash is the top 60
  * bits of md5 (the value of the first 15 hex digits of the digest) —
  * exactly `CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT)` in
  * the oracle engine — so the FULL near-dup pipeline (signatures, chunk
  * bucketing, hamming distances) is reproducible bit-for-bit by any SQL
  * engine with md5. That makes simhash dedup verifiable against an
  * independent oracle instead of rows-only-checkable; xxhash64
  * ([[SimHash64]]) remains the cheaper choice when cross-engine
  * verification is not needed — the two are interchangeable one-line
  * swaps.
  *
  * Single pass over the document bytes; md5 is computed on token byte
  * slices with a thread-local digest (no per-token allocation beyond
  * the digest's own output).
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash60 requires STRING input, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override protected def nullSafeEval(input: Any): Any =
    SimHash60.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.SimHash60.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object SimHash60 {
  val Bits = 60

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Value of the first 15 hex digits of md5(token) — i.e. the top 7.5
    * bytes of the digest, big-endian. Matches the SQL spelling
    * CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT) exactly. */
  private def tokenHash(bytes: Array[Byte], start: Int, len: Int): Long = {
    val md = md5Local.get()
    md.reset()
    md.update(bytes, start, len)
    val d = md.digest()
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    (v << 4) | ((d(7) >> 4) & 0xFL)
  }

  def compute(s: UTF8String): Long = {
    val bytes = s.getBytes
    val votes = new Array[Int](Bits)
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start) {
        val h = tokenHash(bytes, start, i - start)
        var j = 0
        while (j < Bits) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
    }
    var sig = 0L
    var j = 0
    while (j < Bits) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}
