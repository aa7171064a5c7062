package graft.functions.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.LongType
import org.apache.spark.util.sketch.BloomFilter

/** `might_contain` over a TORRENT-BROADCAST Bloom sketch.
  *
  * Spark's own `BloomFilterMightContain` takes the serialized sketch as
  * a foldable child — a plan `Literal` — which rides inside the task
  * binary: every task deserializes the whole closure, so a b-bit sketch
  * costs b/8 bytes of deserialization PER TASK (Spark tolerates this
  * because its runtime filters cap at 2^26 bits = 8 MiB). A curation
  * sketch sized for a 100 TB shingle vocabulary is orders bigger, so
  * this expression carries only the `Broadcast` HANDLE (bytes ship once
  * per executor over torrent), and [[BloomProbe.cached]] pays the
  * bytes→long[] deserialization once per executor JVM, keyed by
  * broadcast id.
  *
  * Child is the 64-bit item hash (e.g. `xxhash64` of the shingle) —
  * same contract as `BloomFilterMightContain`'s value side. `doGenCode`
  * keeps the probe inside whole-stage codegen.
  */
case class BloomProbe(sketch: Broadcast[Array[Byte]], child: Expression)
    extends UnaryExpression with Predicate {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_probe requires a BIGINT item hash, got ${child.dataType.catalogString}")

  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bloom_probe"

  @transient private lazy val filter: BloomFilter = BloomProbe.cached(sketch)

  override protected def nullSafeEval(input: Any): Any =
    filter.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("bloomSketch", sketch,
      "org.apache.spark.broadcast.Broadcast")
    val f = ctx.addMutableState("org.apache.spark.util.sketch.BloomFilter",
      "graftBloom",
      v => s"$v = graft.functions.expressions.BloomProbe.cached($bc);")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $f.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomProbe =
    copy(child = newChild)
}

object BloomProbe {
  /** Once-per-JVM deserialized sketches, keyed by broadcast id. Entries
    * are NOT evicted: sketches are model-sized artifacts (one per
    * contamination pass), not per-query garbage — the map holds as many
    * filters as live contamination pipelines, which is O(1) in practice.
    * `Broadcast.destroy` frees the byte blocks; the deserialized copy
    * lives until executor exit like any cached model. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[java.lang.Long, BloomFilter]()

  def cached(b: Broadcast[Array[Byte]]): BloomFilter =
    cache.computeIfAbsent(b.id,
      (_: java.lang.Long) => BloomFilter.readFrom(new ByteArrayInputStream(b.value)))
}
