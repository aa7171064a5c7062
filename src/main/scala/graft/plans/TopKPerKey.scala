package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** How the rank bound treats ties — which window function the operator
  * subsumes. */
sealed trait TopKMode
object TopKMode {
  /** `row_number()`: exactly k rows per key, order must be total. */
  case object RowNum extends TopKMode
  /** `rank()`: all rows ranked ≤ k; ties share a rank and ALL tied
    * rows are kept (output per key can exceed k). */
  case object Ranked extends TopKMode
  /** `dense_rank()`: all rows of the k best distinct order values. */
  case object Dense extends TopKMode
}

/** Whole-operator top-k-per-key, as custom plan machinery.
  *
  * The declarative spelling — `row_number().over(partitionBy(keys)
  * .orderBy(ord)) <= k` — plans as Exchange → FULL SORT of every
  * group → Window → Filter. At 100 TB the sort dominates: every row of
  * every group is shuffled and sorted even though only k survive.
  *
  * This operator keeps a bounded heap of k rows per key, applied TWICE
  * (the aggregation partial/final pattern): a pre-shuffle pass caps
  * each map partition's contribution at k rows per key, so the exchange
  * moves at most (#map partitions × k) rows per key instead of the whole
  * group, and a post-shuffle pass produces the exact result with ranks.
  * No sort of group bodies ever happens; per-partition memory is
  * bounded by (keys-in-partition × k) rows, like a partial aggregate.
  *
  * [[TopKMode.Ranked]]/[[TopKMode.Dense]] admit ties: the per-key
  * structure becomes at most k GROUPS of order-tied rows (a k-capped
  * tree of (value → tied rows)), every tied row retained — the k+1-th
  * best group always has ≥ k rows ranked before it, so the cap is
  * exact for both modes. Memory/output per key is k groups × tie
  * multiplicity — unbounded only where the ANSWER itself is (rank ≤ k
  * admits unbounded ties); that is the window function's contract, not
  * an operator defect.
  *
  * Determinism: ranks follow `order`; for RowNum make it a total order
  * (include a unique tiebreak column) for stable output — the same
  * requirement `row_number` has. The tied modes are deterministic as a
  * ROW SET by construction (all ties kept).
  */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                      rankAttr: AttributeReference, child: LogicalPlan,
                      mode: TopKMode)
    extends UnaryNode {
  require(k >= 1)
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

object TopKPerKey {
  import org.apache.spark.sql.graft.ColumnBridge

  /** DataFrame API: top `k` rows per `keys` group in `order`, with a
    * rank column appended. Drop-in for the window row_number pattern
    * (or rank/dense_rank via `mode`). */
  def apply(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int,
            rankName: String = "rnk",
            mode: TopKMode = TopKMode.RowNum): DataFrame = {
    val sortOrders = order.map(c => ColumnBridge.catalystExpression(c) match {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    })
    val rank = AttributeReference(rankName, IntegerType, nullable = false)()
    GraftStrategy.ensureRegistered(df.sparkSession)
    ColumnBridge.ofRows(df.sparkSession,
      TopKPerKey(keys.map(ColumnBridge.catalystExpression), sortOrders, k, rank,
        ColumnBridge.logicalPlan(df), mode))
  }
}

/** Plans [[TopKPerKey]] as partial → (shuffle on keys) → final. */
object GraftStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, rank, child, mode) =>
      TopKPerKeyFinalExec(keys, order, k, rank,
        TopKPerKeyPartialExec(keys, order, k, planLater(child), mode), mode) :: Nil
    case _ => Nil
  }

  /** Idempotently add the strategy to a built session (the
    * `spark.sql.extensions` path covers cluster deployment). */
  def ensureRegistered(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(GraftStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GraftStrategy
    }
}

/** Shared per-partition bounded top-k: key → heap of (at most k) rows,
  * heap root = currently-worst kept row for O(log k) replacement.
  *
  * `maxKeysInFlight` bounds memory under extreme key cardinality: when
  * the map exceeds it, all current heaps are FLUSHED downstream and the
  * map restarts. Flushing is exact, not approximate — a row of the true
  * partition top-k can only be evicted from a heap by k better rows of
  * the SAME partition, which would contradict it being in the top-k, so
  * every true top-k row survives in some flushed heap and the final
  * pass sees it. The partial stage then degrades gracefully from
  * "at most k rows per key" toward pass-through instead of OOMing —
  * the same safety property hash aggregation gets from spilling. */
private[plans] object BoundedTopK {
  type Heap = java.util.PriorityQueue[InternalRow]

  def run(iter: Iterator[InternalRow], keys: Seq[Expression], order: Seq[SortOrder],
          k: Int, attrs: Seq[Attribute],
          maxKeysInFlight: Int = Int.MaxValue): Iterator[(UnsafeRow, Heap)] =
    new Iterator[(UnsafeRow, Heap)] {
      private val keyProj = UnsafeProjection.create(keys, attrs)
      private val ordering = RowOrdering.create(order, attrs)
      private var current: java.util.Iterator[java.util.Map.Entry[UnsafeRow, Heap]] =
        java.util.Collections.emptyIterator()
      private var pending: InternalRow = _ // row that forced the last flush

      private def insert(heaps: java.util.LinkedHashMap[UnsafeRow, Heap],
                         row: InternalRow, key: UnsafeRow): Unit = {
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new Heap(k + 1, ordering.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < k) heap.add(row.copy())
        else if (ordering.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy())
        }
      }

      // builds the next batch of heaps; stops early (emitting what it
      // has) when the in-flight key cap is reached, so memory stays
      // bounded no matter the partition's key cardinality
      private def consume(): Unit = {
        val heaps = new java.util.LinkedHashMap[UnsafeRow, Heap]()
        if (pending != null) {
          insert(heaps, pending, keyProj(pending)); pending = null
        }
        var flushNow = false
        while (!flushNow && iter.hasNext) {
          val row = iter.next()
          val key = keyProj(row)
          if (heaps.get(key) == null && heaps.size >= maxKeysInFlight) {
            pending = row.copy(); flushNow = true
          } else insert(heaps, row, key)
        }
        current = heaps.entrySet().iterator()
      }

      override def hasNext: Boolean = {
        while (!current.hasNext && (pending != null || iter.hasNext)) consume()
        current.hasNext
      }
      override def next(): (UnsafeRow, Heap) = {
        if (!hasNext) throw new NoSuchElementException
        val e = current.next()
        (e.getKey, e.getValue)
      }
    }
}

/** Ties-aware sibling of [[BoundedTopK]]: per key, a tree of at most k
  * GROUPS (order value → all tied rows). Retention is exact under the
  * k-group cap because each group holds ≥ 1 row, so the k+1-th best
  * group has ≥ k rows ranked strictly before it — rank > k under both
  * tied modes. The same flush valve applies per key-count; a flushed
  * group's rows survive to the final pass by the argument above
  * applied per partition. */
private[plans] object BoundedTopKGroups {
  type Groups = java.util.TreeMap[InternalRow, java.util.ArrayList[InternalRow]]

  def run(iter: Iterator[InternalRow], keys: Seq[Expression], order: Seq[SortOrder],
          k: Int, attrs: Seq[Attribute],
          maxKeysInFlight: Int = Int.MaxValue): Iterator[(UnsafeRow, Groups)] =
    new Iterator[(UnsafeRow, Groups)] {
      private val keyProj = UnsafeProjection.create(keys, attrs)
      private val ordering = RowOrdering.create(order, attrs)
      private var current: java.util.Iterator[java.util.Map.Entry[UnsafeRow, Groups]] =
        java.util.Collections.emptyIterator()
      private var pending: InternalRow = _ // row that forced the last flush

      private def insert(heaps: java.util.LinkedHashMap[UnsafeRow, Groups],
                         row: InternalRow, key: UnsafeRow): Unit = {
        var groups = heaps.get(key)
        if (groups == null) {
          groups = new Groups(ordering)
          heaps.put(key.copy(), groups)
        }
        val tied = groups.get(row) // comparator equality = order-value tie
        if (tied != null) tied.add(row.copy())
        else if (groups.size < k || ordering.compare(row, groups.lastKey()) < 0) {
          if (groups.size >= k) groups.remove(groups.lastKey())
          val l = new java.util.ArrayList[InternalRow](1)
          val copy = row.copy()
          l.add(copy)
          groups.put(copy, l)
        }
      }

      private def consume(): Unit = {
        val heaps = new java.util.LinkedHashMap[UnsafeRow, Groups]()
        if (pending != null) {
          insert(heaps, pending, keyProj(pending)); pending = null
        }
        var flushNow = false
        while (!flushNow && iter.hasNext) {
          val row = iter.next()
          val key = keyProj(row)
          if (heaps.get(key) == null && heaps.size >= maxKeysInFlight) {
            pending = row.copy(); flushNow = true
          } else insert(heaps, row, key)
        }
        current = heaps.entrySet().iterator()
      }

      override def hasNext: Boolean = {
        while (!current.hasNext && (pending != null || iter.hasNext)) consume()
        current.hasNext
      }
      override def next(): (UnsafeRow, Groups) = {
        if (!hasNext) throw new NoSuchElementException
        val e = current.next()
        (e.getKey, e.getValue)
      }
    }
}

/** Map-side cap: at most k rows (RowNum) or k tied groups (Ranked /
  * Dense) per key leave each input partition. Emits plain child rows
  * (no rank yet); partitioning is preserved. */
case class TopKPerKeyPartialExec(keys: Seq[Expression], order: Seq[SortOrder],
                                 k: Int, child: SparkPlan,
                                 mode: TopKMode = TopKMode.RowNum)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val (ks, ord, n, attrs, m) = (keys, order, k, child.output, mode)
    // memory valve for extreme key cardinality (see BoundedTopK); the
    // FINAL exec never flushes — it must see every row of a key — so
    // the cap only loosens the map-side reduction, never correctness
    val maxKeys = conf.getConfString(
      "spark.graft.topk.maxKeysInFlight", "1000000").toInt
    child.execute().mapPartitions({ iter =>
      import scala.jdk.CollectionConverters._
      if (m == TopKMode.RowNum)
        BoundedTopK.run(iter, ks, ord, n, attrs, maxKeys)
          .flatMap { case (_, heap) => heap.iterator().asScala }
      else
        BoundedTopKGroups.run(iter, ks, ord, n, attrs, maxKeys)
          .flatMap { case (_, groups) =>
            groups.values().iterator().asScala.flatMap(_.iterator().asScala)
          }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyPartialExec =
    copy(child = newChild)
}

/** Reduce side: exact top-k with ranks; requires co-location by keys
  * (EnsureRequirements inserts the single exchange). */
case class TopKPerKeyFinalExec(keys: Seq[Expression], order: Seq[SortOrder],
                               k: Int, rankAttr: AttributeReference,
                               child: SparkPlan,
                               mode: TopKMode = TopKMode.RowNum)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)
  override def requiredChildDistribution: Seq[Distribution] =
    if (keys.isEmpty) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val (ks, ord, n, attrs, out, rank, m) =
      (keys, order, k, child.output, output, rankAttr, mode)
    child.execute().mapPartitions({ iter =>
      import scala.jdk.CollectionConverters._
      val ordering = RowOrdering.create(ord, attrs)
      val proj = UnsafeProjection.create(out, attrs :+ rank)
      val joined = new JoinedRow
      val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      if (m == TopKMode.RowNum)
        BoundedTopK.run(iter, ks, ord, n, attrs).flatMap { case (_, heap) =>
          val arr = heap.toArray(new Array[InternalRow](heap.size))
          java.util.Arrays.sort(arr, ordering)
          arr.iterator.zipWithIndex.map { case (row, i) =>
            rankRow.update(0, i + 1)
            proj(joined(row, rankRow))
          }
        }
      else
        BoundedTopKGroups.run(iter, ks, ord, n, attrs).flatMap { case (_, groups) =>
          // groups iterate in rank order; emit every tied row with its
          // group's rank, stopping once the rank bound is passed (Ranked
          // ranks grow by group size, so later groups can overshoot k
          // even within the k-group cap)
          var cum = 0
          var dense = 0
          groups.entrySet().iterator().asScala.flatMap { e =>
            dense += 1
            val rk = if (m == TopKMode.Dense) dense else cum + 1
            cum += e.getValue.size()
            if (rk > n) Iterator.empty
            else e.getValue.iterator().asScala.map { row =>
              rankRow.update(0, rk)
              proj(joined(row, rankRow))
            }
          }
        }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyFinalExec =
    copy(child = newChild)
}
