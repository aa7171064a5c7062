package graft

import graft.operators.{Dedup, Graphs, Pins}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Pin hygiene (r13 verdict #2) and the checkpoint-mode dial (#3).
  *
  * Hygiene contract: an iterative operator may retain ONLY the pins the
  * returned frame reads — every superseded loop pin and every consumed
  * setup pin is released inside the call. A library user composing
  * several iterative operators in one long session must not accumulate
  * dead storage blocks (the bench harness's between-query janitor
  * masked this; a real caller has no janitor).
  *
  * Mode contract: `spark.graft.checkpointMode=reliable` routes every
  * pin through `Dataset.checkpoint()` (checkpoint-dir files, surviving
  * executor loss) and produces row-for-row identical results — all
  * these operators are deterministic integer arithmetic. */
class PinsSpec extends SparkSpec {
  import spark.implicits._

  private def pinnedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  /** Runs `op`, consumes its result, and returns (result frame, ids of
    * persistent RDDs the call left behind). */
  private def retained(op: => DataFrame): (DataFrame, Set[Int]) = {
    val before = pinnedIds
    val out = op
    out.collect()
    (out, pinnedIds -- before)
  }

  private val edges =
    Seq((1L, 2L), (2L, 1L), (3L, 1L), (3L, 4L), (4L, 5L), (5L, 3L))
      .toDF("s", "t")

  test("pageRank + clusters back-to-back retain only the returned frames' pins") {
    val before = pinnedIds
    val (pr, prNew) = retained(Graphs.pageRank(edges, "s", "t", iters = 5))
    assert(prNew.size == 1,
      s"pageRank must retain exactly its final rank pin, got ${prNew.size}")
    val pairs = Seq((10L, 11L), (11L, 12L), (20L, 21L)).toDF("a", "b")
    val (cl, clNew) = retained(Dedup.clusters(pairs, "a", "b"))
    assert(clNew.size == 1,
      s"clusters must retain exactly its final label pin, got ${clNew.size}")
    // the retained pins are exactly the returned frames' backing blocks:
    // releasing them restores the pre-call block-manager state
    Pins.release(pr, cl)
    assert(pinnedIds == before, "releasing the returned frames restores baseline")
  }

  test("hits retains the nodes pin plus the final mass pins, nothing else") {
    val (out, fresh) = retained(Graphs.hits(edges, "s", "t", iters = 3))
    // nodes + final auth mass + final hub mass back the returned frame
    assert(fresh.size == 3, s"hits should retain 3 pins, got ${fresh.size}")
    Pins.release(out)
    assert((pinnedIds intersect fresh).isEmpty)
  }

  test("bfsDepth, kcore, labelPropagation each retain exactly one pin") {
    val seeds = Seq(1L).toDF("n")
    val (bfs, bNew) = retained(Graphs.bfsDepth(edges, "s", "t", seeds))
    assert(bNew.size == 1, s"bfsDepth: ${bNew.size}")
    val (kc, kNew) = retained(Graphs.kcore(edges, "s", "t", k = 2))
    assert(kNew.size == 1, s"kcore: ${kNew.size}")
    val (lp, lNew) = retained(Graphs.labelPropagation(edges, "s", "t"))
    assert(lNew.size == 1, s"labelPropagation: ${lNew.size}")
    Pins.release(bfs, kc, lp)
    assert((pinnedIds intersect (bNew ++ kNew ++ lNew)).isEmpty)
  }

  test("scc retains only its result-backing pins on both physical paths") {
    val directed = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 4L), (4L, 3L))
      .toDF("s", "t")
    // fast path: one pin (the normalized edge frame the single-task
    // Kosaraju reads)
    val (out, fresh) = retained(Graphs.scc(directed, "s", "t"))
    assert(fresh.size == 1, s"scc local path should retain 1 pin, got ${fresh.size}")
    Pins.release(out)
    assert((pinnedIds intersect fresh).isEmpty)
    // distributed path: the node pin + the extracted-assignment pin
    val (out2, fresh2) =
      retained(Graphs.scc(directed, "s", "t", localThreshold = 0L))
    assert(fresh2.size == 2,
      s"scc distributed path should retain 2 pins, got ${fresh2.size}")
    Pins.release(out2)
    assert((pinnedIds intersect fresh2).isEmpty)
  }

  test("triangles retains its two result-backing pins (degrees + oriented edges)") {
    val (tri, fresh) = retained(Graphs.triangles(edges, "s", "t"))
    assert(fresh.size == 2, s"triangles: ${fresh.size}")
    Pins.release(tri)
    assert((pinnedIds intersect fresh).isEmpty)
  }

  test("released returned frames were the ONLY retained state across a composed session") {
    // the library-user scenario the r13 verdict names: several
    // iterative operators composed in one session must leave the block
    // manager exactly as found once their results are released
    val before = pinnedIds
    val frames = Seq(
      Graphs.pageRank(edges, "s", "t", iters = 4),
      Graphs.hits(edges, "s", "t", iters = 2),
      Graphs.bfsDepth(edges, "s", "t", Seq(1L).toDF("n")),
      Dedup.clusters(Seq((1L, 2L), (2L, 3L)).toDF("a", "b"), "a", "b"))
    frames.foreach(_.collect())
    Pins.release(frames: _*)
    assert(pinnedIds == before)
  }

  test("checkpointMode=reliable produces row-identical results on the L-family fixtures") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt")
    spark.sparkContext.setCheckpointDir(dir.toString)
    def all(): Map[String, Set[Seq[Any]]] = Map[String, DataFrame](
      "pageRank" -> Graphs.pageRank(edges, "s", "t", iters = 5),
      "hits" -> Graphs.hits(edges, "s", "t", iters = 3),
      "bfs" -> Graphs.bfsDepth(edges, "s", "t", Seq(1L).toDF("n")),
      "kcore" -> Graphs.kcore(edges, "s", "t", k = 2),
      "labelProp" -> Graphs.labelPropagation(edges, "s", "t"),
      "clusters" -> Dedup.clusters(Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b"), "a", "b")
    ).map { case (k, df) => k -> df.collect().map(_.toSeq).toSet }
    val local = all()
    spark.conf.set(Pins.ModeKey, "reliable")
    try {
      val reliable = all()
      local.keys.foreach { k =>
        assert(reliable(k) == local(k), s"$k diverged between checkpoint modes")
      }
    } finally {
      spark.conf.unset(Pins.ModeKey)
      org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
    }
  }

  test("pin stats stay capped across iterative re-pinning (no BigInt digit explosion)") {
    // checkpoint copies the origin plan's size estimate onto the new
    // leaf; the size-only estimator multiplies join children, so
    // un-capped iterative pins DOUBLE their sizeInBytes digit count
    // per round (measured 6 -> 1310 digits in 8 rounds) and melt the
    // driver in million-digit stats multiplications past ~20 rounds —
    // the L13 probe hang that motivated the cap
    val cap = BigInt(Long.MaxValue)
    var a = Pins.pin(Seq.tabulate(64)(i => (i.toLong, i.toLong)).toDF("k", "v"))
    for (_ <- 1 to 6) {
      val joined = a.join(a.select(col("k"), col("v").as("v2")), "k")
        .select(col("k"), col("v"))
      val next = Pins.pin(joined)
      Pins.release(a)
      a = next
      val size = a.queryExecution.analyzed.stats.sizeInBytes
      assert(size <= cap, s"pin stats exceeded the cap: $size")
    }
    Pins.release(a)
  }

  test("pins debug guard: a pin over a RELEASED pin fails immediately with a named error") {
    // the r14-advice seam: without the guard, a misplaced release on a
    // localCheckpoint leaf (no lineage to recompute from) surfaces as a
    // missing-block failure far from the bug; with
    // spark.graft.pins.debug=true the NEXT pin names the misuse site
    spark.conf.set(Pins.DebugKey, "true")
    try {
      val a = Pins.pin(Seq((1L, 2L), (3L, 4L)).toDF("k", "v"))
      val downstream = a.select(col("k"), (col("v") + 1).as("v"))
      Pins.release(a) // WRONG: downstream still reads a's blocks
      val e = intercept[IllegalStateException] { Pins.pin(downstream) }
      assert(e.getMessage.contains("RELEASED pin") &&
        e.getMessage.contains("released at"), e.getMessage)
      // live pins stay silent: a fresh pin chain is unaffected
      val b = Pins.pin(Seq(1L).toDF("x"))
      val c = Pins.pin(b.select((col("x") + 1).as("x")))
      assert(c.count() == 1)
      Pins.release(b, c)
    } finally spark.conf.unset(Pins.DebugKey)
    // and OFF by default: the same misuse is not intercepted (it would
    // surface at action time) — the guard must cost nothing when unset
    val a2 = Pins.pin(Seq(5L).toDF("x"))
    val down2 = a2.select(col("x"))
    Pins.release(a2)
    Pins.release(Pins.pin(spark.range(1).toDF("x"))) // no exception path
    assert(down2 != null)
  }

  test("capStats preserves the origin rowCount and attributeStats when capping") {
    // build a frame whose pinned stats exceed the cap (self-join digit
    // growth), then assert the capped leaf kept the origin row count
    // metadata shape (r14 advice: the old rebuild dropped it)
    var a = Pins.pin(Seq((1L, 1L), (2L, 2L)).toDF("k", "v"))
    (0 until 12).foreach { _ =>
      val joined = a.join(a.select(col("k"), col("v").as("v2")), "k")
        .select(col("k"), col("v"))
      val next = Pins.pin(joined)
      Pins.release(a)
      a = next
    }
    val st = a.queryExecution.analyzed.stats
    assert(st.sizeInBytes <= BigInt(Long.MaxValue))
    Pins.release(a)
  }

  test("checkpointMode validation: a bogus mode fails loudly, naming the conf key") {
    val df = Seq(1L).toDF("x")
    spark.conf.set(Pins.ModeKey, "bogus")
    try {
      val e = intercept[IllegalArgumentException] { Pins.pin(df) }
      assert(e.getMessage.contains(Pins.ModeKey))
    } finally spark.conf.unset(Pins.ModeKey)
  }
}
