package graft

import graft.streaming.IotStreamPipeline
import org.apache.spark.sql.functions._
import java.nio.file.Files

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def landEvents(dir: String): Unit = {
    // land the sf0.001 events as the streaming source's input files
    val ev = graft.sources.Tables.events(spark, sf)
    ev.coalesce(2).write.mode("overwrite").parquet(dir)
  }

  /** Shared arrival fixture for streaming==batch maintenance specs:
    * land `df` into `dir` split into sequential micro-batches (the
    * cursor-order delivery contract a change-stream source provides),
    * calling `afterEach` — in practice `q.processAllAvailable()` —
    * after each split lands.
    *
    * r12 verdict next-round #5: the split COUNT (2–4) and split POINTS
    * (random quantiles of the split column) are drawn from a logged
    * seed (`SPARK_GRAFT_STREAM_FUZZ_SEED`, annotated into every
    * failure message by `withFixture`) instead of the old fixed
    * median — a state bug that only shows at an unlucky arrival
    * boundary (a split exactly at a session gap or SCD2 flip instant)
    * now has fresh chances every seed, while any one run stays fully
    * reproducible (per-call RNG = seed + call index, and tests run
    * sequentially in declaration order). Quantile cuts can coincide —
    * an empty micro-batch is a legal (and useful) arrival. */
  private def landTimeSplit(df: org.apache.spark.sql.DataFrame, dir: String,
                            tsCol: String = "ts")(afterEach: () => Unit): Unit = {
    val r = StreamFuzz.nextRng()
    val nBatches = 2 + r.nextInt(3)
    val qs = Seq.fill(nBatches - 1)(0.1 + r.nextDouble() * 0.8).sorted
    val cuts = df
      .agg(expr(s"percentile_approx(cast($tsCol as double), " +
        s"array(${qs.mkString(", ")}), 10000)"))
      .head().getSeq[Double](0)
    val v = col(tsCol).cast("double")
    val batches = (Option.empty[Double] +: cuts.map(Option(_)))
      .zip(cuts.map(Option(_)) :+ Option.empty[Double])
      .map { case (lo, hi) =>
        (lo.map(v > _).getOrElse(lit(true))
          && hi.map(v <= _).getOrElse(lit(true)))
      }
    batches.zipWithIndex.foreach { case (pred, i) =>
      df.filter(pred).coalesce(1)
        .write.mode(if (i == 0) "overwrite" else "append").parquet(dir)
      afterEach()
    }
  }

  /** Every failure carries the stream-fuzz seed so an unlucky-boundary
    * repro is one env var away. */
  override def withFixture(test: NoArgTest): org.scalatest.Outcome =
    super.withFixture(test) match {
      case org.scalatest.Failed(ex) =>
        org.scalatest.Failed(new Exception(
          s"[stream-fuzz seed=${StreamFuzz.seed} — rerun with " +
            s"SPARK_GRAFT_STREAM_FUZZ_SEED=${StreamFuzz.seed}] " +
            ex.getMessage, ex))
      case o => o
    }

  /** Run an update-mode maintained-table stream, upserting each emitted
    * row into a keyed map (the idempotent keyed-sink contract of
    * sinkToJdbc) while `land` delivers arrivals; returns the final
    * maintained rows. */
  private def maintainedRows[T <: Product : _root_.scala.reflect.runtime.universe.TypeTag](
      stream: org.apache.spark.sql.DataFrame, keyOf: T => Any)(
      land: (() => Unit) => Unit): Seq[T] = {
    val table = scala.collection.mutable.Map.empty[Any, T]
    val enc = org.apache.spark.sql.Encoders.product[T]
    val q = stream.writeStream.outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.as[T](enc).collect().foreach(r => table(keyOf(r)) = r)
      }.start()
    try land(() => q.processAllAvailable()) finally q.stop()
    table.values.toSeq
  }

  test("text curation runs unchanged on a document stream (scores == batch)") {
    import graft.functions.TextFunctions
    // the curation scoring surface is pure projection work (native
    // expressions, no shuffle) — it must compose with readStream as-is,
    // which is what makes streaming corpus intake possible
    val dir = Files.createTempDirectory("graft-stream-docs").toString
    val docs = graft.sources.Tables.documents(spark, sf)
    docs.coalesce(2).write.mode("overwrite").parquet(dir)
    def curate(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), col("lang"),
          TextFunctions.textProfile(lower(col("text"))).as("p"), col("text"))
        .select(col("doc_id"), col("lang"),
          TextFunctions.qualityScoreFromProfile(col("text"), col("p")).as("q"),
          TextFunctions.langIdFromProfile(col("p")).as("pred_lang"))
        .filter(col("q") >= 0.5 && col("pred_lang") === col("lang"))
    val stream = curate(spark.readStream
      .schema(docs.schema).parquet(dir))
    assert(stream.isStreaming)
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("curated_stream").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("curated_stream")
    val want = curate(docs)
    assert(got.count() == want.count() && want.count() > 0)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("contamination probe runs on a document stream against an offline sketch (== batch)") {
    import graft.operators.Curation
    // the deployment shape: sketch trained ONCE offline (a persisted
    // model artifact), every incoming eval batch/stream probed against
    // its broadcast — the BloomProbe expression must be streaming-legal
    // (stateless codegen'd projection; the per-doc ratio is a standard
    // streaming aggregation under complete output)
    val dir = Files.createTempDirectory("graft-stream-contam").toString
    val docs = graft.sources.Tables.documents(spark, sf)
    val isEval = col("doc_id") % 20 === 0
    docs.filter(isEval).coalesce(2).write.mode("overwrite").parquet(dir)
    val sketch = Curation.trainContaminationSketch(docs.filter(!isEval),
      "text", 3, expectedItems = 200000L, numBits = 1L << 24)
    val stream = Curation.contaminationBloomWith(
      spark.readStream.schema(docs.schema).parquet(dir),
      "doc_id", "text", 3, sketch)
    assert(stream.isStreaming)
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("contam_stream").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("contam_stream")
    val want = Curation.contaminationBloomWith(docs.filter(isEval),
      "doc_id", "text", 3, sketch)
    assert(got.count() == want.count() && want.count() > 0)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("ngram LM scoring runs on a document stream against an offline model (== batch)") {
    import graft.operators.Curation
    // the train-once/score-many seam, streaming: the char-LM model is a
    // batch-materialized vocab table; scoring is explode + stream-static
    // broadcast join + per-doc aggregation (complete output) — the same
    // deployment shape as the contamination sketch probe
    val dir = Files.createTempDirectory("graft-stream-lm").toString
    val docs = graft.sources.Tables.documents(spark, sf)
    docs.coalesce(2).write.mode("overwrite").parquet(dir)
    val model = Curation.trainCharLm(docs, "text", 3)
    val stream = Curation.ngramLmScoreWith(
      spark.readStream.schema(docs.schema).parquet(dir),
      "doc_id", "text", 3, 6, model)
    assert(stream.isStreaming)
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("lm_stream").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("lm_stream")
    val want = Curation.ngramLmScoreWith(docs, "doc_id", "text", 3, 6, model)
    assert(got.count() == want.count() && want.count() > 0)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("evidence classifier scores a document stream against a frozen model (== batch)") {
    import graft.operators.Curation
    import org.apache.spark.sql.functions.col
    // the H21 distillation, deployed: train once offline, score the
    // incoming document stream — explode + stream-static broadcast
    // join + per-doc agg (complete output), the LM-scoring shape
    val dir = Files.createTempDirectory("graft-stream-evid").toString
    val docs = graft.sources.Tables.documents(spark, sf)
    docs.coalesce(2).write.mode("overwrite").parquet(dir)
    val label = graft.functions.TextFunctions.qualityScoreFromProfile(
      col("text"), graft.functions.TextFunctions.textProfile(
        org.apache.spark.sql.functions.lower(col("text")))) >= 0.5
    val model = Curation.trainEvidenceModel(
      docs.filter(col("doc_id") % 2 === 0), "text", label, vocab = 256)
    val stream = Curation.evidenceScoreWith(
      spark.readStream.schema(docs.schema).parquet(dir),
      "doc_id", "text", model)
    assert(stream.isStreaming)
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("evid_stream").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("evid_stream")
    val want = Curation.evidenceScoreWith(docs, "doc_id", "text", model)
    assert(got.count() == want.count() && want.count() > 0)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("chunking streams as-is; per-batch CMS sketches merge to the batch matrix") {
    import graft.operators.{Curation, Sketches}
    // chunking is a stateless narrow projection → composes with
    // readStream unchanged; the CMS is the streaming heavy-hitters
    // story — each micro-batch builds its own sketch and the cell-wise
    // merge (distributive) maintains exactly the full-corpus matrix,
    // so a maintained sketch never re-reads history
    val dir = Files.createTempDirectory("graft-stream-chunk").toString
    val docs = graft.sources.Tables.documents(spark, sf)
    docs.coalesce(4).write.mode("overwrite").parquet(dir) // 4 splits
    val stream = Curation.chunkTokens(
      spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(dir),
      "doc_id", "text", 64, 16)
    assert(stream.isStreaming)
    var maintained: Option[org.apache.spark.sql.DataFrame] = None
    val q = stream.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val terms = batch.select(
          explode(split(col("chunk_text"), " ")).as("term"))
        val b = Sketches.countMinTable(terms, "term", 4, 64).localCheckpoint()
        maintained = Some(maintained
          .map(Sketches.countMinMerge(_, b)).getOrElse(b).localCheckpoint())
      }.start()
    try q.processAllAvailable() finally q.stop()
    // maintained sketch over the streamed chunks == one batch build
    val batchChunks = Curation.chunkTokens(docs, "doc_id", "text", 64, 16)
    val want = Sketches.countMinTable(
      batchChunks.select(explode(split(col("chunk_text"), " ")).as("term")),
      "term", 4, 64)
    val got = maintained.get
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0
      && want.count() > 0)
  }

  test("silence alerts fire when the watermark passes a quiet device's deadline") {
    import graft.streaming.IotStreamPipeline
    import graft.streaming.IotStreamPipeline.SilenceAlert
    val in = Files.createTempDirectory("graft-silence-in").toString
    def land(rows: Seq[(Long, String)], mode: String): Unit =
      rows.toDF("user_id", "s")
        .select($"user_id", $"s".cast("timestamp").as("ts"))
        .coalesce(1).write.mode(mode).parquet(in)
    // batch 1: devices 1 and 2 alive at 10:00
    land(Seq((1L, "2024-01-01 10:00:00"), (2L, "2024-01-01 10:00:00")),
      "overwrite")
    val schema = spark.read.parquet(in).schema
    val stream = IotStreamPipeline.silenceAlerts(
      spark.readStream.schema(schema).parquet(in), gapSeconds = 3600)
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("silence_out").start()
    try {
      q.processAllAvailable()
      assert(spark.table("silence_out").count() == 0) // nobody late yet
      // batch 2: device 2 keeps reporting; device 1 stays silent — the
      // watermark (driven by device 2) passes 1's 11:00 deadline
      land(Seq((2L, "2024-01-01 13:00:00")), "append")
      q.processAllAvailable()
      // timeout firing needs a following trigger after the watermark
      // advances; an empty-ish extra batch provides it
      land(Seq((2L, "2024-01-01 13:30:00")), "append")
      q.processAllAvailable()
    } finally q.stop()
    import org.apache.spark.sql.Encoders
    val alerts = spark.table("silence_out")
      .as[SilenceAlert](Encoders.product[SilenceAlert]).collect()
    assert(alerts.exists(a => a.user_id == 1L &&
      a.last_seen.toString.startsWith("2024-01-01 10:00:00") &&
      a.n_events == 1L), s"expected device-1 alert, got ${alerts.toSeq}")
    assert(!alerts.exists(_.user_id == 2L), s"device 2 is alive: ${alerts.toSeq}")
  }

  test("streaming funnel maintains batch C9 counts across arrivals") {
    import graft.streaming.IotStreamPipeline
    import graft.streaming.IotStreamPipeline.FunnelProgOut
    val in = Files.createTempDirectory("graft-funnel-in").toString
    val steps = Seq("view", "click", "purchase")
    val ev = graft.sources.Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type")
    val got = maintainedRows[FunnelProgOut](
      IotStreamPipeline.funnelStream(
        spark.readStream.schema(ev.schema).parquet(in), steps, 3600L),
      _.user_id)(landTimeSplit(ev, in)).toDF()
    val counts = IotStreamPipeline.funnelProgressCounts(got, steps)
    val want = graft.operators.Sessionize.funnel(
      graft.sources.Tables.events(spark, sf),
      "user_id", "ts", "event_type", steps, 3600L)
    assert(counts.count() == want.filter(col("n_entities") > 0).count())
    assert(counts.exceptAll(want).count() == 0 &&
      want.filter(col("n_entities") > 0).exceptAll(counts).count() == 0)
  }

  test("streaming funnel: equal-timestamp chain advances to fixpoint (== batch)") {
    import graft.streaming.IotStreamPipeline
    import graft.streaming.IotStreamPipeline.FunnelProgOut
    val in = Files.createTempDirectory("graft-funnel-eq-in").toString
    val steps = Seq("view", "click", "purchase")
    // u1: click and purchase share one timestamp — batch's `__ti >= __t`
    // admits the same-instant multi-step advance (reaches 3); u2's
    // purchase precedes its click (stops at 2); u3 only views
    val df = Seq(
      (1L, "2024-01-01 00:00:00", 1L, "view"),
      (1L, "2024-01-01 00:10:00", 2L, "click"),
      (1L, "2024-01-01 00:10:00", 3L, "purchase"),
      (2L, "2024-01-01 00:00:00", 4L, "view"),
      (2L, "2024-01-01 00:05:00", 5L, "purchase"),
      (2L, "2024-01-01 00:30:00", 6L, "click"),
      (3L, "2024-01-01 00:00:00", 7L, "view"))
      .toDF("user_id", "s", "event_id", "event_type")
      .withColumn("ts", col("s").cast("timestamp")).drop("s")
      .select("user_id", "ts", "event_id", "event_type")
    val got = maintainedRows[FunnelProgOut](
      IotStreamPipeline.funnelStream(
        spark.readStream.schema(df.schema).parquet(in), steps, 3600L),
      _.user_id)(landTimeSplit(df, in)).toDF()
    val counts = IotStreamPipeline.funnelProgressCounts(got, steps)
      .select("step", "n_entities").as[(Int, Long)].collect().toMap
    assert(counts == Map(1 -> 3L, 2 -> 2L, 3 -> 1L))
    val want = graft.operators.Sessionize.funnel(
      df, "user_id", "ts", "event_type", steps, 3600L)
      .select("step", "n_entities").as[(Int, Long)].collect().toMap
    assert(counts == want)
  }

  test("streaming retention maintains batch C10 row-for-row; replay converges") {
    import graft.streaming.IotStreamPipeline
    val dir = Files.createTempDirectory("graft-retention").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    val ev = graft.sources.Tables.events(spark, sf)
      .select("user_id", "ts")
    val q = IotStreamPipeline.maintainRetention(
      spark.readStream.schema(ev.schema).parquet(s"$dir/in"),
      s"$dir/state", s"$dir/ckpt").start()
    try landTimeSplit(ev, s"$dir/in")(() => q.processAllAvailable())
    finally q.stop()
    val got = IotStreamPipeline.retentionCounts(spark, s"$dir/state")
      .localCheckpoint()
    val want = graft.operators.Sessionize.retentionCohorts(
      graft.sources.Tables.events(spark, sf), "user_id", "ts")
    assert(got.count() == want.count() && want.count() > 0)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
    // replay: a fresh-checkpoint query re-delivers every landed file;
    // the anti-joined ledger absorbs them and counts are unchanged
    val q2 = IotStreamPipeline.maintainRetention(
      spark.readStream.schema(ev.schema).parquet(s"$dir/in"),
      s"$dir/state", s"$dir/ckpt2").start()
    try q2.processAllAvailable() finally q2.stop()
    val replayed = IotStreamPipeline.retentionCounts(spark, s"$dir/state")
    assert(replayed.exceptAll(got).count() == 0 &&
      got.exceptAll(replayed).count() == 0)
  }

  test("streaming counter delta maintains the batch rollup across arrivals") {
    import graft.streaming.IotStreamPipeline
    import graft.streaming.IotStreamPipeline.CounterOut
    val in = Files.createTempDirectory("graft-counter-in").toString
    val ev = graft.sources.Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "value")
    val got = maintainedRows[CounterOut](
      IotStreamPipeline.counterDeltaStream(
        spark.readStream.schema(ev.schema).parquet(in)),
      r => (r.user_id, r.day))(landTimeSplit(ev, in)).toDF()
    val want = graft.operators.TimeAgg.counterDelta(
      graft.sources.Tables.events(spark, sf)
        .withColumn("day", graft.operators.TimeAgg.dayKey(col("ts"))),
      Seq("user_id", "day"), "value", Seq("ts", "event_id"), 4)
    assert(got.count() == want.count() && want.count() > 0)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("streaming interval lookup enriches like batch (stateless, I36)") {
    // the bucketized band join is a stateless stream-static enrichment
    // (the I5 shape): the dim explode + equi-join runs per micro-batch
    // with zero stream state
    val in = Files.createTempDirectory("graft-il-in").toString
    val ev = graft.sources.Tables.events(spark, sf)
      .select("event_id", "user_id", "value")
    val bands = Seq(("bronze", 0.0, 50.0), ("silver", 50.0, 200.0),
      ("gold", 200.0, 1000.0)).toDF("tier", "lo", "hi")
    val outRows = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val q = graft.operators.TemporalJoin.intervalLookup(
        spark.readStream.schema(ev.schema).parquet(in),
        bands, "value", "lo", "hi", 50.0)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        outRows ++= batch.select("event_id", "tier")
          .collect().map(r => (r.getLong(0), r.getString(1)))
        ()
      }.start()
    try {
      ev.coalesce(1).write.mode("overwrite").parquet(in)
      q.processAllAvailable()
    } finally q.stop()
    val want = graft.operators.TemporalJoin.intervalLookup(
        ev, bands, "value", "lo", "hi", 50.0)
      .select("event_id", "tier")
      .as[(Long, String)].collect()
    assert(outRows.sorted == want.toSeq.sorted && want.nonEmpty)
  }

  test("streaming cusum by composition: maintained daily counts feed DQ9 (I37)") {
    // same maintenance story as I32: daily counts are additive, a plain
    // update-mode agg keeps them exactly-once; the CUSUM flags
    // re-derive through the SAME calendar-sized cusumFromDaily stage
    val in = Files.createTempDirectory("graft-cusum-in").toString
    val ev = graft.sources.Tables.events(spark, sf)
      .select("user_id", "ts", "event_type")
    val table = scala.collection.mutable.Map
      .empty[(String, java.sql.Date), (String, java.sql.Date, Long)]
    val stream = spark.readStream.schema(ev.schema).parquet(in)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val q = stream.writeStream.outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach { r =>
          table((r.getString(0), r.getDate(1))) =
            (r.getString(0), r.getDate(1), r.getLong(2))
        }
      }.start()
    try landTimeSplit(ev, in)(() => q.processAllAvailable()) finally q.stop()
    val maintained = table.values.toSeq.toDF("event_type", "day", "cnt")
    val got = graft.operators.DataQuality.cusumFromDaily(
      maintained, Seq("event_type"), slack = 0, threshold = 30)
    val want = graft.operators.DataQuality.cusumChangepoints(
      graft.sources.Tables.events(spark, sf), Seq("event_type"), "ts",
      slack = 0, threshold = 30)
    assert(got.count() == want.count() && want.count() > 0)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("streaming z-order keys enrich like batch (stateless, I38)") {
    // with provided ranges the layout key is a pure projection — a
    // stateless per-micro-batch enrichment (the I36 shape); collected
    // ranges would come from a maintained stats table in production
    val in = Files.createTempDirectory("graft-zo-in").toString
    val ev = graft.sources.Tables.events(spark, sf)
      .select("event_id", "user_id", "value")
      .withColumn("vmilli", (col("value") * 1000).cast("long"))
    val ranges = Some(Seq((0L, 999999L), (0L, 1999999L)))
    val outRows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = graft.operators.Layout.zorderKey(
        spark.readStream.schema(ev.schema).parquet(in),
        Seq("user_id", "vmilli"), bits = 8, ranges = ranges)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        outRows ++= batch.select("event_id", "zval")
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        ()
      }.start()
    try {
      ev.coalesce(1).write.mode("overwrite").parquet(in)
      q.processAllAvailable()
    } finally q.stop()
    val want = graft.operators.Layout.zorderKey(ev,
        Seq("user_id", "vmilli"), bits = 8, ranges = ranges)
      .select("event_id", "zval").as[(Long, Long)].collect()
    assert(outRows.sorted == want.toSeq.sorted && want.nonEmpty)
  }

  test("streaming link rank by composition: maintained edge set feeds H28 (I39)") {
    // link/purchase graphs grow append-only; the maintained DISTINCT
    // edge table is a plain streaming dropDuplicates (exactly-once
    // append into a keyed sink), and the ranks re-derive through the
    // SAME batch pageRank stage — the I37 composition discipline
    val in = Files.createTempDirectory("graft-pr-in").toString
    val li = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_suppkey"))
    val ord = graft.sources.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"))
    val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
    val edges0 = pairs.unionByName(
      pairs.select(col("dst").as("src"), col("src").as("dst")))
    val maintained = scala.collection.mutable.Set.empty[(Long, Long)]
    val q = spark.readStream.schema(edges0.schema).parquet(in)
      .dropDuplicates("src", "dst")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r =>
          maintained += ((r.getLong(0), r.getLong(1))))
        ()
      }.start()
    // arrivals split on the src key — every edge lands whole in one half
    try landTimeSplit(edges0, in, tsCol = "src")(() => q.processAllAvailable())
    finally q.stop()
    val got = graft.operators.Graphs.pageRank(
      maintained.toSeq.toDF("src", "dst"), "src", "dst", iters = 3)
    val want = graft.operators.Graphs.pageRank(edges0, "src", "dst", iters = 3)
    assert(got.count() == want.count() && want.count() > 0)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("streaming SCC + condensation by composition: maintained edges feed L13/L14 (I52)") {
    // the I39 discipline for the directed-graph surface: the maintained
    // DISTINCT edge table (streaming dropDuplicates, exactly-once
    // append) feeds the SAME batch scc/condense stages — both physical
    // paths (single-task fast path and distributed FB-coloring) must
    // equal the batch run over all arrivals
    val in = Files.createTempDirectory("graft-scc-in").toString
    val edges0 = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 4L), (4L, 3L),
      (4L, 5L), (5L, 6L), (6L, 7L), (7L, 5L), (8L, 8L), (9L, 3L))
      .toDF("src", "dst")
    val maintained = scala.collection.mutable.Set.empty[(Long, Long)]
    val q = spark.readStream.schema(edges0.schema).parquet(in)
      .dropDuplicates("src", "dst")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r =>
          maintained += ((r.getLong(0), r.getLong(1))))
        ()
      }.start()
    try landTimeSplit(edges0, in, tsCol = "src")(() => q.processAllAvailable())
    finally q.stop()
    val me = maintained.toSeq.toDF("src", "dst")
    for (thr <- Seq(100000L, 0L)) { // fast path AND distributed path
      val gotScc = graft.operators.Graphs.scc(me, "src", "dst",
        localThreshold = thr)
      val wantScc = graft.operators.Graphs.scc(edges0, "src", "dst")
      assert(gotScc.count() == wantScc.count() && wantScc.count() > 0)
      assert(gotScc.exceptAll(wantScc).count() == 0 &&
        wantScc.exceptAll(gotScc).count() == 0, s"scc thr=$thr")
      val gotC = graft.operators.Graphs.condense(me, "src", "dst",
        localThreshold = thr)
      val wantC = graft.operators.Graphs.condense(edges0, "src", "dst")
      assert(gotC.exceptAll(wantC).count() == 0 &&
        wantC.exceptAll(gotC).count() == 0, s"condense thr=$thr")
    }
  }

  test("streaming graph analytics by composition: maintained edges feed L6/L7 (I44)") {
    // the I39 discipline extended to the rest of the graph surface:
    // ONE maintained distinct edge table (streaming dropDuplicates,
    // exactly-once append) serves k-core AND neighbor-jaccard through
    // the SAME batch stages — no per-operator streaming state at all
    val in = Files.createTempDirectory("graft-gph-in").toString
    val edges0 = graft.operators.Graphs.cooccurrence(
        graft.sources.Tables.lineitem(spark, sf)
          .select(col("l_orderkey"), col("l_partkey")),
        "l_orderkey", "l_partkey", minSupport = 1L)
      .select(col("item_a"), col("item_b"))
    val maintained = scala.collection.mutable.Set.empty[(Long, Long)]
    val q = spark.readStream.schema(edges0.schema).parquet(in)
      .dropDuplicates("item_a", "item_b")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r =>
          maintained += ((r.getLong(0), r.getLong(1))))
        ()
      }.start()
    try landTimeSplit(edges0, in, tsCol = "item_a")(() => q.processAllAvailable())
    finally q.stop()
    val me = maintained.toSeq.toDF("item_a", "item_b")
    for ((got, want) <- Seq(
      (graft.operators.Graphs.kcore(me, "item_a", "item_b", k = 2),
        graft.operators.Graphs.kcore(edges0, "item_a", "item_b", k = 2)),
      (graft.operators.Graphs.neighborJaccard(me, "item_a", "item_b", 0.5),
        graft.operators.Graphs.neighborJaccard(edges0, "item_a", "item_b", 0.5)))) {
      assert(got.count() == want.count() && want.count() > 0)
      assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
    }
    // I51: modularity rides the same maintained edge table — LPA
    // labels + the exact integer score, batch stages unchanged
    val labels = graft.operators.Graphs.labelPropagation(
      me, "item_a", "item_b", iters = 2).localCheckpoint()
    val gotQ = graft.operators.Graphs.modularity(me, "item_a", "item_b", labels)
    val wantQ = graft.operators.Graphs.modularity(
      edges0, "item_a", "item_b",
      graft.operators.Graphs.labelPropagation(edges0, "item_a", "item_b",
        iters = 2))
    assert(gotQ.count() == wantQ.count() && wantQ.count() > 0)
    assert(gotQ.exceptAll(wantQ).count() == 0
      && wantQ.exceptAll(gotQ).count() == 0)
  }

  test("streaming co-purchase + triangles by composition: maintained pairs feed L2/L3 (I54)") {
    // the I44 discipline for the remaining graph pair (r15 verdict #6):
    // L2 consumes (basket, item) PAIRS, so the maintained table is the
    // DISTINCT pair set (streaming dropDuplicates, exactly-once
    // append); cooccurrence's minSupport count then re-derives exactly
    // (each distinct pair contributes once, whatever batch it arrived
    // in), and L3 rides L2's edges — both through the UNCHANGED batch
    // stages, no per-operator streaming state
    val in = Files.createTempDirectory("graft-cop-in").toString
    val pairs0 = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val maintained = scala.collection.mutable.Set.empty[(Long, Long)]
    val q = spark.readStream.schema(pairs0.schema).parquet(in)
      .dropDuplicates("l_orderkey", "l_partkey")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r =>
          maintained += ((r.getLong(0), r.getLong(1))))
        ()
      }.start()
    try landTimeSplit(pairs0, in, tsCol = "l_orderkey")(() => q.processAllAvailable())
    finally q.stop()
    val mp = maintained.toSeq.toDF("l_orderkey", "l_partkey")
    val gotCo = graft.operators.Graphs.cooccurrence(
      mp, "l_orderkey", "l_partkey", minSupport = 2L).localCheckpoint()
    val wantCo = graft.operators.Graphs.cooccurrence(
      pairs0, "l_orderkey", "l_partkey", minSupport = 2L).localCheckpoint()
    assert(gotCo.count() == wantCo.count() && wantCo.count() > 0)
    assert(gotCo.exceptAll(wantCo).count() == 0 &&
      wantCo.exceptAll(gotCo).count() == 0)
    val gotTri = graft.operators.Graphs.triangles(gotCo, "item_a", "item_b")
    val wantTri = graft.operators.Graphs.triangles(wantCo, "item_a", "item_b")
    assert(gotTri.count() == wantTri.count() && wantTri.count() > 0)
    assert(gotTri.exceptAll(wantTri).count() == 0 &&
      wantTri.exceptAll(gotTri).count() == 0)
  }

  test("streaming k-anonymity by composition: maintained class counts feed DQ10 (I40)") {
    // quasi-class counts are additive — a plain update-mode agg keeps
    // them exactly-once; the audit re-derives through the SAME
    // class-table-sized kAnonymityFromCounts stage
    val in = Files.createTempDirectory("graft-kanon-in").toString
    val cust = graft.sources.Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_nationkey").cast("long").as("c_nationkey"),
        floor(col("c_acctbal") / 1000).as("acct_band"))
    val table = scala.collection.mutable.Map
      .empty[(Long, Long), (Long, Long, Long)]
    val q = spark.readStream.schema(cust.schema).parquet(in)
      .groupBy(col("c_nationkey"), col("acct_band"))
      .agg(count(lit(1)).as("n"))
      .writeStream.outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach { r =>
          table((r.getLong(0), r.getLong(1))) =
            (r.getLong(0), r.getLong(1), r.getLong(2))
        }
        ()
      }.start()
    try landTimeSplit(cust, in, tsCol = "c_custkey")(() => q.processAllAvailable())
    finally q.stop()
    val got = graft.operators.DataQuality.kAnonymityFromCounts(
      table.values.toSeq.toDF("c_nationkey", "acct_band", "n"), k = 5L)
    val want = graft.operators.DataQuality.kAnonymity(
      cust.drop("c_custkey"), Seq("c_nationkey", "acct_band"), k = 5L)
    assert(got.count() == want.count() && want.count() > 0)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("streaming t-closeness by composition: maintained class-value counts feed DQ17 (I52)") {
    // (quasi, sensitive) counts are additive — the same update-mode
    // maintenance as I40; the audit re-derives through the
    // sketch-sized tClosenessFromCounts stage (global counts and the
    // total are ROLLUPS of the maintained table, never a raw rescan)
    val in = Files.createTempDirectory("graft-tclose-in").toString
    val cust = graft.sources.Tables.customer(spark, sf)
      .select(col("c_custkey"),
        col("c_nationkey").cast("long").as("c_nationkey"),
        floor(col("c_acctbal") / 1000).as("acct_band"),
        col("c_mktsegment"))
    val table = scala.collection.mutable.Map
      .empty[(Long, Long, String), (Long, Long, String, Long)]
    val q = spark.readStream.schema(cust.schema).parquet(in)
      .groupBy(col("c_nationkey"), col("acct_band"), col("c_mktsegment"))
      .agg(count(lit(1)).as("__ncv"))
      .writeStream.outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach { r =>
          table((r.getLong(0), r.getLong(1), r.getString(2))) =
            (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))
        }
        ()
      }.start()
    try landTimeSplit(cust, in, tsCol = "c_custkey")(() => q.processAllAvailable())
    finally q.stop()
    val got = graft.operators.DataQuality.tClosenessFromCounts(
      table.values.toSeq
        .toDF("c_nationkey", "acct_band", "c_mktsegment", "__ncv"),
      Seq("c_nationkey", "acct_band"), "c_mktsegment", t = 0.3)
    val want = graft.operators.DataQuality.tCloseness(
      cust.drop("c_custkey"), Seq("c_nationkey", "acct_band"),
      "c_mktsegment", t = 0.3)
    assert(got.count() == want.count() && want.count() > 0)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("streaming benford by composition: maintained digit counts feed DQ12 (I41)") {
    // (key, digit) counts are additive — a plain update-mode agg
    // maintains them exactly-once; the report re-derives through the
    // SAME class-table-sized benfordFromCounts stage (the I40 shape)
    val in = Files.createTempDirectory("graft-benford-in").toString
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), col("value"), col("ts"))
    val digits = (df: org.apache.spark.sql.DataFrame) => df
      .filter(abs(col("value")) >= 1)
      .select(col("event_type"), substring(floor(abs(col("value")))
        .cast("long").cast("string"), 1, 1).cast("int").as("digit"))
    val maintained = maintainedRows[(String, Int, Long)](
      digits(spark.readStream.schema(ev.schema).parquet(in))
        .groupBy(col("event_type"), col("digit"))
        .agg(count(lit(1)).as("n")),
      r => (r._1, r._2)) { after => landTimeSplit(ev, in)(after) }
    val got = graft.operators.DataQuality.benfordFromCounts(
      maintained.toDF("event_type", "digit", "n"), Seq("event_type"))
    val want = graft.operators.DataQuality.benford(
      ev.drop("ts"), Seq("event_type"), "value")
    assert(want.count() > 0 && got.count() == want.count())
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("streaming FD audit by composition: maintained pair counts feed DQ13 (I42)") {
    val in = Files.createTempDirectory("graft-fd-in").toString
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("ts"))
    val maintained = maintainedRows[(Long, String, Long)](
      spark.readStream.schema(ev.schema).parquet(in)
        .filter(col("event_type").isNotNull)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n")),
      r => (r._1, r._2)) { after => landTimeSplit(ev, in)(after) }
    val got = graft.operators.DataQuality.fdFromPairCounts(
      maintained.toDF("user_id", "event_type", "n"),
      Seq("user_id"), "event_type")
    val want = graft.operators.DataQuality.fdViolations(
      ev.drop("ts"), Seq("user_id"), "event_type")
    assert(want.count() > 0 && got.count() == want.count())
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("streaming CDC: maintained latest-change table feeds the J14 merge (I45)") {
    // the winning-change-per-key stage of applyCdc is ONE grouped
    // max_by — partial-aggregable, so an update-mode streaming agg
    // maintains it exactly with zero user state code (the I17/I43
    // declarative discipline); the snapshot merge then runs off the
    // maintained table (applyCdcFrom) without ever re-reading the log
    val in = Files.createTempDirectory("graft-cdc-in").toString
    val chg = graft.sources.Tables.events(spark, sf)
      .select(col("user_id").as("k"), col("ts"),
        col("event_id").as("seqn"),
        when(col("event_type") === "error", lit("D")).otherwise(lit("U"))
          .as("op"),
        col("value").as("bal"), col("event_type").as("seg"))
    val snap = graft.sources.Tables.customer(spark, sf)
      .select(col("c_custkey").as("k"), col("c_acctbal").as("bal"),
        col("c_mktsegment").as("seg"))
    val maintained = maintainedRows[(Long, String, Long, Double, String)](
      graft.operators.Incremental.latestChange(
        spark.readStream.schema(chg.schema).parquet(in),
        Seq("k"), "seqn", "op", Seq("bal", "seg")),
      r => r._1) { after => landTimeSplit(chg, in)(after) }
    val got = graft.operators.Incremental.applyCdcFrom(snap,
      maintained.toDF("k", "__op", "__seq", "bal", "seg"),
      Seq("k"), Seq("bal", "seg"))
    val want = graft.operators.Incremental.applyCdc(snap, chg.drop("ts"),
      Seq("k"), "seqn", "op", Seq("bal", "seg"))
    assert(want.count() > 0 && got.count() == want.count())
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("streaming golden record: the max_by survivorship agg maintains batch C20 (I43)") {
    // per-field latest-non-null is a commutative-monoid merge — the
    // goldenRecord aggregation runs UNCHANGED as an update-mode
    // streaming agg (the I17 declarative discipline, zero state code),
    // emitted rows upsert keyed on the entity
    val in = Files.createTempDirectory("graft-golden-in").toString
    val sparse = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"),
        when(col("event_id") % 2 === 1, lit(null).cast("double"))
          .otherwise(col("value")).as("value"),
        when(col("event_id") % 2 === 0, lit(null).cast("string"))
          .otherwise(col("event_type")).as("event_type"))
    val maintained = maintainedRows[
        (Long, Option[Double], Option[String], java.sql.Timestamp, Long)](
      graft.operators.Incremental.goldenRecord(
        spark.readStream.schema(sparse.schema).parquet(in),
        "user_id", "ts", "event_id", Seq("value", "event_type")),
      r => r._1) { after => landTimeSplit(sparse, in)(after) }
    val got = maintained
      .toDF("user_id", "value", "event_type", "last_seen", "n_rows")
    val want = graft.operators.Incremental.goldenRecord(
      sparse, "user_id", "ts", "event_id", Seq("value", "event_type"))
    assert(want.count() > 0 && got.count() == want.count())
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("streaming instant rate maintains batch B40 across arrivals (I35)") {
    import graft.streaming.IotStreamPipeline
    import graft.streaming.IotStreamPipeline.InstantRateOut
    val in = Files.createTempDirectory("graft-irate-in").toString
    val ev = graft.sources.Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "value")
    val got = maintainedRows[InstantRateOut](
      IotStreamPipeline.instantRateStream(
        spark.readStream.schema(ev.schema).parquet(in)),
      r => r.user_id)(landTimeSplit(ev, in)).toDF()
    val want = graft.operators.TimeAgg.instantRate(
      graft.sources.Tables.events(spark, sf),
      "user_id", "ts", "event_id", "value")
    assert(got.count() == want.count() && want.count() > 0)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("streaming state_agg maintains the batch rollup across arrivals") {
    import graft.streaming.IotStreamPipeline
    import graft.streaming.IotStreamPipeline.StateAggOut
    val in = Files.createTempDirectory("graft-stateagg-in").toString
    val ev = graft.sources.Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type")
    val got = maintainedRows[StateAggOut](
      IotStreamPipeline.stateAggStream(
        spark.readStream.schema(ev.schema).parquet(in)),
      r => (r.user_id, r.event_type))(landTimeSplit(ev, in)).toDF()
    val want = graft.operators.TimeAgg.stateAgg(
      graft.sources.Tables.events(spark, sf),
      "user_id", "event_type", "ts", "event_id")
    assert(got.count() == want.count() && want.count() > 0)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("streaming uptime maintains the batch heartbeat rollup across arrivals") {
    import graft.streaming.IotStreamPipeline
    import graft.streaming.IotStreamPipeline.UptimeOut
    val in = Files.createTempDirectory("graft-uptime-in").toString
    val ev = graft.sources.Tables.events(spark, sf)
      .select("user_id", "ts", "event_id")
    val got = maintainedRows[UptimeOut](
      IotStreamPipeline.uptimeStream(
        spark.readStream.schema(ev.schema).parquet(in), gapSeconds = 1800),
      _.user_id)(landTimeSplit(ev, in)).toDF()
    val want = graft.operators.TimeAgg.heartbeatUptime(
      graft.sources.Tables.events(spark, sf),
      entity = "user_id", ts = "ts", tieBreak = "event_id",
      gapSeconds = 1800)
    assert(got.count() == want.count() && want.count() > 0)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("streaming candlestick maintains the batch OHLC declaratively") {
    import graft.streaming.IotStreamPipeline
    import graft.streaming.IotStreamPipeline.CandleOut
    val in = Files.createTempDirectory("graft-candle-in").toString
    val ev = graft.sources.Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "value")
    val got = maintainedRows[CandleOut](
      IotStreamPipeline.candlestickStream(
        spark.readStream.schema(ev.schema).parquet(in)),
      r => (r.user_id, r.day))(landTimeSplit(ev, in)).toDF()
    val want = graft.operators.TimeAgg.candlestick(
      graft.sources.Tables.events(spark, sf)
        .withColumn("day", graft.operators.TimeAgg.dayKey(col("ts"))),
      Seq("user_id", "day"), "ts", "event_id", "value")
    assert(got.count() == want.count() && want.count() > 0)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("streaming histogram bins maintain B31's layer; estimates == batch rollup") {
    import graft.operators.Sketches
    import graft.streaming.IotStreamPipeline
    import graft.streaming.IotStreamPipeline.HistBinOut
    val in = Files.createTempDirectory("graft-hist-in").toString
    val ev = graft.sources.Tables.events(spark, sf)
      .select("event_type", "ts", "value")
    val got = maintainedRows[HistBinOut](
      IotStreamPipeline.histBinsStream(
        spark.readStream.schema(ev.schema).parquet(in), 0.0, 600.0, 600),
      r => (r.event_type, r.day, r.bin))(landTimeSplit(ev, in)).toDF()
    val want = Sketches.histBinCounts(
      ev.withColumn("day", graft.operators.TimeAgg.dayKey(col("ts"))),
      Seq("event_type", "day"), col("value"), 0.0, 600.0, 600)
      .select(col("event_type"), col("day"),
        col("__bin").as("bin"), col("__cnt").as("cnt"))
    assert(got.count() == want.count() && want.count() > 0)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
    // the maintained table feeds the B31 rollup unchanged: month-grain
    // estimates off maintained bins == estimates off raw data
    val ps = Seq(("p50", 0.5), ("p95", 0.95), ("p99", 0.99))
    val maintained = got
      .select(col("event_type"), col("day"),
        col("bin").as("__bin"), col("cnt").as("__cnt"))
    val est = Sketches.histPercentilesFromBins(
      Sketches.histMerge(
        maintained.withColumn("month", substring(col("day"), 1, 6)),
        Seq("event_type", "month")),
      Seq("event_type", "month"), ps, 0.0, 600.0, 600)
    val direct = Sketches.histPercentiles(
      ev.withColumn("month", graft.operators.TimeAgg.monthKey(col("ts"))),
      Seq("event_type", "month"), col("value"), ps, 0.0, 600.0, 600)
    assert(est.exceptAll(direct).count() == 0 &&
      direct.exceptAll(est).count() == 0)
  }

  test("streaming rolling percentiles: maintained bins feed B41 unchanged (I46)") {
    // the I23 composition discipline: the ONE maintained (type, day,
    // bin) table already carries everything the trailing-window
    // estimate needs — histRollingBins + histPercentilesFromBins run
    // off it as sketch-sized post-rollup stages, raw never re-read
    import graft.operators.Sketches
    import graft.streaming.IotStreamPipeline
    import graft.streaming.IotStreamPipeline.HistBinOut
    val in = Files.createTempDirectory("graft-rollpctl-in").toString
    val ev = graft.sources.Tables.events(spark, sf)
      .select("event_type", "ts", "value")
    val maintained = maintainedRows[HistBinOut](
      IotStreamPipeline.histBinsStream(
        spark.readStream.schema(ev.schema).parquet(in), 0.0, 600.0, 600),
      r => (r.event_type, r.day, r.bin))(landTimeSplit(ev, in)).toDF()
      .select(col("event_type"), col("day"),
        col("bin").as("__bin"), col("cnt").as("__cnt"))
    val ps = Seq(("p50", 0.5), ("p90", 0.9))
    def rolling(bins: org.apache.spark.sql.DataFrame) =
      Sketches.histPercentilesFromBins(
        Sketches.histRollingBins(bins, Seq("event_type"), "day", window = 7),
        Seq("event_type", "day"), ps, 0.0, 600.0, 600)
    val got = rolling(maintained)
    val want = rolling(Sketches.histBinCounts(
      ev.withColumn("day", graft.operators.TimeAgg.dayKey(col("ts"))),
      Seq("event_type", "day"), col("value"), 0.0, 600.0, 600))
    assert(want.count() > 0 && got.count() == want.count())
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("streaming drift: maintained bins + frozen reference reproduce batch drift") {
    // the DQ4 continuous story: keep ONE maintained (event_type, day,
    // bin) table current (the I19 stream — equality-proven above);
    // drift then re-derives from the maintained table alone — raw
    // events are never re-read when the drift report refreshes
    import graft.operators.{DataQuality, Sketches}
    import graft.streaming.IotStreamPipeline
    import graft.streaming.IotStreamPipeline.HistBinOut
    val in = Files.createTempDirectory("graft-drift-in").toString
    val ev = graft.sources.Tables.events(spark, sf)
      .select("event_type", "ts", "value")
    val maintained = maintainedRows[HistBinOut](
      IotStreamPipeline.histBinsStream(
        spark.readStream.schema(ev.schema).parquet(in), 0.0, 600.0, 600),
      r => (r.event_type, r.day, r.bin))(landTimeSplit(ev, in)).toDF()
    val cutDay = "20240116"
    def roll(cond: org.apache.spark.sql.Column, as: String) = maintained
      .filter(cond).groupBy(col("event_type"), col("bin").as("bucket"))
      .agg(sum(col("cnt")).as(as))
    val streamDrift = DataQuality.driftFromBins(
      roll(col("day") < cutDay, "cnt_ref"),
      roll(col("day") >= cutDay, "cnt_cur"), Seq("event_type"))
    // batch side: fresh bins over the same slices, same computation
    val cut = lit("2024-01-16").cast("timestamp")
    def bins(cond: org.apache.spark.sql.Column, as: String) =
      Sketches.histBinCounts(ev.filter(cond), Seq("event_type"),
          col("value"), 0.0, 600.0, 600)
        .select(col("event_type"), col("__bin").as("bucket"),
          col("__cnt").as(as))
    val batchDrift = DataQuality.driftFromBins(
      bins(col("ts") < cut, "cnt_ref"),
      bins(col("ts") >= cut, "cnt_cur"), Seq("event_type"))
    assert(streamDrift.count() > 0)
    assert(streamDrift.exceptAll(batchDrift).count() == 0 &&
      batchDrift.exceptAll(streamDrift).count() == 0)
  }

  test("streaming time-weighted avg maintains the batch rollup across arrivals") {
    import graft.streaming.IotStreamPipeline
    import graft.streaming.IotStreamPipeline.TwaOut
    val in = Files.createTempDirectory("graft-twa-in").toString
    val ev = graft.sources.Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "value")
    val got = maintainedRows[TwaOut](
      IotStreamPipeline.timeWeightedStream(
        spark.readStream.schema(ev.schema).parquet(in)),
      r => (r.user_id, r.day))(landTimeSplit(ev, in)).toDF()
      .select(col("user_id"), col("day"), col("tw_avg"), col("n_readings"))
    val want = graft.operators.TimeAgg.timeWeightedAvg(
      graft.sources.Tables.events(spark, sf)
        .withColumn("day", graft.operators.TimeAgg.dayKey(col("ts"))),
      Seq("user_id", "day"), "ts", Seq("event_id"), "value", 4)
      .select(col("user_id"), col("day"), col("tw_avg"), col("n_readings"))
    assert(got.count() == want.count() && want.count() > 0)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("stage → watermarked windowed agg over a file stream (memory sink)") {
    val in = Files.createTempDirectory("graft-stream-in").toString
    landEvents(in)
    val raw = IotStreamPipeline.readRaw(spark, in)
    assert(raw.isStreaming)
    val agg = IotStreamPipeline.windowedAgg(IotStreamPipeline.stage(raw), "1 hour", "2 hours")
    val q = agg.writeStream.outputMode("update")
      .format("memory").queryName("agg_out").start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("agg_out")
    val batch = IotStreamPipeline.stage(graft.sources.Tables.events(spark, sf))
      .groupBy(window(col("ts"), "1 hour"), col("user_id"), col("event_type"))
      .agg(sum("value").as("value_sum"), count(lit(1)).as("n_events"))
    // streaming result (complete after processAllAvailable) == batch result
    assert(out.count() == batch.count())
    assert(out.join(batch, Seq("user_id", "event_type", "n_events"), "left_anti").count() == 0)
  }

  test("foreachBatch warehouse sink writes idempotent-keyed parquet") {
    val in = Files.createTempDirectory("graft-sink-in").toString
    val outP = Files.createTempDirectory("graft-sink-out").toString + "/wh"
    val ckpt = Files.createTempDirectory("graft-sink-ckpt").toString
    landEvents(in)
    val agg = IotStreamPipeline.windowedAgg(
      IotStreamPipeline.stage(IotStreamPipeline.readRaw(spark, in)), "1 day", "2 days")
    val q = IotStreamPipeline.sinkToWarehouse(agg, outP, ckpt).start()
    q.processAllAvailable(); q.stop()
    val written = spark.read.parquet(outP)
    assert(written.count() > 0)
    assert(written.columns.contains("batch_id"))
  }

  test("dedupStream drops re-delivered event ids within the watermark") {
    val in = Files.createTempDirectory("graft-dedup-in").toString
    // land the same events TWICE — replaying the extract cursor
    val ev = graft.sources.Tables.events(spark, sf)
    ev.coalesce(1).write.mode("overwrite").parquet(in)
    ev.coalesce(1).write.mode("append").parquet(in)
    val st = IotStreamPipeline.stage(IotStreamPipeline.readRaw(spark, in))
    val q = IotStreamPipeline.dedupStream(st, "1 hour").writeStream
      .outputMode("append").format("memory").queryName("dedup_out").start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("dedup_out").count() == ev.count())
  }

  test("native session_window sessionize: closed sessions == batch operator") {
    val in = Files.createTempDirectory("graft-sessnat-in").toString
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    // user 1: two events 10 s apart, then a 1990 s gap (> 1800 closes
    // the session); user 2: one event. No exact-boundary gaps.
    val chunk1 = Seq(
      (1L, ts(0), 2.0), (1L, ts(10), 3.0), (2L, ts(5), 7.0))
    val chunk2 = Seq((1L, ts(2000), 1.0))
    val cols = Seq("user_id", "ts", "value")
    chunk1.toDF(cols: _*).coalesce(1).write.mode("overwrite").parquet(in)
    val stream = IotStreamPipeline.sessionizeNative(
      spark.readStream.schema(chunk1.toDF(cols: _*).schema).parquet(in), 1800)
    assert(stream.isStreaming)
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("sessnat_out").start()
    q.processAllAvailable()
    // chunk 2 arrives in a LATER micro-batch: the watermark jumps to
    // t=2000, past both open sessions' close (last + gap ≤ 1810/1805)
    chunk2.toDF(cols: _*).coalesce(1).write.mode("append").parquet(in)
    q.processAllAvailable(); q.stop()
    val got = spark.table("sessnat_out")
    // exactly the two closed sessions, with first/last EVENT bounds;
    // user 1's t=2000 session is still open (nothing after it) — unemitted
    val want = Seq(
      (1L, ts(0), ts(10), 2L, 5.0), (2L, ts(5), ts(5), 1L, 7.0))
      .toDF("user_id", "session_start", "session_end", "n_events", "value_sum")
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
      s"got ${got.collect().mkString(";")}")
    // and each closed session matches the BATCH operator's rollup row
    val batch = graft.operators.Sessionize.summarize(
      (chunk1 ++ chunk2).toDF(cols: _*), "user_id", "ts", "ts", "value", 1800)
      .select("user_id", "session_start", "session_end", "n_events", "value_sum")
    assert(got.join(batch,
      Seq("user_id", "session_start", "session_end", "n_events"), "left_anti")
      .count() == 0)
  }

  test("streaming sessionize with custom state emits closed sessions") {
    val in = Files.createTempDirectory("graft-sess-in").toString
    landEvents(in)
    val st = IotStreamPipeline.stage(IotStreamPipeline.readRaw(spark, in))
    val sess = IotStreamPipeline.sessionize(st, 1800)
    val q = sess.writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("sess_out")
    // sessions close only when a later event arrives; emitted ones must be valid
    assert(out.filter(col("session_end") < col("session_start")).count() == 0)
    assert(out.count() > 0)
  }

  test("streaming SCD2 maintains exactly the batch type-2 table") {
    import graft.streaming.IotStreamPipeline.Scd2Out
    val in = Files.createTempDirectory("graft-scd2-in").toString
    val ev = graft.sources.Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type")
    // two arrivals split BY TIME — the cursor-order delivery contract a
    // change-stream source provides across micro-batches
    val cut = ev.agg(expr("percentile_approx(cast(ts as double), 0.5)"))
      .head().getDouble(0)
    ev.filter(col("ts").cast("double") <= cut).coalesce(1)
      .write.mode("overwrite").parquet(in)
    // the maintained table: an in-memory stand-in for the idempotent
    // upsert sink, keyed the way the operator keys its emissions
    val table = scala.collection.mutable.Map
      .empty[(Long, java.sql.Timestamp, Long), Scd2Out]
    val stream = graft.streaming.IotStreamPipeline.scd2Stream(
      spark.readStream.schema(ev.schema).parquet(in))
    val q = stream.writeStream.outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        import batch.sparkSession.implicits._
        batch.as[Scd2Out].collect().foreach { r =>
          table((r.user_id, r.valid_from, r.open_event_id)) = r
        }
      }.start()
    try {
      q.processAllAvailable()
      ev.filter(col("ts").cast("double") > cut).coalesce(1)
        .write.mode("append").parquet(in)
      q.processAllAvailable()
    } finally q.stop()
    val got = table.values.toSeq
      .toDF().drop("open_event_id")
      .withColumn("valid_to", col("valid_to")) // Option[-] already nullable
    val want = graft.operators.Incremental.scd2(ev, Seq("user_id"), col("ts"),
        order = Seq(col("ts"), col("event_id")), attrs = Seq("event_type"))
      .select("user_id", "event_type", "valid_from", "valid_to", "is_current")
    assert(got.count() == want.count() && want.count() > 0)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("checkpointed query restarts exactly-once: no loss, no dups") {
    val in = Files.createTempDirectory("graft-restart-in").toString
    val outP = Files.createTempDirectory("graft-restart-out").toString + "/wh"
    val ckpt = Files.createTempDirectory("graft-restart-ckpt").toString
    val ev = graft.sources.Tables.events(spark, sf)
    val half1 = ev.filter(col("event_id") % 2 === 0)
    val half2 = ev.filter(col("event_id") % 2 =!= 0)
    half1.coalesce(1).write.mode("overwrite").parquet(in)
    def runOnce(): Unit = {
      val st = IotStreamPipeline.stage(IotStreamPipeline.readRaw(spark, in))
      val q = st.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", outP).start()
      q.processAllAvailable(); q.stop()
    }
    runOnce() // first run consumes half1, then "crashes" (stop)
    half2.coalesce(1).write.mode("append").parquet(in) // new arrivals
    runOnce() // restart from the SAME checkpoint
    val got = spark.read.parquet(outP)
    // exactly the full event set: the restart neither re-emits half1
    // nor misses half2 — the Airflow-retry guarantee, from checkpoints
    assert(got.count() == ev.count())
    assert(got.select("event_id").distinct().count() == ev.count())
  }

  test("stream-static enrichment matches the batch join") {
    val in = Files.createTempDirectory("graft-enrich-in").toString
    landEvents(in)
    val dim = graft.sources.Tables.customer(spark, sf)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val enriched = IotStreamPipeline.enrichWithDim(
      IotStreamPipeline.stage(IotStreamPipeline.readRaw(spark, in)), dim, "user_id")
    val q = enriched.writeStream.outputMode("append")
      .format("memory").queryName("enrich_out").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("enrich_out")
    val want = IotStreamPipeline.stage(graft.sources.Tables.events(spark, sf))
      .join(dim, Seq("user_id"), "left")
    assert(got.count() == want.count())
    assert(got.filter(col("c_mktsegment").isNull).count()
      == want.filter(col("c_mktsegment").isNull).count())
  }

  test("stream-stream interval join matches the batch interval join") {
    val inV = Files.createTempDirectory("graft-ssj-v").toString
    val inC = Files.createTempDirectory("graft-ssj-c").toString
    val ev = graft.sources.Tables.events(spark, sf)
    ev.filter(col("event_type") === "view").coalesce(1)
      .write.mode("overwrite").parquet(inV)
    ev.filter(col("event_type") === "click").coalesce(1)
      .write.mode("overwrite").parquet(inC)
    val joined = IotStreamPipeline.intervalJoin(
      IotStreamPipeline.stage(IotStreamPipeline.readRaw(spark, inV)),
      IotStreamPipeline.stage(IotStreamPipeline.readRaw(spark, inC)),
      "1 hour", "30 minutes")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_out").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("ssj_out")
      .select("left_event_id", "right_event_id").as[(Long, Long)].collect().toSet
    val v = ev.filter(col("event_type") === "view").alias("l")
    val c = ev.filter(col("event_type") === "click").alias("r")
    val want = v.join(c, expr(
        "l.user_id = r.user_id AND r.ts > l.ts AND r.ts <= l.ts + interval 30 minutes"))
      .select(col("l.event_id"), col("r.event_id")).as[(Long, Long)].collect().toSet
    assert(got == want)
    assert(got.nonEmpty)
  }
  test("streaming transitions maintain the batch Markov bigrams across arrivals") {
    import graft.streaming.IotStreamPipeline
    import graft.streaming.IotStreamPipeline.TransOut
    val in = Files.createTempDirectory("graft-trans-in").toString
    val ev = graft.sources.Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type")
    val maintained = maintainedRows[TransOut](
      IotStreamPipeline.transitionsStream(
        spark.readStream.schema(ev.schema).parquet(in)),
      r => (r.user_id, r.prev_type, r.curr_type))(landTimeSplit(ev, in)).toDF()
    val got = IotStreamPipeline.transitionTotals(maintained)
    val want = graft.operators.Sessionize.transitions(
      graft.sources.Tables.events(spark, sf),
      "user_id", "ts", "event_id", "event_type")
    assert(got.count() == want.count() && want.count() > 0)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("streaming attribution maintains the batch last-touch credit across arrivals") {
    import graft.streaming.IotStreamPipeline
    import graft.streaming.IotStreamPipeline.AttrOut
    val in = Files.createTempDirectory("graft-attr-in").toString
    val ev = graft.sources.Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type")
    val maintained = maintainedRows[AttrOut](
      IotStreamPipeline.attributionStream(
        spark.readStream.schema(ev.schema).parquet(in),
        Seq("click", "view"), "purchase", 7L * 24 * 3600),
      _.event_id)(landTimeSplit(ev, in)).toDF()
    val got = IotStreamPipeline.attributionTotals(maintained)
    val want = graft.operators.Sessionize.lastTouchAttribution(
      graft.sources.Tables.events(spark, sf), "user_id", "ts", "event_id",
      "event_type", Seq("click", "view"), "purchase", 7L * 24 * 3600)
    assert(got.count() == want.count() && want.count() > 0)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
    // a same-state replay of the whole input re-emits identical rows —
    // the keyed upsert converges (at-least-once delivery tolerated)
    assert(maintained.groupBy("event_id").count()
      .filter(col("count") > 1).count() == 0)
  }
  test("streaming markov journey ledger == batch C23 removal effects (I53)") {
    import graft.streaming.IotStreamPipeline
    import graft.streaming.IotStreamPipeline.MkvOut
    val in = Files.createTempDirectory("graft-mkv-in").toString
    val ev = graft.sources.Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type")
    // terminal rows supersede by (uid, "(terminal)") — their dst is the
    // VALUE (the journey's current last type), not part of the key
    val maintained = maintainedRows[MkvOut](
      IotStreamPipeline.markovJourneyStream(
        spark.readStream.schema(ev.schema).parquet(in),
        Seq("click", "view"), "purchase"),
      r => (r.user_id, r.src,
        if (r.src == "(terminal)") "" else r.dst))(landTimeSplit(ev, in)).toDF()
    val got = IotStreamPipeline.markovTotals(
      maintained, Seq("click", "view"), "purchase")
    val want = graft.operators.Sessionize.markovAttribution(
      graft.sources.Tables.events(spark, sf), "user_id", "ts", "event_id",
      "event_type", Seq("click", "view"), "purchase")
    assert(got.count() == want.count() && want.count() > 0)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("streaming multi-touch off the maintained event ledger == batch C22 (I47)") {
    // c22's range-window pairing needs each conversion's 7-day touch
    // history, so the streaming story is the I28 ledger composition:
    // maintain a keyed (event_id-deduped) ledger of JUST the touch +
    // conversion types and run the batch operator off it — in
    // production the ledger is TTL-evicted past the lookback, which
    // cannot change any credit by construction (the window never
    // reaches further back)
    val in = Files.createTempDirectory("graft-mt-in").toString
    val ev = graft.sources.Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type", "value")
    val table = scala.collection.mutable.Map
      .empty[Long, (Long, java.sql.Timestamp, Long, String, Double)]
    val q = spark.readStream.schema(ev.schema).parquet(in)
      .filter(col("event_type").isin("click", "view", "purchase"))
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach { r =>
          table(r.getLong(2)) = (r.getLong(0), r.getTimestamp(1),
            r.getLong(2), r.getString(3), r.getDouble(4))
        }
      }.start()
    try landTimeSplit(ev, in)(() => q.processAllAvailable()) finally q.stop()
    val ledger = table.values.toSeq
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    def credit(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Sessionize.multiTouchAttribution(df, "user_id",
        "ts", "event_id", "event_type", Seq("click", "view"), "purchase",
        "value", 7L * 24 * 3600)
    val got = credit(ledger)
    val want = credit(ev)
    assert(got.count() == want.count() && want.count() > 0)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
    // the SAME ledger feeds C23's Markov model unchanged (one
    // maintained table, two continuous attribution reports) — with
    // the caveat that Markov journeys span full history, so THIS
    // composition keeps the whole filtered ledger (no TTL)
    def markov(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Sessionize.markovAttribution(df, "user_id", "ts",
        "event_id", "event_type", Seq("click", "view"), "purchase")
    val gotM = markov(ledger)
    val wantM = markov(ev)
    assert(gotM.exceptAll(wantM).count() == 0 &&
      wantM.exceptAll(gotM).count() == 0)
  }

  test("streaming kmeans assignment under a frozen model == batch F20 (I48)") {
    // the I18 discipline: centroids train in batch; arrivals between
    // retrains are assigned by the SAME stateless fixed-point argmin
    // projection, so the maintained assignment table equals a fresh
    // batch run at every point
    val in = Files.createTempDirectory("graft-km-in").toString
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .withColumn("embedding", col("embedding").cast("array<double>"))
    val fx = emb.select(col("vec_id").as("nn_id"),
      org.apache.spark.sql.functions.transform(col("embedding"),
        x => graft.functions.Portable.toFixed(x, 6)).as("fv"))
    val cents = graft.operators.Similarity.kmeansCentroidsFixed(fx,
      k = 8, iters = 2)
    val table = scala.collection.mutable.Map.empty[Long, (Long, Int)]
    val q = graft.operators.Similarity.kmeansAssignWith(
        spark.readStream.schema(emb.schema).parquet(in),
        "vec_id", "embedding", cents)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach { r =>
          table(r.getLong(0)) = (r.getLong(0), r.getInt(1))
        }
      }.start()
    try landTimeSplit(emb, in, tsCol = "vec_id")(() => q.processAllAvailable())
    finally q.stop()
    val got = table.values.toSeq.toDF("vec_id", "cell")
    val want = graft.operators.Similarity.kmeansAssign(emb, "vec_id",
      "embedding", k = 8, iters = 2)
    assert(got.count() == want.count() && want.count() > 0)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("streaming KMV set-ops off maintained bottom-k sketches == batch B42 (I49)") {
    // KMV union is lossless, so per-side maintenance is just
    // re-bottoming (old sketch ∪ new arrivals' hashes) each batch —
    // k longs of state per side; the report then runs off the
    // maintained tables through the same algebra seam
    import graft.operators.Sketches
    val in = Files.createTempDirectory("graft-kmv-in").toString
    val ev = graft.sources.Tables.events(spark, sf)
    val k = 256
    val skA = scala.collection.mutable.SortedSet.empty[Long]
    val skB = scala.collection.mutable.SortedSet.empty[Long]
    val q = spark.readStream.schema(ev.schema).parquet(in)
      .filter(col("event_type").isin("click", "view"))
      .select(col("event_type"), Sketches.portableHash(col("user_id")).as("h"))
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach { r =>
          (if (r.getString(0) == "click") skA else skB) += r.getLong(1)
        }
        while (skA.size > k) skA -= skA.last
        while (skB.size > k) skB -= skB.last
      }.start()
    try landTimeSplit(ev, in)(() => q.processAllAvailable()) finally q.stop()
    val got = Sketches.kmvSetOpsFromSketches(
      skA.toSeq.toDF("h"), skB.toSeq.toDF("h"), k)
    val want = Sketches.kmvSetOps(
      ev.filter(col("event_type") === "click"),
      ev.filter(col("event_type") === "view"),
      col("user_id"), col("user_id"), k)
    assert(got.count() == 1L)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("streaming DSIR scoring under frozen models == batch scores (I50)") {
    // the K12 deployment mode: both char-LM models train once in
    // batch (vocab-sized pinned artifacts), every arriving micro-batch
    // is scored by the SAME stateless broadcast-probe pass
    import graft.operators.Curation
    val in = Files.createTempDirectory("graft-dsir-in").toString
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text", "source")
    val mt = Curation.trainCharLm(
      docs.filter(col("source").isin("src0", "src1")), "text", 3)
    val ms = Curation.trainCharLm(docs, "text", 3)
    val table = scala.collection.mutable.Map.empty[Long, (Long, Long, Double)]
    val q = Curation.dsirScoreWith(
        spark.readStream.schema(docs.schema).parquet(in),
        "doc_id", "text", mt, ms)
      .writeStream.outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach { r =>
          table(r.getLong(0)) = (r.getLong(0), r.getLong(1), r.getDouble(2))
        }
      }.start()
    try landTimeSplit(docs, in, tsCol = "doc_id")(() => q.processAllAvailable())
    finally q.stop()
    val got = table.values.toSeq.toDF("doc_id", "n_target_grams", "importance")
    val want = Curation.dsirScoreWith(docs, "doc_id", "text", mt, ms)
    assert(got.count() == want.count() && want.count() > 0)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
    // frozen-model OOV contract: a doc whose grams are ALL absent from
    // the SOURCE model (novel language the frozen LM never saw) scores
    // 0.0 — not NULL/NaN that desc_nulls_last would silently bury
    val oov = Curation.dsirScoreWith(
      Seq((999L, "ΩΩΩΩΩΩ")).toDF("doc_id", "text"),
      "doc_id", "text", mt, ms)
    val r = oov.collect()
    assert(r.length == 1 && !r.head.isNullAt(2) && r.head.getDouble(2) == 0.0,
      s"OOV doc under frozen models must score 0.0, got ${r.toSeq}")
  }

  test("streaming EWMA by composition: the maintained daily rollup feeds b34 unchanged (I27)") {
    import graft.streaming.IotStreamPipeline
    // the b34 smoothing needs no new streaming state: maintain the
    // daily fixed sums as a plain update-mode agg (bounded by live
    // (user, day) keys) and apply TimeAgg.ewma to the maintained table
    // — the I23 composition discipline
    val in = Files.createTempDirectory("graft-ewma-in").toString
    val ev = graft.sources.Tables.events(spark, sf)
    val table = scala.collection.mutable.Map.empty[(Long, String), (Long, String, Long)]
    val stream = spark.readStream.schema(ev.schema).parquet(in)
      .groupBy(col("user_id"),
        graft.operators.TimeAgg.dayKey(col("ts")).as("day"))
      .agg(sum(graft.functions.Portable.toFixed(col("value"), 4)).as("fs"))
    val q = stream.writeStream.outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach { r =>
          val k = (r.getLong(0), r.getString(1))
          table(k) = (r.getLong(0), r.getString(1), r.getLong(2))
        }
      }.start()
    try landTimeSplit(ev, in)(() => q.processAllAvailable()) finally q.stop()
    val maintained = table.values.toSeq
      .toDF("user_id", "day", "fs")
    val got = graft.operators.TimeAgg.ewma(
      maintained, "user_id", "day", "fs", span = 8, scale = 4)
    val want = graft.operators.TimeAgg.ewma(
      ev.groupBy(col("user_id"),
          graft.operators.TimeAgg.dayKey(col("ts")).as("day"))
        .agg(sum(graft.functions.Portable.toFixed(col("value"), 4)).as("fs")),
      "user_id", "day", "fs", span = 8, scale = 4)
    assert(got.count() == want.count() && want.count() > 0)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
    // the SAME maintained rollup feeds b35 autocorrelation unchanged —
    // one maintained table, two continuous analytics
    val gotAc = graft.operators.TimeAgg.autocorr(
      maintained, "user_id", "day", "fs", k = 1)
    val wantAc = graft.operators.TimeAgg.autocorr(
      ev.groupBy(col("user_id"),
          graft.operators.TimeAgg.dayKey(col("ts")).as("day"))
        .agg(sum(graft.functions.Portable.toFixed(col("value"), 4)).as("fs")),
      "user_id", "day", "fs", k = 1)
    assert(gotAc.exceptAll(wantAc).count() == 0 &&
      wantAc.exceptAll(gotAc).count() == 0)
  }
  test("streaming stickiness by composition: the I21 ledger feeds C14 unchanged (I28)") {
    import graft.streaming.IotStreamPipeline
    // the maintained active_days ledger IS stickiness's input shape —
    // the cohortCounts seam discipline: no new state, no raw re-read
    val dir = Files.createTempDirectory("graft-stick").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    val ev = graft.sources.Tables.events(spark, sf).select("user_id", "ts")
    val q = IotStreamPipeline.maintainRetention(
      spark.readStream.schema(ev.schema).parquet(s"$dir/in"),
      s"$dir/state", s"$dir/ckpt").start()
    try landTimeSplit(ev, s"$dir/in")(() => q.processAllAvailable())
    finally q.stop()
    val ledger = spark.read.parquet(s"$dir/state/active_days")
    val got = graft.operators.Sessionize.stickinessFromLedger(
      ledger, "user_id")
    val want = graft.operators.Sessionize.stickiness(
      graft.sources.Tables.events(spark, sf), "user_id", "ts")
    assert(got.count() == want.count() && want.count() > 0)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }
  test("streaming freshness by composition: maintained per-key max ts feeds DQ6 (I29)") {
    // freshness is a grouped MAX — streaming-legal as a plain
    // update-mode agg; the maintained (key, max ts) table feeds the
    // same threshold projection as batch DQ6
    val in = Files.createTempDirectory("graft-fresh-in").toString
    val ev = graft.sources.Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type")
    val table = scala.collection.mutable.Map.empty[String, java.sql.Timestamp]
    val stream = spark.readStream.schema(ev.schema).parquet(in)
      .groupBy(col("event_type")).agg(max(col("ts")).as("max_loaded_at"))
    val q = stream.writeStream.outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r => table(r.getString(0)) = r.getTimestamp(1))
      }.start()
    try landTimeSplit(ev, in)(() => q.processAllAvailable()) finally q.stop()
    val maintained = table.toSeq.toDF("event_type", "ts")
    val got = graft.operators.DataQuality.freshness(maintained,
      Seq("event_type"), "ts", lit("2024-02-01 00:00:00").cast("timestamp"),
      3L * 24 * 3600, 10L * 24 * 3600)
    val want = graft.operators.DataQuality.freshness(
      graft.sources.Tables.events(spark, sf), Seq("event_type"), "ts",
      lit("2024-02-01 00:00:00").cast("timestamp"),
      3L * 24 * 3600, 10L * 24 * 3600)
    assert(got.count() == want.count() && want.count() > 0)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }
  test("streaming LTV by composition: the maintained daily value rollup feeds C15 (I30)") {
    // daily fixed sums are additive — a plain update-mode agg maintains
    // them exactly-once under the checkpoint, and the LTV curve
    // re-derives through the SAME post-rollup stage as batch
    val in = Files.createTempDirectory("graft-ltv-in").toString
    val ev = graft.sources.Tables.events(spark, sf)
      .select("user_id", "ts", "value")
    val table = scala.collection.mutable.Map
      .empty[(Long, java.sql.Date), (Long, java.sql.Date, Long)]
    val stream = spark.readStream.schema(ev.schema).parquet(in)
      .groupBy(col("user_id"), to_date(col("ts")).as("__day"))
      .agg(sum(graft.functions.Portable.toFixed(col("value"), 4)).as("__fv"))
    val q = stream.writeStream.outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach { r =>
          table((r.getLong(0), r.getDate(1))) =
            (r.getLong(0), r.getDate(1), r.getLong(2))
        }
      }.start()
    try landTimeSplit(ev, in)(() => q.processAllAvailable()) finally q.stop()
    val maintained = table.values.toSeq.toDF("user_id", "__day", "__fv")
    val got = graft.operators.Sessionize.cohortValueFromDaily(
      maintained, "user_id")
    val want = graft.operators.Sessionize.cohortValue(
      graft.sources.Tables.events(spark, sf), "user_id", "ts", "value")
    assert(got.count() == want.count() && want.count() > 0)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }
  test("streaming growth + streaks by composition: the I21 ledger feeds C17/C18 (I31)") {
    import graft.streaming.IotStreamPipeline
    // one maintained ledger, THREE continuous analytics (stickiness
    // already rides it — I28): growth accounting and streaks re-derive
    // through the same post-collapse seams as batch
    val dir = Files.createTempDirectory("graft-growth").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    val ev = graft.sources.Tables.events(spark, sf).select("user_id", "ts")
    val q = IotStreamPipeline.maintainRetention(
      spark.readStream.schema(ev.schema).parquet(s"$dir/in"),
      s"$dir/state", s"$dir/ckpt").start()
    try landTimeSplit(ev, s"$dir/in")(() => q.processAllAvailable())
    finally q.stop()
    val ledger = spark.read.parquet(s"$dir/state/active_days")
    val gotG = graft.operators.Sessionize.growthFromLedger(ledger, "user_id")
    val wantG = graft.operators.Sessionize.growthAccounting(
      graft.sources.Tables.events(spark, sf), "user_id", "ts")
    assert(gotG.count() == wantG.count() && wantG.count() > 0)
    assert(gotG.exceptAll(wantG).count() == 0 &&
      wantG.exceptAll(gotG).count() == 0)
    val gotS = graft.operators.Sessionize.streaksFromLedger(ledger, "user_id")
    val wantS = graft.operators.Sessionize.activeStreaks(
      graft.sources.Tables.events(spark, sf), "user_id", "ts")
    assert(gotS.exceptAll(wantS).count() == 0 &&
      wantS.exceptAll(gotS).count() == 0)
    // DQ8 completeness rides the same ledger: distinct (entity, day)
    // IS its collapse stage, so the report re-derives maintained too
    val gotC = graft.operators.DataQuality.completeness(
      ledger.withColumnRenamed("__day", "ts"), Seq("user_id"), "ts")
    val wantC = graft.operators.DataQuality.completeness(
      graft.sources.Tables.events(spark, sf), Seq("user_id"), "ts")
    assert(gotC.exceptAll(wantC).count() == 0 &&
      wantC.exceptAll(gotC).count() == 0)
  }
  test("streaming anomalies by composition: maintained daily counts feed DQ7 (I32)") {
    // daily counts are additive — a plain update-mode agg maintains
    // them exactly-once; the anomaly test re-derives through the SAME
    // calendar-sized post-rollup stage as batch
    val in = Files.createTempDirectory("graft-anom-in").toString
    val ev = graft.sources.Tables.events(spark, sf)
      .select("user_id", "ts", "event_type")
    val table = scala.collection.mutable.Map
      .empty[(String, java.sql.Date), (String, java.sql.Date, Long)]
    val stream = spark.readStream.schema(ev.schema).parquet(in)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val q = stream.writeStream.outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach { r =>
          table((r.getString(0), r.getDate(1))) =
            (r.getString(0), r.getDate(1), r.getLong(2))
        }
      }.start()
    try landTimeSplit(ev, in)(() => q.processAllAvailable()) finally q.stop()
    val maintained = table.values.toSeq.toDF("event_type", "day", "cnt")
    val got = graft.operators.DataQuality.anomaliesFromDaily(
      maintained, Seq("event_type"))
    val want = graft.operators.DataQuality.rollingAnomalies(
      graft.sources.Tables.events(spark, sf), Seq("event_type"), "ts")
    assert(got.count() == want.count() && want.count() > 0)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }
  test("streaming RFM + seasonal by composition: maintained rollups feed C19/B39 (I33/I34)") {
    // RFM's rollup is (max day, count, fixed sum) — ALL additive, so a
    // plain update-mode agg maintains it; segmentation re-derives
    // through rfmFromRollup. The seasonal baseline rides the SAME
    // daily-fixed-sum shape as I27/I30.
    val in = Files.createTempDirectory("graft-rfm-in").toString
    val ev = graft.sources.Tables.events(spark, sf)
      .select("user_id", "ts", "value", "event_type")
    val rfmTable = scala.collection.mutable.Map
      .empty[Long, (Long, java.sql.Date, Long, Long)]
    val rfmStream = spark.readStream.schema(ev.schema).parquet(in)
      .groupBy(col("user_id"))
      .agg(max(to_date(col("ts"))).as("__last"),
        count(lit(1)).as("frequency"),
        sum(graft.functions.Portable.toFixed(col("value"), 4)).as("__fv"))
    val q = rfmStream.writeStream.outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach { r =>
          rfmTable(r.getLong(0)) =
            (r.getLong(0), r.getDate(1), r.getLong(2), r.getLong(3))
        }
      }.start()
    try landTimeSplit(ev, in)(() => q.processAllAvailable()) finally q.stop()
    val maintained = rfmTable.values.toSeq
      .toDF("user_id", "__last", "frequency", "__fv")
    val gotR = graft.operators.Sessionize.rfmFromRollup(maintained, "user_id")
    val wantR = graft.operators.Sessionize.rfm(
      graft.sources.Tables.events(spark, sf), "user_id", "ts", "value")
    assert(gotR.count() == wantR.count() && wantR.count() > 0)
    assert(gotR.exceptAll(wantR).count() == 0 &&
      wantR.exceptAll(gotR).count() == 0)
    // seasonal baseline off a maintained (key, day, fixed-sum) rollup
    val dailyTable = scala.collection.mutable.Map
      .empty[(String, java.sql.Date), (String, java.sql.Date, Long)]
    val in2 = Files.createTempDirectory("graft-seas-in").toString
    val dailyStream = spark.readStream.schema(ev.schema).parquet(in2)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(graft.functions.Portable.toFixed(col("value"), 4)).as("__fv"))
    val q2 = dailyStream.writeStream.outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach { r =>
          dailyTable((r.getString(0), r.getDate(1))) =
            (r.getString(0), r.getDate(1), r.getLong(2))
        }
      }.start()
    try landTimeSplit(ev, in2)(() => q2.processAllAvailable())
    finally q2.stop()
    val maintainedDaily = dailyTable.values.toSeq
      .toDF("event_type", "day", "__fv")
    val gotS = graft.operators.TimeAgg.seasonalFromDaily(
      maintainedDaily, "event_type")
    val wantS = graft.operators.TimeAgg.seasonalBaseline(
      graft.sources.Tables.events(spark, sf), "event_type", "ts", "value")
    assert(gotS.count() == wantS.count() && wantS.count() > 0)
    assert(gotS.exceptAll(wantS).count() == 0 &&
      wantS.exceptAll(gotS).count() == 0)
  }
}

/** Seed plumbing for the randomized arrival splits (r12 verdict
  * next-round #5). One RNG per landTimeSplit CALL, derived as
  * `seed + callIndex` — reproducible for a whole `sbt test` run
  * because ScalaTest executes these suites' tests sequentially in
  * declaration order, and robust to a test being run in isolation
  * only in WHICH draws it sees, never in whether a draw is valid. */
object StreamFuzz {
  val seed: Long = sys.env.get("SPARK_GRAFT_STREAM_FUZZ_SEED")
    .map(_.toLong).getOrElse(20260815L)
  private val calls = new java.util.concurrent.atomic.AtomicLong
  def nextRng(): scala.util.Random =
    new scala.util.Random(seed + calls.getAndIncrement())
}
