package graft

import graft.functions.TextFunctions
import graft.operators.Curation
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val train = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "spark engines compile queries to distributed plans"))
    .toDF("doc_id", "text")

  test("contamination: verbatim eval doc scores 1.0, novel doc 0.0") {
    val eval = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"), // leaked
      (101L, "entirely unrelated zebra telescope harmonica wavelength"))
      .toDF("doc_id", "text")
    val got = Curation.contamination(train, eval, "doc_id", "text", 3)
      .select("doc_id", "contamination").as[(Long, Double)].collect().toMap
    assert(got(100L) == 1.0)
    assert(got(101L) == 0.0)
  }

  test("contamination: partial overlap is the shingle hit fraction") {
    // 5 tokens -> 3 shingles; first 3-shingle matches train doc 1
    val eval = Seq((200L, "the quick brown elephant trumpet"))
      .toDF("doc_id", "text")
    val got = Curation.contamination(train, eval, "doc_id", "text", 3)
      .as[(String, Long, Long, Double)].collect().head
    assert(got._2 == 3L && got._3 == 1L && got._4 == 0.3333)
  }

  test("hash sample is deterministic and close to the nominal rate") {
    val df = spark.range(10000).toDF("id")
    val a = Curation.hashSample(df, $"id", 37).as[Long].collect().toSet
    val b = Curation.hashSample(df, $"id", 37).as[Long].collect().toSet
    assert(a == b) // reproducible across runs
    assert(math.abs(a.size - 3700) < 300) // uniform bucket hash
    // nested property: a lower-rate sample is a subset of a higher-rate
    // one (bucket < 10 implies bucket < 37) -- what makes staged
    // down-sampling consistent across pipeline versions
    val c = Curation.hashSample(df, $"id", 10).as[Long].collect().toSet
    assert(c.subsetOf(a))
  }

  test("weightedThin: ppm weights gate deterministically; mass converges; salt redraws") {
    val df = spark.range(10000).toDF("id")
    // degenerate weights: >= 1e6 always keeps, <= 0 always drops
    assert(Curation.weightedThin(df, $"id", lit(1000000L)).count() == 10000L)
    assert(Curation.weightedThin(df, $"id", lit(0L)).count() == 0L)
    // constant half-weight: kept mass ~ sum(weight)/1e6, reproducible
    val a = Curation.weightedThin(df, $"id", lit(500000L))
      .as[Long].collect().toSet
    val b = Curation.weightedThin(df, $"id", lit(500000L))
      .as[Long].collect().toSet
    assert(a == b && math.abs(a.size - 5000) < 300)
    // a lower weight keeps a SUBSET of a higher weight (same hash,
    // tighter gate) — staged thinning stays consistent
    val c = Curation.weightedThin(df, $"id", lit(250000L))
      .as[Long].collect().toSet
    assert(c.subsetOf(a) && math.abs(c.size - 2500) < 250)
    // changing the salt redraws: same expected mass, different rows
    val s = Curation.weightedThin(df, $"id", lit(500000L), salt = "v2")
      .as[Long].collect().toSet
    assert(s != a && math.abs(s.size - 5000) < 300)
    // per-row weights: the e13 shape — weight column drives each row
    val wdf = df.withColumn("w",
      when($"id" % 2 === 0, 1000000L).otherwise(0L))
    val kept = Curation.weightedThin(wdf, $"id", $"w")
      .select("id").as[Long].collect()
    assert(kept.length == 5000 && kept.forall(_ % 2 == 0))
  }

  test("quota sample keeps exactly n best rows per stratum") {
    val df = Seq(
      ("a", 1L, 0.9), ("a", 2L, 0.8), ("a", 3L, 0.7),
      ("b", 4L, 0.5), ("b", 5L, 0.6))
      .toDF("lang", "doc_id", "q")
    val got = Curation.quotaSample(df, Seq("lang"), $"q", $"doc_id", 2)
      .select("lang", "doc_id").as[(String, Long)].collect().toSet
    assert(got == Set(("a", 1L), ("a", 2L), ("b", 5L), ("b", 4L)))
  }

  test("KMV distinct estimate lands within the sketch's error bound") {
    val df = spark.range(50000).select(($"id" % 10000).as("v"))
    val est = graft.operators.Sketches.kmvDistinct(df, $"v", 256)
      .select("est_distinct").as[Double].head()
    // rel std err ~ 1/sqrt(256) = 6.25%; allow 4 sigma
    assert(math.abs(est - 10000) / 10000 < 0.25, s"est=$est")
    // below k distinct values the sketch is exact
    val exact = graft.operators.Sketches.kmvDistinct(
      spark.range(100).toDF("v"), $"v", 256)
      .select("est_distinct").as[Double].head()
    assert(exact == 100.0)
  }

  test("kmvSetOps: exact under k, overlap estimates within bounds, disjoint zero") {
    import graft.operators.Sketches
    // A = 1..100, B = 51..150, both under k → every stat EXACT
    val a = spark.range(1, 101).toDF("v")
    val b = spark.range(51, 151).toDF("v")
    val r = Sketches.kmvSetOps(a, b, col("v"), col("v"), k = 256)
      .as[(Long, Double, Long, Double, Long, Double, Long, Double, Double)]
      .head()
    assert(r._1 == 100L && r._2 == 100.0)
    assert(r._3 == 100L && r._4 == 100.0)
    assert(r._5 == 150L && r._6 == 150.0)
    assert(r._7 == 50L) // true intersection, exact under k
    assert(r._8 == math.floor(50.0 / 150.0 * 1e6 + 0.5) / 1e6)
    assert(r._9 == 50.0)
    // disjoint sets → zero overlap, zero intersection estimate
    val d = Sketches.kmvSetOps(spark.range(0, 500).toDF("v"),
        spark.range(1000, 1500).toDF("v"), col("v"), col("v"), k = 256)
      .select("n_overlap", "est_intersection").as[(Long, Double)].head()
    assert(d._1 == 0L && d._2 == 0.0)
    // over-k regime: 10k vs 10k with 5k shared — estimates within 4σ-ish
    val big = Sketches.kmvSetOps(spark.range(0, 10000).toDF("v"),
        spark.range(5000, 15000).toDF("v"), col("v"), col("v"), k = 256)
      .select("est_union", "est_intersection").as[(Double, Double)].head()
    assert(math.abs(big._1 - 15000) / 15000 < 0.25, s"union=${big._1}")
    assert(math.abs(big._2 - 5000) / 5000 < 0.5, s"inter=${big._2}")
  }

  test("count-min estimates never undercount; exact at generous width") {
    import graft.operators.Sketches
    // zipf-ish: key k appears 1000/k times, 200 keys, ~5900 items
    val items = spark.range(1, 201).select(explode(sequence(lit(1),
      (lit(1000) / $"id").cast("int"))).as("rep"), $"id")
      .select(concat(lit("key"), $"id").as("term"))
    val truth = items.groupBy("term").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // tight sketch: collisions expected → est >= truth, never under
    val tight = Sketches.countMinEstimate(
      Sketches.countMinTable(items, "term", 4, 64),
      items.distinct(), "term", 4, 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (t, n) =>
      assert(tight(t) >= n, s"CMS undercounted $t: ${tight(t)} < $n") }
    // generous sketch: 200 keys across 4x4096 cells → exact w.h.p.
    val wide = Sketches.countMinEstimate(
      Sketches.countMinTable(items, "term", 4, 4096),
      items.distinct(), "term", 4, 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wide == truth)
    // CMS is distributive: per-batch sketches merged cell-wise give
    // the bit-identical matrix the full-corpus build gives
    val half = Sketches.portableHash($"term") % 2 === 0
    val (b1, b2) = (items.filter(half), items.filter(!half))
    val merged = Sketches.countMinMerge(
      Sketches.countMinTable(b1, "term", 4, 64),
      Sketches.countMinTable(b2, "term", 4, 64))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val full = Sketches.countMinTable(items, "term", 4, 64)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == full)
  }

  test("histogram percentiles land within one bin width of the nearest-rank value") {
    import org.apache.spark.sql.expressions.Window
    val ev = graft.sources.Tables.events(spark, sf)
    // the histogram targets rank ceil(p·n) — compare against the exact
    // value AT that rank (the interpolating `percentile` aggregate can
    // legitimately sit a sparse-tail gap away from any data point)
    val w = Window.partitionBy("event_type").orderBy("value")
    val ranked = ev.select($"event_type", $"value")
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
    val exact = ranked.groupBy("event_type").agg(
      min(when($"rk" === ceil($"n" * 0.5), $"value")).as("e50"),
      min(when($"rk" === ceil($"n" * 0.99), $"value")).as("e99"))
    val hist = graft.operators.Sketches.histPercentiles(ev,
      Seq("event_type"), col("value"),
      Seq(("p50", 0.5), ("p99", 0.99)), lo = 0.0, hi = 600.0, nBins = 600)
    val joined = exact.join(hist, "event_type")
      .select($"event_type", ($"p50" - $"e50").as("d50"), ($"p99" - $"e99").as("d99"))
      .as[(String, Double, Double)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (et, d50, d99) =>
      assert(math.abs(d50) <= 1.0 && math.abs(d99) <= 1.0,
        s"$et drifted beyond a bin: d50=$d50 d99=$d99")
    }
  }

  test("histogram percentile rollup == direct estimate (bin counts merge exactly)") {
    import graft.operators.{Sketches, TimeAgg}
    val ev = graft.sources.Tables.events(spark, sf)
    val ps = Seq(("p50", 0.5), ("p95", 0.95), ("p99", 0.99))
    // rollup path: per-(type, day) bins (the persisted finer aggregate)
    // merged up to months, estimated from merged bins
    val bins = Sketches.histBinCounts(
      ev.withColumn("day", TimeAgg.dayKey(col("ts"))),
      Seq("event_type", "day"), col("value"), 0.0, 600.0, 600)
    val rolled = Sketches.histPercentilesFromBins(
      Sketches.histMerge(bins.withColumn("month", substring($"day", 1, 6)),
        Seq("event_type", "month")),
      Seq("event_type", "month"), ps, 0.0, 600.0, 600)
    // direct path: bins built straight at month grain
    val direct = Sketches.histPercentiles(
      ev.withColumn("month", TimeAgg.monthKey(col("ts"))),
      Seq("event_type", "month"), col("value"), ps, 0.0, 600.0, 600)
    assert(rolled.count() > 0)
    assert(rolled.exceptAll(direct).count() == 0 &&
      direct.exceptAll(rolled).count() == 0)
  }

  test("histRollingBins: trailing window merges across a gap, anchors only on observed days") {
    import graft.operators.Sketches
    // day bins: key g, days 0101 (bin 1: 2), 0103 (bin 1: 1, bin 5: 4),
    // 0110 (bin 2: 3). Window 3:
    //   anchor 0101 <- {0101}           = bin1:2
    //   anchor 0103 <- {0101, 0103}     = bin1:3, bin5:4
    //   anchor 0110 <- {0110}           = bin2:3 (0103 is 7 days back)
    // 0102, 0104, 0105 are NOT anchors — never observed
    val bins = Seq(
      ("g", "20240101", 1L, 2L), ("g", "20240103", 1L, 1L),
      ("g", "20240103", 5L, 4L), ("g", "20240110", 2L, 3L))
      .toDF("g", "day", "__bin", "__cnt")
    val rows = Sketches.histRollingBins(bins, Seq("g"), "day", window = 3)
      .select($"day", $"__bin", $"__cnt")
      .as[(String, Long, Long)].collect().toSet
    assert(rows == Set(
      ("20240101", 1L, 2L),
      ("20240103", 1L, 3L), ("20240103", 5L, 4L),
      ("20240110", 2L, 3L)))
    // window = 1 is the identity on the bins frame
    val id = Sketches.histRollingBins(bins, Seq("g"), "day", window = 1)
      .select($"g", $"day", $"__bin", $"__cnt")
    val want = bins.select($"g", $"day", $"__bin", $"__cnt")
    assert(id.exceptAll(want).count() == 0 && want.exceptAll(id).count() == 0)
    // month-boundary carry: a 0131 bin reaches the 0201 anchor
    val feb = Seq(("g", "20240131", 1L, 1L), ("g", "20240201", 1L, 1L))
      .toDF("g", "day", "__bin", "__cnt")
    val gotFeb = Sketches.histRollingBins(feb, Seq("g"), "day", window = 3)
      .filter($"day" === "20240201")
      .select($"__cnt").as[Long].collect()
    assert(gotFeb.sum == 2L)
  }

  test("KMV rollup: merged day sketches == month-grain sketch; estimates accurate") {
    import graft.operators.{Sketches, TimeAgg}
    val ev = graft.sources.Tables.events(spark, sf)
      .withColumn("day", TimeAgg.dayKey(col("ts")))
      .withColumn("month", TimeAgg.monthKey(col("ts")))
    val k = 256
    // the union property: bottom-k of the union of per-day bottom-k
    // sets == bottom-k built directly over the month's raw rows
    val rolled = Sketches.kmvMerge(
      Sketches.kmvBottomK(ev, Seq("event_type", "day"), col("user_id"), k)
        .withColumn("month", substring($"day", 1, 6)),
      Seq("event_type", "month"), k)
    val direct = Sketches.kmvBottomK(ev, Seq("event_type", "month"),
      col("user_id"), k)
    assert(rolled.count() > 0)
    assert(rolled.exceptAll(direct).count() == 0 &&
      direct.exceptAll(rolled).count() == 0)
    // estimates off the merged sketch land within KMV's error envelope
    // of the exact per-month distinct (rel std err ≈ 1/√k ≈ 6.25%)
    val est = Sketches.kmvEstimate(rolled, Seq("event_type", "month"), k)
    val exact = ev.groupBy("event_type", "month")
      .agg(countDistinct($"user_id").as("n_exact"))
    val joined = est.join(exact, Seq("event_type", "month"))
      .select($"est_distinct", $"n_exact").as[(Double, Long)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (e, n) =>
      assert(math.abs(e - n) <= math.max(0.25 * n, 2.0),
        s"estimate $e too far from exact $n") }
  }

  test("histogram: dense per-group buckets incl. explicit zeros and under/overflow") {
    val df = Seq(("a", -1.0), ("a", 0.0), ("a", 5.0), ("a", 5.5), ("a", 10.0),
      ("a", 99.0), ("b", 3.0)).toDF("g", "v")
    // lo=0 hi=10 n=2: bucket 0 = underflow, 1 = [0,5), 2 = [5,10), 3 = overflow
    val got = graft.operators.Sketches.histogram(df, Seq("g"), col("v"),
        lo = 0.0, hi = 10.0, nBuckets = 2)
      .as[(String, Int, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(
      ("a", 0, 1L), ("a", 1, 1L), ("a", 2, 2L), ("a", 3, 2L),
      ("b", 0, 0L), ("b", 1, 1L), ("b", 2, 0L), ("b", 3, 0L)))
  }

  test("bigramStats: adjacent-pair counts with support threshold") {
    val docs = Seq("a b a b c", "a b x", "z").toDF("text")
    val got = Curation.bigramStats(docs, "text", minCount = 2)
      .as[(String, String, Long)].collect().sortBy(r => (r._1, r._2))
    // "a b" appears 3x (twice in doc1, once in doc2); every other pair
    // is below the threshold; the single-token doc contributes nothing
    assert(got.toSeq == Seq(("a", "b", 3L)))
    val all = Curation.bigramStats(docs, "text", minCount = 1)
      .as[(String, String, Long)].collect().sortBy(r => (r._1, r._2))
    assert(all.toSeq == Seq(
      ("a", "b", 3L), ("b", "a", 1L), ("b", "c", 1L), ("b", "x", 1L)))
  }

  test("leakage-safe split never puts two docs of one cluster in different splits") {
    val docs = (1L to 400L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // clusters pairing neighbors: (1,2), (5,6), ... — and one big star
    val clusters = ((1L to 100L).map(i => (2 * i, 2 * i - 1)) ++
      Seq((301L, 300L), (302L, 300L), (303L, 300L)))
      .toDF("doc_id", "cluster_id")
    val split = graft.operators.Curation.leakageSafeSplit(
      docs, "doc_id", clusters, "doc_id", "cluster_id", 90, 5)
    // every doc assigned exactly once
    assert(split.count() == 400)
    // no split_key (cluster or singleton) spans two splits
    assert(split.groupBy("split_key")
      .agg(countDistinct($"split").as("n")).filter($"n" > 1).count() == 0)
    // clustered docs share their cluster's assignment
    val star = split.filter($"doc_id".isin(300L, 301L, 302L, 303L))
      .select("split").distinct()
    assert(star.count() == 1)
    // all three splits materialize at this size
    assert(split.select("split").distinct().count() == 3)
  }

  test("repetition ratio: degenerate repeats score high, prose low") {
    val df = Seq(
      (1L, "buy now buy now buy now buy now buy now buy now"),
      (2L, "a perfectly normal sentence with no repeated phrases at all"),
      (3L, "one two"), (4L, ""))
      .toDF("doc_id", "text")
    val got = df.select($"doc_id",
      TextFunctions.repetitionRatio($"text", 3).as("r"))
      .as[(Long, Double)].collect().toMap
    assert(got(1L) > 0.7)
    assert(got(2L) == 0.0)
    assert(got(3L) == 0.0) // shorter than k: single shingle, no repetition
    assert(got(4L) == 0.0)
  }

  test("bloom contamination == exact contamination at generous bits, never under") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val isEval = col("doc_id") % 20 === 0
    val train = docs.filter(!isEval)
    val ev = docs.filter(isEval)
    val exact = Curation.contamination(train, ev, "doc_id", "text", 3)
      .select("doc_id", "n_hit").as[(Long, Long)].collect().toMap
    // ~600 bits/item: FPR is ~1e-12 class — the sketch reproduces the
    // exact report; at ANY sizing it may only over-count (no false
    // negatives), never under
    val bloom = Curation.contaminationBloom(train, ev, "doc_id", "text", 3,
      expectedItems = 200000L, numBits = 1L << 27)
      .select("doc_id", "n_hit").as[(Long, Long)].collect().toMap
    assert(bloom.keySet == exact.keySet && bloom.nonEmpty)
    assert(bloom.forall { case (d, h) => h >= exact(d) },
      "bloom must never miss a real hit")
    assert(bloom == exact, "at 600+ bits/item the sketch should be exact here")
    // empty train corpus: nothing is contaminated, nothing throws
    val none = Curation.contaminationBloom(train.limit(0), ev,
      "doc_id", "text", 3, 100L, 1L << 16)
    assert(none.filter(col("n_hit") > 0).count() == 0)

    // auto-sizing: KMV picks the sketch budget; still never under, and
    // at 16 bits/item the total over-count stays a rounding error
    val auto = Curation.contaminationBloomAuto(train, ev, "doc_id", "text", 3)
      .select("doc_id", "n_hit").as[(Long, Long)].collect().toMap
    assert(auto.keySet == exact.keySet)
    assert(auto.forall { case (d, h) => h >= exact(d) })
    val overCount = auto.map { case (d, h) => h - exact(d) }.sum.toDouble
    assert(overCount <= 0.01 * exact.values.sum,
      s"auto-sized sketch over-counted by $overCount")
  }

  test("bloom sketch honors bit budgets beyond Spark's runtime-filter cap") {
    // BloomFilterAggregate Math.min-clamps to the session caps (default
    // 2^26 bits); the build must raise them so the requested budget is
    // the built budget — observable as serialized size ≈ numBits/8
    val itemsBefore = spark.conf.getOption(Curation.MaxItemsConf)
    val bitsBefore = spark.conf.getOption(Curation.MaxBitsConf)
    val bytes = Curation.trainShingleSketch(train, "text", 3,
      expectedItems = 5000000L, numBits = 1L << 27)
    assert(bytes.length >= (1L << 27) / 8,
      s"sketch is ${bytes.length} B — the 2^27-bit request was clamped")
    // and the session caps are restored after the build
    assert(spark.conf.getOption(Curation.MaxItemsConf) == itemsBefore)
    assert(spark.conf.getOption(Curation.MaxBitsConf) == bitsBefore)
  }

  test("bloom probe plan carries the broadcast handle, not the sketch bytes") {
    val ev = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val df = Curation.contaminationBloom(train, ev, "doc_id", "text", 3,
      expectedItems = 5000000L, numBits = 1L << 27)
    // a Literal-shipped sketch would ride (and be deserialized by)
    // every task binary; assert no plan literal is sketch-sized
    val bigLiterals = df.queryExecution.executedPlan.flatMap(
      _.expressions.flatMap(_.collect {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Array[Byte], _)
            if v.length > 4096 => v.length
      }))
    assert(bigLiterals.isEmpty,
      s"sketch bytes embedded as plan literal(s) of size $bigLiterals")
    // and the probe still answers correctly through the broadcast
    val got = df.select("doc_id", "contamination")
      .as[(Long, Double)].collect().toMap
    assert(got(100L) == 1.0)
  }

  test("no-split packing: bins never overflow, full bins stay above the harmonic fill bound") {
    val seqLen = 512L
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"lang",
        TextFunctions.tokenCount($"text").as("n"))
    val packed = Curation.packSequencesNoSplit(docs, Seq("lang"), col("n"),
      order = col("n"), tieBreak = col("doc_id"), seqLen = seqLen)
    // every doc assigned exactly once, never cut
    assert(packed.count() == docs.count())
    val bins = packed.groupBy("lang", "seq_id", "bin_cap")
      .agg(sum("n").as("fill"), count(lit(1)).as("n_docs"),
        max("n").as("max_n"), min("n").as("min_n"))
    // capacity: a bin never holds more docs than its class capacity,
    // and (absent oversize docs) never more tokens than seqLen
    assert(bins.filter(col("n_docs") > col("bin_cap")).count() == 0)
    assert(bins.filter(col("max_n") <= seqLen && col("fill") > seqLen).count() == 0)
    // fill guarantee: a FULL bin of class cap carries > seqLen·cap/(cap+1)
    // tokens (each member is > seqLen/(cap+1) by class construction) —
    // ≥ 50% for every class; empty docs (n=0) are excluded from the bound
    val slack = bins.filter(col("n_docs") === col("bin_cap") &&
        col("max_n") <= seqLen && col("min_n") >= 1)
      .filter(col("fill") <= lit(seqLen.toDouble) * col("bin_cap") / (col("bin_cap") + 1))
    assert(slack.count() == 0, "a full bin fell below the harmonic fill bound")
    // oversize docs (n > seqLen) are isolated one-per-bin
    assert(packed.filter(col("n") > seqLen)
      .groupBy("seq_id").count().filter(col("count") > 1).count() == 0)
    // deterministic: a re-run assigns identical bins
    val again = Curation.packSequencesNoSplit(docs, Seq("lang"), col("n"),
      order = col("n"), tieBreak = col("doc_id"), seqLen = seqLen)
    assert(packed.exceptAll(again).count() == 0 && again.exceptAll(packed).count() == 0)
  }

  test("no-split packing stays within the harmonic bound of the sequential greedy") {
    // the parallel harmonic packing trades bins for parallelism; its
    // guarantee is ≤ ~1.69×OPT + one partial bin per (stratum, class).
    // Verify against the EXACT sequential first-fit greedy (what a
    // single-threaded packer would ship), computed driver-side on the
    // small corpus — the operator must stay inside the documented bound.
    val seqLen = 512L
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"lang", TextFunctions.tokenCount($"text").as("n"))
    val packed = Curation.packSequencesNoSplit(docs, Seq("lang"), col("n"),
      order = col("n"), tieBreak = col("doc_id"), seqLen = seqLen)
    val harmonicBins = packed.select("lang", "seq_id").distinct().count()
    val classes = packed.select("lang", "bin_cap").distinct().count()
    // exact greedy, same visit order (n desc, doc_id asc) per stratum
    val byLang = docs.select("lang", "n", "doc_id")
      .as[(String, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(r => (-r._2, r._3)).map(_._2))
    val greedyBins = byLang.values.map { ns =>
      var bins = 0L; var fill = 0L
      ns.foreach { n =>
        if (n > seqLen) { if (fill > 0) { bins += 1; fill = 0 }; bins += 1 }
        else if (fill + n > seqLen) { bins += 1; fill = n }
        else fill += n
      }
      if (fill > 0) bins + 1 else bins
    }.sum
    assert(greedyBins > 0 && harmonicBins >= greedyBins,
      "greedy is a lower bound here (it packs at least as tight)")
    assert(harmonicBins <= math.ceil(1.7 * greedyBins).toLong + classes,
      s"harmonic packing used $harmonicBins bins vs greedy $greedyBins " +
        s"(+$classes class remainders) — outside the documented bound")
  }

  test("packSequences lays docs head-to-tail with contiguous offsets") {
    // lang a: sizes 5,3,2 (desc) packed into 4-token sequences:
    //   doc 1 starts seq 0 off 0; doc 2 starts seq 1 off 1 (5 = 4+1);
    //   doc 3 starts seq 2 off 0 (5+3 = 8). lang b independent.
    val df = Seq(
      (1L, "a", 5), (2L, "a", 3), (3L, "a", 2),
      (10L, "b", 4), (11L, "b", 1))
      .toDF("doc_id", "lang", "n_tokens")
    val got = Curation.packSequences(df, Seq("lang"), col("n_tokens"),
        order = col("n_tokens"), tieBreak = col("doc_id"), seqLen = 4L)
      .select("doc_id", "seq_id", "seq_offset")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((0L, 0L)) && got(2L) == ((1L, 1L)) && got(3L) == ((2L, 0L)))
    assert(got(10L) == ((0L, 0L)) && got(11L) == ((1L, 0L)))
    // invariant: each doc starts exactly where the previous one ended
    // (seq_id * seqLen + offset == exclusive prefix sum) — packing
    // wastes no token slots
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"),
        TextFunctions.tokenCount(col("text")).as("n"))
    val packed = Curation.packSequences(docs, Seq("lang"), col("n"),
      order = col("n"), tieBreak = col("doc_id"), seqLen = 2048L)
    val bad = packed
      .withColumn("global_start", col("seq_id") * 2048L + col("seq_offset"))
      .withColumn("prev_end", sum(col("n")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("lang")
          .orderBy(col("n").desc, col("doc_id").asc)) - col("n"))
      .filter(col("global_start") =!= col("prev_end"))
    assert(bad.count() == 0)
  }

  test("chunkTokens: hand-checked windows — overlap shared, tail kept, no token dropped") {
    // 10 tokens, chunk=4, overlap=2 → stride 2 → starts 0,2,4,6,8
    val doc = Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), (2L, "   "))
      .toDF("doc_id", "text")
    val got = Curation.chunkTokens(doc, "doc_id", "text", 4, 2)
      .orderBy("doc_id", "chunk_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getInt(3), r.getString(4)))
    assert(got.toSeq == Seq(
      (1L, 0, 0, 4, "t0 t1 t2 t3"),
      (1L, 1, 2, 4, "t2 t3 t4 t5"),
      (1L, 2, 4, 4, "t4 t5 t6 t7"),
      (1L, 3, 6, 4, "t6 t7 t8 t9"),
      (1L, 4, 8, 2, "t8 t9")))          // tail chunk shorter, kept
    // whitespace-only doc produces no chunks; every token of doc 1
    // appears in at least one chunk
    val covered = got.flatMap(_._5.split(" ")).toSet
    assert(covered == (0 to 9).map(i => s"t$i").toSet)
  }

  test("topTfidfTerms: rare terms outrank common ones, rank deterministic") {
    val corpus = Seq(
      (1L, "alpha beta beta shared"),
      (2L, "alpha gamma shared"),
      (3L, "alpha delta shared")).toDF("doc_id", "text")
    val got = Curation.topTfidfTerms(corpus, "doc_id", "text", 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(5)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    // 'alpha'/'shared' appear in all 3 docs (df=3, score tf*3/3=tf);
    // doc-unique terms score 3 (1*3/1) — beta has tf=2 ⇒ score 6, top
    assert(got(1L) == Seq("beta", "alpha"))   // beta 6; alpha=shared=1 → term asc
    assert(got(2L) == Seq("gamma", "alpha"))  // gamma 3
    assert(got(3L) == Seq("delta", "alpha"))
  }

  test("ngram LM score: hand-checked transition likelihoods; short docs drop") {
    // corpus grams: "abab" -> {aba, bab}, "abc" -> {abc}; prefix "ab"
    // is followed by 'a' once and 'c' once -> P(aba)=P(abc)=1/2,
    // "ba" only by 'b' -> P(bab)=1
    val docs = Seq((1L, "abab"), (2L, "abc"), (3L, "ab"), (4L, ""))
      .toDF("doc_id", "text")
    val got = Curation.ngramLmScore(docs, "doc_id", "text", 3)
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    // docs 3 and 4 have no 3-gram transition: absent, not zero-scored
    assert(got.map(_._1).toSeq == Seq(1L, 2L))
    assert(got(0) == ((1L, 2L, 0.75, 0.5))) // (0.5 + 1.0) / 2
    assert(got(1) == ((2L, 1L, 0.5, 0.5)))
  }

  test("dsirSelect: likelihood-ratio ranking, OOV grams penalize, zero-match scores 0") {
    // target model (source t): "aaaa" → aaa:2, P(aaa)=1
    // source model (all): aaa:3 aab:1 bbb:2 → P(aaa)=.75 P(aab)=.25 P(bbb)=1
    val docs = Seq((1L, "aaaa", "t"), (2L, "aaab", "s"), (3L, "bbbb", "s"))
      .toDF("doc_id", "text", "source")
    val got = Curation.dsirSelect(docs, "doc_id", "text",
        col("source") === "t", n = 3)
      .as[(Long, Long, Double)].collect()
    // d1: at=1, as=.75 → 1.333333; d2: one OOV target gram halves the
    // target mass → at=.5, as=.5 → 1.0 (the matched-only mean would
    // have inflated it to 2.0); d3: zero target mass → 0
    assert(got.toSeq == Seq((1L, 2L, 1.333333), (2L, 1L, 1.0),
      (3L, 0L, 0.0)))
    // the cut keeps the top n by (importance desc, id asc)
    val cut = Curation.dsirSelect(docs, "doc_id", "text",
        col("source") === "t", n = 2)
      .as[(Long, Long, Double)].collect().map(_._1).toSeq
    assert(cut == Seq(1L, 2L))
  }

  test("bpeTrain learns the textbook merges with deterministic tie-breaks") {
    // Sennrich's worked example: {low×5, lower×2, newest×6, widest×3}.
    // Round 1 pair counts peak at 9 shared by (e,s),(s,t),(t,</w>) —
    // the (left, right) lexicographic tie-break picks (e,s); rounds 2/3
    // cascade (es,t) then (est,</w>); round 4 ties (l,o)/(o,w) at 7 and
    // picks (l,o); round 5 merges (lo,w).
    val words =
      Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val docs = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val merges = Curation.bpeTrain(docs, "text", numMerges = 5,
      topWords = 100, minPairCount = 2)
      .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
    assert(merges == Seq(
      (0, "e", "s", 9L), (1, "es", "t", 9L), (2, "est", "</w>", 9L),
      (3, "l", "o", 7L), (4, "lo", "w", 7L)))
  }

  test("bpeTrain: minPairCount stops before one-occurrence merges") {
    val docs = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    val merges = Curation.bpeTrain(docs, "text", numMerges = 10,
      topWords = 100, minPairCount = 2)
      .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
    // (a,b)=2 and (ab,</w>)=2 qualify; every cd pair occurs once
    assert(merges == Seq((0, "a", "b", 2L), (1, "ab", "</w>", 2L)))
  }

  test("bpeEncode applies merges lowest-rank-first; unmerged pairs stay split") {
    val merges = Seq(("e", "s"), ("es", "t"), ("est", "</w>"),
      ("l", "o"), ("lo", "w"))
    val df = Seq((1L, "Lowest low"), (2L, ""), (3L, "zz")).toDF("doc_id", "text")
    val got = Curation.bpeEncode(df, "doc_id", "text", merges)
      .as[(Long, Seq[String], Int)].collect().sortBy(_._1)
    // "lowest": e+s -> es+t -> est+</w> -> l+o -> lo+w leaves [low, est</w>];
    // "low" has no (low,</w>) merge so the marker stays separate
    assert(got(0) == ((1L, Seq("low", "est</w>", "low", "</w>"), 4)))
    assert(got(1) == ((2L, Seq(), 0)))
    assert(got(2) == ((3L, Seq("z", "z", "</w>"), 3)))
  }

  test("bpe round-trip: encoding a training word reconstructs word+</w>") {
    val words = Seq("alpha", "alphabet", "better", "butter", "batter",
      "banana", "bandana", "low", "lowest", "slow", "slower")
    val docs = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val merges = Curation.bpeMerges(
      Curation.bpeTrain(docs, "text", numMerges = 20, topWords = 100,
        minPairCount = 2))
    val got = Curation.bpeEncode(docs, "doc_id", "text", merges)
      .as[(Long, Seq[String], Int)].collect()
    got.foreach { case (id, pieces, n) =>
      assert(pieces.length == n)
      assert(pieces.mkString == words(id.toInt) + "</w>",
        s"round-trip broke for ${words(id.toInt)}: $pieces")
      assert(n <= words(id.toInt).length + 1)
    }
    // merges actually compress: at least one multi-char piece
    assert(got.exists(_._2.exists(_.length > 1)))
  }

  test("bpeEncode with zero merges is characters plus the marker") {
    val df = Seq((1L, "ab c")).toDF("doc_id", "text")
    val got = Curation.bpeEncode(df, "doc_id", "text", Seq.empty)
      .as[(Long, Seq[String], Int)].collect().head
    assert(got == ((1L, Seq("a", "b", "</w>", "c", "</w>"), 5)))
  }

  test("histCdfFromBins: ranks monotone in the probe, 1.0 at hi, inverse of the percentile estimate") {
    import graft.operators.Sketches
    val ev = graft.sources.Tables.events(spark, sf)
    val bins = Sketches.histBinCounts(
      ev, Seq("event_type"), col("value"), 0.0, 600.0, 600)
    val cdf = Sketches.histCdfFromBins(bins, Seq("event_type"),
      Seq(("a", 50.0), ("b", 150.0), ("c", 400.0), ("top", 600.0)),
      0.0, 600.0, 600).collect()
    assert(cdf.nonEmpty)
    cdf.foreach { r =>
      val Seq(a, b, c, top) = Seq("a", "b", "c", "top").map(r.getAs[Double])
      assert(a <= b && b <= c && c <= top, s"CDF not monotone: $r")
      assert(top == 1.0, s"rank at hi must be 1.0: $r")
    }
    // inverse consistency: rank(percentile(0.5)) == 0.5 up to the
    // within-bin interpolation model (both estimates share it, so the
    // round trip is tight — one bin's mass of slack)
    val p50 = Sketches.histPercentilesFromBins(bins, Seq("event_type"),
      Seq(("p50", 0.5)), 0.0, 600.0, 600)
      .select("event_type", "p50").as[(String, Double)].collect()
    p50.foreach { case (et, est) =>
      val rank = Sketches.histCdfFromBins(
        bins.filter(col("event_type") === et), Seq("event_type"),
        Seq(("r", est)), 0.0, 600.0, 600)
        .select("r").as[Double].head()
      assert(math.abs(rank - 0.5) < 0.02,
        s"rank(p50)=$rank for $et (p50 estimate $est)")
    }
  }

  test("evidence classifier: separable corpus splits on sign, OOV-only docs score zero") {
    val docs = Seq(
      (0L, "good fine solid good"), (2L, "good nice fine"),
      (4L, "good fine"), (6L, "zzz qqq zzz"),
      (1L, "bad awful bad"), (3L, "zzz qqq"), (5L, "good solid nice"))
      .toDF("doc_id", "text")
    val label = col("text").contains("good")
    val out = Curation.evidenceClassify(docs, "doc_id", "text", label,
        trainFilter = col("doc_id") % 2 === 0, vocab = 16)
      .as[(Long, Long, Double, Int)].collect()
      .map(r => r._1 -> r).toMap
    // label-true docs carry positive evidence, including held-out 5
    Seq(0L, 2L, 4L, 5L).foreach { id =>
      assert(out(id)._4 == 1 && out(id)._3 > 0, s"doc $id: ${out(id)}")
    }
    // trained-negative vocabulary drives 3/6 negative
    Seq(3L, 6L).foreach { id =>
      assert(out(id)._4 == 0 && out(id)._3 < 0, s"doc $id: ${out(id)}")
    }
    // doc 1 is entirely out-of-vocabulary: exactly zero evidence, and
    // the zero must not round to a predicted keep
    assert(out(1L)._3 == 0.0 && out(1L)._4 == 0)
  }

  test("trainEvidenceModel: vocab cap keeps the highest-total tokens with deterministic ties") {
    val docs = Seq(
      (0L, "alpha alpha alpha beta beta gamma"),
      (1L, "beta gamma delta"))
      .toDF("doc_id", "text")
    val m = Curation.trainEvidenceModel(docs, "text", col("doc_id") === 0L,
        vocab = 2)
      .as[(String, Long, Long)].collect()
    // totals: alpha 3, beta 3, gamma 2, delta 1 → cap keeps the tied
    // 3s, alphabetical within the tie
    assert(m.toSeq == Seq(("alpha", 3L, 0L), ("beta", 2L, 1L)))
  }
}
