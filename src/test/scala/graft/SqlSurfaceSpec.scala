package graft

import graft.operators.{Incremental, Sessionize, TemporalJoin, TimeAgg}
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The SQL table-function surface ([[GraftTableFunctions]]): each
  * `graft_*` TVF must produce row-for-row the SAME result as the Scala
  * operator it wraps — they share one code path, so this is a drift
  * guard on the registration layer (argument decoding, table
  * resolution, plan splicing), not a re-test of the operators. */
class SqlSurfaceSpec extends SparkSpec {

  private def sameRows(sql: DataFrame, scala: DataFrame): Unit = {
    assert(sql.columns.toSeq == scala.columns.toSeq)
    assert(sql.collect().toSet == scala.collect().toSet)
    assert(sql.count() == scala.count())
  }

  private lazy val ready: Unit = {
    GraftExtensions.register(spark)
    Tables.events(spark, sf).createOrReplaceTempView("ev")
    Incremental.upsertLatest(Tables.orders(spark, sf),
        Seq("o_custkey", "o_orderdate"), Seq(col("o_orderkey")))
      .createOrReplaceTempView("orders_dedup")
  }

  test("graft_funnel == Sessionize.funnel, and composes in a bigger query") {
    ready
    val sql = spark.sql(
      """SELECT * FROM graft_funnel('ev', 'user_id', 'ts', 'event_type',
        |  'view,click,purchase', 3600)""".stripMargin)
    val sc = Sessionize.funnel(Tables.events(spark, sf), "user_id", "ts",
      "event_type", Seq("view", "click", "purchase"), 3600L)
    sameRows(sql, sc)
    // TVF output is a relation like any other: filter + join over it
    val composed = spark.sql(
      """SELECT f.step_name, f.n_entities
        |FROM graft_funnel('ev', 'user_id', 'ts', 'event_type',
        |                  'view,click,purchase', 3600) f
        |WHERE f.step >= 2 ORDER BY f.step""".stripMargin).collect()
    assert(composed.length == 2)
    assert(composed.map(_.getString(0)).toSeq == Seq("click", "purchase"))
  }

  test("graft_retention == Sessionize.retentionCohorts") {
    ready
    sameRows(
      spark.sql("SELECT * FROM graft_retention('ev', 'user_id', 'ts')"),
      Sessionize.retentionCohorts(Tables.events(spark, sf), "user_id", "ts"))
  }

  test("graft_asof_join == TemporalJoin.asOf, with and without tolerance") {
    ready
    val e = Tables.events(spark, sf)
    val o = spark.table("orders_dedup")
    sameRows(
      spark.sql(
        """SELECT * FROM graft_asof_join('ev', 'orders_dedup',
          |  'user_id', 'o_custkey', 'ts', 'o_orderdate',
          |  'o_orderkey,o_totalprice')""".stripMargin),
      TemporalJoin.asOf(e, o, keys = ("user_id", "o_custkey"),
        times = ("ts", "o_orderdate"),
        payload = Seq("o_orderkey", "o_totalprice")))
    sameRows(
      spark.sql(
        """SELECT * FROM graft_asof_join('ev', 'orders_dedup',
          |  'user_id', 'o_custkey', 'ts', 'o_orderdate',
          |  'o_orderkey,o_totalprice', 604800)""".stripMargin),
      TemporalJoin.asOf(e, o, keys = ("user_id", "o_custkey"),
        times = ("ts", "o_orderdate"),
        payload = Seq("o_orderkey", "o_totalprice"),
        toleranceSeconds = 604800.0))
  }

  test("graft_gapfill_locf == TimeAgg.gapfillLocf over an hourly rollup") {
    ready
    val hourly = Tables.events(spark, sf)
      .groupBy(col("user_id"), TimeAgg.timeBucket(col("ts"), 3600).as("bucket"))
      .agg(count(lit(1)).as("n_events"),
        graft.functions.Portable.fixedAvg(col("value"), 4).as("avg_value"))
    hourly.createOrReplaceTempView("hourly")
    sameRows(
      spark.sql(
        """SELECT * FROM graft_gapfill_locf('hourly', 'user_id', 'bucket',
          |  3600, 'n_events', 'avg_value')""".stripMargin),
      TimeAgg.gapfillLocf(hourly, "user_id", "bucket", 3600,
        fillZero = Seq("n_events"), locf = Seq("avg_value")))
  }

  test("graft_sessionize == Sessionize.summarize") {
    ready
    sameRows(
      spark.sql(
        """SELECT * FROM graft_sessionize('ev', 'user_id', 'ts',
          |  'event_id', 'value', 1800)""".stripMargin),
      Sessionize.summarize(Tables.events(spark, sf), "user_id", "ts",
        "event_id", "value", 1800L))
  }

  test("graft_dedup_latest == Incremental.upsertLatest") {
    ready
    sameRows(
      spark.sql(
        """SELECT * FROM graft_dedup_latest('ev', 'user_id,event_type',
          |  'ts,event_id')""".stripMargin),
      Incremental.upsertLatest(Tables.events(spark, sf),
        Seq("user_id", "event_type"), Seq(col("ts"), col("event_id"))))
  }

  test("graft_range_join == TemporalJoin.countPriorWithin") {
    ready
    val e = Tables.events(spark, sf)
    e.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts").createOrReplaceTempView("clicks")
    e.filter(col("event_type") === "view")
      .select("user_id", "ts").createOrReplaceTempView("views")
    sameRows(
      spark.sql(
        """SELECT * FROM graft_range_join('clicks', 'views', 'user_id',
          |  'user_id', 'ts', 'ts', 1800, 'n_prior_views')""".stripMargin),
      TemporalJoin.countPriorWithin(
        e.filter(col("event_type") === "click")
          .select("event_id", "user_id", "ts"),
        e.filter(col("event_type") === "view").select("user_id", "ts"),
        keys = ("user_id", "user_id"), times = ("ts", "ts"),
        windowSeconds = 1800, countName = "n_prior_views"))
  }

  test("graft_uptime == TimeAgg.heartbeatUptime") {
    ready
    sameRows(
      spark.sql(
        "SELECT * FROM graft_uptime('ev', 'user_id', 'ts', 'event_id', 1800)"),
      TimeAgg.heartbeatUptime(Tables.events(spark, sf), "user_id", "ts",
        "event_id", 1800))
  }

  test("graft_candlestick == TimeAgg.candlestick") {
    ready
    Tables.events(spark, sf)
      .withColumn("day", TimeAgg.dayKey(col("ts")))
      .createOrReplaceTempView("ev_day")
    sameRows(
      spark.sql(
        """SELECT * FROM graft_candlestick('ev_day', 'user_id,day', 'ts',
          |  'event_id', 'value')""".stripMargin),
      TimeAgg.candlestick(
        Tables.events(spark, sf).withColumn("day", TimeAgg.dayKey(col("ts"))),
        Seq("user_id", "day"), "ts", "event_id", "value"))
  }

  test("graft_topk == TopKPerKey in both modes; defaults apply") {
    ready
    Tables.events(spark, sf)
      .select(col("event_type"), col("event_id"), col("value"))
      .createOrReplaceTempView("ev_slim")
    sameRows(
      spark.sql(
        """SELECT * FROM graft_topk('ev_slim', 'event_type',
          |  'value desc,event_id asc', 5)""".stripMargin),
      graft.plans.TopKPerKey(
        Tables.events(spark, sf)
          .select(col("event_type"), col("event_id"), col("value")),
        keys = Seq(col("event_type")),
        order = Seq(col("value").desc, col("event_id").asc),
        k = 5, rankName = "rnk"))
    // ties-aware mode over a coarse band
    Tables.events(spark, sf)
      .select(col("event_type"), col("event_id"),
        floor(col("value") / 100).as("band"))
      .createOrReplaceTempView("ev_band")
    sameRows(
      spark.sql(
        """SELECT * FROM graft_topk('ev_band', 'event_type', 'band desc',
          |  2, 'rk', 'rank')""".stripMargin),
      graft.plans.TopKPerKey(
        Tables.events(spark, sf)
          .select(col("event_type"), col("event_id"),
            floor(col("value") / 100).as("band")),
        keys = Seq(col("event_type")),
        order = Seq(col("band").desc),
        k = 2, rankName = "rk", mode = graft.plans.TopKMode.Ranked))
  }

  test("graft_bpe_train / graft_bpe_encode == Curation BPE pair") {
    ready
    Tables.documents(spark, sf).createOrReplaceTempView("docs_sql")
    val sqlTrained = spark.sql(
      "SELECT * FROM graft_bpe_train('docs_sql', 'text', 10, 500, 2)")
    val scTrained = graft.operators.Curation.bpeTrain(
      Tables.documents(spark, sf), "text", numMerges = 10,
      topWords = 500, minPairCount = 2)
    sameRows(sqlTrained, scTrained)
    sqlTrained.createOrReplaceTempView("merges_sql")
    val sqlEnc = spark.sql(
      """SELECT doc_id, n_pieces FROM graft_bpe_encode('docs_sql',
        |  'doc_id', 'text', 'merges_sql')""".stripMargin)
    val scEnc = graft.operators.Curation.bpeEncode(
        Tables.documents(spark, sf), "doc_id", "text",
        graft.operators.Curation.bpeMerges(scTrained))
      .select("doc_id", "n_pieces")
    sameRows(sqlEnc, scEnc)
  }

  test("graft_drift / graft_embedding_drift == the drift operators") {
    ready
    val e = Tables.events(spark, sf)
    val cut = lit("2024-01-16").cast("timestamp")
    e.filter(col("ts") < cut).createOrReplaceTempView("ev_ref")
    e.filter(col("ts") >= cut).createOrReplaceTempView("ev_cur")
    sameRows(
      spark.sql("""SELECT * FROM graft_drift('ev_ref', 'ev_cur',
          'event_type', 'value', 0.0, 500.0, 20)""".stripMargin),
      graft.operators.DataQuality.distributionDrift(
        e.filter(col("ts") < cut), e.filter(col("ts") >= cut),
        Seq("event_type"), col("value"), 0.0, 500.0, 20))
    val emb = Tables.embeddings(spark, sf)
      .withColumn("embedding", col("embedding").cast("array<double>"))
    emb.filter(col("vec_id") % 2 === 0).createOrReplaceTempView("emb_ref")
    emb.filter(col("vec_id") % 2 === 1).createOrReplaceTempView("emb_cur")
    sameRows(
      spark.sql("""SELECT * FROM graft_embedding_drift('emb_ref',
          'emb_cur', 'label', 'embedding')""".stripMargin),
      graft.operators.Similarity.embeddingDrift(
        emb.filter(col("vec_id") % 2 === 0),
        emb.filter(col("vec_id") % 2 === 1), "label", "embedding"))
  }

  test("graft_bloom_join == Skew.bloomPrunedJoin == the plain SQL join") {
    ready
    Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_extendedprice")
      .createOrReplaceTempView("li_slim")
    Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey", "o_orderdate")
      .createOrReplaceTempView("urgent")
    val viaTvf = spark.sql(
      """SELECT l_orderkey, o_orderdate FROM graft_bloom_join(
        |'li_slim', 'urgent', 'l_orderkey', 'o_orderkey')""".stripMargin)
    val plain = spark.sql(
      """SELECT l_orderkey, o_orderdate FROM li_slim
        |JOIN urgent ON l_orderkey = o_orderkey""".stripMargin)
    sameRows(viaTvf, plain)
  }

  test("html_to_text scalar == TextFunctions.htmlToText") {
    ready
    Tables.documents(spark, sf).createOrReplaceTempView("docs_html")
    val viaSql = spark.sql(
      """SELECT doc_id, html_to_text(concat('<p>', text,
        |'</p><script>x</script>')) AS t FROM docs_html""".stripMargin)
    val viaScala = Tables.documents(spark, sf).select(col("doc_id"),
      graft.functions.TextFunctions.htmlToText(
        concat(lit("<p>"), col("text"), lit("</p><script>x</script>")))
        .as("t"))
    sameRows(viaSql, viaScala)
  }

  test("graft_evidence_score == Curation.evidenceScoreWith off the same model table") {
    ready
    val docs = Tables.documents(spark, sf)
    docs.createOrReplaceTempView("docs_ev")
    val model = graft.operators.Curation.trainEvidenceModel(
      docs.filter(col("doc_id") % 2 === 0), "text",
      graft.functions.TextFunctions.qualityScoreFromProfile(col("text"),
        graft.functions.TextFunctions.textProfile(lower(col("text")))) >= 0.5,
      vocab = 128)
    model.createOrReplaceTempView("model_ev")
    sameRows(
      spark.sql("""SELECT * FROM graft_evidence_score('docs_ev',
          'doc_id', 'text', 'model_ev')""".stripMargin),
      graft.operators.Curation.evidenceScoreWith(docs, "doc_id", "text",
        model))
  }

  test("argument errors fail loudly with the usage string") {
    ready
    val tooFew = intercept[Exception] {
      spark.sql("SELECT * FROM graft_retention('ev')").collect()
    }
    assert(tooFew.getMessage.contains("graft_retention"))
    val notLit = intercept[Exception] {
      spark.sql("SELECT * FROM graft_retention('ev', 'user_id', 'nope', 'x')")
        .collect()
    }
    assert(notLit.getMessage.contains("graft_retention"))
    val badMode = intercept[Exception] {
      spark.sql(
        "SELECT * FROM graft_topk('ev', 'event_type', 'value', 3, 'r', 'nope')")
        .collect()
    }
    assert(badMode.getMessage.contains("rownum"))
    val badOrder = intercept[Exception] {
      spark.sql(
        "SELECT * FROM graft_topk('ev', 'event_type', 'value way up', 3)")
        .collect()
    }
    assert(badOrder.getMessage.contains("order spec"))
  }

  test("r9 batch-3 TVFs == their Scala operators") {
    ready
    sameRows(
      spark.sql("""SELECT * FROM graft_transitions('ev', 'user_id', 'ts',
        'event_id', 'event_type')"""),
      Sessionize.transitions(Tables.events(spark, sf), "user_id", "ts",
        "event_id", "event_type"))
    sameRows(
      spark.sql("""SELECT * FROM graft_attribution('ev', 'user_id', 'ts',
        'event_id', 'event_type', 'click,view', 'purchase', 604800)"""),
      Sessionize.lastTouchAttribution(Tables.events(spark, sf), "user_id",
        "ts", "event_id", "event_type", Seq("click", "view"), "purchase",
        604800L))
    sameRows(
      spark.sql("""SELECT * FROM graft_multi_touch('ev', 'user_id', 'ts',
        'event_id', 'event_type', 'click,view', 'purchase', 'value',
        604800)"""),
      Sessionize.multiTouchAttribution(Tables.events(spark, sf), "user_id",
        "ts", "event_id", "event_type", Seq("click", "view"), "purchase",
        "value", 604800L))
    sameRows(
      spark.sql("""SELECT * FROM graft_markov_attribution('ev', 'user_id',
        'ts', 'event_id', 'event_type', 'click,view', 'purchase')"""),
      Sessionize.markovAttribution(Tables.events(spark, sf), "user_id",
        "ts", "event_id", "event_type", Seq("click", "view"), "purchase"))
    val daily = Tables.events(spark, sf)
      .groupBy(col("user_id"), TimeAgg.dayKey(col("ts")).as("day"))
      .agg(sum(graft.functions.Portable.toFixed(col("value"), 4)).as("fs"))
    daily.createOrReplaceTempView("daily_fs_tvf")
    sameRows(
      spark.sql(
        "SELECT * FROM graft_ewma('daily_fs_tvf', 'user_id', 'day', 'fs', 8, 4)"),
      TimeAgg.ewma(daily, "user_id", "day", "fs", span = 8, scale = 4))
    sameRows(
      spark.sql(
        "SELECT * FROM graft_autocorr('daily_fs_tvf', 'user_id', 'day', 'fs', 1)"),
      TimeAgg.autocorr(daily, "user_id", "day", "fs", k = 1))
    Tables.documents(spark, sf).createOrReplaceTempView("docs_tvf")
    sameRows(
      spark.sql("""SELECT * FROM graft_keyword_search('docs_tvf', 'doc_id',
        'text', 'spark,window,merge', 10)"""),
      graft.operators.Curation.keywordSearch(Tables.documents(spark, sf),
        "doc_id", "text", Seq("spark", "window", "merge"), 10))
    val scored = Tables.documents(spark, sf).select(col("doc_id"),
      (col("doc_id") % 7).as("difficulty"))
    scored.createOrReplaceTempView("scored_tvf")
    sameRows(
      spark.sql("""SELECT * FROM graft_curriculum('scored_tvf',
        'difficulty asc, doc_id asc', 4)"""),
      graft.operators.Curation.curriculumPhases(scored,
        Seq(col("difficulty").asc, col("doc_id").asc), phases = 4))
  }

  test("graft_twa / graft_rebalance / graft_profile == their Scala operators") {
    ready
    sameRows(
      spark.sql("""SELECT * FROM graft_twa('ev', 'user_id', 'ts',
        'event_id', 'value', 21600, 4)"""),
      TimeAgg.twaInterpolated(Tables.events(spark, sf), "user_id", "ts",
        Seq("event_id"), "value", bucketSeconds = 21600, scale = 4))
    val langs = Tables.documents(spark, sf).select(col("doc_id"), col("lang"))
    langs.createOrReplaceTempView("langs_tvf")
    sameRows(
      spark.sql("""SELECT * FROM graft_rebalance('langs_tvf', 'lang',
        'en:2,de:1,fr:1', 'doc_id', '|s')"""),
      graft.operators.Curation.rebalanceMix(langs, "lang",
        Map("en" -> 2L, "de" -> 1L, "fr" -> 1L), col("doc_id"), "|s"))
    val ev0 = Tables.events(spark, sf)
    ev0.filter(col("event_type") =!= "purchase")
      .createOrReplaceTempView("prof_ref_tvf")
    ev0.filter(col("event_type") === "purchase")
      .createOrReplaceTempView("prof_cur_tvf")
    sameRows(
      spark.sql(
        "SELECT * FROM graft_profile('prof_ref_tvf', 'prof_cur_tvf', 'value:4')"),
      graft.operators.DataQuality.profileCompare(
        ev0.filter(col("event_type") =!= "purchase"),
        ev0.filter(col("event_type") === "purchase"), Seq(("value", 4))))
    // malformed weight/scale specs fail loudly with the usage string
    val badW = intercept[Exception] {
      spark.sql("""SELECT * FROM graft_rebalance('langs_tvf', 'lang',
        'en=2', 'doc_id', '|s')""").collect()
    }
    assert(badW.getMessage.contains("stratum:weight"))
    val badC = intercept[Exception] {
      spark.sql(
        "SELECT * FROM graft_profile('prof_ref_tvf', 'prof_cur_tvf', 'value')")
        .collect()
    }
    assert(badC.getMessage.contains("col:scale"))
  }

  test("r9 batch-4 TVFs == their Scala operators") {
    ready
    sameRows(
      spark.sql(
        "SELECT * FROM graft_top_gaps('ev', 'user_id', 'ts', 'event_id', 3)"),
      TimeAgg.topGaps(Tables.events(spark, sf), "user_id", "ts",
        "event_id", k = 3))
    val daily = Tables.events(spark, sf)
      .groupBy(col("user_id"),
        TimeAgg.dayKey(col("ts")).as("day"))
      .agg(sum(graft.functions.Portable.toFixed(col("value"), 4)).as("fs"))
    daily.createOrReplaceTempView("daily_asap_tvf")
    sameRows(
      spark.sql("""SELECT * FROM graft_asap('daily_asap_tvf', 'user_id',
        'day', 'fs', '1,2,4,8', 4)"""),
      TimeAgg.asapSmooth(daily, "user_id", "day", "fs", Seq(1, 2, 4, 8), 4))
    val sizes = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    sizes.createOrReplaceTempView("sizes_tvf")
    sameRows(
      spark.sql("""SELECT * FROM graft_shard_pack('sizes_tvf', 'lang',
        'doc_id', 'n_chars', 4096)"""),
      graft.operators.Multimodal.packShards(sizes, Seq("lang"), "doc_id",
        col("n_chars"), shardBytes = 4096))
    sameRows(
      spark.sql("""SELECT * FROM graft_freshness('ev', 'event_type', 'ts',
        '2024-02-01 00:00:00', 259200, 864000)"""),
      graft.operators.DataQuality.freshness(Tables.events(spark, sf),
        Seq("event_type"), "ts",
        lit("2024-02-01 00:00:00").cast("timestamp"), 259200L, 864000L))
    val badW = intercept[Exception] {
      spark.sql("""SELECT * FROM graft_asap('daily_asap_tvf', 'user_id',
        'day', 'fs', '1,two', 4)""").collect()
    }
    assert(badW.getMessage.contains("integers"))
  }

  test("r10 TVFs + flesch_score == their Scala operators") {
    ready
    sameRows(
      spark.sql("SELECT * FROM graft_growth('ev', 'user_id', 'ts')"),
      Sessionize.growthAccounting(Tables.events(spark, sf), "user_id", "ts"))
    sameRows(
      spark.sql("SELECT * FROM graft_streaks('ev', 'user_id', 'ts')"),
      Sessionize.activeStreaks(Tables.events(spark, sf), "user_id", "ts"))
    sameRows(
      spark.sql("SELECT * FROM graft_rfm('ev', 'user_id', 'ts', 'value')"),
      Sessionize.rfm(Tables.events(spark, sf), "user_id", "ts", "value"))
    sameRows(
      spark.sql(
        "SELECT * FROM graft_anomalies('ev', 'event_type', 'ts', 7, 3, 3)"),
      graft.operators.DataQuality.rollingAnomalies(
        Tables.events(spark, sf), Seq("event_type"), "ts", 7, 3, 3))
    // the seasonal (dq16) spelling: stratum column projected in a view
    Tables.events(spark, sf)
      .select(col("event_type"), hour(col("ts")).as("hod"),
        col("event_id"), col("value"))
      .createOrReplaceTempView("ev_hod")
    sameRows(
      spark.sql(
        "SELECT * FROM graft_outliers('ev_hod', 'event_type,hod', 'value', 3, 2)"),
      graft.operators.DataQuality.outliers(
        spark.table("ev_hod"), Seq("event_type", "hod"), "value", 3, 2))
    val docsV = Tables.documents(spark, sf)
    docsV.createOrReplaceTempView("docs_tvf")
    sameRows(
      spark.sql("""SELECT * FROM graft_temperature_sample('docs_tvf',
        'source', 'doc_id', 20, '|t')"""),
      graft.operators.Curation.temperatureSample(docsV, "source",
        col("doc_id"), 20L, "|t"))
    sameRows(
      spark.sql("SELECT doc_id, flesch_score(text) AS f FROM docs_tvf"),
      docsV.select(col("doc_id"),
        graft.functions.TextFunctions.fleschScore(col("text")).as("f")))
    sameRows(
      spark.sql(
        "SELECT * FROM graft_seasonal('ev', 'event_type', 'ts', 'value')"),
      TimeAgg.seasonalBaseline(Tables.events(spark, sf), "event_type",
        "ts", "value"))
    val embV = Tables.embeddings(spark, sf)
      .withColumn("embedding", col("embedding").cast("array<double>"))
    embV.createOrReplaceTempView("emb_tvf")
    embV.filter(col("vec_id") % 100 === 0)
      .createOrReplaceTempView("emb_q_tvf")
    sameRows(
      spark.sql("""SELECT * FROM graft_matryoshka('emb_tvf', 'emb_q_tvf',
        'vec_id', 'embedding', 5, 16, 20)"""),
      graft.operators.Similarity.matryoshkaTopK(embV,
        embV.filter(col("vec_id") % 100 === 0), "vec_id", "embedding",
        5, 16, 20))
    sameRows(
      spark.sql("SELECT * FROM graft_completeness('ev', 'event_type', 'ts')"),
      graft.operators.DataQuality.completeness(Tables.events(spark, sf),
        Seq("event_type"), "ts"))
    sameRows(
      spark.sql("SELECT * FROM graft_cusum('ev', 'event_type', 'ts', 0, 30)"),
      graft.operators.DataQuality.cusumChangepoints(
        Tables.events(spark, sf), Seq("event_type"), "ts", 0, 30))
    val liZo = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"))
    liZo.createOrReplaceTempView("li_zo_tvf")
    sameRows(
      spark.sql(
        "SELECT * FROM graft_zorder('li_zo_tvf', 'l_partkey,l_suppkey', 8)"),
      graft.operators.Layout.zorderKey(liZo,
        Seq("l_partkey", "l_suppkey"), 8))
    val edges = spark.createDataFrame(
      Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))).toDF("src", "dst")
    edges.createOrReplaceTempView("edges_tvf")
    sameRows(
      spark.sql("SELECT * FROM graft_pagerank('edges_tvf', 'src', 'dst', 4)"),
      graft.operators.Graphs.pageRank(edges, "src", "dst", iters = 4))
    val seedsDf = spark.createDataFrame(Seq(Tuple1(1L))).toDF("node")
    seedsDf.createOrReplaceTempView("seeds_tvf")
    sameRows(
      spark.sql("""SELECT * FROM graft_pagerank('edges_tvf', 'src', 'dst',
        4, '', 'seeds_tvf')"""),
      graft.operators.Graphs.pageRank(edges, "src", "dst", iters = 4,
        seeds = Some(seedsDf)))
    val wEdges = spark.createDataFrame(
      Seq((1L, 2L, 3L), (2L, 3L, 1L), (3L, 1L, 2L))).toDF("src", "dst", "w")
    wEdges.createOrReplaceTempView("wedges_tvf")
    sameRows(
      spark.sql("""SELECT * FROM graft_pagerank('wedges_tvf', 'src', 'dst',
        4, 'w', '')"""),
      graft.operators.Graphs.pageRank(wEdges, "src", "dst", iters = 4,
        weight = Some("w")))
    sameRows(
      spark.sql("SELECT * FROM graft_components('edges_tvf', 'src', 'dst')"),
      graft.operators.Graphs.connectedComponents(edges, "src", "dst"))
    sameRows(
      spark.sql("SELECT * FROM graft_communities('edges_tvf', 'src', 'dst', 4)"),
      graft.operators.Graphs.labelPropagation(edges, "src", "dst", iters = 4))
    sameRows(
      spark.sql("SELECT * FROM graft_triangles('edges_tvf', 'src', 'dst')"),
      graft.operators.Graphs.triangles(edges, "src", "dst"))
    val cust = Tables.customer(spark, sf)
      .select(col("c_nationkey"),
        floor(col("c_acctbal") / 1000).as("acct_band"), col("c_mktsegment"))
    cust.createOrReplaceTempView("cust_tvf")
    sameRows(
      spark.sql(
        "SELECT * FROM graft_k_anonymity('cust_tvf', 'c_nationkey,acct_band', 5)"),
      graft.operators.DataQuality.kAnonymity(cust,
        Seq("c_nationkey", "acct_band"), k = 5L))
    sameRows(
      spark.sql("""SELECT * FROM graft_l_diversity('cust_tvf',
        'c_nationkey,acct_band', 'c_mktsegment', 3)"""),
      graft.operators.DataQuality.lDiversity(cust,
        Seq("c_nationkey", "acct_band"), "c_mktsegment", l = 3L))
    sameRows(
      spark.sql("""SELECT * FROM graft_ab_test('ev', 'user_id',
        'event_type', 'purchase', 'value')"""),
      graft.operators.DataQuality.abTest(Tables.events(spark, sf),
        "user_id", "event_type", "purchase", "value"))
    Tables.documents(spark, sf).createOrReplaceTempView("docs_tvf")
    sameRows(
      spark.sql("""SELECT * FROM graft_dsir('docs_tvf', 'doc_id', 'text',
        'source IN (''src0'', ''src1'')', 10)"""),
      graft.operators.Curation.dsirSelect(Tables.documents(spark, sf),
        "doc_id", "text", col("source").isin("src0", "src1"), n = 10))
    val embd = Tables.embeddings(spark, sf)
      .withColumn("embedding", col("embedding").cast("array<double>"))
    embd.createOrReplaceTempView("embd_tvf")
    sameRows(
      spark.sql(
        "SELECT * FROM graft_kmeans('embd_tvf', 'vec_id', 'embedding', 4, 1)"),
      graft.operators.Similarity.kmeansAssign(embd, "vec_id", "embedding",
        k = 4, iters = 1))
    sameRows(
      spark.sql("""SELECT * FROM graft_semdedup('embd_tvf', 'vec_id',
        'embedding', 4, 1, 3, 10)"""),
      graft.operators.Similarity.semDedup(embd, "vec_id", "embedding",
        k = 4, iters = 1, thresholdNum = 3, thresholdDen = 10))
    val qset = embd.filter(col("vec_id") % 100 === 0)
    val bf5 = graft.operators.Similarity.bruteForceTopK(embd, qset,
      "vec_id", "embedding", 5)
    val lsh5 = graft.operators.Similarity.lshTopK(embd, qset, "vec_id",
      "embedding", 5, 8, 64)
    bf5.createOrReplaceTempView("truth_tvf")
    lsh5.createOrReplaceTempView("cand_tvf")
    sameRows(
      spark.sql("SELECT * FROM graft_rank_eval('truth_tvf', 'cand_tvf', 5)"),
      graft.operators.Similarity.rankEval(bf5, lsh5, 5))
    val clickers = Tables.events(spark, sf)
      .filter(col("event_type") === "click")
    val viewers = Tables.events(spark, sf)
      .filter(col("event_type") === "view")
    clickers.createOrReplaceTempView("clk_tvf")
    viewers.createOrReplaceTempView("vw_tvf")
    sameRows(
      spark.sql("""SELECT * FROM graft_kmv_setops('clk_tvf', 'vw_tvf',
        'user_id', 'user_id', 256)"""),
      graft.operators.Sketches.kmvSetOps(clickers, viewers,
        col("user_id"), col("user_id"), k = 256))
    val baskets = spark.createDataFrame(
      Seq((10L, 1L), (10L, 2L), (10L, 3L), (20L, 1L), (20L, 2L)))
      .toDF("bk", "it")
    baskets.createOrReplaceTempView("baskets_tvf")
    sameRows(
      spark.sql("SELECT * FROM graft_copurchase('baskets_tvf', 'bk', 'it', 2)"),
      graft.operators.Graphs.cooccurrence(baskets, "bk", "it", minSupport = 2L))
    val badArity = intercept[Exception] {
      spark.sql("SELECT * FROM graft_cusum('ev', 'event_type', 'ts')")
        .collect()
    }
    assert(badArity.getMessage.contains("graft_cusum"))
    // r10 batch: kcore / golden_record / benford / fd_check / key_skew
    sameRows(
      spark.sql("SELECT * FROM graft_kcore('edges_tvf', 'src', 'dst', 2)"),
      graft.operators.Graphs.kcore(edges, "src", "dst", k = 2L))
    val sparseEv = spark.createDataFrame(Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 1L,
        Option(1.5), Option("a")),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:02"), 2L,
        Option.empty[Double], Option("b"))))
      .toDF("k", "ts", "id", "v", "tag")
    sparseEv.createOrReplaceTempView("sparse_tvf")
    sameRows(
      spark.sql("""SELECT * FROM graft_golden_record('sparse_tvf',
        'k', 'ts', 'id', 'v,tag')"""),
      graft.operators.Incremental.goldenRecord(sparseEv, "k", "ts", "id",
        Seq("v", "tag")))
    val priced = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_extendedprice"))
    priced.createOrReplaceTempView("priced_tvf")
    sameRows(
      spark.sql("""SELECT * FROM graft_benford('priced_tvf',
        'l_returnflag', 'l_extendedprice')"""),
      graft.operators.DataQuality.benford(priced, Seq("l_returnflag"),
        "l_extendedprice"))
    sameRows(
      spark.sql("SELECT * FROM graft_fd_check('ev', 'user_id', 'event_type')"),
      graft.operators.DataQuality.fdViolations(
        Tables.events(spark, sf), Seq("user_id"), "event_type"))
    sameRows(
      spark.sql("SELECT * FROM graft_key_skew('ev', 'user_id', 10)"),
      graft.operators.DataQuality.keySkew(
        Tables.events(spark, sf), "user_id", topN = 10))
    val badK = intercept[Exception] {
      spark.sql("SELECT * FROM graft_kcore('edges_tvf', 'src', 'dst')")
        .collect()
    }
    assert(badK.getMessage.contains("graft_kcore"))
  }
}
