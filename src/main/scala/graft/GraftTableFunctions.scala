package graft

import graft.operators.{Curation, Incremental, Sessionize, TemporalJoin, TimeAgg}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StringType

/** SQL TABLE-function surface for the whole-operator layer.
  *
  * The native scalar expressions are already SQL-registered
  * ([[GraftExtensions]]), but the operator layer — funnel, retention,
  * as-of join, gapfill, sessionize — was Scala-only, while the
  * reference serves these workloads to plain-SQL users (dbt models:
  * reference dags/dbt_project/models/agg/daily_summary.sql and
  * siblings). Each builder here is a
  * Spark `TableFunctionRegistry` entry (`Seq[Expression] =>
  * LogicalPlan`), so SQL users write
  *
  * {{{
  *   SELECT * FROM graft_funnel('events', 'user_id', 'ts', 'event_type',
  *                              'view,click,purchase', 3600)
  * }}}
  *
  * and get EXACTLY the Scala operator's plan — the builder resolves the
  * named table through the session catalog, calls the same operator
  * function, and returns its analyzed logical plan to be spliced into
  * the outer query. One code path, so the SQL and Scala spellings
  * cannot drift (spec-asserted row-for-row; the registered SQL
  * spellings are also oracle-checked through the same DuckDB oracles as
  * their Scala originals).
  *
  * Arguments are SQL literals (table/column names as strings, CSV lists
  * for multi-column parameters, numerics for windows/steps) — the
  * operator's knobs, not data. Installed by
  * `spark.sql.extensions=graft.GraftExtensions` at session build or
  * [[GraftExtensions.register]] on a live session.
  */
object GraftTableFunctions {

  private def lit(args: Seq[Expression], i: Int, fn: String): Any = {
    if (i >= args.length) throw new IllegalArgumentException(
      s"$fn: missing argument ${i + 1} (got ${args.length})")
    args(i) match {
      case Literal(v, _) if v != null => v
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be a non-null literal, got $other")
    }
  }

  private def str(args: Seq[Expression], i: Int, fn: String): String =
    args(i) match {
      case Literal(s, StringType) if s != null => s.toString
      case _ => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be a string literal" +
          (if (i < args.length) s", got ${args(i)}" else " (missing)"))
    }

  private def num(args: Seq[Expression], i: Int, fn: String): Double =
    lit(args, i, fn) match {
      case n: java.lang.Number => n.doubleValue()
      // SQL decimal literals ('0.0') carry Spark's Decimal, not a JVM Number
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be numeric, got $other")
    }

  private def csv(args: Seq[Expression], i: Int, fn: String): Seq[String] =
    str(args, i, fn).split(',').iterator.map(_.trim).filter(_.nonEmpty).toSeq

  /** As [[csv]] but refuses an EMPTY result — for specs where "no
    * entries" would otherwise produce a degenerate operator silently
    * (empty funnel steps crash in an anonymous `empty.reduce`; an
    * empty key list turns a per-key report into one global row)
    * instead of the usage error the caller needs (r13 verdict #7:
    * never a silent wrong default). */
  private def csv1(args: Seq[Expression], i: Int, fn: String,
                   what: String): Seq[String] = {
    val out = csv(args, i, fn)
    if (out.isEmpty) throw new IllegalArgumentException(
      s"$fn: $what must name at least one entry, got '${str(args, i, fn)}'")
    out
  }

  /** Timestamp literal with EAGER parse validation — a bare
    * `lit(s).cast("timestamp")` turns a malformed string into a silent
    * NULL, and a NULL as-of nulls every downstream lag: the exact
    * silent-wrong-default the TVF arg surface must never produce. */
  private def tsLit(args: Seq[Expression], i: Int,
                    fn: String): org.apache.spark.sql.Column = {
    val raw = str(args, i, fn)
    val parsed = org.apache.spark.sql.catalyst.expressions.Cast(
      Literal(org.apache.spark.unsafe.types.UTF8String.fromString(raw),
        StringType),
      org.apache.spark.sql.types.TimestampType, Option("UTC")).eval(null)
    if (parsed == null) throw new IllegalArgumentException(
      s"$fn: argument ${i + 1} must be a timestamp literal " +
        s"(e.g. '2024-02-01 00:00:00'), got '$raw'")
    org.apache.spark.sql.functions.lit(raw).cast("timestamp")
  }

  private def table(name: String): DataFrame = SparkSession.active.table(name)

  private def plan(df: DataFrame): LogicalPlan =
    org.apache.spark.sql.graft.ColumnBridge.logicalPlan(df)

  private def arity(args: Seq[Expression], fn: String, allowed: Set[Int],
                    usage: String): Unit =
    if (!allowed.contains(args.length)) throw new IllegalArgumentException(
      s"$fn expects ${allowed.toSeq.sorted.mkString(" or ")} arguments: " +
        s"$fn($usage); got ${args.length}")

  /** name → (builder, usage string for the ExpressionInfo). */
  val builders: Seq[(String, Seq[Expression] => LogicalPlan)] = Seq(

    // graft_funnel(table, entity, ts, typeCol, stepsCsv, windowSeconds)
    "graft_funnel" -> { args =>
      val fn = "graft_funnel"
      arity(args, fn, Set(6), "table, entity, ts, typeCol, stepsCsv, windowSeconds")
      plan(Sessionize.funnel(table(str(args, 0, fn)), str(args, 1, fn),
        str(args, 2, fn), str(args, 3, fn), csv1(args, 4, fn, "stepsCsv"),
        num(args, 5, fn).toLong))
    },

    // graft_funnel_times(table, entity, ts, typeCol, stepsCsv,
    //                    windowSeconds) — C16
    "graft_funnel_times" -> { args =>
      val fn = "graft_funnel_times"
      arity(args, fn, Set(6),
        "table, entity, ts, typeCol, stepsCsv, windowSeconds")
      plan(Sessionize.funnelTimes(table(str(args, 0, fn)), str(args, 1, fn),
        str(args, 2, fn), str(args, 3, fn), csv1(args, 4, fn, "stepsCsv"),
        num(args, 5, fn).toLong))
    },

    // graft_retention(table, entity, ts)
    "graft_retention" -> { args =>
      val fn = "graft_retention"
      arity(args, fn, Set(3), "table, entity, ts")
      plan(Sessionize.retentionCohorts(table(str(args, 0, fn)),
        str(args, 1, fn), str(args, 2, fn)))
    },

    // graft_asof_join(left, right, leftKey, rightKey, leftTime,
    //                 rightTime, payloadCsv [, toleranceSeconds])
    "graft_asof_join" -> { args =>
      val fn = "graft_asof_join"
      arity(args, fn, Set(7, 8),
        "left, right, leftKey, rightKey, leftTime, rightTime, payloadCsv[, toleranceSeconds]")
      val tol = if (args.length == 8) num(args, 7, fn) else -1.0
      plan(TemporalJoin.asOf(table(str(args, 0, fn)), table(str(args, 1, fn)),
        keys = (str(args, 2, fn), str(args, 3, fn)),
        times = (str(args, 4, fn), str(args, 5, fn)),
        payload = csv(args, 6, fn), toleranceSeconds = tol))
    },

    // graft_asof_forward(left, right, leftKey, rightKey, leftTime,
    //                    rightTime, payloadCsv [, toleranceSeconds]) — D32
    "graft_asof_forward" -> { args =>
      val fn = "graft_asof_forward"
      arity(args, fn, Set(7, 8),
        "left, right, leftKey, rightKey, leftTime, rightTime, payloadCsv[, toleranceSeconds]")
      val tol = if (args.length == 8) num(args, 7, fn) else -1.0
      plan(TemporalJoin.asOfForward(
        table(str(args, 0, fn)), table(str(args, 1, fn)),
        keys = (str(args, 2, fn), str(args, 3, fn)),
        times = (str(args, 4, fn), str(args, 5, fn)),
        payload = csv(args, 6, fn), toleranceSeconds = tol))
    },

    // graft_gapfill_locf(table, entity, bucket, stepSeconds,
    //                    fillZeroCsv, locfCsv)
    "graft_gapfill_locf" -> { args =>
      val fn = "graft_gapfill_locf"
      arity(args, fn, Set(6), "table, entity, bucket, stepSeconds, fillZeroCsv, locfCsv")
      plan(TimeAgg.gapfillLocf(table(str(args, 0, fn)), str(args, 1, fn),
        str(args, 2, fn), num(args, 3, fn).toLong,
        fillZero = csv(args, 4, fn), locf = csv(args, 5, fn)))
    },

    // graft_sessionize(table, entity, ts, tieCol, valueCol, gapSeconds)
    "graft_sessionize" -> { args =>
      val fn = "graft_sessionize"
      arity(args, fn, Set(6), "table, entity, ts, tieCol, valueCol, gapSeconds")
      plan(Sessionize.summarize(table(str(args, 0, fn)), str(args, 1, fn),
        str(args, 2, fn), str(args, 3, fn), str(args, 4, fn),
        num(args, 5, fn).toLong))
    },

    // graft_dedup_latest(table, keysCsv, orderCsv) — dbt unique_key
    // incremental upsert semantics: latest row per key
    "graft_dedup_latest" -> { args =>
      val fn = "graft_dedup_latest"
      arity(args, fn, Set(3), "table, keysCsv, orderCsv")
      plan(Incremental.upsertLatest(table(str(args, 0, fn)),
        csv(args, 1, fn), csv(args, 2, fn).map(col)))
    },

    // graft_range_join(left, right, leftKey, rightKey, leftTime,
    //                  rightTime, windowSeconds, countName)
    "graft_range_join" -> { args =>
      val fn = "graft_range_join"
      arity(args, fn, Set(8),
        "left, right, leftKey, rightKey, leftTime, rightTime, windowSeconds, countName")
      plan(TemporalJoin.countPriorWithin(
        table(str(args, 0, fn)), table(str(args, 1, fn)),
        keys = (str(args, 2, fn), str(args, 3, fn)),
        times = (str(args, 4, fn), str(args, 5, fn)),
        windowSeconds = num(args, 6, fn).toLong,
        countName = str(args, 7, fn)))
    },

    // graft_uptime(table, entity, ts, tieCol, gapSeconds)
    "graft_uptime" -> { args =>
      val fn = "graft_uptime"
      arity(args, fn, Set(5), "table, entity, ts, tieCol, gapSeconds")
      plan(TimeAgg.heartbeatUptime(table(str(args, 0, fn)),
        entity = str(args, 1, fn), ts = str(args, 2, fn),
        tieBreak = str(args, 3, fn), gapSeconds = num(args, 4, fn).toLong))
    },

    // graft_candlestick(table, keysCsv, ts, tieCol, valueCol)
    "graft_candlestick" -> { args =>
      val fn = "graft_candlestick"
      arity(args, fn, Set(5), "table, keysCsv, ts, tieCol, valueCol")
      plan(TimeAgg.candlestick(table(str(args, 0, fn)),
        keys = csv(args, 1, fn), ts = str(args, 2, fn),
        tieBreak = str(args, 3, fn), value = str(args, 4, fn)))
    },

    // graft_topk(table, keysCsv, orderCsv, k [, rankName [, mode]]) —
    // the bounded-heap TopKPerKey operator; orderCsv entries are
    // 'col', 'col asc' or 'col desc'; mode is 'rownum' (default) or
    // 'rank' (ties-aware)
    "graft_topk" -> { args =>
      val fn = "graft_topk"
      arity(args, fn, Set(4, 5, 6),
        "table, keysCsv, orderCsv, k[, rankName[, rownum|rank]]")
      val mode = if (args.length == 6) str(args, 5, fn).toLowerCase match {
        case "rownum" => graft.plans.TopKMode.RowNum
        case "rank" => graft.plans.TopKMode.Ranked
        case other => throw new IllegalArgumentException(
          s"$fn: mode must be 'rownum' or 'rank', got '$other'")
      } else graft.plans.TopKMode.RowNum
      plan(graft.plans.TopKPerKey(table(str(args, 0, fn)),
        keys = csv1(args, 1, fn, "keysCsv").map(col),
        order = csv1(args, 2, fn, "orderCsv").map(orderCol(_, fn)),
        k = num(args, 3, fn).toInt,
        rankName = if (args.length >= 5) str(args, 4, fn) else "rnk",
        mode = mode))
    },

    // graft_bpe_train(table, text, numMerges [, topWords [, minPairCount]])
    // — runs the corpus word count EAGERLY at plan time (bpeTrain's
    // merge loop needs the counts); the result relation is the
    // model-sized merge table
    "graft_bpe_train" -> { args =>
      val fn = "graft_bpe_train"
      arity(args, fn, Set(3, 4, 5),
        "table, text, numMerges[, topWords[, minPairCount]]")
      plan(Curation.bpeTrain(table(str(args, 0, fn)), str(args, 1, fn),
        numMerges = num(args, 2, fn).toInt,
        topWords = if (args.length >= 4) num(args, 3, fn).toInt else 65536,
        minPairCount = if (args.length >= 5) num(args, 4, fn).toLong else 2L))
    },

    // graft_bpe_encode(table, id, text, mergesTable) — collects the
    // MODEL-SIZED merges relation at plan time and encodes as the
    // zero-shuffle BpeSegment projection
    "graft_bpe_encode" -> { args =>
      val fn = "graft_bpe_encode"
      arity(args, fn, Set(4), "table, id, text, mergesTable")
      plan(Curation.bpeEncode(table(str(args, 0, fn)), str(args, 1, fn),
        str(args, 2, fn), Curation.bpeMerges(table(str(args, 3, fn)))))
    },

    // graft_drift(refTable, curTable, keysCsv, valueCol, lo, hi, nBins)
    "graft_drift" -> { args =>
      val fn = "graft_drift"
      arity(args, fn, Set(7), "refTable, curTable, keysCsv, valueCol, lo, hi, nBins")
      plan(graft.operators.DataQuality.distributionDrift(
        table(str(args, 0, fn)), table(str(args, 1, fn)),
        keys = csv(args, 2, fn), value = col(str(args, 3, fn)),
        lo = num(args, 4, fn), hi = num(args, 5, fn),
        nBins = num(args, 6, fn).toInt))
    },

    // graft_embedding_drift(refTable, curTable, keyCol, vecCol)
    "graft_embedding_drift" -> { args =>
      val fn = "graft_embedding_drift"
      arity(args, fn, Set(4), "refTable, curTable, keyCol, vecCol")
      plan(graft.operators.Similarity.embeddingDrift(
        table(str(args, 0, fn)), table(str(args, 1, fn)),
        key = str(args, 2, fn), vec = str(args, 3, fn)))
    },

    // graft_bloom_join(fact, dim, factKey, dimKey [, bitsPerItem]) —
    // builds the dim key sketch EAGERLY at plan time (the bpe_train
    // contract) and returns the pruned inner join
    "graft_bloom_join" -> { args =>
      val fn = "graft_bloom_join"
      arity(args, fn, Set(4, 5), "fact, dim, factKey, dimKey[, bitsPerItem]")
      plan(graft.operators.Skew.bloomPrunedJoin(
        table(str(args, 0, fn)), table(str(args, 1, fn)),
        str(args, 2, fn), str(args, 3, fn),
        bitsPerItem = if (args.length >= 5) num(args, 4, fn).toInt else 16))
    },

    // graft_evidence_score(table, id, text, modelTable) — scores
    // against a (tok, pos, neg) model relation (trainEvidenceModel's
    // output, typically a persisted table); the model is collected at
    // plan time (model-sized, the bpe_encode contract)
    "graft_evidence_score" -> { args =>
      val fn = "graft_evidence_score"
      arity(args, fn, Set(4), "table, id, text, modelTable")
      plan(Curation.evidenceScoreWith(table(str(args, 0, fn)),
        str(args, 1, fn), str(args, 2, fn), table(str(args, 3, fn))))
    },

    // graft_transitions(table, entity, ts, tieCol, typeCol) — C11
    "graft_transitions" -> { args =>
      val fn = "graft_transitions"
      arity(args, fn, Set(5), "table, entity, ts, tieCol, typeCol")
      plan(Sessionize.transitions(table(str(args, 0, fn)), str(args, 1, fn),
        str(args, 2, fn), str(args, 3, fn), str(args, 4, fn)))
    },

    // graft_attribution(table, entity, ts, tieCol, typeCol, touchCsv,
    //                   conversionType, lookbackSeconds) — C12
    "graft_attribution" -> { args =>
      val fn = "graft_attribution"
      arity(args, fn, Set(8),
        "table, entity, ts, tieCol, typeCol, touchCsv, conversionType, lookbackSeconds")
      plan(Sessionize.lastTouchAttribution(table(str(args, 0, fn)),
        str(args, 1, fn), str(args, 2, fn), str(args, 3, fn),
        str(args, 4, fn), csv(args, 5, fn), str(args, 6, fn),
        num(args, 7, fn).toLong))
    },

    // graft_multi_touch(table, entity, ts, tieCol, typeCol, touchCsv,
    //                   conversionType, valueCol, lookbackSeconds) — C22
    "graft_multi_touch" -> { args =>
      val fn = "graft_multi_touch"
      arity(args, fn, Set(9),
        "table, entity, ts, tieCol, typeCol, touchCsv, conversionType, valueCol, lookbackSeconds")
      plan(Sessionize.multiTouchAttribution(table(str(args, 0, fn)),
        str(args, 1, fn), str(args, 2, fn), str(args, 3, fn),
        str(args, 4, fn), csv(args, 5, fn), str(args, 6, fn),
        str(args, 7, fn), num(args, 8, fn).toLong))
    },

    // graft_markov_attribution(table, entity, ts, tieCol, typeCol,
    //                          touchCsv, conversionType) — C23
    "graft_markov_attribution" -> { args =>
      val fn = "graft_markov_attribution"
      arity(args, fn, Set(7),
        "table, entity, ts, tieCol, typeCol, touchCsv, conversionType")
      plan(Sessionize.markovAttribution(table(str(args, 0, fn)),
        str(args, 1, fn), str(args, 2, fn), str(args, 3, fn),
        str(args, 4, fn), csv(args, 5, fn), str(args, 6, fn)))
    },

    // graft_ewma(table, entity, orderCol, fixedCol, span, scale) — B34;
    // fixedCol must already be a fixed-point integer series
    "graft_ewma" -> { args =>
      val fn = "graft_ewma"
      arity(args, fn, Set(6), "table, entity, orderCol, fixedCol, span, scale")
      plan(TimeAgg.ewma(table(str(args, 0, fn)), str(args, 1, fn),
        str(args, 2, fn), str(args, 3, fn),
        span = num(args, 4, fn).toInt, scale = num(args, 5, fn).toInt))
    },

    // graft_autocorr(table, entity, orderCol, fixedCol, lag) — B35
    "graft_autocorr" -> { args =>
      val fn = "graft_autocorr"
      arity(args, fn, Set(5), "table, entity, orderCol, fixedCol, lag")
      plan(TimeAgg.autocorr(table(str(args, 0, fn)), str(args, 1, fn),
        str(args, 2, fn), str(args, 3, fn), k = num(args, 4, fn).toInt))
    },

    // graft_keyword_search(table, id, text, termsCsv, k) — H22
    "graft_keyword_search" -> { args =>
      val fn = "graft_keyword_search"
      arity(args, fn, Set(5), "table, id, text, termsCsv, k")
      plan(Curation.keywordSearch(table(str(args, 0, fn)), str(args, 1, fn),
        str(args, 2, fn), csv(args, 3, fn), k = num(args, 4, fn).toInt))
    },

    // graft_top_paths(table, entity, ts, tieCol, typeCol, gapSeconds,
    //                 maxSteps, k) — C13
    "graft_top_paths" -> { args =>
      val fn = "graft_top_paths"
      arity(args, fn, Set(8),
        "table, entity, ts, tieCol, typeCol, gapSeconds, maxSteps, k")
      plan(Sessionize.topPaths(table(str(args, 0, fn)), str(args, 1, fn),
        str(args, 2, fn), str(args, 3, fn), str(args, 4, fn),
        gapSeconds = num(args, 5, fn).toLong,
        maxSteps = num(args, 6, fn).toInt, k = num(args, 7, fn).toInt))
    },

    // graft_stickiness(table, entity, ts) — C14
    "graft_stickiness" -> { args =>
      val fn = "graft_stickiness"
      arity(args, fn, Set(3), "table, entity, ts")
      plan(Sessionize.stickiness(table(str(args, 0, fn)), str(args, 1, fn),
        str(args, 2, fn)))
    },

    // graft_knn_classify(corpus, queries, id, vec, label, k) — F17
    "graft_knn_classify" -> { args =>
      val fn = "graft_knn_classify"
      arity(args, fn, Set(6), "corpus, queries, id, vec, label, k")
      plan(graft.operators.Similarity.knnClassify(
        table(str(args, 0, fn)), table(str(args, 1, fn)),
        str(args, 2, fn), str(args, 3, fn), str(args, 4, fn),
        k = num(args, 5, fn).toInt))
    },

    // graft_cohort_value(table, entity, ts, valueCol) — C15
    "graft_cohort_value" -> { args =>
      val fn = "graft_cohort_value"
      arity(args, fn, Set(4), "table, entity, ts, valueCol")
      plan(Sessionize.cohortValue(table(str(args, 0, fn)), str(args, 1, fn),
        str(args, 2, fn), str(args, 3, fn)))
    },

    // graft_top_gaps(table, entity, ts, tieCol, k) — B37
    "graft_top_gaps" -> { args =>
      val fn = "graft_top_gaps"
      arity(args, fn, Set(5), "table, entity, ts, tieCol, k")
      plan(TimeAgg.topGaps(table(str(args, 0, fn)), str(args, 1, fn),
        str(args, 2, fn), str(args, 3, fn), k = num(args, 4, fn).toInt))
    },

    // graft_asap(table, entity, orderCol, fixedCol, windowsCsv, scale)
    // — B38; windowsCsv is the dyadic candidate grid, e.g. '1,2,4,8'
    "graft_asap" -> { args =>
      val fn = "graft_asap"
      arity(args, fn, Set(6),
        "table, entity, orderCol, fixedCol, windowsCsv, scale")
      val ws = csv(args, 4, fn).map { x =>
        if (x.forall(_.isDigit) && x.nonEmpty) x.toInt
        else throw new IllegalArgumentException(
          s"$fn: windowsCsv entries must be integers, got '$x'")
      }
      plan(TimeAgg.asapSmooth(table(str(args, 0, fn)), str(args, 1, fn),
        str(args, 2, fn), str(args, 3, fn), windows = ws,
        scale = num(args, 5, fn).toInt))
    },

    // graft_twa(table, entity, ts, tieCsv, value, bucketSeconds,
    //           scale) — B36 interpolated time-weighted average
    "graft_twa" -> { args =>
      val fn = "graft_twa"
      arity(args, fn, Set(7),
        "table, entity, ts, tieCsv, value, bucketSeconds, scale")
      plan(TimeAgg.twaInterpolated(table(str(args, 0, fn)), str(args, 1, fn),
        str(args, 2, fn), csv(args, 3, fn), str(args, 4, fn),
        bucketSeconds = num(args, 5, fn).toLong,
        scale = num(args, 6, fn).toInt))
    },

    // graft_rebalance(table, stratum, weightsCsv, keyCol, salt) — K9;
    // weightsCsv entries are 'stratum:weight'
    "graft_rebalance" -> { args =>
      val fn = "graft_rebalance"
      arity(args, fn, Set(5), "table, stratum, weightsCsv('s:w'), keyCol, salt")
      val weights = csv1(args, 2, fn, "weightsCsv").map { kv =>
        kv.split(":") match {
          case Array(k, v) if k.trim.nonEmpty && v.nonEmpty &&
              v.forall(_.isDigit) => k.trim -> v.toLong
          case _ => throw new IllegalArgumentException(
            s"$fn: weightsCsv entries must be 'stratum:weight', got '$kv'")
        }
      }.toMap
      plan(Curation.rebalanceMix(table(str(args, 0, fn)), str(args, 1, fn),
        weights, col(str(args, 3, fn)), str(args, 4, fn)))
    },

    // graft_profile(refTable, curTable, colsCsv('col:scale')) — DQ5
    "graft_profile" -> { args =>
      val fn = "graft_profile"
      arity(args, fn, Set(3), "refTable, curTable, colsCsv('col:scale')")
      val cols = csv1(args, 2, fn, "colsCsv").map { kv =>
        kv.split(":") match {
          case Array(k, v) if k.trim.nonEmpty && v.nonEmpty &&
              v.forall(_.isDigit) => k.trim -> v.toInt
          case _ => throw new IllegalArgumentException(
            s"$fn: colsCsv entries must be 'col:scale', got '$kv'")
        }
      }
      plan(graft.operators.DataQuality.profileCompare(
        table(str(args, 0, fn)), table(str(args, 1, fn)), cols))
    },

    // graft_shard_pack(table, stratumCsv, id, bytesCol, shardBytes) — G6
    "graft_shard_pack" -> { args =>
      val fn = "graft_shard_pack"
      arity(args, fn, Set(5), "table, stratumCsv, id, bytesCol, shardBytes")
      plan(graft.operators.Multimodal.packShards(table(str(args, 0, fn)),
        csv(args, 1, fn), str(args, 2, fn), col(str(args, 3, fn)),
        shardBytes = num(args, 4, fn).toLong))
    },

    // graft_freshness(table, keysCsv, ts, asOfTimestamp, warnSeconds,
    //                 errorSeconds) — DQ6; asOf is a literal string
    "graft_freshness" -> { args =>
      val fn = "graft_freshness"
      arity(args, fn, Set(6),
        "table, keysCsv, ts, asOfTimestamp, warnSeconds, errorSeconds")
      plan(graft.operators.DataQuality.freshness(table(str(args, 0, fn)),
        csv1(args, 1, fn, "keysCsv"), str(args, 2, fn),
        tsLit(args, 3, fn),
        warnAfterSeconds = num(args, 4, fn).toLong,
        errorAfterSeconds = num(args, 5, fn).toLong))
    },

    // graft_curriculum(table, orderCsv, phases) — K8; the distributed
    // global rank runs its partition-count job EAGERLY at plan time
    // (the bpe_train eager contract)
    "graft_curriculum" -> { args =>
      val fn = "graft_curriculum"
      arity(args, fn, Set(3), "table, orderCsv, phases")
      plan(Curation.curriculumPhases(table(str(args, 0, fn)),
        csv1(args, 1, fn, "orderCsv").map(orderCol(_, fn)),
        phases = num(args, 2, fn).toInt))
    },

    // graft_growth(table, entity, ts) — C17
    "graft_growth" -> { args =>
      val fn = "graft_growth"
      arity(args, fn, Set(3), "table, entity, ts")
      plan(Sessionize.growthAccounting(table(str(args, 0, fn)),
        str(args, 1, fn), str(args, 2, fn)))
    },

    // graft_streaks(table, entity, ts) — C18
    "graft_streaks" -> { args =>
      val fn = "graft_streaks"
      arity(args, fn, Set(3), "table, entity, ts")
      plan(Sessionize.activeStreaks(table(str(args, 0, fn)),
        str(args, 1, fn), str(args, 2, fn)))
    },

    // graft_rfm(table, entity, ts, valueCol) — C19; the exact-ntile
    // ranks run their partition-count jobs EAGERLY at plan time (the
    // graft_curriculum contract)
    "graft_rfm" -> { args =>
      val fn = "graft_rfm"
      arity(args, fn, Set(4), "table, entity, ts, valueCol")
      plan(Sessionize.rfm(table(str(args, 0, fn)), str(args, 1, fn),
        str(args, 2, fn), str(args, 3, fn)))
    },

    // graft_anomalies(table, keysCsv, ts, window, minPrior, z) — DQ7
    "graft_anomalies" -> { args =>
      val fn = "graft_anomalies"
      arity(args, fn, Set(6), "table, keysCsv, ts, window, minPrior, z")
      plan(graft.operators.DataQuality.rollingAnomalies(
        table(str(args, 0, fn)), csv(args, 1, fn), str(args, 2, fn),
        window = num(args, 3, fn).toInt, minPrior = num(args, 4, fn).toInt,
        z = num(args, 5, fn).toInt))
    },

    // graft_outliers(table, keysCsv, valueCol, k, scale) — the DQ2/DQ16
    // exact z²-test family; project a stratum column (e.g. hour-of-day)
    // into the table for the seasonal-baseline spelling
    "graft_outliers" -> { args =>
      val fn = "graft_outliers"
      arity(args, fn, Set(5), "table, keysCsv, valueCol, k, scale")
      plan(graft.operators.DataQuality.outliers(
        table(str(args, 0, fn)), csv(args, 1, fn), str(args, 2, fn),
        k = num(args, 3, fn).toInt, scale = num(args, 4, fn).toInt))
    },

    // graft_temperature_sample(table, stratum, keyCol, total, salt) —
    // K10; the stratum-count allocation collects EAGERLY at plan time
    "graft_temperature_sample" -> { args =>
      val fn = "graft_temperature_sample"
      arity(args, fn, Set(5), "table, stratum, keyCol, total, salt")
      plan(Curation.temperatureSample(table(str(args, 0, fn)),
        str(args, 1, fn), col(str(args, 2, fn)),
        total = num(args, 3, fn).toLong, salt = str(args, 4, fn)))
    },

    // graft_seasonal(table, key, ts, valueCol) — B39
    "graft_seasonal" -> { args =>
      val fn = "graft_seasonal"
      arity(args, fn, Set(4), "table, key, ts, valueCol")
      plan(TimeAgg.seasonalBaseline(table(str(args, 0, fn)),
        str(args, 1, fn), str(args, 2, fn), str(args, 3, fn)))
    },

    // graft_matryoshka(corpus, queries, id, vec, k, mDims, candidates)
    // — F18
    "graft_matryoshka" -> { args =>
      val fn = "graft_matryoshka"
      arity(args, fn, Set(7), "corpus, queries, id, vec, k, mDims, candidates")
      plan(graft.operators.Similarity.matryoshkaTopK(
        table(str(args, 0, fn)), table(str(args, 1, fn)),
        str(args, 2, fn), str(args, 3, fn), k = num(args, 4, fn).toInt,
        mDims = num(args, 5, fn).toInt,
        candidates = num(args, 6, fn).toInt))
    },

    // graft_completeness(table, keysCsv, ts) — DQ8
    "graft_completeness" -> { args =>
      val fn = "graft_completeness"
      arity(args, fn, Set(3), "table, keysCsv, ts")
      plan(graft.operators.DataQuality.completeness(
        table(str(args, 0, fn)), csv(args, 1, fn), str(args, 2, fn)))
    },

    // graft_scene_cuts(mediaTable, frameBytes, everyNth, cutHamming)
    // — G7; mediaTable must carry (media_id, payload)
    "graft_scene_cuts" -> { args =>
      val fn = "graft_scene_cuts"
      arity(args, fn, Set(4), "mediaTable, frameBytes, everyNth, cutHamming")
      plan(graft.operators.Multimodal.sceneCuts(table(str(args, 0, fn)),
        frameBytes = num(args, 1, fn).toInt,
        everyNth = num(args, 2, fn).toInt,
        cutHamming = num(args, 3, fn).toInt))
    },

    // graft_mmr(corpus, queries, id, vec, k, poolSize) — F19
    "graft_mmr" -> { args =>
      val fn = "graft_mmr"
      arity(args, fn, Set(6), "corpus, queries, id, vec, k, poolSize")
      plan(graft.operators.Similarity.mmrTopK(
        table(str(args, 0, fn)), table(str(args, 1, fn)),
        str(args, 2, fn), str(args, 3, fn), k = num(args, 4, fn).toInt,
        poolSize = num(args, 5, fn).toInt))
    },

    // graft_instant_rate(table, key, ts, tieCol, valueCol) — B40
    "graft_instant_rate" -> { args =>
      val fn = "graft_instant_rate"
      arity(args, fn, Set(5), "table, key, ts, tieCol, valueCol")
      plan(TimeAgg.instantRate(table(str(args, 0, fn)), str(args, 1, fn),
        str(args, 2, fn), str(args, 3, fn), str(args, 4, fn)))
    },

    // graft_line_dedup(table, id, textCol, minDocs) — H27
    "graft_line_dedup" -> { args =>
      val fn = "graft_line_dedup"
      arity(args, fn, Set(4), "table, id, textCol, minDocs")
      plan(Curation.lineDedup(table(str(args, 0, fn)), str(args, 1, fn),
        str(args, 2, fn), minDocs = num(args, 3, fn).toLong))
    },

    // graft_interval_lookup(facts, dim, valueCol, loCol, hiCol,
    //                       bucketWidth) — D33
    "graft_interval_lookup" -> { args =>
      val fn = "graft_interval_lookup"
      arity(args, fn, Set(6), "facts, dim, valueCol, loCol, hiCol, bucketWidth")
      plan(TemporalJoin.intervalLookup(table(str(args, 0, fn)),
        table(str(args, 1, fn)), str(args, 2, fn), str(args, 3, fn),
        str(args, 4, fn), bucketWidth = num(args, 5, fn)))
    },

    // graft_cusum(table, keysCsv, ts, slack, threshold) — DQ9
    "graft_cusum" -> { args =>
      val fn = "graft_cusum"
      arity(args, fn, Set(5), "table, keysCsv, ts, slack, threshold")
      plan(graft.operators.DataQuality.cusumChangepoints(
        table(str(args, 0, fn)), csv(args, 1, fn), str(args, 2, fn),
        slack = num(args, 3, fn).toInt,
        threshold = num(args, 4, fn).toInt))
    },

    // graft_pagerank(edges, src, dst, iters[, weightCol, seedsTable])
    // — H28/L4/L5; '' skips an optional ('' weight = unweighted, ''
    // seeds = uniform restart); the iterative rounds run their
    // node-sized localCheckpoint jobs eagerly at plan time (the
    // bpe_train contract)
    "graft_pagerank" -> { args =>
      val fn = "graft_pagerank"
      arity(args, fn, Set(4, 6),
        "edges, src, dst, iters[, weightCol, seedsTable]")
      val w = if (args.size > 4) Some(str(args, 4, fn)).filter(_.nonEmpty) else None
      val s = if (args.size > 5) Some(str(args, 5, fn)).filter(_.nonEmpty) else None
      plan(graft.operators.Graphs.pageRank(table(str(args, 0, fn)),
        str(args, 1, fn), str(args, 2, fn),
        iters = num(args, 3, fn).toInt,
        weight = w, seeds = s.map(table)))
    },

    // graft_hits(edges, src, dst, iters) — L10; the mutual-
    // reinforcement rounds run eagerly at plan time (the
    // graft_pagerank contract)
    "graft_hits" -> { args =>
      val fn = "graft_hits"
      arity(args, fn, Set(4), "edges, src, dst, iters")
      plan(graft.operators.Graphs.hits(table(str(args, 0, fn)),
        str(args, 1, fn), str(args, 2, fn),
        iters = num(args, 3, fn).toInt))
    },

    // graft_zorder(table, dimsCsv, bits) — K11; the per-dimension
    // (min, max) collect runs EAGERLY at plan time (the
    // graft_curriculum contract)
    "graft_zorder" -> { args =>
      val fn = "graft_zorder"
      arity(args, fn, Set(3), "table, dimsCsv, bits")
      plan(graft.operators.Layout.zorderKey(table(str(args, 0, fn)),
        csv(args, 1, fn), bits = num(args, 2, fn).toInt))
    },

    // graft_hll(table, groupCsv, key, p) — B9b: portable HLL distinct
    // estimate per group (md5 registers, oracle-reproducible)
    "graft_hll" -> { args =>
      val fn = "graft_hll"
      arity(args, fn, Set(4), "table, groupCsv, key, p")
      plan(graft.operators.Sketches.hllDistinct(table(str(args, 0, fn)),
        csv(args, 1, fn), col(str(args, 2, fn)), num(args, 3, fn).toInt))
    },

    // graft_kmv_setops(tableA, tableB, keyA, keyB, k) — B42
    "graft_kmv_setops" -> { args =>
      val fn = "graft_kmv_setops"
      arity(args, fn, Set(5), "tableA, tableB, keyA, keyB, k")
      plan(graft.operators.Sketches.kmvSetOps(table(str(args, 0, fn)),
        table(str(args, 1, fn)), col(str(args, 2, fn)),
        col(str(args, 3, fn)), num(args, 4, fn).toInt))
    },

    // graft_rank_eval(truthTable, candTable, k) — F22; both tables are
    // (query_id, rank, nn_id, …) ranked frames with ranks <= k
    "graft_rank_eval" -> { args =>
      val fn = "graft_rank_eval"
      arity(args, fn, Set(3), "truthTable, candTable, k")
      plan(graft.operators.Similarity.rankEval(table(str(args, 0, fn)),
        table(str(args, 1, fn)), num(args, 2, fn).toInt))
    },

    // graft_kmeans(table, id, vec, k, iters) — F20
    "graft_kmeans" -> { args =>
      val fn = "graft_kmeans"
      arity(args, fn, Set(5), "table, id, vec, k, iters")
      plan(graft.operators.Similarity.kmeansAssign(table(str(args, 0, fn)),
        str(args, 1, fn), str(args, 2, fn), num(args, 3, fn).toInt,
        num(args, 4, fn).toInt))
    },

    // graft_semdedup(table, id, vec, k, iters, thresholdNum,
    //                thresholdDen) — F21
    "graft_semdedup" -> { args =>
      val fn = "graft_semdedup"
      arity(args, fn, Set(7),
        "table, id, vec, k, iters, thresholdNum, thresholdDen")
      plan(graft.operators.Similarity.semDedup(table(str(args, 0, fn)),
        str(args, 1, fn), str(args, 2, fn), num(args, 3, fn).toInt,
        num(args, 4, fn).toInt, num(args, 5, fn).toLong,
        num(args, 6, fn).toLong))
    },

    // graft_dsir(table, id, text, targetPredicateSql, n) — K12; the
    // predicate is any boolean SQL expression over the table's columns
    "graft_dsir" -> { args =>
      val fn = "graft_dsir"
      arity(args, fn, Set(5), "table, id, text, targetPredicateSql, n")
      plan(Curation.dsirSelect(table(str(args, 0, fn)), str(args, 1, fn),
        str(args, 2, fn),
        org.apache.spark.sql.functions.expr(str(args, 3, fn)),
        num(args, 4, fn).toInt))
    },

    // graft_ab_test(table, entity, typeCol, conversionType, valueCol) — DQ15
    "graft_ab_test" -> { args =>
      val fn = "graft_ab_test"
      arity(args, fn, Set(5),
        "table, entity, typeCol, conversionType, valueCol")
      plan(graft.operators.DataQuality.abTest(table(str(args, 0, fn)),
        str(args, 1, fn), str(args, 2, fn), str(args, 3, fn),
        str(args, 4, fn)))
    },

    // graft_k_anonymity(table, quasiCsv, k) — DQ10
    "graft_k_anonymity" -> { args =>
      val fn = "graft_k_anonymity"
      arity(args, fn, Set(3), "table, quasiCsv, k")
      plan(graft.operators.DataQuality.kAnonymity(table(str(args, 0, fn)),
        csv(args, 1, fn), num(args, 2, fn).toLong))
    },

    // graft_l_diversity(table, quasiCsv, sensitive, l) — DQ11
    "graft_l_diversity" -> { args =>
      val fn = "graft_l_diversity"
      arity(args, fn, Set(4), "table, quasiCsv, sensitive, l")
      plan(graft.operators.DataQuality.lDiversity(table(str(args, 0, fn)),
        csv(args, 1, fn), str(args, 2, fn), num(args, 3, fn).toLong))
    },

    // graft_t_closeness(table, quasiCsv, sensitive, t) — DQ17
    "graft_t_closeness" -> { args =>
      val fn = "graft_t_closeness"
      arity(args, fn, Set(4), "table, quasiCsv, sensitive, t")
      plan(graft.operators.DataQuality.tCloseness(table(str(args, 0, fn)),
        csv(args, 1, fn), str(args, 2, fn), num(args, 3, fn)))
    },

    // graft_components(edges, src, dst) — L1; the label-propagation
    // iterations run eagerly at plan time (the graft_pagerank contract)
    "graft_components" -> { args =>
      val fn = "graft_components"
      arity(args, fn, Set(3), "edges, src, dst")
      plan(graft.operators.Graphs.connectedComponents(
        table(str(args, 0, fn)), str(args, 1, fn), str(args, 2, fn)))
    },

    // graft_communities(edges, src, dst, iters) — L11
    "graft_communities" -> { args =>
      val fn = "graft_communities"
      arity(args, fn, Set(4), "edges, src, dst, iters")
      plan(graft.operators.Graphs.labelPropagation(
        table(str(args, 0, fn)), str(args, 1, fn), str(args, 2, fn),
        num(args, 3, fn).toInt))
    },

    // graft_weighted_thin(table, keyCol, weightPpmCol[, salt]) — K13
    "graft_weighted_thin" -> { args =>
      val fn = "graft_weighted_thin"
      arity(args, fn, Set(3, 4), "table, keyCol, weightPpmCol[, salt]")
      plan(graft.operators.Curation.weightedThin(
        table(str(args, 0, fn)), col(str(args, 1, fn)),
        col(str(args, 2, fn)),
        salt = if (args.length > 3) str(args, 3, fn) else ""))
    },

    // graft_soft_dedup(docs, id, pairs, a, b) — E13
    "graft_soft_dedup" -> { args =>
      val fn = "graft_soft_dedup"
      arity(args, fn, Set(5), "docs, id, pairs, a, b")
      plan(graft.operators.Dedup.softDedupWeights(
        table(str(args, 0, fn)), str(args, 1, fn),
        table(str(args, 2, fn)), str(args, 3, fn), str(args, 4, fn)))
    },

    // graft_modularity(edges, src, dst, labels, node, community) — L12
    "graft_modularity" -> { args =>
      val fn = "graft_modularity"
      arity(args, fn, Set(6), "edges, src, dst, labels, node, community")
      plan(graft.operators.Graphs.modularity(
        table(str(args, 0, fn)), str(args, 1, fn), str(args, 2, fn),
        table(str(args, 3, fn)), str(args, 4, fn), str(args, 5, fn)))
    },

    // graft_copurchase(table, basket, item, minSupport) — L2
    "graft_copurchase" -> { args =>
      val fn = "graft_copurchase"
      arity(args, fn, Set(4), "table, basket, item, minSupport")
      plan(graft.operators.Graphs.cooccurrence(table(str(args, 0, fn)),
        str(args, 1, fn), str(args, 2, fn),
        minSupport = num(args, 3, fn).toLong))
    },

    // graft_triangles(edges, src, dst) — L3
    "graft_triangles" -> { args =>
      val fn = "graft_triangles"
      arity(args, fn, Set(3), "edges, src, dst")
      plan(graft.operators.Graphs.triangles(
        table(str(args, 0, fn)), str(args, 1, fn), str(args, 2, fn)))
    },

    // graft_kcore(edges, src, dst, k) — L6; the peeling rounds run
    // their convergence probes eagerly at plan time (the
    // graft_pagerank contract)
    "graft_kcore" -> { args =>
      val fn = "graft_kcore"
      arity(args, fn, Set(4), "edges, src, dst, k")
      plan(graft.operators.Graphs.kcore(
        table(str(args, 0, fn)), str(args, 1, fn), str(args, 2, fn),
        k = num(args, 3, fn).toLong))
    },

    // graft_scc(edges, src, dst) — L13; the FB-coloring rounds run
    // their convergence probes eagerly at plan time (the graft_kcore
    // contract)
    "graft_scc" -> { args =>
      val fn = "graft_scc"
      arity(args, fn, Set(3), "edges, src, dst")
      plan(graft.operators.Graphs.scc(
        table(str(args, 0, fn)), str(args, 1, fn), str(args, 2, fn)))
    },

    // graft_condense(edges, src, dst) — L14; the SCC + relaxation
    // rounds run their convergence probes eagerly at plan time (the
    // graft_scc contract)
    "graft_condense" -> { args =>
      val fn = "graft_condense"
      arity(args, fn, Set(3), "edges, src, dst")
      plan(graft.operators.Graphs.condense(
        table(str(args, 0, fn)), str(args, 1, fn), str(args, 2, fn)))
    },

    // graft_golden_record(table, key, ts, tieCol, fieldsCsv) — C20
    "graft_golden_record" -> { args =>
      val fn = "graft_golden_record"
      arity(args, fn, Set(5), "table, key, ts, tieCol, fieldsCsv")
      plan(graft.operators.Incremental.goldenRecord(
        table(str(args, 0, fn)), str(args, 1, fn), str(args, 2, fn),
        str(args, 3, fn), csv(args, 4, fn)))
    },

    // graft_benford(table, keysCsv, valueCol) — DQ12
    "graft_benford" -> { args =>
      val fn = "graft_benford"
      arity(args, fn, Set(3), "table, keysCsv, valueCol")
      plan(graft.operators.DataQuality.benford(
        table(str(args, 0, fn)), csv(args, 1, fn), str(args, 2, fn)))
    },

    // graft_fd_check(table, detCsv, depCol) — DQ13
    "graft_fd_check" -> { args =>
      val fn = "graft_fd_check"
      arity(args, fn, Set(3), "table, detCsv, depCol")
      plan(graft.operators.DataQuality.fdViolations(
        table(str(args, 0, fn)), csv(args, 1, fn), str(args, 2, fn)))
    },

    // graft_key_skew(table, key, topN) — DQ14
    "graft_key_skew" -> { args =>
      val fn = "graft_key_skew"
      arity(args, fn, Set(3), "table, key, topN")
      plan(graft.operators.DataQuality.keySkew(
        table(str(args, 0, fn)), str(args, 1, fn),
        topN = num(args, 2, fn).toInt))
    },

    // graft_neighbor_jaccard(edges, src, dst, threshold, maxDegree) — L7
    "graft_neighbor_jaccard" -> { args =>
      val fn = "graft_neighbor_jaccard"
      arity(args, fn, Set(5), "edges, src, dst, threshold, maxDegree")
      plan(graft.operators.Graphs.neighborJaccard(
        table(str(args, 0, fn)), str(args, 1, fn), str(args, 2, fn),
        threshold = num(args, 3, fn), maxDegree = num(args, 4, fn).toInt))
    },

    // graft_containment(docs, id, textCol, k, threshold, maxDocFreq) — E12
    "graft_containment" -> { args =>
      val fn = "graft_containment"
      arity(args, fn, Set(6), "docs, id, textCol, k, threshold, maxDocFreq")
      plan(graft.operators.Dedup.containmentPairs(
        table(str(args, 0, fn)), str(args, 1, fn), str(args, 2, fn),
        k = num(args, 3, fn).toInt, threshold = num(args, 4, fn),
        maxDocFreq = num(args, 5, fn).toInt))
    },

    // ── versioned-table READ side (J15) — time travel belongs in FROM
    // clauses where pruning/pushdown compose with the outer query; the
    // WRITE side (commit/rollback/vacuum) is CALL graft.* procedures
    // (graft.sql.GraftCatalog). One code path with the Scala API.

    // graft_read_at(path, version) — VERSION AS OF
    "graft_read_at" -> { args =>
      val fn = "graft_read_at"
      arity(args, fn, Set(2), "path, version")
      plan(graft.sources.Versioned.readAt(SparkSession.active,
        str(args, 0, fn), num(args, 1, fn).toLong))
    },

    // graft_read_latest(path)
    "graft_read_latest" -> { args =>
      val fn = "graft_read_latest"
      arity(args, fn, Set(1), "path")
      plan(graft.sources.Versioned.readLatest(SparkSession.active,
        str(args, 0, fn)))
    },

    // graft_versions(path) — the committed version ids
    "graft_versions" -> { args =>
      val fn = "graft_versions"
      arity(args, fn, Set(1), "path")
      val s = SparkSession.active
      import s.implicits._
      plan(graft.sources.Versioned.versions(s, str(args, 0, fn))
        .toDF("version"))
    },

    // graft_changes_between(path, from_v, to_v, keyCsv, attrsCsv) —
    // the Delta-CDF role: keyed diff of two immutable snapshots
    "graft_changes_between" -> { args =>
      val fn = "graft_changes_between"
      arity(args, fn, Set(5), "path, fromV, toV, keyCsv, attrsCsv")
      plan(graft.sources.Versioned.changesBetween(SparkSession.active,
        str(args, 0, fn), num(args, 1, fn).toLong, num(args, 2, fn).toLong,
        csv(args, 3, fn), csv(args, 4, fn)))
    })

  /** 'col', 'col asc' or 'col desc' → a sort Column. */
  private def orderCol(spec: String, fn: String): org.apache.spark.sql.Column =
    spec.trim.split("\\s+") match {
      case Array(n) => col(n)
      case Array(n, dir) if dir.equalsIgnoreCase("asc") => col(n).asc
      case Array(n, dir) if dir.equalsIgnoreCase("desc") => col(n).desc
      case _ => throw new IllegalArgumentException(
        s"$fn: bad order spec '$spec' (use 'col [asc|desc]')")
    }
}
