package graft

import graft.functions.Portable
import graft.functions.expressions.{SimHash64, WordShingles}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based checks for the foundations everything else trusts:
  * portable numerics must be order-independent (or 100 TB partial
  * aggregation trees silently drift from any single-node oracle) and
  * the native expressions must agree with straightforward reference
  * implementations on arbitrary input, not just curated docs.
  *
  * Generators are driven with fixed seeds (no scalatestplus bridge in
  * the offline cache) — failures are reproducible by construction. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): List[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong))).toList

  private val reasonableDouble: Gen[Double] =
    Gen.chooseNum(-1e6, 1e6).map(x => math.rint(x * 1e6) / 1e6)

  test("fixedSum is invariant under partitioning (order-independent)") {
    samples(Gen.listOfN(40, reasonableDouble), 8).foreach { xs =>
      val df = xs.toDF("x")
      def total(parts: Int): Double = df.repartition(parts)
        .agg(Portable.fixedSum($"x", 4).as("s")).as[Double].head()
      assert(total(1) == total(7)) // exact ==, not approx: that's the point
    }
  }

  test("pround == toFixed unscaled, and both match floor(x*10^s+0.5)") {
    val cases = samples(for {
      x <- reasonableDouble; s <- Gen.choose(0, 6)
    } yield (x, s), 30)
    cases.groupBy(_._2).foreach { case (s, group) =>
      val p = math.pow(10, s)
      val got = group.map(_._1).toDF("x").select(
        Portable.pround($"x", s).as("r"),
        (Portable.toFixed($"x", s).cast("double") / lit(p)).as("f"),
        $"x").as[(Double, Double, Double)].collect()
      got.foreach { case (r, f, x) =>
        val want = math.floor(x * p + 0.5) / p
        assert(r == want && f == want, s"x=$x s=$s")
      }
    }
  }

  private val wsChars = Gen.oneOf(' ', '\t', '\n', '\r', '\f', '\u000B')
  private val word = Gen.choose(1, 8).flatMap(n =>
    Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
  private val doc: Gen[String] = for {
    n <- Gen.choose(0, 12)
    ws <- Gen.listOfN(n + 1,
      Gen.choose(1, 3).flatMap(m => Gen.listOfN(m, wsChars).map(_.mkString)))
    tokens <- Gen.listOfN(n, word)
  } yield ws.head + tokens.zip(ws.tail).map { case (t, w) => t + w }.mkString

  private def refTokens(s: String): List[String] =
    s.split("[ \t\n\f\r\u000B]+").filter(_.nonEmpty).toList

  test("WordShingles agrees with sliding-window reference on arbitrary docs") {
    val cases = samples(for { s <- doc; k <- Gen.choose(1, 4) } yield (s, k), 60)
    cases.foreach { case (s, k) =>
      val toks = refTokens(s)
      val want =
        if (toks.size < k) List(toks.mkString(" "))
        else toks.sliding(k).map(_.mkString(" ")).toList.distinct
      val got = WordShingles.compute(UTF8String.fromString(s), k)
        .toArray[UTF8String](org.apache.spark.sql.types.StringType)
        .map(_.toString).toList
      assert(got == want, s"doc=${s.map(_.toInt)} k=$k")
    }
  }

  test("TextProfile counts agree with the declarative token pipeline") {
    import graft.functions.TextFunctions
    // include profile words so hit counters actually fire
    val profWord = Gen.oneOf(TextFunctions.profiles.flatMap(_._2))
    val mixedDoc = for {
      base <- doc
      extra <- Gen.listOfN(4, Gen.oneOf(profWord, word, Gen.const("it.")))
    } yield base + " " + extra.mkString(" ")
    val docs = samples(mixedDoc, 30)
    val df = docs.toDF("text")
    val got = df.select(
      TextFunctions.textProfile(lower($"text")).as("p"), $"text")
      .select($"p.n_tokens", $"p.n_punct", $"p.n_en", $"p.n_de", $"p.n_fr",
        $"p.n_es", $"text")
      .collect()
    val profCols = TextFunctions.profiles.map { case (l, ws) =>
      size(filter(TextFunctions.tokens(lower($"text")),
        t => t.isin(ws.map(lit): _*))).as(s"c_$l")
    }
    val want = df.select(Seq(
      TextFunctions.tokenCount($"text").as("nt"),
      TextFunctions.punctCount($"text").as("np"),
      TextFunctions.stopwordCount($"text").as("ns")) ++ profCols :+ $"text": _*)
      .collect()
    got.zip(want).foreach { case (g, w) =>
      val ctx = g.getString(6)
      assert(g.getInt(0) == w.getInt(0), s"n_tokens: $ctx")
      assert(g.getInt(1) == w.getInt(1), s"n_punct: $ctx")
      assert(g.getInt(2) == w.getInt(2), s"stopwords==n_en: $ctx")
      (0 until 4).foreach(p =>
        assert(g.getInt(2 + p) == w.getInt(3 + p), s"profile $p: $ctx"))
    }
  }

  test("histPercentiles hits the nearest-rank value's bin on arbitrary data") {
    import graft.operators.Sketches
    val dataset: Gen[List[Double]] = for {
      n <- Gen.choose(1, 120)
      xs <- Gen.listOfN(n, Gen.chooseNum(0.0, 100.0))
    } yield xs
    samples(Gen.zip(dataset, Gen.choose(1, 99)), 10).foreach { case (xs, pi) =>
      val p = pi / 100.0
      val est = Sketches.histPercentiles(xs.toDF("v"), Nil, $"v",
        Seq(("est", p)), lo = 0.0, hi = 100.0, nBins = 200)
        .select("est").as[Double].head()
      // exact nearest-rank reference on the driver
      val want = xs.sorted.apply(math.ceil(p * xs.size).toInt - 1)
      assert(math.abs(est - want) <= 100.0 / 200 + 1e-9,
        s"p=$p n=${xs.size} est=$est want=$want")
    }
  }

  test("histMerge over ANY split of the data == bins built whole (associativity)") {
    import graft.operators.Sketches
    val dataset: Gen[(List[Double], Int)] = for {
      n <- Gen.choose(2, 120)
      xs <- Gen.listOfN(n, Gen.chooseNum(0.0, 100.0))
      cut <- Gen.choose(1, n - 1)
    } yield (xs, cut)
    samples(dataset, 8).foreach { case (xs, cut) =>
      // split arbitrarily into two "days", merge the per-day bins to
      // one group, compare against bins built over the whole set — the
      // distributivity the B31 rollup and I19 maintenance both rest on
      val tagged = xs.zipWithIndex
        .map { case (x, i) => (if (i < cut) "d1" else "d2", x) }
        .toDF("day", "v").withColumn("g", lit("all"))
      val merged = Sketches.histMerge(
        Sketches.histBinCounts(tagged, Seq("g", "day"), $"v", 0.0, 100.0, 50),
        Seq("g"))
      val whole = Sketches.histBinCounts(tagged, Seq("g"), $"v", 0.0, 100.0, 50)
      assert(merged.exceptAll(whole).count() == 0 &&
        whole.exceptAll(merged).count() == 0, s"split at $cut of ${xs.size}")
    }
  }

  test("kmvMerge over ANY split == bottom-k built whole (the union property)") {
    import graft.operators.Sketches
    val dataset: Gen[(List[Long], Int)] = for {
      n <- Gen.choose(2, 150)
      xs <- Gen.listOfN(n, Gen.choose(0L, 400L)) // duplicates likely
      cut <- Gen.choose(1, n - 1)
    } yield (xs, cut)
    samples(dataset, 8).foreach { case (xs, cut) =>
      val k = 16
      val tagged = xs.zipWithIndex
        .map { case (x, i) => (if (i < cut) "p1" else "p2", x) }
        .toDF("part", "id").withColumn("g", lit("all"))
      val rolled = Sketches.kmvMerge(
        Sketches.kmvBottomK(tagged, Seq("g", "part"), $"id", k), Seq("g"), k)
      val whole = Sketches.kmvBottomK(tagged, Seq("g"), $"id", k)
      assert(rolled.exceptAll(whole).count() == 0 &&
        whole.exceptAll(rolled).count() == 0, s"split at $cut of ${xs.size}")
    }
  }

  test("TopKPerKey (all three modes) == the window spelling on arbitrary data") {
    import org.apache.spark.sql.expressions.Window
    val gen = for {
      n <- Gen.choose(30, 120)
      rows <- Gen.listOfN(n, for {
        key <- Gen.choose(0, 4)
        v <- Gen.choose(0, 9) // small domain → guaranteed ties
      } yield (key, v))
      k <- Gen.choose(1, 5)
    } yield (rows, k)
    samples(gen, 6).foreach { case (rows, k) =>
      val df = rows.zipWithIndex.map { case ((key, v), i) => (i.toLong, key, v) }
        .toDF("id", "key", "v")
      val w = Window.partitionBy("key").orderBy(col("v").desc, col("id").asc)
      val wTies = Window.partitionBy("key").orderBy(col("v").desc)
      def windowed(fn: org.apache.spark.sql.Column, win: org.apache.spark.sql.expressions.WindowSpec) =
        df.withColumn("rnk", fn.over(win)).filter(col("rnk") <= k)
          .collect().map(_.toSeq).toSet
      val modes = Seq(
        (graft.plans.TopKMode.RowNum, row_number(), w,
          Seq(col("v").desc, col("id").asc)),
        (graft.plans.TopKMode.Ranked, rank(), wTies, Seq(col("v").desc)),
        (graft.plans.TopKMode.Dense, dense_rank(), wTies, Seq(col("v").desc)))
      modes.foreach { case (mode, fn, win, order) =>
        val native = graft.plans.TopKPerKey(df, Seq(col("key")), order, k,
          mode = mode).collect().map(_.toSeq).toSet
        assert(native == windowed(fn, win), s"mode $mode k=$k diverged")
      }
    }
  }

  test("saltedAgg == plain groupBy for arbitrary data and salt factors") {
    import graft.operators.Skew
    val rows: Gen[List[(Int, Int)]] = for {
      n <- Gen.choose(1, 150)
      ks <- Gen.listOfN(n, Gen.choose(0, 5)) // few keys -> heavy collisions
      vs <- Gen.listOfN(n, Gen.choose(-1000, 1000))
    } yield ks.zip(vs)
    samples(Gen.zip(rows, Gen.choose(1, 9)), 8).foreach { case (data, factor) =>
      val df = data.zipWithIndex
        .map { case ((k, v), i) => (k, v.toLong, i.toLong) }
        .toDF("k", "v", "rid")
      val plain = df.groupBy("k")
        .agg(sum($"v").as("s"), count(lit(1)).as("n"), min($"v").as("mn"))
      val salted = Skew.saltedAgg(df, Seq("k"), $"rid", factor,
        partialAggs = Seq(sum($"v").as("__s"), count(lit(1)).as("__n"),
          min($"v").as("__mn")),
        mergeAggs = Seq(sum($"__s").as("s"), sum($"__n").as("n"),
          min($"__mn").as("mn")))
      assert(salted.exceptAll(plain).count() == 0
        && plain.exceptAll(salted).count() == 0, s"factor=$factor")
    }
  }

  test("normalizeRecursive conserves leaf rows and keeps ids unique at depth 2") {
    import graft.sources.MongoJsonSource
    val batch: Gen[List[(Long, Long, Long)]] = for {
      n <- Gen.choose(1, 60)
      rows <- Gen.listOfN(n, for {
        parent <- Gen.choose(0L, 4L)
        bucket <- Gen.choose(0L, 2L)
      } yield (parent, bucket))
    } yield rows.zipWithIndex.map { case ((p, b), i) => (p, b, i.toLong) }
    samples(batch, 6).foreach { data =>
      val docs = data.toDF("p", "b", "leaf")
        .groupBy("p", "b").agg(array_sort(collect_list(struct($"leaf"))).as("metrics"))
        .groupBy("p").agg(array_sort(collect_list(
          struct($"b", $"metrics"))).as("buckets"))
        .withColumn("root_id", md5($"p".cast("string")))
      val tables = MongoJsonSource.normalizeRecursive(docs, "r", "root_id")
      assert(tables.keySet == Set("r", "r__buckets", "r__buckets__metrics"))
      val leaves = tables("r__buckets__metrics")
      // every leaf row survives exactly once, ids collision-free
      assert(leaves.count() == data.size)
      assert(leaves.select("row_id").distinct().count() == data.size)
      assert(leaves.select("leaf").as[Long].collect().sorted.toList ==
        data.map(_._3).sorted)
    }
  }

  test("SimHash64 agrees with a per-token xxhash64 vote reference") {
    samples(doc, 40).foreach { s =>
      val votes = new Array[Int](64)
      val toks = refTokens(s)
      // reference bit-votes from Spark's own xxhash64 column function
      val hashes = if (toks.isEmpty) Nil
        else toks.toDF("t").select(xxhash64($"t")).as[Long].collect().toList
      hashes.foreach { h =>
        (0 until 64).foreach(j =>
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1)
      }
      val want = (0 until 64).foldLeft(0L)((acc, j) =>
        if (votes(j) > 0) acc | (1L << j) else acc)
      assert(SimHash64.compute(UTF8String.fromString(s)) == want, s.map(_.toInt))
    }
  }

  test("counterDelta and firstLast == their window spellings on arbitrary series") {
    import org.apache.spark.sql.expressions.Window
    val series: Gen[List[(Long, Long, Double)]] = for {
      n <- Gen.choose(1, 40)
      rows <- Gen.listOfN(n, for {
        k <- Gen.choose(1L, 4L)
        v <- Gen.chooseNum(0.0, 1000.0).map(x => math.rint(x * 1e4) / 1e4)
      } yield (k, v))
    } yield rows.zipWithIndex.map { case ((k, v), i) => (k, i.toLong, v) }
    samples(series, 10).foreach { rows =>
      val df = rows.toDF("k", "seq", "v")
      val w = Window.partitionBy("k").orderBy("seq")
      // reference: explicit lag spelling of the reset-aware delta
      val ref = df.withColumn("prev", lag($"v", 1).over(w))
        .withColumn("step", when($"prev".isNull, lit(null).cast("double"))
          .when($"v" >= $"prev", $"v" - $"prev").otherwise($"v"))
        .groupBy("k")
        .agg(coalesce(Portable.fixedSum($"step", 4), lit(0.0)).as("counter_delta"),
          sum(($"prev".isNotNull && $"v" < $"prev").cast("int")).as("n_resets"),
          count(lit(1)).as("n_readings"))
      val got = graft.operators.TimeAgg.counterDelta(df, Seq("k"), "v", Seq("seq"), 4)
      assert(got.exceptAll(ref).count() == 0 && ref.exceptAll(got).count() == 0)
      // firstLast vs the row_number spelling
      val fl = graft.operators.TimeAgg.firstLast(df, Seq("k"), "v", Seq("seq"))
      val wAsc = Window.partitionBy("k").orderBy($"seq".asc)
      val wDesc = Window.partitionBy("k").orderBy($"seq".desc)
      val flRef = df.withColumn("rn", row_number().over(wAsc))
        .withColumn("rd", row_number().over(wDesc))
        .groupBy("k")
        .agg(max(when($"rn" === 1, $"v")).as("first_value"),
          max(when($"rd" === 1, $"v")).as("last_value"),
          count(lit(1)).as("n_readings"))
      assert(fl.exceptAll(flRef).count() == 0 && flRef.exceptAll(fl).count() == 0)
    }
  }

  test("PqAdc sums the table entries the codes select, on arbitrary shapes") {
    import graft.functions.expressions.PqAdc
    import org.apache.spark.sql.graft.ColumnBridge
    val shape = for {
      m <- Gen.choose(1, 12)
      nCodes <- Gen.choose(1, 9)
      codes <- Gen.listOfN(m, Gen.choose(0, nCodes - 1))
      qtab <- Gen.listOfN(m, Gen.listOfN(nCodes, reasonableDouble))
    } yield (codes, qtab)
    samples(shape, 40).foreach { case (codes, qtab) =>
      val want = codes.zip(qtab).map { case (c, tab) => tab(c) }.sum
      val got = Seq((codes, qtab)).toDF("codes", "qtab")
        .select(ColumnBridge.column(PqAdc(
          ColumnBridge.expression(col("codes")),
          ColumnBridge.expression(col("qtab")))).as("s"))
        .as[Double].head()
      assert(got == want, s"codes=$codes qtab=$qtab")
    }
  }

  test("PQ generous-shortlist search == brute force on arbitrary vector sets") {
    import graft.operators.Similarity
    val vecs = for {
      n <- Gen.choose(3, 40)
      dim <- Gen.oneOf(4, 8)
      rows <- Gen.listOfN(n, Gen.listOfN(dim, Gen.chooseNum(-1.0, 1.0)
        .map(x => math.rint(x * 1e3) / 1e3)))
    } yield rows.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
    samples(vecs, 8).foreach { rows =>
      val dim = rows.head._2.length
      val df = rows.toDF("vec_id", "embedding")
      val q = df.filter($"vec_id" % 5 === 0)
      val bf = Similarity.bruteForceTopK(df, q, "vec_id", "embedding", 3)
      val pq = Similarity.pqTopK(df, q, "vec_id", "embedding", 3,
        m = 2, nCodes = 8, iters = 1, shortlist = 1000, dim = dim)
      assert(pq.exceptAll(bf).count() == 0 && bf.exceptAll(pq).count() == 0,
        s"n=${rows.size} dim=$dim")
    }
  }

  test("BPE: round-trip, monotone compression, and greedy-merge consistency on arbitrary corpora") {
    import graft.operators.Curation
    val word: Gen[String] = for {
      n <- Gen.chooseNum(1, 8)
      cs <- Gen.listOfN(n, Gen.alphaLowerChar)
    } yield cs.mkString
    samples(Gen.listOfN(30, word), 6).foreach { words =>
      val counts = words.groupBy(identity).view
        .mapValues(_.size.toLong).toSeq.sortBy(_._1)
      val merges = Curation.bpeTrainLocal(counts, numMerges = 15,
        minPairCount = 2).map(m => (m._1, m._2))
      val codec = new graft.functions.expressions.BpeCodec(merges)
      words.foreach { w =>
        // apply-time segmentation must reconstruct the word exactly...
        val pieces = codec.segmentWord(w)
        assert(pieces.mkString == w + "</w>", s"round-trip broke on '$w'")
        // ...never expand it...
        assert(pieces.length <= w.length + 1)
        // ...and more merges never produce MORE pieces for any word
        val fewer = new graft.functions.expressions.BpeCodec(
          merges.take(merges.length / 2)).segmentWord(w)
        assert(pieces.length <= fewer.length,
          s"more merges grew '$w': ${fewer.toSeq} -> ${pieces.toSeq}")
      }
      // determinism: retraining on the same counts is identical
      assert(Curation.bpeTrainLocal(counts, 15, 2).map(m => (m._1, m._2))
        == merges)
    }
  }

  test("drift: symmetric, within [0,1], zero iff identical, on arbitrary bin tables") {
    import graft.operators.DataQuality
    val binRow: Gen[(Int, Long)] = for {
      b <- Gen.chooseNum(0, 9)
      n <- Gen.chooseNum(1L, 50L)
    } yield (b, n)
    samples(Gen.zip(Gen.listOfN(6, binRow), Gen.listOfN(6, binRow)), 6)
      .foreach { case (rbs, cbs) =>
        val ref = rbs.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
          .map { case (b, n) => ("K", b, n) }
          .toDF("k", "bucket", "cnt_ref")
        val cur = cbs.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
          .map { case (b, n) => ("K", b, n) }
          .toDF("k", "bucket", "cnt_cur")
        def row(a: org.apache.spark.sql.DataFrame,
                b: org.apache.spark.sql.DataFrame) =
          DataQuality.driftFromBins(
              a.toDF("k", "bucket", "cnt_ref"),
              b.toDF("k", "bucket", "cnt_cur"), Seq("k"))
            .select("tv_dist", "max_bin_delta", "ks_stat")
            .as[(Double, Double, Double)].head()
        val f = row(ref, cur.toDF("k", "bucket", "cnt_cur"))
        val g = row(cur.toDF("k", "bucket", "cnt_ref"), ref)
        assert(f == g, s"asymmetric: $f vs $g")
        Seq(f._1, f._2, f._3).foreach(x => assert(x >= 0.0 && x <= 1.0))
        assert(f._2 <= f._1 * 2 + 2e-6) // max bin <= 2*TV (6dp rounding slack)
        // self-drift is exactly zero
        val selfRow = row(ref, ref.toDF("k", "bucket", "cnt_cur"))
        assert(selfRow == ((0.0, 0.0, 0.0)))
      }
  }
  test("ewma of a constant series is that constant, at any span") {
    val cases = samples(for {
      v <- Gen.chooseNum(-100000L, 100000L)
      n <- Gen.choose(1, 12)
      span <- Gen.choose(1, 10)
    } yield (v, n, span), 12)
    cases.foreach { case (v, n, span) =>
      val df = (1 to n).map(i => (1L, f"d$i%03d", v)).toDF("e", "d", "fs")
      val got = graft.operators.TimeAgg.ewma(df, "e", "d", "fs", span, 0)
        .select("ewma").as[Double].collect()
      assert(got.forall(_ == v.toDouble),
        s"ewma of constant $v (n=$n span=$span) drifted: ${got.toList}")
    }
  }

  test("autocorr is invariant under series reversal") {
    // lag-1 pairs of the reversed series are the swapped pairs of the
    // original; Pearson corr is symmetric in its arguments
    val cases = samples(Gen.listOfN(8, Gen.chooseNum(-1000L, 1000L)), 10)
    cases.filter(_.toSet.size > 2).foreach { xs =>
      val fwd = xs.zipWithIndex.map { case (v, i) => (1L, f"d$i%03d", v) }
        .toDF("e", "d", "fs")
      val rev = xs.reverse.zipWithIndex.map { case (v, i) => (1L, f"d$i%03d", v) }
        .toDF("e", "d", "fs")
      def ac(df: org.apache.spark.sql.DataFrame) =
        graft.operators.TimeAgg.autocorr(df, "e", "d", "fs", 1)
          .select("autocorr_1").collect().head.get(0)
      assert(ac(fwd) == ac(rev), s"autocorr not reversal-invariant on $xs")
    }
  }

  test("canonicalizeUrl is idempotent on arbitrary url-ish strings") {
    val urlGen = for {
      scheme <- Gen.oneOf("http", "HTTPS", "Ftp")
      host <- Gen.alphaLowerStr.map(h => "Host" + h.take(8) + ".COM")
      port <- Gen.oneOf("", ":80", ":443", ":8080")
      path <- Gen.alphaNumStr.map(p => "/Pa" + p.take(6))
      q <- Gen.oneOf("", "?b=2&a=1", "?utm_source=x&z=9", "?only=utm#f", "#frag")
    } yield s"$scheme://$host$port$path$q"
    val urls = samples(urlGen, 40)
    val df = urls.toDF("u")
      .select(graft.functions.TextFunctions.canonicalizeUrl(col("u")).as("c1"))
      .select(col("c1"),
        graft.functions.TextFunctions.canonicalizeUrl(col("c1")).as("c2"))
    val rows = df.as[(String, String)].collect()
    rows.foreach { case (c1, c2) =>
      assert(c1 == c2, s"canonicalizeUrl not idempotent: '$c1' -> '$c2'")
    }
  }

  test("filterLines is idempotent and never invents lines") {
    val lineGen = Gen.oneOf(
      Gen.const("Home"), Gen.const("short"),
      Gen.alphaLowerStr.map(w => s"real words in a sentence $w"),
      Gen.const("Copyright 2024 X"), Gen.const("about us"))
    val docGen = Gen.listOfN(6, lineGen).map(_.mkString("\n"))
    samples(docGen, 20).foreach { doc =>
      val once = Seq(doc).toDF("t")
        .select(graft.functions.TextFunctions.filterLines(col("t"), 3).as("f"))
        .select("f.clean_text").as[String].head()
      val twice = Seq(once).toDF("t")
        .select(graft.functions.TextFunctions.filterLines(col("t"), 3).as("f"))
        .select("f.clean_text").as[String].head()
      assert(twice == once, s"filterLines not idempotent on: $doc")
      val inLines = doc.split("\n").map(_.trim).toSet
      assert(once.split("\n").filter(_.nonEmpty).forall(inLines.contains),
        s"filterLines invented a line on: $doc")
    }
  }

  test("packShards conserves bytes and keeps shard ids dense from zero") {
    val gen = Gen.listOfN(12, Gen.chooseNum(1L, 5000L))
    samples(gen, 10).foreach { sizes =>
      val df = sizes.zipWithIndex.map { case (b, i) => (i.toLong, "s", b) }
        .toDF("id", "src", "nb")
      val packed = graft.operators.Multimodal.packShards(
        df, Seq("src"), "id", col("nb"), shardBytes = 4096)
      val manifest = graft.operators.Multimodal
        .shardManifest(packed, Seq("src"), "id")
        .select("shard_id", "bytes").as[(Long, Long)].collect().sortBy(_._1)
      assert(manifest.map(_._2).sum == sizes.sum, "bytes not conserved")
      // ids start at 0 and strictly increase; an item larger than the
      // budget SKIPS the indices its bytes span (the manifest, not
      // density, is the loader's source of truth)
      assert(manifest.head._1 == 0L, "first shard must be 0")
      assert(manifest.map(_._1).sliding(2).forall(p => p.length < 2 || p(0) < p(1)),
        s"shard ids not increasing: ${manifest.map(_._1).toList}")
    }
  }

  test("growth accounting decomposes every day exactly on arbitrary ledgers") {
    import graft.operators.Sessionize
    val ledgerGen = for {
      n <- Gen.choose(1, 40)
      pairs <- Gen.listOfN(n, for {
        u <- Gen.choose(1L, 6L); d <- Gen.choose(0, 20)
      } yield (u, d))
    } yield pairs.distinct
    samples(ledgerGen, 10).foreach { pairs =>
      val ledger = pairs.toDF("user_id", "d")
        .select(col("user_id"),
          (to_date(lit("2024-01-01")) + col("d")).as("__day"))
      val got = Sessionize.growthFromLedger(ledger, "user_id")
      // per day: new + retained + resurrected == that day's actives
      val actives = ledger.groupBy(col("__day").as("day"))
        .agg(count(lit(1)).as("na"))
      val bad = got.join(actives, Seq("day"), "left")
        .filter(coalesce(col("na"), lit(0L)) =!=
          col("n_new") + col("n_retained") + col("n_resurrected"))
        .count()
      assert(bad == 0, s"decomposition broke for $pairs")
      // churn-ins never exceed the previous day's actives
      val churnBad = got.select((col("day") - 1).as("pd"), col("n_churned"))
        .join(actives.withColumnRenamed("day", "pd"), Seq("pd"), "left")
        .filter(col("n_churned") > coalesce(col("na"), lit(0L)))
        .count()
      assert(churnBad == 0, s"churn exceeded prior actives for $pairs")
    }
  }

  test("rolling anomaly flags are invariant under uniform count scaling") {
    import graft.operators.DataQuality
    // (n·x − S)² > z²(n·Q − S²) scales by c² on BOTH sides: multiplying
    // every count by the same positive integer cannot flip a flag
    val dailyGen = for {
      n <- Gen.choose(4, 15)
      cs <- Gen.listOfN(n, Gen.choose(1L, 1000L))
    } yield cs
    samples(dailyGen, 8).foreach { cs =>
      def daily(scale: Long) = cs.zipWithIndex
        .map { case (c, i) => ("k", i, c * scale) }
        .toDF("k", "d", "cnt")
        .select(col("k"), (to_date(lit("2024-01-01")) + col("d")).as("day"),
          col("cnt"))
      def flags(scale: Long) = DataQuality
        .anomaliesFromDaily(daily(scale), Seq("k"))
        .orderBy("day").select("is_anomaly").as[Boolean].collect().toSeq
      assert(flags(1L) == flags(7L), s"scaling flipped a flag for $cs")
    }
  }

  test("temperature sampling hits the exact total when no stratum caps") {
    import graft.operators.Curation
    val gen = for {
      k <- Gen.choose(2, 5)
      sizes <- Gen.listOfN(k, Gen.choose(20L, 60L))
      total <- Gen.choose(1L, 15L) // well under every stratum size
    } yield (sizes, total)
    samples(gen, 6).foreach { case (sizes, total) =>
      val rows = sizes.zipWithIndex.flatMap { case (n, si) =>
        (0L until n).map(i => (si * 1000L + i, s"s$si"))
      }
      val df = rows.toDF("doc_id", "source")
      val got = Curation.temperatureSample(df, "source", col("doc_id"),
        total, "|p").count()
      assert(got == total, s"sizes=$sizes total=$total got=$got")
    }
  }

  test("seasonal residual sums per (key, dow) stay inside the rounding envelope") {
    import graft.operators.TimeAgg
    val gen = for {
      n <- Gen.choose(3, 30)
      rows <- Gen.listOfN(n, for {
        d <- Gen.choose(0, 40); v <- Gen.choose(-100000L, 100000L)
      } yield (d, v))
    } yield rows.groupBy(_._1).map { case (d, vs) => (d, vs.map(_._2).sum) }.toList
    samples(gen, 8).foreach { rows =>
      val daily = rows.toDF("d", "__fv")
        .select(lit("k").as("k"),
          (to_date(lit("2024-01-01")) + col("d")).as("day"), col("__fv"))
      // the EXACT cross-product numerators sum to zero within a group;
      // each emitted residual then rounds to 4dp, so the group sum is
      // bounded by n·(half an ulp) — never by data magnitude
      val bad = TimeAgg.seasonalFromDaily(daily, "k")
        .groupBy("k", "dow")
        .agg(sum(col("residual")).as("rs"), count(lit(1)).as("n"))
        .filter(abs(col("rs")) >
          col("n").cast("double") * lit(0.5e-4) + lit(1e-9))
        .count()
      assert(bad == 0, s"residual sum escaped the rounding envelope for $rows")
    }
  }

  test("cusum flags == the direct max-reset recurrence on arbitrary series") {
    // the operator evaluates S_t = C_t − min(0, min_{j≤t} C_j) as
    // window prefix sums; the textbook definition is the sequential
    // recurrence S_t = max(0, S_{t−1} + increment). The identity (and
    // the window plumbing) must agree on arbitrary counts — checked
    // against an exact N-scaled BigInt simulation
    val gen = Gen.listOfN(12, Gen.chooseNum(0L, 50L))
    samples(gen, 10).foreach { counts =>
      val slack = 1; val th = 5
      val df = counts.zipWithIndex.map { case (c, i) =>
        ("k", java.sql.Date.valueOf(f"2024-03-${i + 1}%02d"), c)
      }.toDF("key", "day", "cnt")
      val got = graft.operators.DataQuality
        .cusumFromDaily(df, Seq("key"), slack, th)
        .orderBy("day").select("alarm_up", "alarm_dn")
        .as[(Boolean, Boolean)].collect().toList
      val n = BigInt(counts.size); val t = BigInt(counts.sum)
      var su = BigInt(0); var sv = BigInt(0)
      val want = counts.map { x =>
        su = (su + n * x - t - n * slack).max(BigInt(0))
        sv = (sv + t - n * slack - n * x).max(BigInt(0))
        (su > n * th, sv > n * th)
      }
      assert(got == want, s"counts=$counts")
    }
  }

  test("kcore == the sequential peel on arbitrary graphs, for every k") {
    // the distributed semi-join rounds must reach the same fixpoint as
    // the textbook sequential peel (drop minimum-degree nodes below k
    // until none remain)
    val edgeGen = Gen.listOfN(14, for {
      s <- Gen.chooseNum(1L, 8L); t <- Gen.chooseNum(1L, 8L)
    } yield (s, t))
    samples(edgeGen, 6).foreach { raw =>
      val canon = raw.filter(e => e._1 != e._2)
        .map(e => (e._1 min e._2, e._1 max e._2)).distinct
      if (canon.nonEmpty) for (k <- 1L to 3L) {
        val got = graft.operators.Graphs
          .kcore(raw.toDF("s", "t"), "s", "t", k)
          .as[(Long, Long)].collect().toMap
        var e = canon
        var changed = true
        while (changed) {
          val deg = (e.map(_._1) ++ e.map(_._2))
            .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
          val keep = deg.filter(_._2 >= k).keySet
          val pruned = e.filter(p => keep(p._1) && keep(p._2))
          changed = pruned.size != e.size
          e = pruned
        }
        val want = (e.map(_._1) ++ e.map(_._2))
          .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
        assert(got == want, s"k=$k edges=$canon")
      }
    }
  }

  test("pageRank == a direct BigInt simulation on arbitrary digraphs") {
    // the distributed join/agg rounds must agree with a sequential
    // exact-integer simulation of the same damped update
    val edgeGen = Gen.listOfN(10, for {
      s <- Gen.chooseNum(1L, 6L); t <- Gen.chooseNum(1L, 6L)
    } yield (s, t))
    samples(edgeGen, 8).foreach { raw =>
      val edges = raw.distinct
      if (edges.nonEmpty) {
        val got = graft.operators.Graphs.pageRank(
          edges.toDF("s", "t"), "s", "t", iters = 3)
          .as[(Long, Long)].collect().toMap
        val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
        val outdeg = edges.groupBy(_._1).map { case (k, v) => k -> v.size }
        var pr = nodes.map(_ -> BigInt(1000000)).toMap
        for (_ <- 1 to 3) {
          val mass = edges.groupBy(_._2).map { case (v, es) =>
            v -> es.map(e => pr(e._1) / outdeg(e._1)).sum
          }
          pr = nodes.map(v =>
            v -> (BigInt(150000) + 85 * mass.getOrElse(v, BigInt(0)) / 100))
            .toMap
        }
        assert(got == pr.map { case (k, v) => k -> v.toLong },
          s"edges=$edges")
      }
    }
  }

  test("weighted + seeded pageRank == the BigInt simulation with multiplicities") {
    // raw duplicate rows with w=1 must pre-sum to multiplicities; seeds
    // gate both the initial mass and the restart share
    val edgeGen = Gen.listOfN(12, for {
      s <- Gen.chooseNum(1L, 5L); t <- Gen.chooseNum(1L, 5L)
    } yield (s, t))
    samples(edgeGen, 6).foreach { raw =>
      if (raw.nonEmpty) {
        val seeds = raw.map(_._1).distinct.take(2)
        val got = graft.operators.Graphs.pageRank(
          raw.map(e => (e._1, e._2, 1L)).toDF("s", "t", "w"),
          "s", "t", iters = 3, weight = Some("w"),
          seeds = Some(seeds.toDF("node")))
          .as[(Long, Long)].collect().toMap
        val w = raw.groupBy(identity).map { case (e, occ) => e -> BigInt(occ.size) }
        val tw = w.groupBy(_._1._1).map { case (s, es) => s -> es.values.sum }
        val nodes = (raw.map(_._1) ++ raw.map(_._2)).distinct
        val seedSet = seeds.toSet
        var pr = nodes.map(v =>
          v -> (if (seedSet(v)) BigInt(1000000) else BigInt(0))).toMap
        for (_ <- 1 to 3) {
          val mass = w.toSeq.groupBy(_._1._2).map { case (v, es) =>
            v -> es.map { case ((s, _), wt) => (pr(s) / tw(s)) * wt }.sum
          }
          pr = nodes.map(v => v ->
            ((if (seedSet(v)) BigInt(150000) else BigInt(0)) +
              85 * mass.getOrElse(v, BigInt(0)) / 100)).toMap
        }
        assert(got == pr.map { case (k, v) => k -> v.toLong }, s"edges=$raw seeds=$seeds")
      }
    }
  }

  test("triangles == brute-force corner counts on arbitrary graphs") {
    // degree-oriented wedge enumeration must agree with the O(n^3)
    // direct count whatever the orientation/duplicate/self-loop mix
    val edgeGen = Gen.listOfN(14, for {
      a <- Gen.chooseNum(1L, 8L); b <- Gen.chooseNum(1L, 8L)
    } yield (a, b))
    samples(edgeGen, 8).foreach { raw =>
      val canon = raw.filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
      if (canon.nonEmpty) {
        val got = graft.operators.Graphs.triangles(
          raw.toDF("a", "b"), "a", "b").as[(Long, Long)].collect().toMap
        val es = canon.toSet
        val nodes = (canon.map(_._1) ++ canon.map(_._2)).distinct.sorted
        val want = scala.collection.mutable.Map(nodes.map(_ -> 0L): _*)
        for {
          i <- nodes; j <- nodes if i < j && es((i, j))
          k <- nodes if j < k && es((j, k)) && es((i, k))
        } { want(i) += 1; want(j) += 1; want(k) += 1 }
        assert(got == want.toMap, s"edges=$raw")
      }
    }
  }

  test("cooccurrence == brute-force distinct-basket pair counts") {
    val rowGen = Gen.listOfN(20, for {
      bk <- Gen.chooseNum(1L, 5L); it <- Gen.chooseNum(1L, 6L)
    } yield (bk, it))
    samples(rowGen, 8).foreach { raw =>
      val got = graft.operators.Graphs.cooccurrence(
        raw.toDF("bk", "it"), "bk", "it", minSupport = 1L)
        .as[(Long, Long, Long)].collect().toSet
      val byBk = raw.distinct.groupBy(_._1).values
      val want = byBk.toSeq.flatMap { rows =>
        val its = rows.map(_._2).sorted
        for (x <- its; y <- its if x < y) yield (x, y)
      }.groupBy(identity).map { case (p, occ) => (p._1, p._2, occ.size.toLong) }
        .toSet
      assert(got == want, s"rows=$raw")
    }
  }

  test("bfsDepth == brute-force shortest hops on arbitrary graphs") {
    val edgeGen = Gen.listOfN(12, for {
      a <- Gen.chooseNum(1L, 8L); b <- Gen.chooseNum(1L, 8L)
    } yield (a, b))
    samples(edgeGen, 6).foreach { raw =>
      val edges = raw.filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        val got = graft.operators.Graphs.bfsDepth(
          edges.toDF("s", "t"), "s", "t", Seq(1L, 2L).toDF("n"), maxDepth = 10)
          .as[(Long, Long)].collect().toMap
        // brute force: Floyd-style BFS from the seed set over the
        // undirected distinct edge set
        val und = edges.flatMap(e => Seq(e, e.swap)).distinct
          .groupBy(_._1).map { case (k, v) => (k, v.map(_._2).toSet) }
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSet
        var want = Map.empty[Long, Long]
        var frontier = Set(1L, 2L).intersect(nodes)
        frontier.foreach(n => want += n -> 0L)
        var d = 0L
        while (frontier.nonEmpty) {
          d += 1
          frontier = frontier.flatMap(n => und.getOrElse(n, Set.empty))
            .diff(want.keySet)
          frontier.foreach(n => want += n -> d)
        }
        assert(got == want, s"edges=$edges")
      }
    }
  }

  test("multiTouchAttribution == a sequential reference on arbitrary event streams") {
    // reference: per conversion, gather the in-window touch multiset
    // and split U by the four models with the documented remainder
    // rules — any drift in window bounds, tie-breaks, or integer
    // splits shows up as a mismatch; mass conservation is implied
    val evGen = for {
      nu <- Gen.choose(1, 4)
      evs <- Gen.listOfN(nu * 6, for {
        u <- Gen.choose(1L, nu.toLong)
        off <- Gen.choose(0L, 300L)
        ty <- Gen.oneOf("click", "view", "purchase")
        v <- Gen.choose(0, 5000).map(_ / 100.0)
      } yield (u, off, ty, v))
    } yield evs
    val lookback = 100L
    samples(evGen, 12).foreach { evs0 =>
      val evs = evs0.zipWithIndex.map { case ((u, off, ty, v), i) =>
        (u, off * 1000000L, i.toLong, ty, v)
      }
      // sequential reference over (user, tsUs, id, type, value)
      val credits = scala.collection.mutable.Map
        .empty[String, Array[Long]].withDefault(_ => Array.fill(4)(0L))
      def add(ty: String, m: Int, amt: Long): Unit = {
        val a = credits.getOrElseUpdate(ty, Array.fill(4)(0L)); a(m) += amt
      }
      evs.groupBy(_._1).values.foreach { userEvs =>
        val touches = userEvs.filter(e => e._4 == "click" || e._4 == "view")
        userEvs.filter(_._4 == "purchase").foreach { conv =>
          val win = touches.filter(t =>
            t._2 <= conv._2 && conv._2 - t._2 <= lookback * 1000000L)
          val u = math.floor(conv._5 * 100 + 0.5).toLong * 1000000L
          val n = win.size
          if (n == 0) (0 to 3).foreach(m => add("(unattributed)", m, u))
          else {
            val first = win.minBy(t => (t._2, t._3))
            val last = win.maxBy(t => (t._2, t._3))
            val base = u / n
            win.foreach(t => add(t._4, 0, base)); add(first._4, 0, u - base * n)
            add(first._4, 1, u); add(last._4, 2, u)
            if (n == 1) add(first._4, 3, u)
            else if (n == 2) { add(last._4, 3, u / 2); add(first._4, 3, u - u / 2) }
            else {
              val fsh = u * 2 / 5; val midTot = u - 2 * fsh; val m2 = n - 2
              val midBase = midTot / m2
              add(first._4, 3, fsh + (midTot - midBase * m2))
              add(last._4, 3, fsh)
              win.filterNot(t => t._3 == first._3 || t._3 == last._3)
                .foreach(t => add(t._4, 3, midBase))
            }
          }
        }
      }
      val df = evs.toDF("user_id", "us", "event_id", "event_type", "value")
        .withColumn("ts", timestamp_micros(col("us")))
      val got = graft.operators.Sessionize.multiTouchAttribution(df,
          "user_id", "ts", "event_id", "event_type", Seq("click", "view"),
          "purchase", "value", lookback)
        .as[(String, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> Seq(r._2, r._3, r._4, r._5)).toMap
      val want = credits.toMap.map { case (k, v) => k -> v.toSeq }
      // the operator emits every declared type row (possibly zero);
      // compare on the union with zero-fill
      val keys = got.keySet ++ want.keySet
      keys.foreach { k =>
        assert(got.getOrElse(k, Seq(0L, 0L, 0L, 0L))
          == want.getOrElse(k, Seq(0L, 0L, 0L, 0L)),
          s"type $k: got ${got.get(k)} want ${want.get(k)} over $evs")
      }
    }
  }

  test("kmeansAssign == a sequential Lloyd reference on arbitrary vector sets") {
    val vecGen = for {
      n <- Gen.choose(1, 10)
      dim <- Gen.choose(1, 3)
      vs <- Gen.listOfN(n,
        Gen.listOfN(dim, Gen.choose(-500, 500).map(_ / 100.0)))
      k <- Gen.choose(1, 3)
      iters <- Gen.choose(0, 2)
    } yield (vs, k, iters)
    samples(vecGen, 12).foreach { case (vs, k, iters) =>
      val fixed = vs.map(_.map(x => math.floor(x * 1e6 + 0.5).toLong).toArray)
      def assign(cents: Seq[Array[Long]]): Seq[Int] =
        fixed.map { fv =>
          cents.zipWithIndex.map { case (cv, j) =>
            (fv.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum, j)
          }.min._2
        }
      var cents: Seq[Array[Long]] = fixed.take(k)
      for (_ <- 0 until iters) {
        val byCell = assign(cents).zip(fixed).groupBy(_._1)
        cents = cents.zipWithIndex.map { case (old, j) =>
          byCell.get(j) match {
            case Some(rows) =>
              val n = rows.size
              old.indices.map(p =>
                Math.floorDiv(rows.map(_._2(p)).sum, n.toLong)).toArray
            case None => old
          }
        }
      }
      val want = assign(cents).zipWithIndex.map { case (c, i) => (i.toLong, c) }.toMap
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val got = graft.operators.Similarity.kmeansAssign(df, "vec_id",
          "embedding", k, iters)
        .as[(Long, Int)].collect().toMap
      assert(got == want, s"k=$k iters=$iters vs=$vs")
    }
  }

  test("zorderValue round-trips: every dimension recovers from the key") {
    val gen = for {
      a <- Gen.chooseNum(0L, 255L); b <- Gen.chooseNum(0L, 255L)
      c <- Gen.chooseNum(0L, 255L)
    } yield (a, b, c)
    def extract(z: Long, i: Int, n: Int, bits: Int): Long =
      (0 until bits).map(bb => ((z >> (bb * n + i)) & 1L) << bb).sum
    samples(gen, 24).foreach { case (a, b, c) =>
      val df = Seq((a, b, c)).toDF("a", "b", "c")
      val z3 = df.select(graft.operators.Layout.zorderValue(
        Seq(col("a"), col("b"), col("c")), 8).as("z")).as[Long].head()
      assert(extract(z3, 0, 3, 8) == a && extract(z3, 1, 3, 8) == b &&
        extract(z3, 2, 3, 8) == c, s"($a,$b,$c) -> $z3")
      val z2 = df.select(graft.operators.Layout.zorderValue(
        Seq(col("a"), col("b")), 8).as("z")).as[Long].head()
      assert(extract(z2, 0, 2, 8) == a && extract(z2, 1, 2, 8) == b)
    }
  }

  test("scc == min mutual-reachability id on arbitrary digraphs (sequential reference)") {
    // the reference computes the DEFINITION directly — Warshall boolean
    // closure, then scc_id(v) = min{u : u →* v ∧ v →* u} — so any
    // divergence is an engine bug, not a reference-algorithm subtlety.
    // Gapped non-contiguous ids guard against accidental index-vs-id
    // confusion in the engine's label arithmetic.
    val gen = for {
      n <- Gen.choose(2, 14)
      density <- Gen.choose(1, 3)
      edges <- Gen.listOfN(math.max(2, n * density), for {
        a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1)
      } yield (a, b))
    } yield (n, edges.distinct)
    samples(gen, 18).foreach { case (n, es) =>
      val ids = (0 until n).map(i => i.toLong * 7 + 3)
      val reach = Array.fill(n, n)(false)
      (0 until n).foreach(i => reach(i)(i) = true)
      es.foreach { case (a, b) => reach(a)(b) = true }
      for (k <- 0 until n; i <- 0 until n; j <- 0 until n)
        if (reach(i)(k) && reach(k)(j)) reach(i)(j) = true
      val present = es.flatMap { case (a, b) => Seq(a, b) }.distinct
      val want = present.map { v =>
        ids(v) -> present.filter(u => reach(u)(v) && reach(v)(u)).map(ids).min
      }.toMap
      val df = es.map { case (a, b) => (ids(a), ids(b)) }.toDF("s", "t")
      // both physical paths must equal the reference: the single-task
      // fast path (default at these sizes) and the distributed
      // FB-coloring rounds (localThreshold = 0)
      val local = graft.operators.Graphs.scc(df, "s", "t", maxOuter = 20)
        .as[(Long, Long)].collect().toMap
      assert(local == want, s"local path, edges=$es")
      val dist = graft.operators.Graphs
        .scc(df, "s", "t", maxOuter = 20, localThreshold = 0L)
        .as[(Long, Long)].collect().toMap
      assert(dist == want, s"distributed path, edges=$es")
    }
  }

  test("condense == reference condensation + longest-path tiers on arbitrary digraphs") {
    // same Warshall-closure reference as the scc property, extended:
    // condensed edges are the distinct cross-component relabels, and
    // tiers come from n rounds of the monotone longest-path relaxation
    // (n rounds always suffice on <= n condensation nodes)
    val gen = for {
      n <- Gen.choose(2, 12)
      density <- Gen.choose(1, 3)
      edges <- Gen.listOfN(math.max(2, n * density), for {
        a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1)
      } yield (a, b))
    } yield (n, edges.distinct)
    samples(gen, 12).foreach { case (n, es) =>
      val ids = (0 until n).map(i => i.toLong * 5 + 2)
      val reach = Array.fill(n, n)(false)
      (0 until n).foreach(i => reach(i)(i) = true)
      es.foreach { case (a, b) => reach(a)(b) = true }
      for (k <- 0 until n; i <- 0 until n; j <- 0 until n)
        if (reach(i)(k) && reach(k)(j)) reach(i)(j) = true
      val present = es.flatMap { case (a, b) => Seq(a, b) }.distinct
      val sccOf = present.map { v =>
        v -> present.filter(u => reach(u)(v) && reach(v)(u)).map(ids).min
      }.toMap
      val members = sccOf.groupBy(_._2).map { case (c, m) => c -> m.size.toLong }
      val ce = es.map { case (a, b) => (sccOf(a), sccOf(b)) }
        .filter { case (x, y) => x != y }.distinct
      var lev = members.keys.map(_ -> 0L).toMap
      for (_ <- 1 to n)
        lev = lev.map { case (v, d) =>
          val preds = ce.collect { case (u, w) if w == v => lev(u) + 1 }
          v -> (d +: preds).max
        }
      val want = members.keys.map(c => (c, members(c), lev(c))).toSet
      val df = es.map { case (a, b) => (ids(a), ids(b)) }.toDF("s", "t")
      val local = graft.operators.Graphs.condense(df, "s", "t", maxOuter = 20)
        .as[(Long, Long, Long)].collect().toSet
      assert(local == want, s"local path, edges=$es")
      val dist = graft.operators.Graphs
        .condense(df, "s", "t", maxOuter = 20, localThreshold = 0L)
        .as[(Long, Long, Long)].collect().toSet
      assert(dist == want, s"distributed path, edges=$es")
    }
  }
}
