package graft.operators

import graft.functions.TextFunctions.shingles
import graft.functions.Portable
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a training-data pipeline runs after
  * cleaning/dedup: benchmark-contamination detection, deterministic
  * sampling, per-stratum quota selection.
  *
  * Scale design: contamination is an equi-join on the shingle key (the
  * eval side is tiny next to the train corpus, but the join key keeps it
  * linear either way — never a cross product); sampling is a pure
  * codegen'd filter with NO shuffle and fully deterministic output (the
  * same row set on every run/cluster — `rand()`-based sampling is not
  * reproducible across retries, which breaks exactly-once pipelines);
  * quota selection is one window per stratum.
  */
object Curation {

  /** Shingle key array for the contamination pair: `hashShingleKeys`
    * swaps the shuffled/joined key from the k-word string to its 60-bit
    * md5 slice — 8 bytes per exchanged row. MEASURED (ScaleProbe 16×):
    * −29% shuffle-write bytes (10.6 → 7.5 MB) for a small md5 CPU
    * cost — worth flipping when the exchange is network-bound, off by
    * default for the CPU-bound profile. Contamination is a ratio
    * REPORT, so a cross-corpus key collision (birthday ≈ n²/2^61 over
    * the shingle vocabulary) at worst flips one shingle's membership
    * bit; mode equality is spec-asserted on test data. */
  private def shingleKeys(text: String, k: Int, hashed: Boolean): Column =
    if (hashed) transform(shingles(col(text), k), Dedup.hashKey60(_))
    else shingles(col(text), k)

  /** Train/eval contamination check (n-gram overlap): for each eval
    * document, the fraction of its distinct k-shingles that occur
    * anywhere in the train corpus. The standard pre-release scan for
    * benchmark leakage into training data.
    *
    * Shape: distinct train shingles (one shuffle, map-side combined) →
    * left join from exploded eval shingles (shuffle on the shingle) →
    * per-doc hit ratio. Cost is linear in corpus shingle mass.
    */
  def contamination(train: DataFrame, eval: DataFrame, id: String,
                    text: String, k: Int,
                    hashShingleKeys: Boolean = false): DataFrame = {
    val keys = shingleKeys(text, k, hashShingleKeys)
    val trainSh = train
      .select(explode(keys).as("sh"))
      .distinct()
      .select(col("sh"), col("sh").as("hit_sh"))
    val evalSh = eval.select(col(id).as("doc_id"), explode(keys).as("sh"))
    evalSh.join(trainSh, Seq("sh"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_sh"), count(col("hit_sh")).as("n_hit"))
      .withColumn("contamination", Portable.pround(
        col("n_hit").cast("double") / col("n_sh"), 4))
  }

  /** Contamination when train and eval live in ONE table split by a
    * predicate: a SINGLE linear pipeline, so the corpus is scanned and
    * shingled exactly once (PlanSpec-asserted) — branching the exploded
    * table instead lets column pruning specialize each branch below the
    * exchange, silently defeating sameResult reuse and doubling the
    * scan. Per shingle, one aggregation records whether ANY train doc
    * has it and which eval docs need it; re-exploding the (small) eval
    * side yields the per-doc hit counts. Two shuffles total (shingle
    * key, then eval doc key), no join. */
  def contaminationSplit(docs: DataFrame, id: String, text: String,
                         k: Int, isEval: Column,
                         hashShingleKeys: Boolean = false): DataFrame =
    docs.select(col(id).as("doc_id"), isEval.as("ev"),
        explode(shingleKeys(text, k, hashShingleKeys)).as("sh"))
      .groupBy("sh")
      .agg(max(when(!col("ev"), lit(1)).otherwise(lit(0))).as("in_train"),
        collect_list(when(col("ev"), col("doc_id"))).as("eval_docs"))
      .filter(size(col("eval_docs")) > 0)
      .select(col("in_train"), explode(col("eval_docs")).as("doc_id"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_sh"), sum(col("in_train")).as("n_hit"))
      .withColumn("contamination", Portable.pround(
        col("n_hit").cast("double") / col("n_sh"), 4))

  /** Contamination at the train-side scale where [[contamination]]'s
    * distinct-shingle JOIN stops being reasonable: a 100 TB train
    * corpus has ~10^12 distinct shingles — shuffling them against the
    * eval probes is a full-corpus exchange for a report about a tiny
    * eval set. The Bloom spelling aggregates train shingle hashes into
    * ONE bounded membership sketch (`numBits` bits, `numBits`/8 bytes —
    * a model-sized binary, collected exactly like the trained IVF
    * centroids) and probes eval shingles with a codegen'd predicate:
    * no join, no train-side shuffle beyond the sketch merge, eval cost
    * linear in eval shingles alone. Uses Spark's own
    * `BloomFilterAggregate`/`BloomFilterMightContain` (the runtime-
    * filter machinery) — native expressions, no UDF.
    *
    * NO FALSE NEGATIVES: a shingle present anywhere in train always
    * probes true, so a contaminated doc can never score clean. False
    * positives are bounded by the bits/item budget, making the
    * reported ratio an UPPER bound that converges to [[contamination]]
    * as `numBits` grows (spec: equal on the test corpus at ~600
    * bits/item, and a hash-green CORRECTNESS row against h8's exact
    * DuckDB oracle at that sizing).
    *
    * Sizing honesty: `BloomFilterAggregate` silently `Math.min`-clamps
    * both arguments to `spark.sql.optimizer.runtime.bloomFilter
    * .maxNumItems`/`maxNumBits` (defaults 4M items / 2^26 bits — sized
    * for join runtime filters, not a corpus vocabulary); a clamped
    * sketch saturates and reports everything contaminated with no
    * error. The build therefore raises those session caps to the
    * requested size for the duration of the sketch job and restores
    * them after ([[withBloomCaps]]) — the bits you ask for are the bits
    * you get. Budget accordingly: the partial aggregation allocates one
    * `numBits`/8-byte buffer PER MAP TASK (2^30 bits = 128 MiB × task
    * concurrency), the same way any sketch-merge aggregate does, and
    * the merge exchange ships one partial sketch per map task —
    * compressed by sparsity (a task holding s shingles produces an
    * s-bits-set bitmap, which lz4 crushes; measured 32 MiB → ~3 MB at
    * probe fill), but still LINEAR IN MAP-TASK COUNT, not in data. On a
    * very wide scan (10^5+ tasks) cap the bits (or pre-shrink the
    * train side) so tasks × compressed-sketch stays inside the shuffle
    * budget — the regime where the exact [[contamination]] join's
    * 8-bytes-per-shingle exchange wins back is exactly when the sketch
    * no longer fits that budget.
    *
    * Shipping: the sketch reaches probe tasks as a torrent BROADCAST
    * ([[graft.functions.expressions.BloomProbe]]), not a plan
    * `Literal` — a literal rides the task binary and is deserialized
    * per task, which is why Spark caps its own runtime filters at
    * 8 MiB. Broadcast bytes move once per executor; the bytes→long[]
    * decode happens once per executor JVM. */
  def contaminationBloom(train: DataFrame, eval: DataFrame, id: String,
                         text: String, k: Int, expectedItems: Long,
                         numBits: Long): DataFrame =
    contaminationBloomWith(eval, id, text, k,
      trainShingleSketch(train, text, k, expectedItems, numBits))

  /** Probe side against a PRE-BUILT sketch — the deployment seam (the
    * [[Similarity.ivfTopKWith]] pattern): train the sketch once
    * offline ([[trainContaminationSketch]]), persist its bytes like
    * any model artifact, and probe every subsequent eval batch — or a
    * document STREAM — against it. The shingle probe itself is a
    * stateless codegen'd projection (composes with `readStream`
    * unchanged); the per-doc hit ratio is a standard grouped
    * aggregation, streaming-legal under update/complete output.
    * `sketch = null` (empty train corpus) marks nothing contaminated. */
  def contaminationBloomWith(eval: DataFrame, id: String, text: String,
                             k: Int, sketch: Array[Byte]): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val probe =
      if (sketch == null) lit(false) // empty train: nothing is contaminated
      else {
        val bc = eval.sparkSession.sparkContext.broadcast(sketch)
        ColumnBridge.column(graft.functions.expressions.BloomProbe(
          bc, ColumnBridge.expression(xxhash64(col("sh")))))
      }
    eval.select(col(id).as("doc_id"),
        explode(shingles(col(text), k)).as("sh"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_sh"),
        sum(when(probe, 1L).otherwise(0L)).as("n_hit"))
      .withColumn("contamination", Portable.pround(
        col("n_hit").cast("double") / col("n_sh"), 4))
  }

  /** Public name for the offline sketch build (bytes are the model
    * artifact to persist/version alongside IVF centroids). */
  def trainContaminationSketch(train: DataFrame, text: String, k: Int,
                               expectedItems: Long,
                               numBits: Long): Array[Byte] =
    trainShingleSketch(train, text, k, expectedItems, numBits)

  private[graft] val MaxItemsConf =
    "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
  private[graft] val MaxBitsConf =
    "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"

  /** Raise Spark's runtime-filter Bloom caps to at least the requested
    * sketch size for the duration of `body`, restoring the prior values
    * after — without this, `BloomFilterAggregate` silently clamps any
    * request above 4M items / 2^26 bits (verified against the Spark
    * 4.1.2 catalyst bytecode: `Math.min(requested, conf)` in the lazy
    * `estimatedNumItems`/`numBits`). Session-conf mutation is visible
    * to concurrent queries on the same session for the build's
    * duration; the caps are only ever RAISED, so a concurrent runtime
    * filter at worst gets more headroom, never less. */
  private[operators] def withBloomCaps[T](spark: SparkSession, items: Long,
                                          bits: Long)(body: => T): T = {
    val conf = spark.conf
    val saved = Seq(MaxItemsConf, MaxBitsConf).map(k => k -> conf.getOption(k))
    conf.set(MaxItemsConf, math.max(items, conf.get(MaxItemsConf).toLong))
    conf.set(MaxBitsConf, math.max(bits, conf.get(MaxBitsConf).toLong))
    try body
    finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  /** Build and collect the train-side shingle sketch: one scan, one
    * merge to a `numBits`-bit filter (serialized ≈ numBits/8 bytes).
    * Returns null for an empty train side. Exposed package-private so
    * specs can assert the built sketch really carries the requested
    * bits (i.e. the clamp raise worked). */
  private[graft] def trainShingleSketch(train: DataFrame, text: String,
                                        k: Int, expectedItems: Long,
                                        numBits: Long): Array[Byte] =
    withBloomCaps(train.sparkSession, expectedItems, numBits) {
      import org.apache.spark.sql.graft.ColumnBridge
      val trainHash = train
        .select(explode(shingles(col(text), k)).as("sh"))
        .select(xxhash64(col("sh")).as("h"))
      val bloomAgg = ColumnBridge.column(
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          ColumnBridge.catalystExpression(col("h")),
          org.apache.spark.sql.catalyst.expressions.Literal(expectedItems),
          org.apache.spark.sql.catalyst.expressions.Literal(numBits))
          .toAggregateExpression())
      trainHash.agg(bloomAgg.as("bf")).head().getAs[Array[Byte]](0)
    }

  /** [[contaminationBloom]] with the sketch sized FROM THE DATA: a
    * KMV cardinality estimate of the train shingle vocabulary
    * ([[Sketches.kmvDistinct]] — one cheap extra pass, rel. error
    * ≈ 1/√1024 ≈ 3%) picks `expectedItems` with 25% headroom, and the
    * bit budget is `bitsPerItem` × items (clamped to [2^16, maxBits]).
    * Removes the one manual knob that actually hurts when wrong: an
    * undersized sketch silently saturates and reports everything
    * contaminated.
    *
    * `maxBits` defaults to 2^30 (a 128 MiB serialized sketch — the
    * broadcast size we're comfortable shipping unasked; the driver and
    * each executor hold one copy). That budget covers a ~67M-shingle
    * vocabulary at the default 16 bits/item; for a bigger corpus pass a
    * larger `maxBits` explicitly — the build raises Spark's session
    * Bloom caps to match, so the request is honored, not silently
    * clamped (see [[contaminationBloom]]). */
  def contaminationBloomAuto(train: DataFrame, eval: DataFrame, id: String,
                             text: String, k: Int, bitsPerItem: Int = 16,
                             maxBits: Long = 1L << 30): DataFrame = {
    val trainSh = train.select(explode(shingles(col(text), k)).as("sh"))
    val est = Sketches.kmvDistinct(trainSh, col("sh"), 1024)
      .select("est_distinct").head().getDouble(0)
    val items = math.max(1000L, (est * 1.25).toLong)
    val bits = math.min(maxBits, math.max(1L << 16, items * bitsPerItem.toLong))
    contaminationBloom(train, eval, id, text, k, items, bits)
  }

  /** Deterministic hash sample: keep rows whose md5-derived bucket (of
    * `buckets`) falls below `rate`. Reproducible across runs, engines
    * and retries; sampling rate is exact in expectation and independent
    * per key. The 15-hex-digit slice is 60 bits — uniform, positive,
    * and parseable as a 64-bit integer by any engine (the oracle
    * mirrors it bit-for-bit). */
  def hashBucket(key: Column, buckets: Int): Column =
    Dedup.hashKey60(key.cast("string")) % buckets

  def hashSample(df: DataFrame, key: Column, rate: Int,
                 buckets: Int = 100): DataFrame =
    df.filter(hashBucket(key, buckets) < rate)

  /** Per-stratum quota: the top `n` rows of each stratum by `order`
    * (desc), ties broken by `tieBreak` (asc) for determinism. The
    * domain/language re-balancing step of corpus assembly. One window
    * per stratum — at scale prefer [[graft.plans.TopKPerKey]] when the
    * quota is small and strata are many. */
  def quotaSample(df: DataFrame, stratum: Seq[String], order: Column,
                  tieBreak: Column, n: Int): DataFrame = {
    val w = Window.partitionBy(stratum.map(col): _*)
      .orderBy(order.desc, tieBreak.asc)
    df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= n)
      .drop("rk")
  }

  /** Deterministic FIXED-SIZE per-stratum sample ("priority sample"):
    * the `n` rows with the smallest `md5(key ‖ salt)` per stratum — a
    * uniform without-replacement draw that is reproducible across
    * engines and re-runs (no RNG state), re-seedable via `salt`, and
    * stable under corpus growth (a new doc displaces at most one
    * incumbent). Complements [[hashSample]] (fixed RATE, size drifts
    * with the corpus) when downstream wants exactly-n rows per stratum
    * — eval set carving, per-language pilot corpora. Runs through the
    * bounded-heap [[graft.plans.TopKPerKey]]: map-side k-cap, never a
    * per-stratum sort of the full table. */
  def prioritySample(df: DataFrame, stratum: Seq[String], key: Column,
                     n: Int, salt: String = ""): DataFrame =
    graft.plans.TopKPerKey(
      df.withColumn("__pri", md5(concat(key.cast("string"), lit(salt)))),
      keys = stratum.map(col),
      order = Seq(col("__pri").asc, key.asc),
      k = n, rankName = "__rk")
      .drop("__rk", "__pri")

  /** Deterministic weighted Bernoulli THINNING (K13) — the sampler
    * that CONSUMES per-row ppm weights (E13's soft-dedup
    * `weight_ppm`, a quality score scaled to ppm, a source-mix
    * allocation): keep a row iff
    * `hash60(key ‖ salt) mod 10^6 < weight_ppm`. No RNG — the keep
    * decision is a pure function of (key, salt), so replays, retries
    * and incremental re-runs keep EXACTLY the same rows (the K1
    * hash-sample discipline, generalized from a constant rate to a
    * per-row weight), while across many rows the kept mass converges
    * to Σ weight/10^6 — e.g. a soft-dedup-weighted corpus thins to
    * the deduped token distribution in expectation. `weight_ppm ≥
    * 10^6` always keeps; `≤ 0` always drops; changing `salt` redraws
    * the whole sample. NULL contract (r11 advice): a NULL `key` or a
    * NULL `weightPpm` DROPS the row — the filter predicate evaluates
    * NULL, and SQL filters drop NULL — including rows whose weight
    * would otherwise be an always-keep `≥ 10^6`. This matches the K1
    * hashSample discipline (a row that cannot be deterministically
    * re-drawn on replay must not be kept by accident); coalesce the
    * key to a sentinel upstream if NULL keys should participate.
    * Pure codegen'd filter — zero shuffles, zero
    * state; scales with the scan alone. */
  def weightedThin(df: DataFrame, key: Column, weightPpm: Column,
                   salt: String = ""): DataFrame =
    df.filter(
      graft.operators.Sketches.portableHash(
        concat(key.cast("string"), lit(salt))) % lit(1000000L) < weightPpm)

  /** Sliding-window token CHUNKING with overlap — the
    * context-window-preparation step between curation and packing in a
    * training pipeline: each document's token stream is cut into
    * `chunk`-token windows every `chunk - overlap` tokens, so adjacent
    * chunks share `overlap` tokens of context and no token is dropped
    * (the tail chunk may be shorter). Entirely NARROW — tokenize,
    * per-row `sequence` of window starts, `posexplode`, `slice` — all
    * codegen'd built-ins, zero shuffles, zero UDFs; output rows stay on
    * their input partition, so the op scales with the scan alone.
    * Empty-token docs produce no chunks.
    *
    * Output: (id, chunk_id, start_token, n_tokens, chunk_text). */
  def chunkTokens(df: DataFrame, id: String, text: String,
                  chunk: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && chunk > overlap,
      s"need chunk > overlap >= 0, got chunk=$chunk overlap=$overlap")
    val stride = chunk - overlap
    df.select(col(id),
        graft.functions.TextFunctions.tokens(col(text)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") > 0)
      .select(col(id), col("__toks"), col("__n"),
        posexplode(sequence(lit(0), col("__n") - 1, lit(stride))))
      .select(col(id), col("pos").as("chunk_id"),
        col("col").as("start_token"),
        least(lit(chunk), col("__n") - col("col")).as("n_tokens"),
        array_join(slice(col("__toks"), col("col") + 1, lit(chunk)), " ")
          .as("chunk_text"))
  }

  /** Corpus-wide ADJACENT-PAIR frequencies — the counting step at the
    * heart of BPE-style tokenizer training (each merge round ranks
    * pairs by corpus frequency; this is that rank table for
    * whitespace units) and the bigram table language-model features
    * read. Pairs below `minCount` are dropped — the support threshold
    * every tokenizer trainer applies, and what keeps the output
    * vocabulary²-BOUNDED instead of corpus-sized.
    *
    * Shape: tokenize → per-row `transform` over the token index
    * (NARROW — the pair list never leaves its input partition) →
    * explode → one count agg with map-side combine. The agg's partial
    * state is the distinct-pair vocabulary per task, not the token
    * stream; one shuffle total. Docs with fewer than two tokens
    * contribute nothing.
    *
    * Output: (first_tok, second_tok, n), n ≥ minCount. */
  def bigramStats(df: DataFrame, text: String, minCount: Long): DataFrame = {
    val toks = graft.functions.TextFunctions.tokens(col(text))
    val pairs = df.select(toks.as("__toks"))
      .filter(size(col("__toks")) >= 2)
      .select(explode(transform(
        sequence(lit(1), size(col("__toks")) - 1),
        i => struct(element_at(col("__toks"), i).as("first_tok"),
          element_at(col("__toks"), i + 1).as("second_tok")))).as("p"))
    pairs.select(col("p.first_tok"), col("p.second_tok"))
      .groupBy("first_tok", "second_tok").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
  }

  /** Per-document top-k salient terms by LOG-FREE tf-idf: score =
    * tf × N / df (linear inverse document frequency). The log variant
    * ranks identically for a fixed corpus (log is monotone in N/df and
    * tf scales within a doc — the tf·log curve can reorder, but the
    * linear form is itself a standard idf family member) and the
    * rational spelling is exactly reproducible across engines: every
    * factor is an integer, the one division is a single IEEE op — no
    * libm `ln` whose last ULP differs between runtimes.
    *
    * Shape: tokenize+explode (narrow) → (doc, term) count with map-side
    * combine → vocabulary-sized df counts joined back on term → corpus
    * size N as a one-row broadcast → bounded-heap
    * [[graft.plans.TopKPerKey]] per doc. No global sort, no window. */
  def topTfidfTerms(df: DataFrame, id: String, text: String,
                    k: Int): DataFrame = {
    val terms = df.select(col(id),
      explode(filter(split(lower(col(text)), "[^a-z0-9]+"),
        t => length(t) > 0)).as("term"))
    val tf = terms.groupBy(col(id), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("__n"))
    val scored = tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(n))
      .select(col(id), col("term"), col("tf"), col("df"),
        (col("tf").cast("double") * col("__n") / col("df")).as("rtfidf"))
    graft.plans.TopKPerKey(scored,
      keys = Seq(col(id)),
      order = Seq(col("rtfidf").desc, col("term").asc),
      k = k, rankName = "rnk")
  }

  /** Token-budget quota: per stratum, keep rows in `order`-desc
    * (tie-broken) sequence while the RUNNING token total (inclusive of
    * the current row) stays within `budget` — how corpus assembly
    * targets a token mix, not a document mix. Same single-window shape
    * as [[quotaSample]]: one shuffle on the stratum key, one sort, a
    * codegen'd running sum, no join. A document larger than the
    * remaining budget blocks the stratum (running total passes the
    * budget and never decreases) — the deterministic greedy-prefix
    * semantics; skip-and-continue would make membership depend on
    * unbounded lookback. */
  def tokenBudgetSample(df: DataFrame, stratum: Seq[String], tokens: Column,
                        order: Column, tieBreak: Column,
                        budget: Long): DataFrame = {
    val w = Window.partitionBy(stratum.map(col): _*)
      .orderBy(order.desc, tieBreak.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_tokens", sum(tokens).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** GPT-style concat-and-split SEQUENCE PACKING: per stratum,
    * documents are laid head-to-tail in a deterministic order and cut
    * into fixed-`seqLen`-token training sequences; each doc gets the
    * sequence id and in-sequence token offset where it starts (a doc
    * straddling a cut spans consecutive sequences — the standard
    * pack-then-split training layout). The no-split greedy alternative
    * is a prefix recurrence (bin fill resets whenever a doc would
    * straddle) that no window expresses — it would serialize each
    * stratum through one task at 100 TB; concat-and-split is both the
    * common practice and the scalable shape: ONE window per stratum
    * (shuffle + sort), a running sum, two codegen'd projections. */
  def packSequences(df: DataFrame, stratum: Seq[String], tokens: Column,
                    order: Column, tieBreak: Column, seqLen: Long): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val w = Window.partitionBy(stratum.map(col): _*)
      .orderBy(order.desc, tieBreak.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // exclusive prefix sum = global offset of the doc's first token
    val start = sum(tokens).over(w) - tokens
    df.withColumn("seq_id", floor(start / seqLen))
      .withColumn("seq_offset", start % seqLen)
  }

  /** NO-SPLIT sequence packing — documents are never cut; each is
    * assigned whole to a fixed-capacity `seqLen`-token bin (the layout
    * for objectives that forbid cross-document attention or mid-doc
    * truncation). The EXACT greedy (walk quality-ordered docs, close
    * the bin when the next doc doesn't fit) is a sequential prefix
    * recurrence no window expresses — it would serialize each stratum
    * through one task at 100 TB — so this is the classic parallel
    * approximation: HARMONIC size-class packing. A doc of `n` tokens
    * joins class `cap = floor(seqLen / n)` (clamped to [1, seqLen]);
    * every bin of that class takes exactly `cap` docs, so capacity can
    * never overflow (`cap · n ≤ seqLen` by construction — no doc ever
    * straddles) and a FULL bin is > `cap/(cap+1) ≥ 50%` filled (docs of
    * class `cap` carry > seqLen/(cap+1) tokens each). Docs longer than
    * `seqLen` land alone in their own bin (`bin_cap = 1`) for the
    * caller to truncate or reroute. Waste vs the sequential greedy is
    * the harmonic-packing bound (≤ ~1.69× bins asymptotically vs
    * OPTIMAL — the greedy itself is ≥ 1.22× on adversarial input);
    * per-stratum-and-class it costs ONE window (shuffle + sort), fully
    * parallel in #classes × #strata.
    *
    * Output adds `bin_cap` (the class), `seq_id` (bin id, unique within
    * the stratum: class ⊕ running bin index), `bin_pos` (the doc's slot
    * in its bin, quality order). */
  def packSequencesNoSplit(df: DataFrame, stratum: Seq[String], tokens: Column,
                           order: Column, tieBreak: Column,
                           seqLen: Long): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val cap = greatest(lit(1L), least(lit(seqLen),
      floor(lit(seqLen) / greatest(tokens.cast("long"), lit(1L))).cast("long")))
    val w = Window.partitionBy((stratum.map(col) :+ col("bin_cap")): _*)
      .orderBy(order.desc, tieBreak.asc)
    df.withColumn("bin_cap", cap)
      .withColumn("__r", row_number().over(w).cast("long") - 1L)
      .withColumn("seq_id",
        shiftleft(col("bin_cap"), 40) + floor(col("__r") / col("bin_cap")))
      .withColumn("bin_pos", col("__r") % col("bin_cap"))
      .drop("__r")
  }

  /** LEAKAGE-SAFE train/val/test split: deterministic hash split where
    * the unit of assignment is the NEAR-DUP CLUSTER, not the document —
    * two near-duplicates must never straddle a split boundary (a doc in
    * train with its near-copy in test is benchmark leakage by
    * construction; Lee et al. ACL'22 measure exactly this effect).
    * Docs outside any cluster split by their own id.
    *
    * `clusters` is a (docCol, clusterCol) assignment (e.g.
    * [[Dedup.clusters]] output — only docs WITH near-dups appear in
    * it, usually dimension-sized next to the corpus). One left join +
    * the zero-shuffle hash filter family; thresholds are percents of
    * [[hashBucket]]'s 100-bucket space. `broadcastClusters = false`
    * drops the broadcast hint for a heavily-duplicated corpus whose
    * cluster table is fact-sized (same opt-out as
    * [[DataQuality.relationships]]). */
  def leakageSafeSplit(docs: DataFrame, id: String, clusters: DataFrame,
                       docCol: String, clusterCol: String,
                       trainPct: Int, valPct: Int,
                       broadcastClusters: Boolean = true): DataFrame = {
    require(trainPct > 0 && valPct > 0 && trainPct + valPct < 100,
      s"need positive train/val and a non-empty test band " +
        s"(train + val < 100), got train=$trainPct val=$valPct")
    val key = coalesce(col(clusterCol), col(id)).cast("string")
    val b = hashBucket(key, 100)
    val cl0 = clusters.select(col(docCol).as(id), col(clusterCol))
    val cl = if (broadcastClusters) broadcast(cl0) else cl0
    docs.join(cl, Seq(id), "left")
      .withColumn("split",
        when(b < trainPct, "train")
          .when(b < trainPct + valPct, "val").otherwise("test"))
      .withColumn("split_key", key)
  }

  /** Corpus mix report: per (group key) document/token mass and its
    * share of the whole corpus — the numbers data-mixing weights are
    * set from. One scan, one grouped aggregation; the strata table is
    * materialized once (`localCheckpoint`, distributed — never
    * collected) and the corpus-wide total is a second-level aggregation
    * over it, broadcast back as a one-row join. An unpartitioned window
    * would funnel ALL strata through a SinglePartition exchange — fine
    * for #source×lang strata, a driver-sized cliff the moment someone
    * strata-izes by a high-cardinality key (URL domain); the two-level
    * agg + broadcast scalar has no such cliff. */
  /** Cross-document boilerplate-LINE removal (H27) — the corpus-
    * statistical half of line filtering H25's per-line rules can't
    * see (C4 drops "any line occurring in ≥ N documents"; nav chrome
    * and cookie banners repeat VERBATIM across a crawl even when no
    * keyword rule matches them): a line is boilerplate iff it appears
    * in at least `minDocs` DISTINCT documents; every occurrence drops
    * and the survivors reassemble in original order. Returns
    * `(id, clean_text, n_kept, n_dropped)` — one row per input doc,
    * all-dropped docs report an empty string honestly.
    *
    * Scale shape: one posexplode + a map-combined per-line
    * distinct-doc count; the HOT set (lines at the threshold) is
    * boilerplate-sized, so the anti join back is small-side; the
    * ordered reassembly is an `array_sort(collect_list(struct(pos,
    * line)))` per doc — grouped state bounded by the doc's own line
    * count, no window. */
  def lineDedup(df: DataFrame, id: String, text: String,
                minDocs: Long): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val lines = df
      .select(col(id), posexplode(split(col(text), "\n"))
        .as(Seq("__pos", "__line")))
    val hot = lines.groupBy(col("__line"))
      .agg(countDistinct(col(id)).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select(col("__line"))
    val kept = lines.join(hot, Seq("__line"), "left_anti")
    val rebuilt = kept.groupBy(col(id))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("__pos"), col("__line")))),
          x => x.getField("__line")), "\n").as("clean_text"),
        count(lit(1)).as("n_kept"))
    df.select(col(id),
        size(split(col(text), "\n")).cast("long").as("__total"))
      .join(rebuilt, Seq(id), "left")
      .select(col(id),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("__total") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }

  def sourceMix(df: DataFrame, groupCols: Seq[String], tokens: Column,
                quality: Column): DataFrame = {
    val strata = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"), sum(tokens).as("n_tokens"),
        Portable.fixedAvg(quality, 4).as("avg_quality"))
      .localCheckpoint() // one scan: both consumers read the materialized strata
    val total = strata.agg(sum(col("n_tokens")).as("__tot"))
    strata.join(broadcast(total))
      .withColumn("token_share", Portable.pround(
        col("n_tokens").cast("double") / col("__tot"), 6))
      .drop("__tot")
  }

  /** Sliding character n-grams — the native single-pass expression
    * ([[graft.functions.expressions.CharNgrams]]). The declarative
    * `transform(sequence(...), i → substr)` spelling was O(len²) per
    * document (`substr` re-scans to code point i) and made the LM
    * scorer the slowest query in the suite. */
  private def charNgrams(c: Column, n: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.expressions.CharNgrams(
        org.apache.spark.sql.graft.ColumnBridge.expression(c), n))

  /** Character-n-gram language-model quality score — the CCNet-style
    * "does this read like the corpus" perplexity filter, kept in pure
    * rational arithmetic: per document, the mean (and min) transition
    * likelihood `P(cₙ | c₁..cₙ₋₁) = count(gram) / count(prefix·)` under
    * the corpus's own n-gram counts. Trained on the corpus it scores,
    * every gram has count ≥ 1 — no smoothing term, no transcendental
    * (a log-space spelling would hash-diverge across engines at the
    * libm ULP level; the mean likelihood ranks documents for the same
    * filtering purpose). Low scores flag machine-garbled / non-natural
    * text exactly like high perplexity does.
    *
    * Shape: TWO cheap corpus scans, deliberately — train then score,
    * the ivfTopKWith / trainContaminationSketch seam. The train pass
    * reduces gram occurrences map-side to a VOCAB-sized count table
    * (distinct char n-grams are capped by charset^n regardless of
    * corpus size — the shuffle carries per-task distinct grams, the
    * prefix marginals aggregate the vocabulary, not the corpus) and
    * materializes the model; the score pass is one scan + a broadcast
    * probe + one doc-key agg. The one-scan alternative — anchoring the
    * exploded grams for both consumers — would re-read a corpus-sized
    * exchange twice (and materializing the exploded grams is corpus ×
    * n bytes); re-scanning the source is strictly cheaper. The bounded
    * vocab is also what makes the model broadcast-able by construction
    * (a word-n-gram model would not be). Docs shorter than `n` chars
    * have no transitions and drop out, mirrored by the oracle's inner
    * join. */
  def ngramLmScore(docs: DataFrame, id: String, text: String, n: Int = 3,
                   scale: Int = 6): DataFrame =
    // train on exactly the rows the scorer keeps (non-null ids) — a
    // null-id doc must not shift the trained probabilities away from
    // what a re-scoring of the same identified corpus would use
    ngramLmScoreWith(docs, id, text, n, scale,
      trainCharLm(docs.filter(col(id).isNotNull), text, n))

  /** Train the [[ngramLmScore]] transition model: `(g, prob)` over the
    * corpus's char n-grams — vocab-sized, eagerly materialized (what a
    * deployment persists and reuses across scoring batches). */
  def trainCharLm(docs: DataFrame, text: String, n: Int = 3): DataFrame = {
    val full = docs.select(explode(charNgrams(col(text), n)).as("g"))
      .groupBy("g").agg(count(lit(1)).as("c_full"))
      .localCheckpoint() // vocab-sized; both consumers below read this
    val prefix = full.groupBy(substring(col("g"), 1, n - 1).as("p"))
      .agg(sum(col("c_full")).as("c_prefix"))
    full.withColumn("p", substring(col("g"), 1, n - 1))
      .join(prefix, "p")
      .select(col("g"),
        (col("c_full").cast("double") / col("c_prefix")).as("prob"))
  }

  /** Score against a pre-trained [[trainCharLm]] model — the per-batch
    * deployment cost: one scan, broadcast probe, one doc-key shuffle.
    * Grams unseen in training drop out (inner join); a corpus scored
    * against its own model loses nothing. */
  def ngramLmScoreWith(docs: DataFrame, id: String, text: String, n: Int,
                       scale: Int, model: DataFrame): DataFrame =
    docs.filter(col(id).isNotNull)
      .select(col(id).as("doc_id"), explode(charNgrams(col(text), n)).as("g"))
      .join(broadcast(model), Seq("g"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        Portable.fixedAvg(col("prob"), scale).as("avg_prob"),
        Portable.pround(min(col("prob")), scale).as("min_prob"))

  /** DSIR-style importance selection (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", NeurIPS 2023): score
    * every document by how much more it looks like a TARGET slice than
    * like the raw corpus — the likelihood ratio under two hashed-gram
    * language models — and keep the top `n`.
    *
    * Kept oracle-exact the [[ngramLmScore]] way: both models are
    * [[trainCharLm]] char-`gramN` transition tables (rational
    * count/count probabilities — no logs, so no libm divergence);
    * per-doc means are over ALL the doc's grams (an out-of-target-vocab
    * gram contributes zero target mass — the matched-only mean would
    * rank a one-gram accidental match above a true target doc), go
    * through fixed-point sums, and the ratio is one final double
    * division + pround. Selection is deterministic:
    * `(importance DESC, id ASC)`; zero-target-vocab docs score 0.
    *
    * Scale shape: two vocab-sized model builds (each one corpus scan +
    * map-combined gram agg — train-once artifacts a deployment
    * persists), then ONE scoring scan with two broadcast probes, one
    * doc-keyed agg, and a bounded TakeOrdered — never a global sort.
    * The paper's sampled variant replaces the top-n with
    * Gumbel-perturbed keys; top-n is the deterministic special case
    * (τ→0), chosen so the cut is engine-reproducible. */
  def dsirSelect(docs: DataFrame, id: String, text: String,
                 targetFilter: Column, n: Int, gramN: Int = 3,
                 scale: Int = 6): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val base = docs.filter(col(id).isNotNull)
    val mt = trainCharLm(base.filter(targetFilter), text, gramN)
    val ms = trainCharLm(base, text, gramN)
    dsirScoreWith(base, id, text, mt, ms, gramN, scale)
      .orderBy(col("importance").desc_nulls_last, col("doc_id").asc)
      .limit(n)
  }

  /** [[dsirSelect]]'s scoring pass against PRE-TRAINED target/source
    * [[trainCharLm]] models — the deployment seam (train once on the
    * reference slices, score every arriving batch; the I10/I18
    * frozen-model discipline): one scan, two broadcast probes, one
    * doc-keyed agg, no state. */
  def dsirScoreWith(docs: DataFrame, id: String, text: String,
                    targetModel: DataFrame, sourceModel: DataFrame,
                    gramN: Int = 3, scale: Int = 6): DataFrame = {
    val mt = targetModel.select(col("g"), col("prob").as("__pt"))
    val ms = sourceModel.select(col("g"), col("prob").as("__ps"))
    val p = math.pow(10, scale)
    // mean over ALL of the doc's grams, out-of-target-vocab grams
    // contributing ZERO mass — a doc matching few target grams must
    // be penalized, not judged on its matches alone (the matched-only
    // mean would rank a 1-gram accidental match above a true target
    // doc)
    def fixedMean(c: Column): Column =
      coalesce(sum(Portable.toFixed(c, scale)), lit(0L)).cast("double") /
        lit(p) / count(lit(1))
    docs.filter(col(id).isNotNull)
      .select(col(id).as("doc_id"), explode(charNgrams(col(text), gramN)).as("g"))
      .join(broadcast(mt), Seq("g"), "left")
      .join(broadcast(ms), Seq("g"), "left")
      .groupBy("doc_id")
      .agg(count(col("__pt")).as("n_target_grams"),
        fixedMean(col("__pt")).as("__at"),
        fixedMean(col("__ps")).as("__as"))
      // __as = 0 happens only under FROZEN models (a doc whose grams
      // are all absent from the source model — novel-language/OOV
      // batches; joint training sees every gram, so there __as > 0 by
      // construction). The unguarded IEEE ratio would yield NaN/Inf
      // that desc_nulls_last ordering quietly buries; such docs score
      // 0 — the same "no evidence → no importance" contract as
      // zero-target-vocab docs.
      .select(col("doc_id"), col("n_target_grams"),
        when(col("__as") > 0,
          Portable.pround(col("__at") / col("__as"), scale))
          .otherwise(lit(0.0)).as("importance"))
  }

  // ───────────────────────── BPE tokenizer training ──────────────────

  /** Train a BPE merge table (Sennrich et al. 2016) over the corpus:
    * `(rank, left, right, pair_count)` — the learned vocabulary every
    * LLM data pipeline ships to its tokenizer.
    *
    * Scale shape: the ONLY corpus-sized stage is one distributed
    * word-frequency count (map-side combined; [[bigramStats]]'s h17
    * exchange discipline). The count table is then capped at `topWords`
    * by `(freq desc, word asc)` through a bounded-heap TakeOrdered —
    * never a full sort — and the merge loop runs driver-side on that
    * MODEL-SIZED table, exactly how production trainers work (word
    * counts first, merges on the distinct-word multiset: merge cost is
    * vocabulary-bounded and INDEPENDENT of corpus size, so 100 TB costs
    * one count pass more than 100 GB, nothing else). The collect is the
    * same model-sized-only discipline as [[trainCharLm]] and the PQ
    * codebook training.
    *
    * Semantics (deterministic, engine-portable): words are
    * whitespace-split lowercased tokens; a word's symbols are its code
    * points plus the `</w>` marker; per round, pair counts are summed
    * over adjacent POSITIONS weighted by word frequency (the reference
    * algorithm's `get_stats`), the argmax breaks ties by `(count desc,
    * left asc, right asc)`, and the winning pair is merged left to
    * right in every word. Stops early when the best pair's count drops
    * below `minPairCount` (merges learned from one occurrence
    * generalize nothing). */
  def bpeTrain(df: DataFrame, text: String, numMerges: Int,
               topWords: Int = 65536, minPairCount: Long = 2): DataFrame = {
    val spark = df.sparkSession
    val capped = df
      .select(explode(graft.functions.TextFunctions.tokens(
        lower(col(text)))).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("__w").asc)
      .limit(topWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val merges = bpeTrainLocal(capped, numMerges, minPairCount)
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((l, r, c), i) => (i, l, r, c) }.toSeq
      .toDF("rank", "left", "right", "pair_count")
  }

  /** The exact merge loop on a word-frequency table — package-visible
    * for property tests. */
  private[graft] def bpeTrainLocal(wordCounts: Seq[(String, Long)],
                                   numMerges: Int, minPairCount: Long)
      : Seq[(String, String, Long)] = {
    import scala.collection.mutable
    val words = wordCounts.map { case (w, n) =>
      val syms = mutable.ArrayBuffer[String]()
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        syms += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      syms += graft.functions.expressions.BpeCodec.Eow
      (syms, n)
    }
    val out = mutable.ArrayBuffer[(String, String, Long)]()
    var stop = false
    while (!stop && out.size < numMerges) {
      val counts = mutable.HashMap[(String, String), Long]()
      for ((syms, n) <- words; i <- 0 until syms.length - 1)
        counts.updateWith((syms(i), syms(i + 1)))(c => Some(c.getOrElse(0L) + n))
      if (counts.isEmpty) stop = true
      else {
        val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        if (c < minPairCount) stop = true
        else {
          out += ((l, r, c))
          for ((syms, _) <- words) {
            var j = 0
            while (j < syms.length - 1) {
              if (syms(j) == l && syms(j + 1) == r) {
                syms(j) = l + r
                syms.remove(j + 1)
              }
              j += 1
            }
          }
        }
      }
    }
    out.toSeq
  }

  /** A [[bpeTrain]] result as the ordered merge list [[bpeEncode]]
    * consumes — model-sized collect. */
  def bpeMerges(trained: DataFrame): Seq[(String, String)] =
    trained.orderBy(col("rank").asc).collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right"))).toSeq

  /** Tokenize the corpus under a FROZEN merge table: `(id, pieces,
    * n_pieces)` with `pieces` the document's BPE symbols in order.
    *
    * A pure ZERO-SHUFFLE projection through the native codegen'd
    * [[graft.functions.expressions.BpeSegment]] — no distinct-word
    * join, no exchange; the merge table is model-sized and rides the
    * plan once per task. The per-occurrence segmentation cost is what a
    * distinct-word+join spelling would trade a corpus-wide shuffle for;
    * on natural text (high word repetition, short words) the projection
    * wins and keeps the stage in whole-stage codegen. */
  def bpeEncode(df: DataFrame, id: String, text: String,
                merges: Seq[(String, String)]): DataFrame = {
    val codec = new graft.functions.expressions.BpeCodec(merges)
    val pieces = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.expressions.BpeSegment(
        org.apache.spark.sql.graft.ColumnBridge.expression(
          graft.functions.TextFunctions.tokens(lower(col(text)))), codec))
    df.filter(col(id).isNotNull)
      .select(col(id).as("doc_id"), pieces.as("pieces"))
      .withColumn("n_pieces", size(col("pieces")))
  }

  /** Distill a boolean curation LABEL into a broadcastable linear
    * token-evidence model — the fasttext-style quality-classifier role
    * (train a cheap scorer on rule labels or human labels, then score
    * the whole corpus with a projection-cheap pass). The model is
    * `(tok, pos, neg)`: lowercased-token OCCURRENCE counts among
    * label-true / label-false documents, capped to the `vocab` tokens
    * with the highest total count (ties by token string, so the cap is
    * deterministic on both engines). Everything integer-exact — no
    * log-probabilities, so the oracle reproduces training bit-for-bit.
    *
    * Scale shape: one corpus scan, token counts collapse map-side, and
    * the top-`vocab` cut runs over the VOCABULARY-sized distinct-token
    * table (TakeOrdered — never a full sort of corpus rows). */
  def trainEvidenceModel(docs: DataFrame, text: String, label: Column,
                         vocab: Int): DataFrame =
    docs
      .select(label.as("__y"),
        explode(graft.functions.TextFunctions.tokens(lower(col(text))))
          .as("tok"))
      .groupBy("tok")
      .agg(sum(when(col("__y"), 1L).otherwise(0L)).as("pos"),
        sum(when(col("__y"), 0L).otherwise(1L)).as("neg"))
      .orderBy((col("pos") + col("neg")).desc, col("tok"))
      .limit(vocab)

  /** Score documents against a [[trainEvidenceModel]] model. Per token
    * occurrence the integer evidence is `pos_t·NEG − neg_t·POS` (POS /
    * NEG are the model's class totals), i.e. the exact
    * common-denominator numerator of `p̂(t|keep) − p̂(t|drop)`; the doc
    * evidence is its sum over occurrences (out-of-vocabulary tokens
    * contribute 0), kept exact in decimal so `predicted = sign` never
    * flips to float noise. The reported `evidence` column is the
    * per-token mean `Σ/(POS·NEG·n_tok)`, rounded.
    *
    * Scale shape: the model is vocab-sized and BROADCAST; scoring is
    * scan → explode → broadcast hash join → one doc-keyed partial-agg
    * sum — a single shuffle of (doc_id, partial sums), never text. The
    * same projection composes with `readStream` (stateless until the
    * per-doc agg, which is streaming-legal under update mode). */
  def evidenceScoreWith(docs: DataFrame, id: String, text: String,
                        model: DataFrame, scale: Int = 6): DataFrame = {
    // materialize the vocab-sized model ONCE (the bpeMerges/trainCharLm
    // model-sized-collect discipline): the class totals come from the
    // same rows, and the scoring plan then carries a local relation —
    // one corpus scan total, not a re-run of training inside the join
    val mrows = model
      .select(col("tok"), col("pos").cast("long"), col("neg").cast("long"))
      .collect()
    // single-class (or empty) training degenerates every comparison;
    // clamping the absent class to 1 keeps the scorer total and biased
    // toward the one class seen — the honest failure mode
    val posT = math.max(1L, mrows.map(_.getLong(1)).sum)
    val negT = math.max(1L, mrows.map(_.getLong(2)).sum)
    val spark = docs.sparkSession
    import spark.implicits._
    val local = mrows.toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toDF("tok", "pos", "neg")
    val dec = "decimal(38,0)"
    val perTok = col("pos").cast(dec) * lit(negT).cast(dec) -
      col("neg").cast(dec) * lit(posT).cast(dec)
    docs
      .select(col(id).as("doc_id"),
        explode(graft.functions.TextFunctions.tokens(lower(col(text))))
          .as("tok"))
      .join(broadcast(local), Seq("tok"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"),
        coalesce(sum(perTok), lit(0L).cast(dec)).as("__ev"))
      .select(col("doc_id"), col("n_tok"),
        Portable.pround(col("__ev").cast("double") /
          (lit(posT.toDouble) * lit(negT.toDouble) *
            col("n_tok").cast("double")), scale).as("evidence"),
        when(col("__ev") > lit(0L).cast(dec), 1).otherwise(0).as("predicted"))
  }

  /** Train on `trainFilter` docs, score ALL docs — the end-to-end
    * distillation pipeline (H21). */
  def evidenceClassify(docs: DataFrame, id: String, text: String,
                       label: Column, trainFilter: Column, vocab: Int,
                       scale: Int = 6): DataFrame =
    evidenceScoreWith(docs, id, text,
      trainEvidenceModel(docs.filter(trainFilter), text, label, vocab),
      scale)

  /** Conjunctive keyword search over an inverted posting view (H22) —
    * the corpus-inspection query every curation loop runs ("show me the
    * docs about X and Y"): documents containing ALL `terms`, ranked by
    * the EXACT-INTEGER tf-idf surrogate Σ_t tf_{d,t}·(N − df_t)
    * (monotone in tf and in inverse document frequency; integer, so
    * rank order — the thing a search result IS — cannot drift to float
    * noise or libm `ln` ULPs across engines), top `k` with doc-id
    * tie-break.
    *
    * Shape: tokenize+explode filtered to the query terms BEFORE the
    * (doc, term) count (the posting build touches only matching
    * tokens), df per term from the postings themselves (a
    * vocabulary-|terms|-sized agg broadcast back), conjunction as
    * `count(distinct term) = |terms|` on the doc-keyed agg, then
    * TakeOrdered top-k (bounded heap, no global sort) and a rank window
    * over the K-ROW result. Never an index scan per term + intersect
    * loop — the one-pass grouped spelling is the scalable form. */
  def keywordSearch(docs: DataFrame, id: String, text: String,
                    terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "keywordSearch needs at least one term")
    val q = terms.map(_.toLowerCase).distinct
    val postings = docs
      .select(col(id), explode(filter(split(lower(col(text)), "[^a-z0-9]+"),
        t => length(t) > 0)).as("term"))
      .filter(col("term").isin(q.map(x => x: Any): _*))
      .groupBy(col(id), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("__n"))
    val scored = postings
      .join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(n))
      .groupBy(col(id))
      .agg(countDistinct(col("term")).as("__hits"),
        sum(col("tf") * (col("__n") - col("df"))).as("score"),
        sum(col("tf")).as("total_tf"))
      .filter(col("__hits") === q.size)
      .select(col(id), col("score"), col("total_tf"))
      .orderBy(col("score").desc, col(id).asc)
      .limit(k)
    scored.withColumn("rnk", row_number().over(
      Window.orderBy(col("score").desc, col(id).asc)))
  }

  /** EXACT distributed global rank — `row_number() OVER (ORDER BY …)`
    * without the single-partition window that spelling forces: range-
    * repartition on the order key (Spark's sampled range partitioner —
    * the same machinery as a global sort), sort within partitions, then
    * per-partition row counts (one tiny collect, numPartitions longs)
    * become cumulative offsets added back in ONE mapPartitions pass.
    * The classic two-phase distributed ranking; every stage is linear
    * and no task ever holds more than its own partition.
    *
    * `order` must be a TOTAL order (include a unique tie-break) or
    * ranks within ties are partition-placement-dependent. */
  def globalRank(df: DataFrame, order: Seq[Column],
                 rankName: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+
        org.apache.spark.sql.types.StructField(rankName, org.apache.spark.sql.types.LongType))
    // persist: the counts pass and the offset pass both read the sorted
    // RDD — unpinned, the range-partition + sort would run twice. This
    // pin is LOAD-BEARING for the returned frame (the ranked RDD maps
    // over it), so it must outlive the call — unlike the iterative
    // operators' superseded pins ([[Pins]]) there is nothing to release
    // here; lineage is intact, so if the caller's janitor unpersists it
    // the frame recomputes instead of failing.
    val rdd = sorted.rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = rdd.mapPartitionsWithIndex { (i, it) =>
      Iterator((i, it.size.toLong))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val ranked = rdd.mapPartitionsWithIndex { (i, it) =>
      var r = offsets(i)
      it.map { row =>
        r += 1
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ r)
      }
    }
    spark.createDataFrame(ranked, schema)
  }

  /** Mixture rebalancing to TARGET INTEGER WEIGHTS (K9) — corpus
    * assembly's "make the training mix 6:3:1 en:de:fr" step: keep the
    * LARGEST corpus whose per-stratum counts sit exactly in the target
    * ratio. With weights w_s and counts n_s, the binding stratum gives
    * t = min_s ⌊n_s / w_s⌋ and each stratum keeps exactly k_s = w_s·t
    * rows — all integer arithmetic, so the selected SET is
    * deterministic and oracle-reproducible (no float proportions whose
    * rounding could disagree across engines). Within a stratum the
    * k_s keepers are the smallest `md5(key ‖ salt)` values (the K7
    * reproducible-uniform discipline): re-runs, retries and engines
    * agree row-for-row, and the sample is uniform within each stratum.
    *
    * Shape: one stratum-count agg (sketch-sized), the binding-minimum
    * as a one-row broadcast, and one rank window per stratum (the
    * quotaSample shape) — input scanned once, one stratum-keyed
    * exchange. Strata present in the data but absent from `weights`
    * are dropped (weight 0); a weight for an absent stratum forces
    * t = 0 and empties the output (the honest answer — the target mix
    * is unsatisfiable). */
  def rebalanceMix(df: DataFrame, stratum: String,
                   weights: Map[String, Long], key: Column,
                   salt: String): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "rebalanceMix needs positive integer weights")
    val spark = df.sparkSession
    import spark.implicits._
    val wdf = weights.toSeq.toDF(stratum, "__w")
    val counts = df.groupBy(col(stratum)).agg(count(lit(1)).as("__n"))
    // t = min over weighted strata of floor(n/w); weights with no rows
    // contribute floor(0/w) = 0 via the right join
    val t = wdf.join(counts, Seq(stratum), "left")
      .select(floor(coalesce(col("__n"), lit(0L)) / col("__w")).as("__t"))
      .agg(min(col("__t")).as("__t"))
    val w = Window.partitionBy(col(stratum))
      .orderBy(md5(concat(key.cast("string"), lit(salt))), key)
    df.join(broadcast(wdf), Seq(stratum))
      .crossJoin(broadcast(t))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= col("__w") * col("__t"))
      .drop("__w", "__t", "__rn")
  }

  /** Curriculum ordering (K8) — rank the corpus easy→hard by a
    * deterministic difficulty key and cut it into `phases` equal-count
    * training phases with EXACT `ntile` semantics (bucket sizes differ
    * by at most one, earlier buckets take the remainder — the standard
    * SQL contract, so the assignment is oracle-checkable): phase 1 is
    * what the first epoch sees, phase `phases` the last. Built on
    * [[globalRank]], so no single-partition window anywhere; the ntile
    * arithmetic is a codegen'd projection over the ranked frame.
    *
    * `order` must be total (tie-break on the id) — same contract as
    * [[globalRank]]. */
  /** Temperature-flattened mixture sampling (K10) — the multilingual /
    * multi-domain corpus trick (sample strata ∝ n^τ with τ < 1 so huge
    * strata stop drowning small ones; τ = 1/2 here, the common
    * UNIMAX-ish midpoint between proportional and uniform): draw
    * `total` rows with per-stratum allocations ∝ isqrt(n_s),
    * largest-remainder rounded. Everything is INTEGER arithmetic —
    * isqrt is floor(√n) computed exactly (one correction step on the
    * correctly-rounded double sqrt, valid through 2^52), allocations
    * are BigInt floor-div + remainder ranks — so the selected SET is
    * deterministic and oracle-reproducible; no float proportions whose
    * last-ulp could flip a floor across engines. Within a stratum the
    * keepers are the smallest `md5(key ‖ salt)` (the K7 reproducible-
    * uniform discipline). A stratum smaller than its allocation
    * contributes all its rows and the total comes up short — the
    * honest answer (re-spreading the deficit would re-weight the mix).
    *
    * Scale shape: one stratum-count agg (sketch-sized) whose result is
    * collected driver-side for the exact BigInt allocation (model-sized
    * — same discipline as the BPE merge table), broadcast back, and
    * ONE rank window per stratum over the input — input scanned once,
    * one stratum-keyed exchange. */
  def temperatureSample(df: DataFrame, stratum: String, key: Column,
                        total: Long, salt: String): DataFrame = {
    require(total >= 0, s"total must be non-negative, got $total")
    val spark = df.sparkSession
    import spark.implicits._
    def isqrt(n: Long): Long = {
      var r = math.sqrt(n.toDouble).toLong
      while ((r + 1) * (r + 1) <= n) r += 1
      while (r * r > n) r -= 1
      r
    }
    val counts = df.groupBy(col(stratum)).agg(count(lit(1)).as("__n"))
      .collect()
      .map(r => (r.get(0).toString, r.getAs[Long]("__n")))
      .sortBy(_._1)
    val u = counts.map { case (s, n) => (s, n, BigInt(isqrt(n))) }
    val bigU = u.map(_._3).sum
    val alloc: Seq[(String, Long)] =
      if (bigU == 0) Seq.empty
      else {
        val t = BigInt(total)
        val base = u.map { case (s, n, us) =>
          (s, n, (t * us) / bigU, (t * us) % bigU) }
        val leftover = (t - base.map(_._3).sum).toLong
        val bonus = base.sortBy { case (s, _, _, rem) => (-rem, s) }
          .take(leftover.toInt).map(_._1).toSet
        base.map { case (s, n, b, _) =>
          val a = b.toLong + (if (bonus(s)) 1L else 0L)
          (s, math.min(n, a))
        }.toSeq
      }
    val allocDf = alloc.toDF(stratum, "__alloc")
    val w = Window.partitionBy(col(stratum))
      .orderBy(md5(concat(key.cast("string"), lit(salt))), key)
    df.join(broadcast(allocDf), Seq(stratum))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= col("__alloc"))
      .drop("__alloc", "__rn")
  }

  /** Exact `ntile(buckets)` over a TOTAL `order` without a
    * single-partition window: [[globalRank]] (range repartition +
    * per-partition offsets) assigns the dense global rank, then the
    * standard ntile arithmetic (first `n % B` buckets take the
    * remainder) runs as a plain projection — the [[curriculumPhases]]
    * machinery generalized to any bucket column. Adds `name` (1-based
    * bucket), preserves all input columns. */
  def exactNtile(df: DataFrame, order: Seq[Column], buckets: Int,
                 name: String): DataFrame = {
    require(buckets >= 1, s"buckets must be positive, got $buckets")
    val ranked = globalRank(df, order, "__xnt_rank")
    val n = ranked.agg(max(col("__xnt_rank")).as("__n"))
    ranked.crossJoin(broadcast(n))
      .withColumn(name, {
        val b = lit(buckets.toLong); val r = col("__xnt_rank")
        val q = floor(col("__n") / b); val rem = col("__n") % b
        val cut = rem * (q + lit(1L))
        when(q === 0, r)
          .when(r <= cut, floor((r - 1) / (q + lit(1L))) + 1)
          .otherwise(rem + floor((r - cut - 1) / q) + 1)
      })
      .drop("__n", "__xnt_rank")
  }

  def curriculumPhases(df: DataFrame, order: Seq[Column],
                       phases: Int): DataFrame = {
    require(phases >= 1, s"phases must be positive, got $phases")
    val ranked = globalRank(df, order, "rank")
    // ntile(B) over n rows at 1-based rank r: rem = n % B buckets of
    // size q+1 first, then size-q buckets (q = n / B); n = max(rank)
    // reads the persisted ranked RDD, not the input again
    val n = ranked.agg(max(col("rank")).as("__n"))
    ranked.crossJoin(broadcast(n))
      .withColumn("phase", {
        val b = lit(phases.toLong); val r = col("rank")
        val q = floor(col("__n") / b); val rem = col("__n") % b
        val cut = rem * (q + lit(1L))
        when(q === 0, r) // fewer rows than phases: one row per phase
          .when(r <= cut, floor((r - 1) / (q + lit(1L))) + 1)
          .otherwise(rem + floor((r - cut - 1) / q) + 1)
      })
      .drop("__n")
  }
}
