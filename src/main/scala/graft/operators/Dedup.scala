package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines.
  *
  * Scale design: every variant generates candidate pairs through an
  * equi-join on a bucketing key (content hash, shared shingle, LSH band,
  * coarse cluster) — never a cross product — so cost is linear in bucket
  * mass. High-frequency "stop shingles" are dropped before pair
  * generation (standard MinHash practice) to bound bucket fan-out under
  * skew; the same role AQE skew-join would play for genuinely heavy keys.
  */
object Dedup {

  /** Exact dedup: group by content hash; keeper = min id. */
  def exact(docs: DataFrame, id: String, text: String): DataFrame =
    docs.groupBy(md5(col(text)).as("content_hash"))
      .agg(min(col(id)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Per-doc exploded (id, shingle) with distinct shingles, dropping
    * shingles shared by more than `maxDocFreq` docs. */
  private def shingleTable(docs: DataFrame, id: String, text: String,
                           k: Int, maxDocFreq: Int): DataFrame = {
    val tbl = docs
      .select(col(id).as("doc"), explode(shingles(col(text), k)).as("sh"))
      .distinct()
    val freq = tbl.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDocFreq)
    tbl.join(freq.select("sh"), Seq("sh"), "inner")
  }

  /** N-gram Jaccard near-dup: candidate pairs share >= 1 (non-stop)
    * shingle; J(a,b) = |A∩B| / (|A|+|B|-|A∩B|) over distinct shingles. */
  def ngramJaccard(docs: DataFrame, id: String, text: String, k: Int,
                   threshold: Double, maxDocFreq: Int = 100): DataFrame = {
    val sh = shingleTable(docs, id, text, k, maxDocFreq)
    val sizes = docs.select(col(id).as("doc"),
      size(array_distinct(shingles(col(text), k))).as("n_sh"))
    val a = sh.as("a"); val b = sh.as("b")
    val shared = a.join(b, col("a.sh") === col("b.sh") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(broadcast(sizes.withColumnRenamed("doc", "doc_a")
        .withColumnRenamed("n_sh", "n_a")), Seq("doc_a"))
      .join(broadcast(sizes.withColumnRenamed("doc", "doc_b")
        .withColumnRenamed("n_sh", "n_b")), Seq("doc_b"))
      .withColumn("jaccard", graft.functions.Portable.pround(
        col("n_shared").cast("double") /
          (col("n_a") + col("n_b") - col("n_shared")), 4))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Deterministic MinHash signature component i: the minimum md5 of
    * (i ':' shingle). md5 hex strings are fixed-width so string-min is a
    * uniform hash-min — a portable permutation family the oracle can
    * reproduce bit-for-bit. */
  private def minhashCol(sh: Column, i: Int): Column =
    array_min(transform(sh, s => md5(concat_ws(":", lit(i.toString), s))))

  /** MinHash+LSH candidate pairs: k-shingles → `numHashes` minhashes →
    * bands of `rowsPerBand` → bucket equi-join on (band idx, band key).
    * Returns distinct candidate pairs with the number of colliding bands
    * (more bands ⇒ higher estimated similarity). */
  def minhashLsh(docs: DataFrame, id: String, text: String, k: Int,
                 numHashes: Int, rowsPerBand: Int): DataFrame = {
    require(numHashes % rowsPerBand == 0)
    val sh = array_distinct(shingles(col(text), k))
    val sig = docs.select(col(id).as("doc"),
      array((0 until numHashes).map(i => minhashCol(sh, i)): _*).as("sig"))
    val numBands = numHashes / rowsPerBand
    val banded = sig.select(col("doc"), posexplode(
      array((0 until numBands).map(bnd =>
        md5(concat_ws("|", slice(col("sig"), bnd * rowsPerBand + 1, rowsPerBand)))
      ): _*)).as(Seq("band", "bucket")))
    val a = banded.as("a"); val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket")
        && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .agg(count(lit(1)).as("n_bands"))
  }

  /** 64-bit SimHash over tokens: per-bit majority vote of token hashes.
    * Bit j of token t = bit j of xxhash64(t); weight = token frequency. */
  def simhash(docs: DataFrame, id: String, text: String): DataFrame = {
    val tok = tokens(lower(col(text)))
    val sig = (0 until 64).map { j =>
      // sum over tokens of (+1 if bit j set else -1) > 0  → bit j of sig
      val votes = aggregate(tok, lit(0L),
        (acc, t) => acc + when(shiftright(xxhash64(t), j).bitwiseAND(lit(1L)) === 1L,
          lit(1L)).otherwise(lit(-1L)))
      when(votes > 0, lit(1L).cast("long") * lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    docs.select(col(id).as("doc"), sig.as("simhash"))
  }

  /** SimHash near-dup candidates: bucket by the 4 16-bit chunks of the
    * signature (pigeonhole: hamming distance <= 3 guarantees one exact
    * chunk match), verify hamming distance within buckets. */
  def simhashNearDup(docs: DataFrame, id: String, text: String,
                     maxHamming: Int): DataFrame = {
    val sig = simhash(docs, id, text)
    val chunked = sig.select(col("doc"), col("simhash"), posexplode(
      array((0 until 4).map(c =>
        shiftrightunsigned(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL))): _*))
      .as(Seq("chunk", "key")))
    val a = chunked.as("a"); val b = chunked.as("b")
    val hamming = {
      val x = col("a.simhash").bitwiseXOR(col("b.simhash"))
      bit_count(x)
    }
    a.join(b, col("a.chunk") === col("b.chunk") && col("a.key") === col("b.key")
        && col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"),
        hamming.as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding near-dup: cosine >= threshold within coarse partitions
    * (`clusterCol` plays the IVF cell). Pairs are generated per cluster
    * — an equi-join on the cluster key — never a cross product. */
  def embeddingNearDup(emb: DataFrame, id: String, vec: String,
                       clusterCol: String, threshold: Double): DataFrame = {
    val normed = emb.select(col(id).as("vid"), col(clusterCol).as("cl"),
      Similarity.l2normalize(col(vec)).as("v"))
    val a = normed.as("a"); val b = normed.as("b")
    a.join(b, col("a.cl") === col("b.cl") && col("a.vid") < col("b.vid"))
      .select(col("a.vid").as("id_a"), col("b.vid").as("id_b"),
        graft.functions.Portable.pround(
          Similarity.dot(col("a.v"), col("b.v")), 4).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
