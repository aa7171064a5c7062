package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — the query set is broadcast (it
  * is small by construction) and every corpus partition scores its own
  * rows in one codegen'd pass; a per-query window keeps top-k. At 100 TB
  * corpus this is one broadcast + one scan + one k-bounded shuffle.
  *
  * Scale path: random-hyperplane LSH — `numBits` deterministic
  * hyperplanes hash each vector to a bucket; probing joins only matching
  * buckets, cutting the scored candidates from |corpus| to bucket mass.
  */
object Similarity {

  /** Sequential left-fold dot product — same accumulation order as the
    * oracle engine, so results match bit-for-bit before rounding. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def l2norm(v: Column): Column = sqrt(aggregate(v, lit(0.0d), (acc, x) => acc + x * x))

  def l2normalize(v: Column): Column = {
    val n = l2norm(v)
    transform(v, x => x / n)
  }

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Exact top-k neighbors for each query vector (excluding self).
    * Ranking uses the cosine rounded to 6dp with an id tie-break so the
    * result is engine-stable. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, id: String,
                     vec: String, k: Int): DataFrame = {
    val c = corpus.select(col(id).as("nn_id"), l2normalize(col(vec)).as("cv"))
    val q = queries.select(col(id).as("query_id"), l2normalize(col(vec)).as("qv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("nn_id"))
      .withColumn("cosine", graft.functions.Portable.pround(dot(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nn_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "rank", "nn_id", "cosine")
  }

  /** Deterministic pseudo-random hyperplane component d of plane p:
    * a fixed hash of (p, d) mapped to [-0.5, 0.5). No RNG state — every
    * executor derives the same planes. */
  private def planeCoef(p: Int, d: Column): Column =
    (pmod(xxhash64(lit(p), d), lit(1000000L)).cast("double") / 1000000.0d) - 0.5d

  /** Random-hyperplane LSH bucket id over `numBits` planes. */
  def lshBucket(vec: Column, numBits: Int): Column =
    (0 until numBits).map { p =>
      val proj = aggregate(zip_with(vec, sequence(lit(0), size(vec) - 1),
        (x, i) => x * planeCoef(p, i)), lit(0.0d), (acc, x) => acc + x)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** ANN via LSH: score only corpus rows in the query's bucket. Same
    * output shape as [[bruteForceTopK]]; recall < 1 by design. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, id: String, vec: String,
              k: Int, numBits: Int): DataFrame = {
    val c = corpus.select(col(id).as("nn_id"), l2normalize(col(vec)).as("cv"))
      .withColumn("bucket", lshBucket(col("cv"), numBits))
    val q = queries.select(col(id).as("query_id"), l2normalize(col(vec)).as("qv"))
      .withColumn("bucket", lshBucket(col("qv"), numBits))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("nn_id"))
      .withColumn("cosine", graft.functions.Portable.pround(dot(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nn_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "rank", "nn_id", "cosine")
  }
}
