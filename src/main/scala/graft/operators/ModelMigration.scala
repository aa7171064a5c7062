package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN model-version migration — the BATCH event the streaming index
  * maintainer ([[graft.streaming.AnnIndexStream]]) defers retraining
  * to: PQ codes are only meaningful against the codebook generation
  * that encoded them, so a retrain REQUIRES a full re-encode, and
  * probes must never read a mixed-generation index.
  *
  * The layout puts every generation under its own immutable prefix and
  * commits with a MARKER FILE (the table-format commit-file idiom —
  * one atomic file create, never a rename-over or an in-place mutate):
  *
  * {{{
  *   root/versions/v<N>/{centroids, codebooks, codes}   // one generation
  *   root/published/v<N>                                // commit marker
  * }}}
  *
  * The current version is the HIGHEST marker. Readers resolve every
  * component (model + codes) through ONE [[currentVersion]] read, so a
  * probe is always a single consistent generation. A crash anywhere in
  * [[prepare]] leaves the new prefix unpublished garbage and the prior
  * version fully servable; [[publish]] is the one-file commit point.
  * Re-running a crashed migration overwrites the unpublished prefix
  * (idempotent — deterministic trainers, mode overwrite).
  *
  * At 100 TB: the re-encode is one pure-projection pass over the
  * corpus (the [[Similarity.encodeIvfPq]] shape — both quantizers ride
  * the rows as literals, zero shuffles before the partitioned write),
  * the version flip is O(1), and old generations stay readable for
  * in-flight queries until explicitly vacuumed with [[dropVersion]].
  *
  * Reference analog: the reference re-creates its DWH models wholesale
  * on schema change (dbt full-refresh semantics) rather than mutating
  * them in place; this is that discipline for the vector index.
  */
object ModelMigration {

  def versionPath(root: String, v: Long): String = s"$root/versions/v$v"

  private def fileSystem(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** The highest published generation, if any — the ONE read every
    * consumer resolves all component paths through. */
  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val (fs, dir) = fileSystem(spark, s"$root/published")
    if (!fs.exists(dir)) None
    else fs.listStatus(dir).toSeq
      .map(_.getPath.getName).filter(_.startsWith("v"))
      .flatMap(n => scala.util.Try(n.drop(1).toLong).toOption)
      .maxOption
  }

  /** Train generation `version` on `corpus` and fully re-encode it
    * under the versioned prefix. Does NOT publish — the prior
    * generation stays current (and fully servable) until [[publish]].
    * Safe to re-run after a crash: the unpublished prefix is simply
    * overwritten. */
  def prepare(corpus: DataFrame, id: String, vec: String, root: String,
              version: Long, nCells: Int, m: Int, nCodes: Int,
              iters: Int): Unit = {
    val spark = corpus.sparkSession
    val vp = versionPath(root, version)
    val cN = Similarity.normalized(corpus, id, vec).localCheckpoint()
    val dim = cN.select(size(col("cv"))).head().getInt(0)
    val cents = Similarity.trainCentroidsNormed(cN, nCells, iters)
      .zipWithIndex.map { case (cv, i) => (i, cv) }
    val cb = Similarity.trainPQ(cN, dim, m, nCodes, iters)
    Similarity.saveIvfCentroids(spark, vp, cents)
    Similarity.savePqIndex(vp, cb, Similarity.encodeIvfPq(cN, cents, cb))
  }

  /** Commit: one atomic marker-file create flips the current version.
    * Fails if the generation's artifacts are missing (a publish of a
    * half-prepared prefix must not succeed). */
  def publish(spark: SparkSession, root: String, version: Long): Unit = {
    val vp = versionPath(root, version)
    Seq("centroids", "codebooks", "codes").foreach { part =>
      val (fs, p) = fileSystem(spark, s"$vp/$part")
      require(fs.exists(p), s"cannot publish v$version: missing $part")
    }
    val (fs, marker) = fileSystem(spark, s"$root/published/v$version")
    fs.mkdirs(marker.getParent)
    val out = fs.create(marker, false) // atomic create, never overwrite
    out.close()
  }

  /** Full migration: train the NEXT generation on `corpus`, re-encode,
    * and atomically publish. Returns the new version. */
  def migrate(corpus: DataFrame, id: String, vec: String, root: String,
              nCells: Int, m: Int, nCodes: Int, iters: Int): Long = {
    val spark = corpus.sparkSession
    val next = currentVersion(spark, root).getOrElse(0L) + 1L
    prepare(corpus, id, vec, root, next, nCells, m, nCodes, iters)
    publish(spark, root, next)
    next
  }

  /** The current generation's components, resolved through one
    * manifest read: `(version, centroids, codebooks, codes)`. */
  def loadCurrent(spark: SparkSession, root: String)
      : (Long, Array[(Int, Seq[Double])], Array[Array[Seq[Double]]],
         DataFrame) = {
    val v = currentVersion(spark, root)
      .getOrElse(sys.error(s"no published index generation under $root"))
    val vp = versionPath(root, v)
    (v, Similarity.loadIvfCentroids(spark, vp),
      Similarity.loadPqCodebooks(spark, vp),
      Similarity.loadPqCodes(spark, vp))
  }

  /** Serve IVFADC top-k from the CURRENT published generation — model
    * and codes from one consistent version, search through the shared
    * [[Similarity.ivfPqTopKWith]] path. */
  def searchCurrent(root: String, corpus: DataFrame, queries: DataFrame,
                    id: String, vec: String, k: Int, nProbe: Int,
                    shortlist: Int): DataFrame = {
    val spark = corpus.sparkSession
    val (_, cents, cb, codes) = loadCurrent(spark, root)
    val cN = Similarity.normalized(corpus, id, vec)
    val qN = Similarity.normalizedQueries(queries, id, vec)
    val dim = cN.select(size(col("cv"))).head().getInt(0)
    Similarity.ivfPqTopKWith(cN, qN, cents, cb, codes, k, nProbe,
      shortlist, dim)
  }

  /** Vacuum an old (or abandoned) generation: marker first — readers
    * stop resolving to it — then the prefix. Refuses to drop the
    * current version. */
  def dropVersion(spark: SparkSession, root: String, version: Long): Unit = {
    require(!currentVersion(spark, root).contains(version),
      s"cannot drop the current version v$version")
    val (fs, marker) = fileSystem(spark, s"$root/published/v$version")
    if (fs.exists(marker)) fs.delete(marker, false)
    val (fs2, prefix) = fileSystem(spark, versionPath(root, version))
    if (fs2.exists(prefix)) fs2.delete(prefix, true)
  }
}
