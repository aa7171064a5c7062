package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot-versioned parquet table (J15) — the minimal
  * manifest-commit core of the lakehouse formats (Delta/Iceberg/Hudi):
  * every commit writes IMMUTABLE data files plus one manifest listing
  * exactly the files that version comprises, and readers resolve a
  * version's manifest to a file list. What that buys over a plain
  * directory, and what each call here demonstrates:
  *
  *  - '''Snapshot isolation / time travel''': a reader of version v is
  *    untouched by later commits — `readAt(v)` (`VERSION AS OF`)
  *    reproduces any historical state byte-for-byte because data files
  *    are never mutated, only referenced or not.
  *  - '''Atomic publish''': the data write and the manifest write are
  *    separate steps; ONLY the manifest rename makes a commit visible.
  *    A crash after the data write leaves orphan files no reader can
  *    see (the model-migration swap discipline at the table layer).
  *  - '''Metadata-only rollback''': `rollback(v)` commits a NEW
  *    version whose manifest is v's file list — no data moves, history
  *    stays intact (roll-forward is another rollback).
  *  - '''Vacuum with shared-file safety''': append commits REFERENCE
  *    prior files rather than rewriting them, so expiry must delete
  *    only files unreferenced by every SURVIVING manifest
  *    (`expireVersions`), never "files older than the cutoff".
  *
  * Scale shape: all bookkeeping is file-count-sized metadata — commits
  * never read existing data, rollback/expiry never scan a row, and
  * `readAt` hands Spark an explicit file list so column pruning and
  * predicate pushdown work unchanged. Concurrency: single-writer (the
  * reference's scheduled-DAG cadence); multi-writer needs a
  * compare-and-swap on the manifest name, stated not implemented.
  *
  * Reference contract: the agg DAGs re-publish tables on a schedule
  * (dags/iot_dwh_agg_transform_daily.py); versioned publication makes
  * each re-run a snapshot readers can pin or audit. */
object Versioned {

  private val ManifestDir = "_manifests"

  private def fs(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def manifestPath(root: String, v: Long) =
    f"$root/$ManifestDir/v$v%09d.json"

  /** All committed versions, ascending (empty for a fresh/absent
    * table). */
  def versions(spark: SparkSession, path: String): Seq[Long] = {
    val (f, _) = fs(spark, path)
    val dir = new org.apache.hadoop.fs.Path(s"$path/$ManifestDir")
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(n => n.stripPrefix("v").stripSuffix(".json").toLong)
      .sorted
  }

  def latestVersion(spark: SparkSession, path: String): Option[Long] =
    versions(spark, path).lastOption

  private def readManifest(spark: SparkSession, path: String,
                           v: Long): Seq[String] = {
    val (f, _) = fs(spark, path)
    val mp = new org.apache.hadoop.fs.Path(manifestPath(path, v))
    require(f.exists(mp), s"version $v does not exist under $path")
    val in = f.open(mp)
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    // one JSON array of file path strings — parsed with the same
    // minimal escaping Verify writes with (no JSON lib in the
    // classpath contract)
    body.trim.stripPrefix("[").stripSuffix("]").split(",")
      .map(_.trim.stripPrefix("\"").stripSuffix("\""))
      .filter(_.nonEmpty).toSeq
  }

  private def writeManifest(spark: SparkSession, path: String, v: Long,
                            files: Seq[String]): Unit = {
    val (f, _) = fs(spark, path)
    val tmp = new org.apache.hadoop.fs.Path(
      s"$path/$ManifestDir/.tmp-v$v-${java.util.UUID.randomUUID}")
    val out = f.create(tmp, false)
    try out.write(files.sorted
      .mkString("[\"", "\",\"", "\"]").getBytes("UTF-8"))
    finally out.close()
    // the rename IS the commit point — readers either see the full
    // manifest or no version at all
    require(f.rename(tmp, new org.apache.hadoop.fs.Path(
      manifestPath(path, v))), s"manifest publish failed for v$v")
  }

  private def dataFilesUnder(spark: SparkSession, path: String,
                             dir: String): Seq[String] = {
    val (f, _) = fs(spark, path)
    f.listStatus(new org.apache.hadoop.fs.Path(dir)).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString)
  }

  /** Commit `df` as the table's next version. `append = false` (the
    * default) publishes df as the COMPLETE new state; `append = true`
    * publishes previous files + df's new files (no rewrite — the
    * incremental-landing commit). Returns the committed version. */
  def commit(df: DataFrame, path: String, append: Boolean = false): Long = {
    val spark = df.sparkSession
    val prev = latestVersion(spark, path)
    val v = prev.map(_ + 1).getOrElse(1L)
    val dataDir = f"$path/data/commit-v$v%09d"
    df.write.mode("errorifexists").parquet(dataDir)
    val fresh = dataFilesUnder(spark, path, dataDir)
    val files =
      if (append) prev.map(readManifest(spark, path, _)).getOrElse(Seq.empty) ++ fresh
      else fresh
    writeManifest(spark, path, v, files)
    v
  }

  /** `VERSION AS OF` — the exact file set version `v` committed;
    * pruning/pushdown run unchanged on the explicit list. */
  def readAt(spark: SparkSession, path: String, v: Long): DataFrame = {
    val files = readManifest(spark, path, v)
    require(files.nonEmpty, s"version $v of $path is empty")
    spark.read.parquet(files: _*)
  }

  def readLatest(spark: SparkSession, path: String): DataFrame = {
    val v = latestVersion(spark, path).getOrElse(
      sys.error(s"no committed versions under $path"))
    readAt(spark, path, v)
  }

  /** Metadata-only rollback: commit a NEW version referencing exactly
    * version `v`'s files. History is preserved — rolling forward is
    * another rollback. Returns the new version. */
  def rollback(spark: SparkSession, path: String, v: Long): Long = {
    val files = readManifest(spark, path, v)
    val nv = latestVersion(spark, path).getOrElse(0L) + 1
    writeManifest(spark, path, nv, files)
    nv
  }

  /** VACUUM: drop all but the newest `keepLast` versions and delete
    * data files no SURVIVING manifest references. Append chains share
    * files across versions, so liveness is a set union over survivors,
    * never a file-age cutoff. Metadata + file-delete only — no row is
    * read; idempotent. Returns (#manifests dropped, #files deleted). */
  def expireVersions(spark: SparkSession, path: String,
                     keepLast: Int): (Int, Int) = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val (f, _) = fs(spark, path)
    val vs = versions(spark, path)
    val (dead, live) = vs.splitAt(math.max(0, vs.size - keepLast))
    val keep = live.flatMap(readManifest(spark, path, _)).toSet
    val doomed = dead.flatMap(readManifest(spark, path, _)).toSet -- keep
    doomed.foreach(p =>
      f.delete(new org.apache.hadoop.fs.Path(p), false))
    dead.foreach(v =>
      f.delete(new org.apache.hadoop.fs.Path(manifestPath(path, v)), false))
    (dead.size, doomed.size)
  }

  /** Change data feed between two committed versions (the Delta CDF /
    * Iceberg changelog role): keyed diff of `readAt(fromV)` vs
    * `readAt(toV)` through the SAME snapshot-diff machinery the C8
    * operator ships — `(key…, change ∈ added/changed/removed,
    * per-attr before/after)`, the snapshotDiff vocabulary
    * (WarehouseSpec-asserted).
    * Because snapshots are immutable file lists, the feed for a fixed
    * (fromV, toV) pair is reproducible forever — the property log-based
    * CDC can't give you once the log is compacted. One full-outer
    * keyed join of two explicit file lists; pushdown and pruning reach
    * both scans unchanged. */
  def changesBetween(spark: SparkSession, path: String, fromV: Long,
                     toV: Long, key: Seq[String],
                     attrs: Seq[String]): DataFrame =
    graft.operators.Incremental.snapshotDiff(
      readAt(spark, path, fromV), readAt(spark, path, toV), key, attrs)
}
