package graft.sql

import java.util.Locale

import graft.sources.{Versioned, Warehouse}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{Identifier, ProcedureCatalog}
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** SQL surface for the WRITE/maintenance side of the engine.
  *
  * The reference serves its entire write path through SQL (dbt models +
  * TimescaleDB policies: reference dags/dbt_project/models/stage +
  * `add_retention_policy()`/`drop_chunks()` in dags/sql), while graft's
  * maintenance layer ([[graft.sources.Warehouse]],
  * [[graft.sources.Versioned]]) was Scala-only — a SQL-first user could
  * read every operator through the `graft_*` table functions but could
  * not run an upsert, a refresh, a compaction or a retention sweep.
  * This catalog closes that gap with Spark 4's stored-procedure
  * surface (`ProcedureCatalog` + `CALL`, the Iceberg
  * `CALL catalog.system.rewrite_data_files(...)` idiom):
  *
  * {{{
  *   -- spark.sql.catalog.graft = graft.sql.GraftCatalog
  *   CALL graft.merge_upsert('updates_view', '/w/events', 'day', 'event_id', 'ts')
  *   CALL graft.compact('/w/events', 'day')
  *   CALL graft.retention('/w/events', 'day', '2024-01-01')
  *   CALL graft.delete_keys('doomed_view', '/w/events', 'day', 'user_id')
  *   CALL graft.write_zordered('lineitem', '/w/li_z', 'l_orderkey,l_partkey', 8)
  *   CALL graft.versioned_commit('snapshot_view', '/w/dim_v')
  *   CALL graft.versioned_rollback('/w/dim_v', 3)
  *   CALL graft.versioned_expire('/w/dim_v', 2)
  * }}}
  *
  * One code path: every procedure body delegates to the SAME
  * Warehouse/Versioned function the Scala caller uses (the S1
  * shared-code-path discipline — the SQL and Scala spellings cannot
  * drift), and each returns the Scala API's return value as rows
  * (compaction report, dropped partitions, committed version) so a SQL
  * session gets the same evidence a Scala caller would. Frame-valued
  * inputs arrive as TABLE/VIEW NAMES resolved through the session
  * catalog; function-valued inputs (`refresh_aggregate`'s aggregate,
  * `refresh_enriched`'s join) arrive as SQL text evaluated against the
  * documented temp views `__raw` / `__fact` + `__dim` — exactly how
  * dbt expresses the same contract (a model is SQL text over source
  * relations).
  *
  * The READ side of the versioned table (time travel, change feed,
  * version list) lives in [[graft.GraftTableFunctions]]
  * (`graft_read_at`/`graft_read_latest`/`graft_changes_between`/
  * `graft_versions`) — reads belong in FROM clauses where pruning and
  * pushdown compose with the outer query, not in CALL results.
  */
class GraftCatalog extends ProcedureCatalog {
  private var catalogName: String = "graft"
  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName
  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    // every procedure lives at the catalog ROOT — a namespaced lookup
    // (`graft.foo.merge_upsert`) must not silently resolve as if the
    // namespace were absent (r11 advice)
    if (ident.namespace().nonEmpty)
      throw new IllegalArgumentException(
        s"graft procedures live at the catalog root; " +
          s"no namespace '${ident.namespace().mkString(".")}'")
    val key = ident.name().toLowerCase(Locale.ROOT)
    GraftCatalog.procedures.getOrElse(key, throw new IllegalArgumentException(
      s"unknown graft procedure '$key' " +
        s"(have: ${GraftCatalog.procedures.keys.toSeq.sorted.mkString(", ")})"))
  }
  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    // root namespace only; SHOW PROCEDURES IN graft.<anything> is empty
    // rather than a phantom copy of the root listing (r11 advice)
    if (namespace.nonEmpty) Array.empty
    else GraftCatalog.procedures.keys.toArray.sorted
      .map(Identifier.of(Array.empty[String], _))
}

object GraftCatalog {

  /** Single-result-set scan the CALL machinery materializes. */
  private final case class RowsScan(schema: StructType, rs: Array[InternalRow])
      extends LocalScan {
    override def rows(): Array[InternalRow] = rs
    override def readSchema(): StructType = schema
  }

  /** A procedure is bound eagerly (parameters are fixed, not
    * input-schema-dependent) — bind() returns itself. */
  private final case class Proc(
      pname: String, doc: String, params: Seq[ProcedureParameter],
      outSchema: StructType,
      body: (SparkSession, InternalRow) => Seq[InternalRow])
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = pname
    override def description(): String = doc
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params.toArray
    // every procedure here writes — none may be constant-folded/reused
    override def isDeterministic: Boolean = false
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val rows = body(SparkSession.active, input)
      java.util.Collections
        .singletonList(RowsScan(outSchema, rows.toArray): Scan).iterator()
    }
  }

  private def in(n: String, t: DataType): ProcedureParameter =
    ProcedureParameter.in(n, t).build()
  private def inD(n: String, t: DataType, sqlDefault: String): ProcedureParameter =
    ProcedureParameter.in(n, t).defaultValue(sqlDefault).build()

  private def gs(r: InternalRow, i: Int): String = r.getUTF8String(i).toString
  private def gcsv(r: InternalRow, i: Int): Seq[String] =
    gs(r, i).split(',').iterator.map(_.trim).filter(_.nonEmpty).toSeq
  private def u8(s: String): UTF8String = UTF8String.fromString(s)
  private def row(vs: Any*): InternalRow = new GenericInternalRow(vs.toArray)

  private val ok = StructType(Seq(StructField("status", StringType)))
  private val okRow = Seq(row(u8("ok")))

  /** Run `sql` with `names(i)` visible as temp views over `frames(i)`,
    * dropping the views afterwards. The names (`__raw`, `__fact`,
    * `__dim`) are RESERVED by this surface — and FAIL FAST if the
    * caller already owns a same-named temp view: the previous
    * clobber-and-drop silently destroyed the caller's view (r11
    * advice). An error names the collision; the caller renames theirs.
    */
  private def withViews(spark: SparkSession, names: Seq[String],
                        frames: Seq[org.apache.spark.sql.DataFrame],
                        sql: String): org.apache.spark.sql.DataFrame = {
    names.foreach { n =>
      require(!spark.catalog.tableExists(n),
        s"temp view name '$n' is reserved by graft CALL procedures and " +
          s"already exists in this session — drop or rename it first")
    }
    names.zip(frames).foreach { case (n, f) => f.createOrReplaceTempView(n) }
    // spark.sql analyzes EAGERLY — the view subtrees are inlined into
    // the returned plan, so dropping the views immediately is safe
    try spark.sql(sql)
    finally names.foreach(spark.catalog.dropTempView(_))
  }

  val procedures: Map[String, UnboundProcedure] = Seq[Proc](
    Proc("merge_upsert",
      "MERGE-style latest-wins upsert of a view into a partitioned " +
        "parquet table; touched partitions only (Warehouse.mergeUpsert)",
      Seq(in("updates", StringType), in("path", StringType),
        in("partition_cols", StringType), in("key_cols", StringType),
        in("version_col", StringType)),
      ok,
      (s, r) => {
        Warehouse.mergeUpsert(s.table(gs(r, 0)), gs(r, 1), gcsv(r, 2),
          gcsv(r, 3), gs(r, 4))
        okRow
      }),

    Proc("refresh_aggregate",
      "Watermark-driven continuous-aggregate refresh: agg_sql runs over " +
        "the temp view __raw (full on first load, touched-period delta " +
        "after) and lands via dynamic partition overwrite " +
        "(Warehouse.refreshAggregate)",
      Seq(in("raw", StringType), in("path", StringType),
        in("partition_cols", StringType), in("raw_watermark", StringType),
        in("agg_watermark", StringType), in("agg_sql", StringType),
        inD("inclusive", BooleanType, "false")),
      ok,
      (s, r) => {
        val aggSql = gs(r, 5)
        Warehouse.refreshAggregate(s.table(gs(r, 0)), gs(r, 1), gcsv(r, 2),
          gs(r, 3), gs(r, 4),
          df => withViews(s, Seq("__raw"), Seq(df), aggSql),
          inclusiveWatermark = r.getBoolean(6))
        okRow
      }),

    Proc("refresh_enriched",
      "Incremental materialized JOIN: enrich_sql runs over temp views " +
        "__fact (the watermark delta) and __dim, lands via merge_upsert " +
        "(Warehouse.refreshEnriched)",
      Seq(in("fact", StringType), in("dim", StringType),
        in("path", StringType), in("partition_cols", StringType),
        in("fact_key", StringType), in("fact_watermark", StringType),
        in("enrich_sql", StringType)),
      ok,
      (s, r) => {
        val enrichSql = gs(r, 6)
        Warehouse.refreshEnriched(s.table(gs(r, 0)), s.table(gs(r, 1)),
          gs(r, 2), gcsv(r, 3), gcsv(r, 4), gs(r, 5),
          (f, d) => withViews(s, Seq("__fact", "__dim"), Seq(f, d), enrichSql))
        okRow
      }),

    Proc("compact",
      "Small-files compaction: coalesce fragmented partitions to " +
        "byte-proportional file targets, never shuffling " +
        "(Warehouse.compactPartitions); returns the per-partition report",
      Seq(in("path", StringType), in("partition_cols", StringType),
        inD("target_file_bytes", LongType, "134217728"),
        inD("min_files", IntegerType, "2")),
      StructType(Seq(StructField("partition", StringType),
        StructField("files_before", IntegerType),
        StructField("files_after", IntegerType))),
      (s, r) => Warehouse.compactPartitions(s, gs(r, 0), gcsv(r, 1),
          targetFileBytes = r.getLong(2), minFiles = r.getInt(3))
        .map { case (p, b, a) => row(u8(p), b, a) }),

    Proc("retention",
      "TimescaleDB drop_chunks(): metadata-only drop of first-level " +
        "time partitions strictly older than keep_from " +
        "(Warehouse.applyRetention); returns the dropped partition values",
      Seq(in("path", StringType), in("partition_col", StringType),
        in("keep_from", StringType)),
      StructType(Seq(StructField("dropped_partition", StringType))),
      (s, r) => Warehouse.applyRetention(s, gs(r, 0), gs(r, 1), gs(r, 2))
        .map(p => row(u8(p)))),

    Proc("delete_keys",
      "GDPR keyed erase: locate pass finds partitions containing a " +
        "doomed key, only those re-read/anti-joined/overwritten " +
        "(Warehouse.deleteKeys); returns the touched partitions",
      Seq(in("doomed", StringType), in("path", StringType),
        in("partition_cols", StringType), in("key_cols", StringType)),
      StructType(Seq(StructField("touched_partition", StringType))),
      (s, r) => Warehouse.deleteKeys(s.table(gs(r, 0)), gs(r, 1),
          gcsv(r, 2), gcsv(r, 3))
        .map(p => row(u8(p)))),

    Proc("write_zordered",
      "OPTIMIZE ZORDER BY: write source ordered by the Morton " +
        "interleave of min-max-quantized cols (Warehouse.writeZOrdered); " +
        "returns the calibration (col, lo, hi) for readers",
      Seq(in("source", StringType), in("path", StringType),
        in("cols", StringType), in("num_files", IntegerType),
        inD("bits_per_col", IntegerType, "10")),
      StructType(Seq(StructField("col", StringType),
        StructField("lo", DoubleType), StructField("hi", DoubleType))),
      (s, r) => Warehouse.writeZOrdered(s.table(gs(r, 0)), gs(r, 1),
          gcsv(r, 2), numFiles = r.getInt(3), bitsPerCol = r.getInt(4))
        .map { case (c, lo, hi) => row(u8(c), lo, hi) }),

    Proc("versioned_commit",
      "Commit a view as a new immutable snapshot version (append=true " +
        "references the prior version's files); returns the version id " +
        "(Versioned.commit)",
      Seq(in("source", StringType), in("path", StringType),
        inD("append", BooleanType, "false")),
      StructType(Seq(StructField("version", LongType))),
      (s, r) => Seq(row(Versioned.commit(s.table(gs(r, 0)), gs(r, 1),
        append = r.getBoolean(2))))),

    Proc("versioned_rollback",
      "Metadata-only rollback: commit a NEW version referencing exactly " +
        "version v's files (history preserved); returns the new version " +
        "(Versioned.rollback)",
      Seq(in("path", StringType), in("version", LongType)),
      StructType(Seq(StructField("version", LongType))),
      (s, r) => Seq(row(Versioned.rollback(s, gs(r, 0), r.getLong(1))))),

    Proc("versioned_expire",
      "VACUUM: drop all but the newest keep_last versions and delete " +
        "files no surviving manifest references (Versioned.expireVersions)",
      Seq(in("path", StringType), in("keep_last", IntegerType)),
      StructType(Seq(StructField("manifests_dropped", IntegerType),
        StructField("files_deleted", IntegerType))),
      (s, r) => {
        val (m, f) = Versioned.expireVersions(s, gs(r, 0), r.getInt(1))
        Seq(row(m, f))
      })
  ).map(p => p.pname -> (p: UnboundProcedure)).toMap
}
